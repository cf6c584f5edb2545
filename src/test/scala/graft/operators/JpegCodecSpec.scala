package graft.operators

import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import org.scalatest.funsuite.AnyFunSuite

/** The baseline JPEG decoder against independent references. JPEG is
  * lossy with spec-sanctioned IDCT latitude, so the pins differ from
  * PNG's bit-exactness: (1) hand-laid all-DC fixtures whose decode is
  * exact BY CONSTRUCTION (zero AC energy → the IDCT is a constant and
  * every conforming decoder must produce the same samples), and (2)
  * per-pixel proximity to javax.imageio's independent decode of
  * imageio-ENCODED bytes (foreign Huffman/quant choices, 4:2:0
  * subsampling, the works). */
class JpegCodecSpec extends AnyFunSuite {

  // --- hand-laid fixture helpers: single-component, single-symbol tables

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  /** Minimal grayscale JPEG: one quant table (all qdc), single-symbol
    * Huffman tables (DC category `dcCat` and AC EOB, each 1-bit code 0),
    * w×h pixels whose scan is the caller's entropy bytes (per block:
    * DC code + `dcCat` diff bits + EOB). `dri` > 0 adds a DRI segment. */
  private def flatJpeg(qdc: Int, dcCat: Int, scan: Array[Byte],
      w: Int = 8, h: Int = 8, dri: Int = 0): Array[Byte] = {
    val qt = bytes(0xff, 0xdb, 0x00, 0x43, 0x00) ++
      (qdc +: Seq.fill(63)(1)).map(_.toByte).toArray
    def dht(cls: Int, sym: Int) =
      bytes(0xff, 0xc4, 0x00, 0x14, cls << 4) ++
        bytes(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++ bytes(sym)
    val sof = bytes(0xff, 0xc0, 0x00, 0x0b, 0x08, h >> 8, h & 0xff,
      w >> 8, w & 0xff, 0x01, 0x01, 0x11, 0x00)
    val driSeg = if (dri > 0) bytes(0xff, 0xdd, 0x00, 0x04, dri >> 8, dri & 0xff)
      else Array.emptyByteArray
    val sos = bytes(0xff, 0xda, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3f, 0x00)
    bytes(0xff, 0xd8) ++ qt ++ dht(0, dcCat) ++ dht(1, 0x00) ++ driSeg ++
      sof ++ sos ++ scan ++ bytes(0xff, 0xd9)
  }

  test("hand-laid all-DC blocks decode exactly") {
    // DC category 0: diff = 0, all coefficients zero → every sample 128
    val flat = JpegCodec.decode(flatJpeg(qdc = 1, dcCat = 0,
      scan = bytes(0x3f))) // bits: DC '0', EOB '0', pad 111111
    assert(flat.width == 8 && flat.height == 8 && flat.components == 1)
    assert(flat.pixels.forall(_ == 0x808080), flat.pixels.take(4).toSeq.toString)

    // DC category 2, diff bits '11' → diff 3, quant 16 → coefficient 48,
    // IDCT of a pure-DC block = 48/8 + 128 = 134 everywhere
    val lifted = JpegCodec.decode(flatJpeg(qdc = 16, dcCat = 2,
      scan = bytes(0x6f))) // bits: DC '0', diff '11', EOB '0', pad 1111
    assert(lifted.pixels.forall(_ == 0x868686),
      f"expected 134 samples, got 0x${lifted.pixels(0)}%06x")
  }

  test("restart markers byte-align, cycle RSTn and reset the DC predictor") {
    // 24x8 grayscale, DRI=1: three MCUs, each followed by... preceded by a
    // restart boundary after every MCU. Each block encodes DC diff +3
    // (category 2, quant 16 → +48 → samples 134). WITHOUT the predictor
    // reset the second block would accumulate (pred 6 → 140) and the
    // third 9 → 146 — so all-134 pins the reset, the RST0/RST1 sequence
    // pins the cycling, and the mid-byte pad before each marker pins the
    // byte-alignment.
    val mcuBits = bytes(0x6f) // DC '0', diff '11', EOB '0', pad 1111
    val scan = mcuBits ++ bytes(0xff, 0xd0) ++ mcuBits ++
      bytes(0xff, 0xd1) ++ mcuBits
    val info = JpegCodec.decode(flatJpeg(qdc = 16, dcCat = 2, scan = scan,
      w = 24, h = 8, dri = 1))
    assert(info.width == 24 && info.height == 8)
    assert(info.pixels.forall(_ == 0x868686),
      f"restart handling broke DC prediction: got 0x${info.pixels(0)}%06x, " +
        f"0x${info.pixels(8)}%06x, 0x${info.pixels(16)}%06x")

    // a wrong restart index must refuse (RST0 expected, RST5 found)
    val bad = mcuBits ++ bytes(0xff, 0xd5) ++ mcuBits ++ bytes(0xff, 0xd1) ++ mcuBits
    val e = intercept[IllegalArgumentException](JpegCodec.decode(
      flatJpeg(qdc = 16, dcCat = 2, scan = bad, w = 24, h = 8, dri = 1)))
    assert(e.getMessage.contains("RST"), e.getMessage)
  }

  test("single-component scans are non-interleaved: 2x2 luma factors ignored") {
    // same stream as the flat 8x8 fixture but SOF declares 2x2 sampling;
    // T.81 §A.2: a one-component scan's MCU is ONE data unit, so this
    // still decodes as a single 8x8 block of 128s (an interleaved reading
    // would consume four blocks and die in the entropy stream)
    val base = flatJpeg(qdc = 1, dcCat = 0, scan = bytes(0x3f))
    val sofHv = base.indexOfSlice(bytes(0x08, 0x00, 0x08, 0x00, 0x08, 0x01, 0x01))
    assert(sofHv >= 0, "fixture SOF not found")
    val patched = base.clone()
    patched(sofHv + 6 + 1) = 0x22.toByte // component h<<4|v: 1x1 → 2x2
    val info = JpegCodec.decode(patched)
    assert(info.width == 8 && info.height == 8)
    assert(info.pixels.forall(_ == 0x808080))
  }

  test("imageio-encoded color and grayscale decode within IDCT latitude") {
    for ((w, h, gray) <- Seq((20, 14, false), (8, 8, false), (33, 17, false),
      (10, 6, true))) {
      val img = new java.awt.image.BufferedImage(w, h,
        if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = (20 + x * 4 + y * 2, 30 + x * 2 + y * 3, 60 + x + y * 4)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "jpg", out))
      val jpeg = out.toByteArray
      val ours = JpegCodec.decode(jpeg)
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      assert(ours.width == w && ours.height == h)
      var maxDelta = 0
      if (gray) {
        // compare raw luma raster samples: getRGB on TYPE_BYTE_GRAY runs
        // a gray→sRGB colorspace conversion that neither codec performs
        assert(ours.components == 1)
        for (y <- 0 until h; x <- 0 until w)
          maxDelta = math.max(maxDelta, math.abs(
            (ours.pixels(y * w + x) & 0xff) - ref.getRaster.getSample(x, y, 0)))
      } else for (y <- 0 until h; x <- 0 until w; shift <- Seq(16, 8, 0)) {
        val a = (ours.pixels(y * w + x) >> shift) & 0xff
        val b2 = (ref.getRGB(x, y) >> shift) & 0xff
        maxDelta = math.max(maxDelta, math.abs(a - b2))
      }
      assert(maxDelta <= 8,
        s"${w}x$h gray=$gray: max per-channel delta $maxDelta vs imageio")
    }
  }

  test("explicit quality and restart intervals decode too") {
    val (w, h) = (40, 24)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((15 + x * 3 + y) << 16) | ((40 + x + y * 2) << 8) | (90 + x + y))
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.5f)
    val out = new ByteArrayOutputStream()
    writer.setOutput(ImageIO.createImageOutputStream(out))
    writer.write(null, new IIOImage(img, null, null), param)
    writer.dispose()
    val jpeg = out.toByteArray
    val ours = JpegCodec.decode(jpeg)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    var maxDelta = 0
    for (y <- 0 until h; x <- 0 until w; shift <- Seq(16, 8, 0))
      maxDelta = math.max(maxDelta, math.abs(
        ((ours.pixels(y * w + x) >> shift) & 0xff) - ((ref.getRGB(x, y) >> shift) & 0xff)))
    assert(maxDelta <= 8, s"quality-0.5: max delta $maxDelta")
  }

  test("progressive, truncated and non-JPEG refuse") {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, x * 16 + y)
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val out = new ByteArrayOutputStream()
    writer.setOutput(ImageIO.createImageOutputStream(out))
    writer.write(null, new IIOImage(img, null, null), param)
    writer.dispose()
    val e = intercept[IllegalArgumentException](JpegCodec.decode(out.toByteArray))
    assert(e.getMessage.contains("progressive"), e.getMessage)

    val good = { val o = new ByteArrayOutputStream(); ImageIO.write(img, "jpg", o); o.toByteArray }
    intercept[IllegalArgumentException](JpegCodec.decode(good.take(good.length / 2)))
    intercept[IllegalArgumentException](JpegCodec.decode("not a jpeg".getBytes))
    // crafted SOF dims must refuse BEFORE any allocation: 65535x40000
    // would Int-overflow the plane size (NegativeArraySizeException) or
    // grab gigabytes from a 25-byte input
    val bomb = bytes(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x0b, 0x08,
      0x9c, 0x40, /* h=40000 */ 0xff, 0xff, /* w=65535 */
      0x01, 0x01, 0x11, 0x00, 0xff, 0xd9)
    val eDim = intercept[IllegalArgumentException](JpegCodec.decode(bomb))
    assert(eDim.getMessage.contains("decode cap"), eDim.getMessage)
  }
}
