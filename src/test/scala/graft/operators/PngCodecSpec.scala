package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** The real PNG codec against three INDEPENDENT references: hand-laid
  * golden bytes (a stored-mode zlib stream, so every byte is visible in
  * the fixture), javax.imageio as a foreign decoder for our encoder's
  * output, and javax.imageio as a foreign ENCODER whose output our
  * decoder must read — a consistent encode/decode inversion would fool
  * the m07 oracle but cannot fool either direction here. */
class PngCodecSpec extends AnyFunSuite {

  private def be(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(i).array()

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val td = typ.getBytes("US-ASCII") ++ data
    val crc = new java.util.zip.CRC32(); crc.update(td)
    be(data.length) ++ td ++ be(crc.getValue.toInt)
  }

  /** zlib framing with a single STORED deflate block: the compressed
    * stream is the raw bytes themselves, so the fixture pins the chunk
    * walk, zlib header, and adler trailer without trusting any
    * compressor. */
  private def zlibStored(raw: Array[Byte]): Array[Byte] = {
    val adler = new java.util.zip.Adler32(); adler.update(raw)
    Array(0x78.toByte, 0x01.toByte, 0x01.toByte, // CMF, FLG, BFINAL+stored
      (raw.length & 0xff).toByte, ((raw.length >> 8) & 0xff).toByte,
      (~raw.length & 0xff).toByte, ((~raw.length >> 8) & 0xff).toByte) ++
      raw ++ be(adler.getValue.toInt)
  }

  private val signature =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def ihdr(w: Int, h: Int, color: Int, interlace: Int = 0): Array[Byte] =
    chunk("IHDR", be(w) ++ be(h) ++
      Array(8.toByte, color.toByte, 0.toByte, 0.toByte, interlace.toByte))

  test("decodePng reads a hand-laid stored-zlib truecolor file") {
    // 2x1 RGB, filter 0: raw scanline = [0, 0,10,20, 30,40,50]
    val raw = Array[Int](0, 0, 10, 20, 30, 40, 50).map(_.toByte)
    val png = signature ++ ihdr(2, 1, color = 2) ++
      chunk("IDAT", zlibStored(raw)) ++ chunk("IEND", Array.emptyByteArray)
    val info = MediaCodecs.decodePng(png)
    assert(info == MediaCodecs.PngInfo(2, 1, 3, 0 + 10 + 20 + 30 + 40 + 50))
  }

  test("hand-laid Sub/Up/Average/Paeth rows reconstruct exactly") {
    // 2x5 RGB, one row per filter type; expected image (top-down, RGB):
    //   row0 (None):  (1,2,3)   (4,5,6)
    //   row1 (Sub):   (10,10,10)(13,14,15)  filt: 10,10,10, 3,4,5
    //   row2 (Up):    (11,12,13)(14,15,16)  filt: 1,2,3, 1,1,1
    //   row3 (Avg):   (10,11,12)(13,14,15)  pred=(left+up)/2
    //   row4 (Paeth): (10,11,12)(13,14,15)  pred=paeth(left,up,ul)
    val rows = Array[Int](
      0, 1, 2, 3, 4, 5, 6,
      1, 10, 10, 10, 3, 4, 5,
      2, 1, 2, 3, 1, 1, 1,
      // row3 raw: left(0,0,0|10,11,12), up(11,12,13|14,15,16)
      //   px0: pred=(0+11)/2=5 -> f=5 ; (0+12)/2=6 -> 5 ; (0+13)/2=6 -> 6
      //   px1: pred=(10+14)/2=12 -> 1 ; (11+15)/2=13 -> 1 ; (12+16)/2=14 -> 1
      3, 5, 5, 6, 1, 1, 1,
      // row4 raw: left(0|10,11,12), up(10,11,12|13,14,15), ul(0|10,11,12)
      //   px0: paeth(0,10,0)=10 -> f=0 (all three)
      //   px1: paeth(10,13,10)=13 -> f=0 (all three)
      4, 0, 0, 0, 0, 0, 0).map(_.toByte)
    val png = signature ++ ihdr(2, 5, color = 2) ++
      chunk("IDAT", zlibStored(rows)) ++ chunk("IEND", Array.emptyByteArray)
    val expected = Seq(
      1, 2, 3, 4, 5, 6,
      10, 10, 10, 13, 14, 15,
      11, 12, 13, 14, 15, 16,
      10, 11, 12, 13, 14, 15,
      10, 11, 12, 13, 14, 15).map(_.toLong).sum
    assert(MediaCodecs.decodePng(png).sumChannels == expected)
  }

  test("javax.imageio decodes our encoder's mixed-filter output pixel-exactly") {
    for (ch <- Seq(3, 4)) {
      val (w, h) = (7, 6) // six rows: every filter type incl. a repeat
      def px(x: Int, y: Int, c: Int): Int = (x * 31 + y * 17 + c * 7 + 5) % 256
      val bytes = MediaCodecs.encodePng(w, h, ch, px)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO failed to parse the container")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        assert(((argb >> 16) & 0xff) == px(x, y, 0), s"R at $x,$y ch=$ch")
        assert(((argb >> 8) & 0xff) == px(x, y, 1), s"G at $x,$y ch=$ch")
        assert((argb & 0xff) == px(x, y, 2), s"B at $x,$y ch=$ch")
        val a = if (ch == 4) px(x, y, 3) else 255
        assert(((argb >> 24) & 0xff) == a, s"A at $x,$y ch=$ch")
      }
    }
  }

  test("our decoder reads a javax.imageio-ENCODED png (foreign filter choices)") {
    val (w, h) = (9, 8)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var expected = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = ((x * 13 + y) % 256, (y * 29 + x) % 256, (x * y + 3) % 256)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      expected += r + g + b
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    val info = MediaCodecs.decodePng(out.toByteArray)
    assert(info.width == w && info.height == h && info.channels == 3)
    assert(info.sumChannels == expected)
  }

  test("encodePng splits IDAT and round-trips edge shapes") {
    val bytes = MediaCodecs.encodePng(6, 7, 3, (x, y, c) => (x + y + c) % 256)
    // walk the chunk list: the compressed stream must span TWO IDATs
    var pos = 8
    var idats = 0
    var typ = ""
    while (typ != "IEND") {
      val len = ByteBuffer.wrap(bytes, pos, 4).order(ByteOrder.BIG_ENDIAN).getInt
      typ = new String(bytes, pos + 4, 4, "US-ASCII")
      if (typ == "IDAT") idats += 1
      pos += 12 + len
    }
    assert(idats == 2, s"expected a split IDAT stream, got $idats chunk(s)")
    // width 1: every filter's left/upper-left neighbors are the zero edge
    for (ch <- Seq(3, 4); (w, h) <- Seq((1, 7), (3, 1), (2, 11))) {
      def px(x: Int, y: Int, c: Int): Int = (x * 7 + y * 3 + c * 11 + 1) % 256
      val info = MediaCodecs.decodePng(MediaCodecs.encodePng(w, h, ch, px))
      val expected = (for { x <- 0 until w; y <- 0 until h; c <- 0 until ch }
        yield px(x, y, c).toLong).sum
      assert(info.sumChannels == expected, s"${w}x${h}x$ch")
      assert(info.channels == ch)
    }
  }

  test("malformed input refuses: signature, CRC, interlace, truncation") {
    val good = MediaCodecs.encodePng(4, 4, 3, (x, y, c) => x + y + c)
    intercept[IllegalArgumentException](
      MediaCodecs.decodePng("nope".getBytes ++ good.drop(4)))
    val badCrc = good.clone()
    badCrc(badCrc.length - 1) = (badCrc(badCrc.length - 1) ^ 0x7f).toByte
    intercept[IllegalArgumentException](MediaCodecs.decodePng(badCrc))
    // interlace declared (Adam7): a correct-CRC header must still refuse
    val raw = Array[Int](0, 1, 2, 3).map(_.toByte) // 1x1 RGB
    val interlaced = signature ++ ihdr(1, 1, color = 2, interlace = 1) ++
      chunk("IDAT", zlibStored(raw)) ++ chunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException](MediaCodecs.decodePng(interlaced))
    // palette color type
    val palette = signature ++ ihdr(1, 1, color = 3) ++
      chunk("IDAT", zlibStored(raw)) ++ chunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException](MediaCodecs.decodePng(palette))
    intercept[IllegalArgumentException](
      MediaCodecs.decodePng(good.dropRight(13))) // IEND gone
    // a chunk length near Int.MaxValue must refuse, not Int-overflow the
    // guard and then die allocating
    val bomb = signature ++ be(0x7fffffff) ++ "IDAT".getBytes("US-ASCII") ++
      be(0) // truncated body: the length check must fire first
    intercept[IllegalArgumentException](MediaCodecs.decodePng(bomb))
    // pixel stream shorter than the image: 2 rows declared, 1 shipped
    val short = signature ++ ihdr(1, 2, color = 2) ++
      chunk("IDAT", zlibStored(raw)) ++ chunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException](MediaCodecs.decodePng(short))
  }
}
