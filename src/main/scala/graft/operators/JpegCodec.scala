package graft.operators

/** REAL baseline JPEG decoder — no imaging library: marker-segment walk,
  * canonical Huffman table construction (JPEG spec §C.2), entropy decode
  * with byte-unstuffing and restart-marker handling, dequantization,
  * zigzag inversion, a direct separable IDCT, and YCbCr→RGB with
  * box-replication chroma upsampling. Baseline DCT only (SOF0; SOF1's
  * 8-bit extended-sequential decodes identically) — progressive (SOF2),
  * arithmetic coding, hierarchical and 12-bit refuse loudly.
  *
  * JPEG is the m-family's first LOSSY format: unlike PNG there is no
  * bit-exact ground truth to reproduce — the spec allows IDCT latitude —
  * so correctness is pinned two ways (JpegCodecSpec): a hand-laid
  * all-DC fixture whose decode is exact by construction, and per-pixel
  * proximity to javax.imageio's independent decode of the same bytes.
  * The m08 entry's outputs are OUR decoder's sums — deterministic, and
  * pinned by a golden oracle.
  */
object JpegCodec {

  final case class JpegInfo(width: Int, height: Int, components: Int,
      pixels: Array[Int]) { // packed 0xRRGGBB, row-major
    def sumChannel(shift: Int): Long = {
      var s = 0L; var i = 0
      while (i < pixels.length) { s += (pixels(i) >> shift) & 0xff; i += 1 }
      s
    }
    def sumR: Long = sumChannel(16)
    def sumG: Long = sumChannel(8)
    def sumB: Long = sumChannel(0)
  }

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  // ------------------------------------------------------------ Huffman

  /** Canonical Huffman table (spec §C.2): BITS[16] code-length counts +
    * values in code order → the MINCODE/MAXCODE/VALPTR decode arrays of
    * §F.2.2.3. */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(in: BitReader): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        code = (code << 1) | in.bit()
        if (maxCode(l) >= 0 && code <= maxCode(l) && code >= minCode(l))
          return vals(valPtr(l) + code - minCode(l))
        l += 1
      }
      fail("invalid Huffman code (corrupt entropy stream)")
    }
  }

  /** Entropy-segment bit reader: unstuffs FF00, stops at any real marker
    * (restart markers are consumed explicitly via expectRestart). */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    private var hitMarker = false

    def bit(): Int = {
      if (nbits == 0) {
        if (hitMarker) fail("entropy stream ran past its terminating marker")
        if (pos >= data.length) fail("truncated entropy stream")
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          val m = if (pos < data.length) data(pos) & 0xff else fail("truncated after FF")
          if (m == 0x00) pos += 1 // stuffed literal FF
          else { hitMarker = true; b = 0 } // pad bits past the marker read as 0
        }
        cur = b; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }

    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Byte-align and consume the expected RSTn marker. */
    def expectRestart(n: Int): Unit = {
      nbits = 0
      hitMarker = false
      while (pos + 1 < data.length && !((data(pos) & 0xff) == 0xff &&
        (data(pos + 1) & 0xff) != 0x00)) pos += 1
      val m = if (pos + 1 < data.length) data(pos + 1) & 0xff else fail("missing restart marker")
      if (m != 0xd0 + n) fail(f"expected RST$n, found marker FF$m%02x")
      pos += 2
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // zigzag order → natural 8x8 index
  private val Zigzag: Array[Int] = {
    val z = new Array[Int](64)
    var x, y, i = 0
    var up = true
    while (i < 64) {
      z(i) = y * 8 + x
      if (up) { if (x == 7) { y += 1; up = false } else if (y == 0) { x += 1; up = false } else { x += 1; y -= 1 } }
      else { if (y == 7) { x += 1; up = true } else if (x == 0) { y += 1; up = true } else { x -= 1; y += 1 } }
      i += 1
    }
    z
  }

  // direct IDCT basis: cosTab(x)(u) = C(u)/2 * cos((2x+1)u*pi/16)
  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16)
  }

  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    // rows then columns (separable); coef in natural order
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += CosTab(x)(u) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += CosTab(yy)(v) * tmp(v * 8 + x); v += 1 }
        val px = math.round(s).toInt + 128
        out(yy * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        yy += 1
      }
      x += 1
    }
  }

  // ------------------------------------------------------------- decode

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int) {
    var td = 0; var ta = 0; var pred = 0
    var plane: Array[Int] = null
    var planeW = 0; var planeH = 0
  }

  def decode(bytes: Array[Byte]): JpegInfo =
    try decodeImpl(bytes)
    catch { // any out-of-range read is a truncated/corrupt container
      case _: ArrayIndexOutOfBoundsException => fail("truncated JPEG")
    }

  private def decodeImpl(bytes: Array[Byte]): JpegInfo = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      fail("not a JPEG file (no SOI)")
    val qt = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var width, height = 0
    var restartInterval = 0
    var pos = 2

    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff); pos += 2; v }

    var sosSeen = false
    while (!sosSeen) {
      if (pos + 1 >= bytes.length) fail("truncated before SOS")
      if ((u8()) != 0xff) fail("expected a marker")
      var marker = u8()
      while (marker == 0xff) marker = u8() // fill bytes
      marker match {
        case 0xd8 => () // SOI again (tolerated)
        case 0xd9 => fail("EOI before any scan")
        case 0xdb => // DQT
          val end = { val l = u16(); pos + l - 2 } // pos AFTER the length read
          while (pos < end) {
            val pq = u8()
            val prec = pq >> 4; val id = pq & 0x0f
            if (prec > 1) fail(s"bad DQT precision $prec")
            if (id > 3) fail(s"bad DQT id $id")
            qt(id) = Array.fill(64)(if (prec == 0) u8() else u16())
          }
        case 0xc4 => // DHT
          val end = { val l = u16(); pos + l - 2 }
          while (pos < end) {
            val tc = u8()
            val cls = tc >> 4; val id = tc & 0x0f
            if (cls > 1 || id > 3) fail(s"bad DHT class/id $cls/$id")
            val bits = Array.fill(16)(u8())
            val vals = Array.fill(bits.sum)(u8())
            val h = new Huff(bits, vals)
            if (cls == 0) dcTabs(id) = h else acTabs(id) = h
          }
        case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended-sequential (8-bit)
          u16()
          val prec = u8()
          if (prec != 8) fail(s"only 8-bit precision supported, got $prec")
          height = u16(); width = u16()
          if (width <= 0 || height <= 0) fail(s"bad dimensions ${width}x$height")
          // refuse before allocating: crafted SOF dims must not turn into
          // a giant (or Int-overflowed) plane allocation from a tiny input
          if (width.toLong * height > (1L << 24))
            fail(s"image ${width}x$height exceeds the 16M-pixel decode cap")
          val n = u8()
          if (n != 1 && n != 3) fail(s"only 1 or 3 components supported, got $n")
          comps = Array.fill(n) {
            val id = u8(); val hv = u8(); val tq = u8()
            val c = Comp(id, hv >> 4, hv & 0x0f, tq)
            if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2)
              fail(s"unsupported sampling ${c.h}x${c.v}")
            c
          }
          // a single-component scan is NON-interleaved (T.81 §A.2): the
          // MCU is one 8x8 data unit in raster order and the SOF sampling
          // factors do not shape the scan — normalize them away so a
          // grayscale file declaring 2x2 luma factors decodes correctly
          if (n == 1) comps(0) = comps(0).copy(h = 1, v = 1)
        case 0xc2 => fail("progressive JPEG (SOF2) not supported")
        case m if m >= 0xc3 && m <= 0xcf && m != 0xc4 && m != 0xc8 =>
          fail(f"unsupported SOF marker FF$m%02x (non-baseline)")
        case 0xdd => u16(); restartInterval = u16() // DRI
        case 0xda => // SOS
          if (comps == null) fail("SOS before SOF")
          u16()
          val ns = u8()
          if (ns != comps.length) fail("interleaved scan must cover all components")
          var i = 0
          while (i < ns) {
            val id = u8(); val tt = u8()
            val c = comps.find(_.id == id).getOrElse(fail(s"unknown component $id in SOS"))
            c.td = tt >> 4; c.ta = tt & 0x0f
            i += 1
          }
          u8(); u8(); u8() // Ss, Se, AhAl (baseline: 0, 63, 0)
          sosSeen = true
        case _ => val l = u16(); pos += l - 2 // APPn / COM / anything skippable
      }
    }

    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
    }

    val in = new BitReader(bytes, pos)
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    var mcu = 0
    var rstN = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        in.expectRestart(rstN)
        rstN = (rstN + 1) % 8
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      comps.foreach { c =>
        val dc = dcTabs(c.td); val ac = acTabs(c.ta)
        if (dc == null || ac == null) fail("scan references an undefined Huffman table")
        val q = qt(c.tq)
        if (q == null) fail("scan references an undefined quantization table")
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            val s = dc.decode(in)
            if (s > 11) fail(s"bad DC category $s")
            c.pred += extend(in.receive(s), s)
            coef(0) = c.pred * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = ac.decode(in)
              val r = rs >> 4; val sz = rs & 0x0f
              if (sz == 0) { if (r == 15) k += 16 else eob = true }
              else {
                k += r
                if (k > 63) fail("AC run past the block")
                coef(Zigzag(k)) = extend(in.receive(sz), sz) * q(k)
                k += 1
              }
            }
            idct(coef, block)
            val ox = (mx * c.h + bx) * 8
            val oy = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              System.arraycopy(block, yy * 8, c.plane, (oy + yy) * c.planeW + ox, 8)
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
      }
      mcu += 1
    }

    def clamp(v: Double): Int =
      { val i = math.round(v).toInt; if (i < 0) 0 else if (i > 255) 255 else i }
    val pixels = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val rgb = if (comps.length == 1) {
          val c = comps(0)
          val s = c.plane(y * c.planeW + x)
          (s << 16) | (s << 8) | s
        } else {
          def sample(c: Comp): Int =
            c.plane((y * c.v / vmax) * c.planeW + (x * c.h / hmax))
          val yv = sample(comps(0)).toDouble
          val cb = sample(comps(1)) - 128.0
          val cr = sample(comps(2)) - 128.0
          (clamp(yv + 1.402 * cr) << 16) |
            (clamp(yv - 0.344136 * cb - 0.714136 * cr) << 8) |
            clamp(yv + 1.772 * cb)
        }
        pixels(y * width + x) = rgb
        x += 1
      }
      y += 1
    }
    JpegInfo(width, height, comps.length, pixels)
  }
}
