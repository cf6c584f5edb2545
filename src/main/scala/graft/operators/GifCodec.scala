package graft.operators

/** A real GIF decoder written from the GIF89a specification — no imaging
  * library anywhere in the chain. The m-family's LZW leg: WAV/BMP pinned
  * fixed-offset layouts, PNG pinned DEFLATE (delegating the bit-level
  * inflate to the JDK's Inflater, as real PNG libraries do), JPEG pinned
  * the lossy DCT chain — GIF's LZW has no JDK primitive, so the
  * variable-width dictionary decompressor here is implemented from the
  * spec (GIF89a appendix F): codes start at minCodeSize+1 bits packed
  * LSB-FIRST across the data sub-blocks, the CLEAR code resets the
  * dictionary, the width grows whenever the next free slot reaches
  * 2^width (capped at 12 bits / 4096 entries), and the "code == next
  * free slot" case reproduces the classic KwKwK sequence from the
  * previous string plus its own first byte.
  *
  * Scope (refusals are loud, never wrong pixels): single full-canvas
  * image, interlaced or not, global or local color table required; extension
  * blocks (including the graphic-control block) are skipped —
  * transparency does not change which palette COLOR a pixel carries, and
  * the channel sums this feeds are palette-order-invariant. */
object GifCodec {

  final case class GifInfo(width: Int, height: Int, nColors: Int,
      sumChannels: Long, rgb: Array[Int]) {
    override def toString: String = s"GifInfo($width x $height, $nColors colors)"
  }

  /** Pixel limit: a crafted logical-screen descriptor must refuse before
    * any allocation happens (the m08 SOF-bomb rule). */
  private val MaxPixels = 1 << 24

  def decode(bytes: Array[Byte]): GifInfo = {
    val in = new Reader(bytes)
    val sig = new String(in.take(6), java.nio.charset.StandardCharsets.US_ASCII)
    require(sig == "GIF87a" || sig == "GIF89a", s"not a GIF: signature '$sig'")
    val width = in.u16()
    val height = in.u16()
    require(width > 0 && height > 0 && width.toLong * height <= MaxPixels,
      s"refusing GIF dimensions $width x $height")
    val packed = in.u8()
    val hasGct = (packed & 0x80) != 0
    val gctSize = 2 << (packed & 0x07)
    in.u8(); in.u8() // background color index, pixel aspect ratio
    val gct = if (hasGct) readColorTable(in, gctSize) else null
    var image: GifInfo = null
    var done = false
    while (!done) {
      in.u8() match {
        case 0x3b => // trailer
          done = true
        case 0x21 => // extension: label + sub-block chain, all skipped
          in.u8()
          skipSubBlocks(in)
        case 0x2c =>
          require(image == null,
            "multi-image GIF (animation) is not supported — decode refuses " +
              "rather than silently dropping frames")
          image = decodeImage(in, width, height, gct)
        case other =>
          throw new IllegalArgumentException(
            f"unknown GIF block introducer 0x$other%02x")
      }
    }
    require(image != null, "GIF carries no image block")
    image
  }

  private def decodeImage(in: Reader, width: Int, height: Int,
      gct: Array[Int]): GifInfo = {
    val left = in.u16(); val top = in.u16()
    val iw = in.u16(); val ih = in.u16()
    require(left == 0 && top == 0 && iw == width && ih == height,
      s"sub-canvas image ($left,$top ${iw}x$ih of ${width}x$height) " +
        "is not supported")
    val packed = in.u8()
    val interlaced = (packed & 0x40) != 0
    val table =
      if ((packed & 0x80) != 0) readColorTable(in, 2 << (packed & 0x07))
      else gct
    require(table != null, "image has neither a local nor a global color table")
    val minCodeSize = in.u8()
    // GIF palettes cap at 256 colors, so a valid stream never declares
    // more than 8 bits of literal codes — a 9–11 header would only ever
    // mint literal codes beyond any color table, so refuse it HERE
    // instead of at the later pixel-index check
    require(minCodeSize >= 2 && minCodeSize <= 8,
      s"invalid LZW minimum code size $minCodeSize")
    val raw = lzwDecode(in, minCodeSize, width * height)
    // interlace (GIF89a appendix E): rows arrive in four passes —
    // every 8th from 0, every 8th from 4, every 4th from 2, every 2nd
    // from 1 — and javax.imageio's writer interlaces BY DEFAULT, so
    // wild-file coverage requires the reorder, not a refusal
    val indices =
      if (!interlaced) raw
      else {
        val out = new Array[Byte](raw.length)
        var src = 0
        for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
          var y = start
          while (y < height) {
            System.arraycopy(raw, src * width, out, y * width, width)
            src += 1
            y += step
          }
        }
        out
      }
    var sum = 0L
    val rgb = new Array[Int](width * height)
    var i = 0
    while (i < indices.length) {
      val idx = indices(i) & 0xff
      require(idx < table.length, s"pixel index $idx outside the color table")
      val c = table(idx)
      rgb(i) = c
      sum += ((c >> 16) & 0xff) + ((c >> 8) & 0xff) + (c & 0xff)
      i += 1
    }
    GifInfo(width, height, table.length, sum, rgb)
  }

  private def readColorTable(in: Reader, n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = in.u8(); val g = in.u8(); val b = in.u8()
      out(i) = (r << 16) | (g << 8) | b
      i += 1
    }
    out
  }

  private def skipSubBlocks(in: Reader): Unit = {
    var len = in.u8()
    while (len != 0) { in.take(len); len = in.u8() }
  }

  /** Variable-width LZW over the sub-block byte stream, LSB-first bit
    * packing (GIF89a appendix F). Emits exactly `expected` indices —
    * over- or under-runs refuse. */
  private def lzwDecode(in: Reader, minCodeSize: Int, expected: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    // dictionary as (prefix code, appended byte) pairs — O(1) insert,
    // strings materialize by walking prefixes (bounded by 4096)
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    val length = new Array[Int](4096)
    var next = 0
    def reset(): Unit = {
      var i = 0
      while (i < clear) {
        prefix(i) = -1; append(i) = i.toByte; length(i) = 1; i += 1
      }
      next = eoi + 1
    }
    reset()
    val out = new Array[Byte](expected)
    var outPos = 0
    def emit(code: Int): Unit = {
      val n = length(code)
      require(outPos + n <= expected,
        s"LZW stream decodes past the ${expected}-pixel image")
      var c = code
      var p = outPos + n - 1
      while (c >= 0) { out(p) = append(c); p -= 1; c = prefix(c) }
      outPos += n
    }
    var codeSize = minCodeSize + 1
    var buf = 0
    var bits = 0
    var blockLeft = 0
    var prev = -1
    var finished = false
    while (!finished) {
      while (bits < codeSize) {
        if (blockLeft == 0) {
          blockLeft = in.u8()
          require(blockLeft > 0, "LZW data ran out before the end-of-information code")
        }
        buf |= (in.u8() & 0xff) << bits
        bits += 8
        blockLeft -= 1
      }
      val code = buf & ((1 << codeSize) - 1)
      buf >>>= codeSize
      bits -= codeSize
      if (code == clear) {
        reset(); codeSize = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        finished = true
      } else if (prev == -1) {
        require(code < clear, s"first code after clear must be a literal, got $code")
        emit(code); prev = code
      } else {
        require(code <= next, s"LZW code $code beyond the next free slot $next")
        val cur = if (code < next) code else prev // KwKwK: string = prev + first(prev)
        if (next < 4096) {
          var first = cur
          while (prefix(first) >= 0) first = prefix(first)
          prefix(next) = prev; append(next) = append(first)
          length(next) = length(prev) + 1
          next += 1
        }
        emit(code min (next - 1))
        prev = code min (next - 1)
        if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
      }
    }
    // EOI may land before the final sub-block's last byte (padding after
    // EOI is legal) — consume the remainder so the terminator parse
    // doesn't misread a data byte as a sub-block length
    if (blockLeft > 0) in.take(blockLeft)
    // the image data sub-block chain must close with its 0 terminator
    skipSubBlocks(in)
    require(outPos == expected,
      s"LZW stream decoded $outPos of $expected pixels")
    out
  }

  private final class Reader(bytes: Array[Byte]) {
    private var pos = 0
    def u8(): Int = {
      require(pos < bytes.length, s"truncated GIF at byte $pos")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = u8() | (u8() << 8)
    def take(n: Int): Array[Byte] = {
      require(pos + n <= bytes.length, s"truncated GIF at byte $pos (+$n)")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      out
    }
  }
}
