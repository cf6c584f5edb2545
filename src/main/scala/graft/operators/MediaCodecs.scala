package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** REAL multimodal decoders — no stub, no library: WAV (RIFF/PCM) and
  * BMP (BITMAPINFOHEADER, uncompressed 24-bit) are fully specified
  * byte-layout formats a pure-JVM parser handles, so these two upgrade
  * the m-family from declared-stub plumbing (m01–m04, where jpeg/ffmpeg
  * would sit) to an end-to-end decode path whose outputs are
  * oracle-checkable: the decoders walk the actual container structure
  * (RIFF chunk list; BMP header + bottom-up rows + 4-byte row padding +
  * BGR channel order) and any deviation from the spec surfaces as a
  * value mismatch against the DuckDB recomputation.
  *
  * The `encode` halves are fixture-side (the entries synthesize
  * deterministic payloads from table data); spec-compliance of the pair
  * is pinned separately by MediaCodecSpec against HAND-LAID golden bytes
  * — a consistent encode/decode inversion (e.g. both sides big-endian)
  * would fool the entry oracle but not the golden fixture.
  */
object MediaCodecs {

  // ----------------------------------------------------------- WAV/PCM

  final case class WavInfo(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nSamples: Int, maxAbs: Int, sumAbs: Long) {
    /** Exact integer duration for 8 kHz fixtures (125 us per sample). */
    def durationUs: Long = nSamples.toLong * 1000000L / sampleRate
  }

  /** Minimal canonical-form encoder: RIFF("WAVE") with one fmt chunk
    * (PCM) and one data chunk, 16-bit little-endian mono. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse a RIFF/WAVE container: verify the magics, WALK the chunk list
    * (fmt may be followed by fact/LIST chunks before data — real files
    * have them), decode PCM 16-bit samples, fold amplitude stats in one
    * pass. Malformed input refuses with the offending structure named. */
  def decodeWav(bytes: Array[Byte]): WavInfo = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val a = new Array[Byte](n); bb.get(a); new String(a, "US-ASCII")
    }
    require(bytes.length >= 12 && ascii(4) == "RIFF", "not a RIFF container")
    bb.getInt // declared riff size (trust the actual buffer instead)
    require(ascii(4) == "WAVE", "RIFF container is not WAVE")
    var channels, sampleRate, bits = -1
    var info: WavInfo = null
    while (bb.remaining() >= 8 && info == null) {
      val id = ascii(4)
      val len = bb.getInt
      require(len >= 0 && len <= bb.remaining(), s"chunk '$id' overruns the file")
      id match {
        case "fmt " =>
          val fmtEnd = bb.position() + len
          val audioFormat = bb.getShort.toInt
          require(audioFormat == 1, s"only PCM supported, got format $audioFormat")
          channels = bb.getShort.toInt
          sampleRate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align (derivable)
          bits = bb.getShort.toInt
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
          bb.position(fmtEnd)
        case "data" =>
          require(bits > 0, "data chunk before fmt chunk")
          val n = len / 2
          var i = 0
          var maxAbs = 0
          var sumAbs = 0L
          while (i < n) {
            val v = math.abs(bb.getShort.toInt)
            if (v > maxAbs) maxAbs = v
            sumAbs += v
            i += 1
          }
          info = WavInfo(channels, sampleRate, bits, n, maxAbs, sumAbs)
        case _ => // fact/LIST/...: skip (chunks are padded to even length)
          bb.position(bb.position() + len + (len & 1))
      }
    }
    require(info != null, "no data chunk")
    info
  }

  // ----------------------------------------------------- BMP (24-bit)

  final case class BmpInfo(width: Int, height: Int, sumChannels: Long) {
    def meanChannel: Double = sumChannels.toDouble / (width.toLong * height * 3)
  }

  /** Canonical 24-bit bottom-up BMP: BITMAPFILEHEADER + BITMAPINFOHEADER,
    * rows padded to 4 bytes, channels stored B,G,R. `rgb(x, y, c)` is
    * asked for c = 0(R), 1(G), 2(B) in TOP-DOWN coordinates. */
  def encodeBmp(width: Int, height: Int, rgb: (Int, Int, Int) => Int): Array[Byte] = {
    val rowBytes = (width * 3 + 3) / 4 * 4
    val dataLen = rowBytes * height
    val bb = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel-array offset
    bb.putInt(40).putInt(width).putInt(height) // positive height = bottom-up
      .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
      .putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = height - 1 // bottom-up: last image row first
    while (row >= 0) {
      var x = 0
      while (x < width) {
        bb.put(rgb(x, row, 2).toByte) // B
        bb.put(rgb(x, row, 1).toByte) // G
        bb.put(rgb(x, row, 0).toByte) // R
        x += 1
      }
      var pad = rowBytes - width * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      row -= 1
    }
    bb.array()
  }

  /** Parse the headers, honor the declared pixel-array offset, walk the
    * padded bottom-up rows, fold all channel bytes. Compression and
    * non-24-bit depths refuse. */
  def decodeBmp(bytes: Array[Byte]): BmpInfo = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && bb.get() == 'B'.toByte && bb.get() == 'M'.toByte,
      "not a BMP file")
    bb.getInt; bb.getShort; bb.getShort
    val pixelOffset = bb.getInt
    val headerSize = bb.getInt
    require(headerSize >= 40, s"unsupported DIB header size $headerSize")
    val width = bb.getInt
    val heightRaw = bb.getInt
    require(width > 0 && heightRaw != 0, s"bad dimensions $width x $heightRaw")
    val bottomUp = heightRaw > 0
    val height = math.abs(heightRaw)
    bb.getShort
    val bpp = bb.getShort.toInt
    require(bpp == 24, s"only 24-bit BMP supported, got $bpp")
    val compression = bb.getInt
    require(compression == 0, s"only BI_RGB supported, got compression $compression")
    val rowBytes = (width * 3 + 3) / 4 * 4
    require(pixelOffset + rowBytes.toLong * height <= bytes.length,
      "pixel array overruns the file")
    var sum = 0L
    var row = 0
    while (row < height) {
      // the decode result is orientation-independent for a sum, but the
      // offset arithmetic must still honor bottom-up vs top-down layout
      val src = if (bottomUp) height - 1 - row else row
      var off = pixelOffset + src * rowBytes
      var x = 0
      while (x < width) {
        sum += (bytes(off) & 0xff) + (bytes(off + 1) & 0xff) + (bytes(off + 2) & 0xff)
        off += 3
        x += 1
      }
      row += 1
    }
    BmpInfo(width, height, sum)
  }
}
