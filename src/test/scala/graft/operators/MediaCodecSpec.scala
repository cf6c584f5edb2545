package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The real WAV/BMP codecs against HAND-LAID golden bytes: pins the
  * actual wire layout (endianness, chunk walk, row padding, BGR order,
  * bottom-up rows) independently of the encode half — a consistent
  * encode/decode inversion would fool the m05/m06 oracles but not
  * these fixtures. */
class MediaCodecSpec extends AnyFunSuite {

  test("decodeWav reads a hand-laid RIFF container (with a skip chunk)") {
    // 2 samples: 1 (01 00) and -2 (FE FF), 8000 Hz mono 16-bit, plus a
    // 'fact' chunk between fmt and data that the walker must skip
    val bytes = Array[Int](
      'R', 'I', 'F', 'F', 48, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0, // PCM
      1, 0, // mono
      0x40, 0x1f, 0, 0, // 8000
      0x80, 0x3e, 0, 0, // byte rate 16000
      2, 0, 16, 0, // block align, bits
      'f', 'a', 'c', 't', 4, 0, 0, 0, 2, 0, 0, 0,
      'd', 'a', 't', 'a', 4, 0, 0, 0,
      0x01, 0x00, 0xfe, 0xff).map(_.toByte)
    val info = MediaCodecs.decodeWav(bytes)
    assert(info == MediaCodecs.WavInfo(1, 8000, 16, 2, 2, 3))
    assert(info.durationUs == 250L)
  }

  test("decodeWav refuses malformed containers") {
    val good = MediaCodecs.encodeWav(8000, Array[Short](1, 2, 3))
    intercept[IllegalArgumentException](
      MediaCodecs.decodeWav("nope".getBytes ++ good.drop(4)))
    // declared chunk length overrunning the file
    val bad = good.clone()
    bad(40) = 0x7f // data chunk length low byte -> huge
    intercept[IllegalArgumentException](MediaCodecs.decodeWav(bad))
  }

  test("encodeWav round-trips through its own decoder") {
    val samples = Array[Short](0, 100, -100, Short.MaxValue, Short.MinValue)
    val info = MediaCodecs.decodeWav(MediaCodecs.encodeWav(44100, samples))
    assert(info.nSamples == 5 && info.sampleRate == 44100)
    assert(info.maxAbs == 32768) // |Short.MinValue|
    assert(info.sumAbs == 0L + 100 + 100 + 32767 + 32768)
  }

  test("decodeBmp reads a hand-laid 2x2 24-bit bottom-up file with padding") {
    // width 2 -> row stride 8 (6 pixel bytes + 2 pad). Bottom-up: the
    // FILE's first row is the image's bottom row. Channels are B,G,R.
    // Image (top-down): (r,g,b) = row 0: (1,2,3) (4,5,6); row 1: (7,8,9) (10,11,12)
    val header = Array[Int](
      'B', 'M', 54 + 16, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0,
      40, 0, 0, 0, 2, 0, 0, 0, 2, 0, 0, 0, 1, 0, 24, 0,
      0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0)
    val pixels = Array[Int](
      9, 8, 7, 12, 11, 10, 99, 99, // bottom image row first; pad bytes ignored
      3, 2, 1, 6, 5, 4, 99, 99)
    val info = MediaCodecs.decodeBmp((header ++ pixels).map(_.toByte))
    assert(info.width == 2 && info.height == 2)
    assert(info.sumChannels == (1 to 12).sum, info.toString) // pads NOT counted
  }

  test("decodeBmp refuses compressed and non-24-bit files") {
    val good = MediaCodecs.encodeBmp(3, 2, (_, _, _) => 5)
    assert(MediaCodecs.decodeBmp(good).sumChannels == 3L * 2 * 3 * 5)
    val comp = good.clone(); comp(30) = 1 // BI_RLE8
    intercept[IllegalArgumentException](MediaCodecs.decodeBmp(comp))
    val depth = good.clone(); depth(28) = 8
    intercept[IllegalArgumentException](MediaCodecs.decodeBmp(depth))
  }

  test("encodeBmp exercises every padding residue and round-trips") {
    (4 to 8).foreach { w => // w*3 mod 4 covers 0,1,2,3
      val bytes = MediaCodecs.encodeBmp(w, 3, (x, y, c) => (x + y + c) % 256)
      val expected = (for { x <- 0 until w; y <- 0 until 3; c <- 0 until 3 }
        yield (x + y + c) % 256).map(_.toLong).sum
      assert(MediaCodecs.decodeBmp(bytes).sumChannels == expected, s"width $w")
    }
  }
}
