package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** GifCodec pinned against three independent references: hand-laid
  * golden bytes whose LZW stream is computed by hand (every byte visible
  * — no encoder trusted), the classic KwKwK sequence, and
  * javax.imageio's encoder/decoder pair (foreign LZW code streams,
  * dictionary growth to wide codes, deferred clears, default
  * interlacing), plus the refusal surface. */
class GifCodecSpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  /** 3x1, two-color golden GIF: codes (clear=4, 1, 0, 1, eoi=5) at
    * 3 bits LSB-first = 0x0C 0x52. Pixels [c1, c0, c1]. */
  private def golden3x1: Array[Byte] =
    "GIF89a".getBytes ++ b(
      3, 0, 1, 0, // logical screen 3x1
      0x80, 0, 0, // GCT present, 2 entries
      10, 20, 30, // color 0
      40, 50, 60, // color 1
      0x2c, 0, 0, 0, 0, 3, 0, 1, 0, 0, // full-canvas image, no LCT
      2, // LZW minimum code size
      2, 0x0C, 0x52, // one 2-byte sub-block
      0, // sub-block terminator
      0x3b) // trailer

  test("hand-laid golden bytes decode to the hand-computed pixels") {
    val info = GifCodec.decode(golden3x1)
    assert(info.width == 3 && info.height == 1 && info.nColors == 2)
    assert(info.rgb.toSeq == Seq((40 << 16) | (50 << 8) | 60,
      (10 << 16) | (20 << 8) | 30, (40 << 16) | (50 << 8) | 60))
    assert(info.sumChannels == (40 + 50 + 60) + (10 + 20 + 30) + (40 + 50 + 60))
  }

  test("the KwKwK sequence (code == next free slot) reconstructs prev + first(prev)") {
    // pixels [0,0,0]: encoder emits clear, 0, then code 6 — the slot it
    // is DEFINING with that very emission. Codes (4, 0, 6, 5) at 3 bits
    // LSB-first = 0x84 0x0B.
    val gif = "GIF89a".getBytes ++ b(
      3, 0, 1, 0, 0x80, 0, 0,
      10, 20, 30, 40, 50, 60,
      0x2c, 0, 0, 0, 0, 3, 0, 1, 0, 0,
      2, 2, 0x84, 0x0B, 0, 0x3b)
    val info = GifCodec.decode(gif)
    assert(info.rgb.toSeq == Seq.fill(3)((10 << 16) | (20 << 8) | 30))
  }

  test("padding bytes after the EOI code inside the final sub-block are consumed") {
    // same golden stream packed into a 3-byte sub-block: the third byte
    // is pure padding after EOI — legal, and it must not be misread as
    // the next sub-block's length
    val gif = "GIF89a".getBytes ++ b(
      3, 0, 1, 0, 0x80, 0, 0,
      10, 20, 30, 40, 50, 60,
      0x2c, 0, 0, 0, 0, 3, 0, 1, 0, 0,
      2, 3, 0x0C, 0x52, 0x00, 0, 0x3b)
    assert(GifCodec.decode(gif).sumChannels == 360)
  }

  test("imageio cross-decode: foreign LZW with dictionary growth, wide codes and interlace") {
    // 64x64 with a repetitive-but-shifting pattern: the dictionary
    // grows through several code widths; imageio interlaces by default
    val w = 64; val h = 64; val n = 128
    val r = Array.tabulate(n)(i => ((i * 11) % 256).toByte)
    val g = Array.tabulate(n)(i => ((i * 13) % 256).toByte)
    val bl = Array.tabulate(n)(i => ((i * 17) % 256).toByte)
    val icm = new java.awt.image.IndexColorModel(8, n, r, g, bl)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * y + x + 3 * y) % n)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", out))
    val info = GifCodec.decode(out.toByteArray)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.toByteArray))
    for (y <- 0 until h; x <- 0 until w)
      assert((info.rgb(y * w + x) & 0xffffff) == (ref.getRGB(x, y) & 0xffffff),
        s"pixel ($x,$y)")
  }

  test("refusals: signature, truncation, dimension bomb, sub-canvas, multi-image") {
    intercept[IllegalArgumentException] {
      GifCodec.decode("NOTGIF".getBytes ++ golden3x1.drop(6))
    }
    intercept[IllegalArgumentException] {
      GifCodec.decode(golden3x1.dropRight(4)) // truncated inside the data
    }
    // a crafted logical screen of 65535x65535 must refuse BEFORE the
    // pixel buffer would allocate
    val bomb = golden3x1.clone()
    bomb(6) = 0xff.toByte; bomb(7) = 0xff.toByte
    bomb(8) = 0xff.toByte; bomb(9) = 0xff.toByte
    val e = intercept[IllegalArgumentException] { GifCodec.decode(bomb) }
    assert(e.getMessage.contains("dimensions"), e.getMessage)
    // sub-canvas image descriptor (left=1) refuses
    val sub = golden3x1.clone()
    sub(20) = 1 // image left byte
    intercept[IllegalArgumentException] { GifCodec.decode(sub) }
    // two image blocks refuse (animation)
    val img = golden3x1.slice(19, golden3x1.length - 1) // 0x2c .. before trailer
    val multi = golden3x1.dropRight(1) ++ img ++ b(0x3b)
    val e2 = intercept[IllegalArgumentException] { GifCodec.decode(multi) }
    assert(e2.getMessage.contains("multi-image"), e2.getMessage)
  }

  test("extension blocks are skipped; missing color table refuses") {
    // splice a graphic-control extension before the image block
    val gce = b(0x21, 0xf9, 4, 0, 0, 0, 0, 0)
    val withExt = golden3x1.take(19) ++ gce ++ golden3x1.drop(19)
    assert(GifCodec.decode(withExt).sumChannels == 360)
    // no GCT and no LCT → refuse
    val noGct = "GIF89a".getBytes ++ b(
      3, 0, 1, 0, 0x00, 0, 0, // GCT flag off
      0x2c, 0, 0, 0, 0, 3, 0, 1, 0, 0,
      2, 2, 0x0C, 0x52, 0, 0x3b)
    val e = intercept[IllegalArgumentException] { GifCodec.decode(noGct) }
    assert(e.getMessage.contains("color table"), e.getMessage)
  }
}
