package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.scaleops.PngCodec

/** PNG codec pins. PNG is lossless, so every comparison here is
  * EXACT — including against the JDK's independent decoder/encoder
  * (whose writer picks its own scanline filters, exercising the
  * Sub/Up/Average/Paeth unfilter paths this codec implements). */
class PngSpec extends AnyFunSuite {

  test("gray fixture round-trip is exact (lossless identity)") {
    val (w, h) = (13, 7) // deliberately non-aligned dims
    def pix(x: Int, y: Int): Int = (11 + 31 * y + 5 * x) % 256
    val bytes = PngCodec.encodeGray(w, h, pix)
    val img = PngCodec.decode(bytes).get
    assert(img.w == w && img.h == h && img.comps == 1)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.pixels(y * w + x) & 0xFF) == pix(x, y), s"($x,$y)")
    val (_, _, sr, sg, sb) = PngCodec.channelSums(bytes).get
    val expect = (for (y <- 0 until h; x <- 0 until w) yield pix(x, y).toLong).sum
    assert(sr == expect && sg == expect && sb == expect)
  }

  private def imageIoPng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("RGB cross-check vs the JDK encoder is EXACT (its writer picks " +
    "filters, exercising the unfilter paths)") {
    val (w, h) = (37, 23)
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val rnd = new scala.util.Random(5L) // noise forces varied filters
    for (y <- 0 until h; x <- 0 until w)
      src.setRGB(x, y, rnd.nextInt() & 0xFFFFFF)
    val bytes = imageIoPng(src)
    val ours = PngCodec.decode(bytes).get
    assert(ours.w == w && ours.h == h && ours.comps == 3)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = src.getRGB(x, y)
      val o = (y * w + x) * 3
      assert((ours.pixels(o) & 0xFF) == ((rgb >> 16) & 0xFF))
      assert((ours.pixels(o + 1) & 0xFF) == ((rgb >> 8) & 0xFF))
      assert((ours.pixels(o + 2) & 0xFF) == (rgb & 0xFF))
    }
  }

  test("RGBA: alpha decoded as 4th sample, excluded from channel sums") {
    val (w, h) = (9, 6)
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w)
      src.setRGB(x, y, ((100 + x) << 24) | (x << 16) | (y << 8) | (x + y))
    val bytes = imageIoPng(src)
    val ours = PngCodec.decode(bytes).get
    assert(ours.comps == 4)
    val (_, _, sr, sg, sb) = PngCodec.channelSums(bytes).get
    val er = (for (y <- 0 until h; x <- 0 until w) yield x.toLong).sum
    val eg = (for (y <- 0 until h; x <- 0 until w) yield y.toLong).sum
    val eb = (for (y <- 0 until h; x <- 0 until w) yield (x + y).toLong).sum
    assert(sr == er && sg == eg && sb == eb)
  }

  test("corrupt and out-of-scope streams return None, never throw") {
    assert(PngCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    val good = PngCodec.encodeGray(8, 8, (x, y) => x + y)
    assert(PngCodec.decode(good.take(good.length / 2)).isEmpty)
    // JPEG bytes are not a PNG
    val jpeg = graft.scaleops.JpegCodec.encodeGrayBlocks(8, 8, _ => 50)
    assert(PngCodec.decode(jpeg).isEmpty)
  }

  test("FDICT zlib header returns None promptly — a stalled inflater " +
    "must fail structurally, never pin an executor task (r12 ADVICE)") {
    // patch the IDAT's zlib header to CMF=0x78 FLG=0x20: FDICT set,
    // check bits valid ((0x7820 % 31) == 0) — invalid in PNG but
    // reachable from corrupt/adversarial payloads. Inflater.inflate
    // then returns 0 with needsInput()==false forever; the decoder
    // must convert that state into DataFormatException -> None.
    val good = PngCodec.encodeGray(8, 8, (x, y) => x * 8 + y)
    val bad = good.clone()
    val idatAt = bad.indices.find(i => i + 4 <= bad.length - 4 &&
      bad(i) == 'I' && bad(i + 1) == 'D' && bad(i + 2) == 'A' &&
      bad(i + 3) == 'T').get
    bad(idatAt + 4) = 0x78.toByte
    bad(idatAt + 5) = 0x20.toByte
    val t0 = System.nanoTime()
    assert(PngCodec.decode(bad).isEmpty)
    assert((System.nanoTime() - t0) < 5e9, "decode stalled instead of failing")
  }
}
