package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.scaleops.GifCodec

/** GIF codec pins — the JpegSpec/PngSpec discipline: exact
  * round-trip through our own encoder (GIF is lossless for ≤256
  * colors), cross-checks against the JDK's independent GIF reader
  * AND writer in both directions, LZW edge cases (dictionary growth
  * across code-width boundaries, clear-on-full, KwKwK), and the
  * corrupt-stream never-throw/never-spin contract. */
class GifSpec extends AnyFunSuite {

  test("gray fixture round-trip is exact (lossless identity), " +
    "palette replicates into all three channels") {
    val (w, h) = (37, 23) // non-multiples: no accidental alignment
    val bytes = GifCodec.encodeGray(w, h, (x, y) => (x * 7 + y * 13) % 256)
    val img = GifCodec.decode(bytes).get
    assert(img.w == w && img.h == h && img.comps == 3)
    for (y <- 0 until h; x <- 0 until w) {
      val want = (x * 7 + y * 13) % 256
      val o = (y * w + x) * 3
      assert((img.pixels(o) & 0xFF) == want, s"R at ($x,$y)")
      assert((img.pixels(o + 1) & 0xFF) == want, s"G at ($x,$y)")
      assert((img.pixels(o + 2) & 0xFF) == want, s"B at ($x,$y)")
    }
  }

  test("LZW survives dictionary growth across every code-width " +
    "boundary and the 4096 clear-on-full (large noisy image)") {
    // 256 distinct symbols in a pattern with little repetition grows
    // the dictionary fast: 300x300 = 90k symbols forces multiple
    // 12-bit saturations and clear/reset cycles
    val (w, h) = (300, 300)
    def f(x: Int, y: Int): Int = (x * 31 + y * 17 + (x * y) % 97) % 256
    val bytes = GifCodec.encodeGray(w, h, f)
    val img = GifCodec.decode(bytes).get
    assert(img.w == w && img.h == h)
    var bad = 0
    for (y <- 0 until h; x <- 0 until w)
      if ((img.pixels((y * w + x) * 3) & 0xFF) != f(x, y)) bad += 1
    assert(bad == 0, s"$bad mismatching pixels")
  }

  test("KwKwK case: long constant runs round-trip exactly") {
    val (w, h) = (64, 16)
    val bytes = GifCodec.encodeGray(w, h, (x, _) => if (x < 48) 7 else 200)
    val img = GifCodec.decode(bytes).get
    for (y <- 0 until h; x <- 0 until w) {
      val want = if (x < 48) 7 else 200
      assert((img.pixels((y * w + x) * 3) & 0xFF) == want, s"($x,$y)")
    }
  }

  test("JDK reads OUR gif exactly (independent decoder cross-check)") {
    val (w, h) = (41, 29)
    def f(x: Int, y: Int): Int = (x * 5 + y * 11) % 256
    val bytes = GifCodec.encodeGray(w, h, f)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(ref != null && ref.getWidth == w && ref.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val want = f(x, y)
      assert(((rgb >> 16) & 0xFF) == want && ((rgb >> 8) & 0xFF) == want &&
        (rgb & 0xFF) == want, s"JDK pixel ($x,$y)")
    }
  }

  test("we read the JDK WRITER's gif exactly (palette, extensions, " +
    "whatever block layout it picks)") {
    val (w, h) = (52, 33)
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, (x * 3 + y * 9) % 256)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "gif", out))
    val bytes = out.toByteArray
    val ours = GifCodec.decode(bytes).get
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(ours.w == w && ours.h == h && ours.comps == 3)
    // compare against the JDK's own read-back (palette quantization,
    // if any, affects both sides identically — GIF is lossless so
    // this is exact equality)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      assert((ours.pixels(o) & 0xFF) == ((rgb >> 16) & 0xFF) &&
        (ours.pixels(o + 1) & 0xFF) == ((rgb >> 8) & 0xFF) &&
        (ours.pixels(o + 2) & 0xFF) == (rgb & 0xFF), s"($x,$y)")
    }
  }

  test("interlaced image decodes to natural row order") {
    // build an interlaced variant by hand: take our plain fixture,
    // set the interlace flag, and reorder the index rows into pass
    // order before LZW — decode must undo it
    val (w, h) = (16, 13)
    def f(x: Int, y: Int): Int = y * 16 + x % 16
    val plain = GifCodec.encodeGray(w, h, f)
    val passOrder =
      (0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++
        (1 until h by 2)
    val reordered = GifCodec.encodeGrayRows(w, h,
      passOrder.map(y => (0 until w).map(x => f(x, y)).toArray).toArray,
      interlaced = true)
    val a = GifCodec.decode(plain).get
    val b = GifCodec.decode(reordered).get
    assert(java.util.Arrays.equals(a.pixels, b.pixels))
  }

  test("ANIMATION frames decode exactly in stream order; the " +
    "single-frame decode still returns frame 0 (r14)") {
    val (w, h, nf) = (16, 8, 4)
    def pf(fr: Int)(x: Int, y: Int): Int = (fr * 37 + y * w + x * 3) % 256
    val anim = GifCodec.encodeGrayAnimation(w, h, nf, fr => pf(fr))
    val frames = GifCodec.decodeFrames(anim).get
    assert(frames.length == nf)
    for (fr <- 0 until nf; y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val img = frames(fr)
      assert(img.w == w && img.h == h)
      val v = pf(fr)(x, y)
      assert((img.pixels(o) & 0xFF) == v &&
        (img.pixels(o + 1) & 0xFF) == v && (img.pixels(o + 2) & 0xFF) == v,
        s"frame $fr pixel ($x,$y)")
    }
    // back-compat: decode = frame 0, even on a multi-frame stream
    val first = GifCodec.decode(anim).get
    assert(java.util.Arrays.equals(first.pixels, frames(0).pixels))
    // truncated mid-animation: no trailer -> None (strict walk)
    assert(GifCodec.decodeFrames(anim.take(anim.length - 10)).isEmpty)
  }

  test("frame-delta GIF: a sub-rectangle descriptor decodes RAW at " +
    "its own dimensions — disposal/compositing is permanently out of " +
    "scope (r15 contract pin)") {
    // Splice a frame-delta animation by hand: a full-canvas 16x8
    // frame 0, then a second descriptor that covers only an 8x3
    // sub-rectangle at (left=4, top=2) — the shape GIF89a disposal
    // semantics would composite onto the retained canvas. The engine
    // contract (GifCodec.decodeFrames scaladoc, SURVEY §9) is that
    // every descriptor decodes STANDALONE: frame 1 must come back as
    // the raw 8x3 patch, NOT a composited 16x8 screen state.
    val (w, h) = (16, 8)
    def f0(x: Int, y: Int): Int = (y * w + x * 3) % 256
    def fSub(x: Int, y: Int): Int = (200 + y * 11 + x * 5) % 256
    val full = GifCodec.encodeGrayAnimation(w, h, 1, _ => f0)
    val sub = GifCodec.encodeGray(8, 3, fSub)
    // single-image layout: 6 (sig) + 7 (LSD) + 768 (GCT) = 781-byte
    // header, image descriptor at 781, trailer is the final byte
    val hdrLen = 781
    val subDesc = sub.slice(hdrLen, sub.length - 1)
    assert(subDesc(0) == 0x2C.toByte)
    subDesc(1) = 4; subDesc(2) = 0 // left = 4 (LE)
    subDesc(3) = 2; subDesc(4) = 0 // top = 2 (LE)
    val spliced = full.dropRight(1) ++ subDesc ++ Array(0x3B.toByte)
    val frames = GifCodec.decodeFrames(spliced).get
    assert(frames.length == 2)
    assert(frames(1).w == 8 && frames(1).h == 3,
      "sub-descriptor frame must keep its OWN dimensions (raw, " +
        "not composited to the 16x8 canvas)")
    for (y <- 0 until 3; x <- 0 until 8) {
      val o = (y * 8 + x) * 3
      assert((frames(1).pixels(o) & 0xFF) == fSub(x, y),
        s"raw sub-frame pixel ($x,$y)")
    }
  }

  test("JDK reads every frame of OUR animation exactly " +
    "(independent multi-frame cross-check)") {
    val (w, h, nf) = (16, 8, 3)
    def pf(fr: Int)(x: Int, y: Int): Int = (fr * 91 + y * 5 + x * 7) % 256
    val anim = GifCodec.encodeGrayAnimation(w, h, nf, fr => pf(fr))
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(anim))
    reader.setInput(iis)
    assert(reader.getNumImages(true) == nf)
    for (fr <- 0 until nf) {
      val img = reader.read(fr)
      for (y <- 0 until h; x <- 0 until w) {
        val v = pf(fr)(x, y)
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xFF) == v && ((rgb >> 8) & 0xFF) == v &&
          (rgb & 0xFF) == v, s"JDK frame $fr pixel ($x,$y)")
      }
    }
    reader.dispose(); iis.close()
  }

  test("corrupt and out-of-scope streams return None promptly, " +
    "never throw, never spin") {
    assert(GifCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(GifCodec.decode("GIF89a".getBytes).isEmpty)
    val good = GifCodec.encodeGray(32, 32, (x, y) => (x + y) % 256)
    val t0 = System.nanoTime()
    assert(GifCodec.decode(good.take(good.length / 2)).isEmpty)
    // LZW garbage: flip bytes inside the data sub-blocks
    val bad = good.clone()
    for (i <- good.length - 40 until good.length - 20) bad(i) = 0x55
    GifCodec.decode(bad) // must not throw (None or a decoded frame)
    // PNG bytes are not a GIF
    val png = graft.scaleops.PngCodec.encodeGray(8, 8, (x, y) => x + y)
    assert(GifCodec.decode(png).isEmpty)
    assert((System.nanoTime() - t0) < 5e9)
  }
}
