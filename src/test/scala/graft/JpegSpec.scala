package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.scaleops.JpegCodec

/** Baseline JPEG codec pins.
  *
  * The fixture path (constant blocks, unit quantization) must be
  * EXACT — that is what lets the gate oracle replay decoded sums
  * arithmetically. The general path is cross-checked against the
  * JDK's independent libjpeg-derived decoder (javax.imageio, an
  * implementation this codec shares no code with): the JPEG spec
  * permits small IDCT/upsampling variance between conforming
  * decoders, so those comparisons carry a tolerance, asserted tight.
  */
class JpegSpec extends AnyFunSuite {

  private def blockVal(b: Int): Int = (37 + b * 29) % 256

  test("fixture round-trip is EXACT: constant blocks at q=1 decode " +
    "to the original values, dims honored") {
    val (w, h) = (24, 16)
    val bytes = JpegCodec.encodeGrayBlocks(w, h, blockVal)
    val img = JpegCodec.decode(bytes).get
    assert(img.w == w && img.h == h && img.comps == 1)
    for (y <- 0 until h; x <- 0 until w) {
      val blk = (y / 8) * (w / 8) + (x / 8)
      assert((img.pixels(y * w + x) & 0xFF) == blockVal(blk),
        s"pixel ($x,$y) block $blk")
    }
    // channel sums: gray replicates into all three, equals the formula
    val (ww, hh, sr, sg, sb) = JpegCodec.channelSums(bytes).get
    val expect = (0 until (w / 8) * (h / 8)).map(b => 64L * blockVal(b)).sum
    assert(ww == w && hh == h && sr == expect && sg == expect && sb == expect)
  }

  test("restart markers: DRI/RSTn stream decodes identically") {
    val (w, h) = (32, 24) // 12 MCUs, restart every 5 -> 2 RST markers
    val plain = JpegCodec.encodeGrayBlocks(w, h, blockVal)
    val rst = JpegCodec.encodeGrayBlocks(w, h, blockVal, restartInterval = 5)
    assert(rst.length > plain.length) // markers actually emitted
    val a = JpegCodec.decode(plain).get
    val b = JpegCodec.decode(rst).get
    assert(java.util.Arrays.equals(a.pixels, b.pixels))
  }

  private def imageIoBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", out)
    out.toByteArray
  }

  test("grayscale cross-check vs the JDK decoder on a smooth gradient " +
    "(independent implementation, spec-permitted IDCT variance only)") {
    val (w, h) = (40, 32)
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, (40 + 3 * x + 2 * y) % 256)
    val bytes = imageIoBytes(src)
    val ours = JpegCodec.decode(bytes).get
    assert(ours.w == w && ours.h == h && ours.comps == 1)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val r = ref.getRaster.getSample(x, y, 0)
      val o = ours.pixels(y * w + x) & 0xFF
      maxDiff = math.max(maxDiff, math.abs(r - o))
    }
    assert(maxDiff <= 2, s"gray max pixel diff $maxDiff")
  }

  /** Encode with chroma subsampling forced OFF (4:4:4 via the
    * writer's metadata tree) so the cross-check compares YCbCr
    * conversion + IDCT only — the default writer grid and the JDK
    * decoder's upsampling filter are implementation choices that made
    * the old per-pixel bound JRE-version brittle (r12 ADVICE). */
  private def imageIoBytes444(
      img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    val spec =
      javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
    val meta = writer.getDefaultImageMetadata(spec, param)
    val fmt = "javax_imageio_jpeg_image_1.0"
    val tree = meta.getAsTree(fmt)
      .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
    val comps = tree.getElementsByTagName("componentSpec")
    for (i <- 0 until comps.getLength) {
      val e = comps.item(i).asInstanceOf[org.w3c.dom.Element]
      e.setAttribute("HsamplingFactor", "1")
      e.setAttribute("VsamplingFactor", "1")
    }
    meta.setFromTree(fmt, tree)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, meta), param)
    writer.dispose(); ios.close()
    out.toByteArray
  }

  test("color cross-check vs the JDK decoder at forced 4:4:4 " +
    "(upsampling-free: YCbCr conversion + IDCT variance only)") {
    val (w, h) = (48, 32)
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (30 + 4 * x) % 256
      val g = (60 + 3 * y) % 256
      val b = (90 + 2 * x + y) % 256
      src.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = imageIoBytes444(src)
    val ours = JpegCodec.decode(bytes).get
    assert(ours.w == w && ours.h == h && ours.comps == 3)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    // at 4:4:4 there is no upsampling filter in either decoder, so
    // per-pixel divergence is spec-permitted IDCT rounding plus
    // YCbCr->RGB conversion rounding only — assert both bounds tight
    var maxDiff = 0
    var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rgb = ref.getRGB(x, y)
      val r = (rgb >> (16 - 8 * c)) & 0xFF
      val o = ours.pixels((y * w + x) * 3 + c) & 0xFF
      val diff = math.abs(r - o)
      maxDiff = math.max(maxDiff, diff)
      sumDiff += diff
    }
    val meanDiff = sumDiff.toDouble / (w * h * 3)
    assert(maxDiff <= 8, s"color max pixel diff $maxDiff")
    assert(meanDiff <= 2.0, s"color mean pixel diff $meanDiff")
  }

  test("PROGRESSIVE fixture round-trip is EXACT and equals the " +
    "baseline twin byte-for-byte in pixels (three-scan successive " +
    "approximation accumulates to the same coefficients)") {
    val (w, h) = (24, 16)
    val prog = JpegCodec.encodeGrayBlocksProgressive(w, h, blockVal)
    // really progressive: SOF2 present, three SOS markers
    def count(m: Int) = prog.indices.count(i =>
      i + 1 < prog.length && (prog(i) & 0xFF) == 0xFF &&
        (prog(i + 1) & 0xFF) == m)
    assert(count(0xC2) == 1 && count(0xDA) == 3)
    val img = JpegCodec.decode(prog).get
    assert(img.w == w && img.h == h && img.comps == 1)
    for (y <- 0 until h; x <- 0 until w) {
      val blk = (y / 8) * (w / 8) + (x / 8)
      assert((img.pixels(y * w + x) & 0xFF) == blockVal(blk),
        s"pixel ($x,$y) block $blk")
    }
    val base = JpegCodec.decode(JpegCodec.encodeGrayBlocks(w, h, blockVal)).get
    assert(java.util.Arrays.equals(img.pixels, base.pixels))
    // channel sums replay the fixture formula (the gate discipline)
    val (ww, hh, sr, _, _) = JpegCodec.channelSums(prog).get
    val expect = (0 until (w / 8) * (h / 8)).map(b => 64L * blockVal(b)).sum
    assert(ww == w && hh == h && sr == expect)
  }

  test("PROGRESSIVE restart markers: DRI + per-scan RSTn decode " +
    "identically (predictor + EOB-run reset across all three scans)") {
    val (w, h) = (32, 24) // 12 blocks, restart every 5
    val plain = JpegCodec.encodeGrayBlocksProgressive(w, h, blockVal)
    val rst = JpegCodec.encodeGrayBlocksProgressive(w, h, blockVal,
      restartInterval = 5)
    assert(rst.length > plain.length) // markers actually emitted
    val a = JpegCodec.decode(plain).get
    val b = JpegCodec.decode(rst).get
    assert(java.util.Arrays.equals(a.pixels, b.pixels))
    // the JDK agrees on the restarted stream too
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(rst))
    for (y <- 0 until h; x <- 0 until w)
      assert(ref.getRaster.getSample(x, y, 0) ==
        (b.pixels(y * w + x) & 0xFF), s"JDK restarted pixel ($x,$y)")
  }

  test("PROGRESSIVE fixture is a conforming stream: the JDK decoder " +
    "reads it to the same exact pixels (cross-check, both directions)") {
    val (w, h) = (32, 24)
    val prog = JpegCodec.encodeGrayBlocksProgressive(w, h, blockVal)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(prog))
    assert(ref != null, "JDK rejected our progressive fixture")
    assert(ref.getWidth == w && ref.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val blk = (y / 8) * (w / 8) + (x / 8)
      assert(ref.getRaster.getSample(x, y, 0) == blockVal(blk),
        s"JDK pixel ($x,$y) block $blk")
    }
  }

  /** JDK progressive writer: exercises the REAL multi-scan script
    * (spectral selection bands + successive approximation with AC
    * refinement — the paths the DC-only fixture cannot reach). */
  private def imageIoBytesProgressive(
      img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    out.toByteArray
  }

  test("PROGRESSIVE cross-check vs the JDK on a JDK-written gray " +
    "stream (real scan script: spectral bands + AC refinement)") {
    val (w, h) = (40, 32)
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0,
        (40 + 3 * x + 2 * y + ((x * y) % 13)) % 256)
    val bytes = imageIoBytesProgressive(src)
    // really progressive with multiple scans
    def count(m: Int) = bytes.indices.count(i =>
      i + 1 < bytes.length && (bytes(i) & 0xFF) == 0xFF &&
        (bytes(i + 1) & 0xFF) == m)
    assert(count(0xC2) == 1 && count(0xDA) >= 3,
      s"JDK emitted ${count(0xDA)} scans")
    val ours = JpegCodec.decode(bytes).get
    assert(ours.w == w && ours.h == h && ours.comps == 1)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val r = ref.getRaster.getSample(x, y, 0)
      val o = ours.pixels(y * w + x) & 0xFF
      maxDiff = math.max(maxDiff, math.abs(r - o))
    }
    assert(maxDiff <= 2, s"progressive gray max pixel diff $maxDiff")
  }

  test("PROGRESSIVE color cross-check vs the JDK (3-component scan " +
    "script: interleaved DC scan + per-component AC scans)") {
    val (w, h) = (48, 32)
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (30 + 4 * x) % 256
      val g = (60 + 3 * y) % 256
      val b = (90 + 2 * x + y) % 256
      src.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = imageIoBytesProgressive(src)
    val ours = JpegCodec.decode(bytes).get
    assert(ours.w == w && ours.h == h && ours.comps == 3)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rgb = ref.getRGB(x, y)
      val r = (rgb >> (16 - 8 * c)) & 0xFF
      val o = ours.pixels((y * w + x) * 3 + c) & 0xFF
      val diff = math.abs(r - o)
      maxDiff = math.max(maxDiff, diff)
      sumDiff += diff
    }
    val meanDiff = sumDiff.toDouble / (w * h * 3)
    // the JDK's default progressive color script subsamples chroma
    // (4:2:0) — upsampling-filter divergence applies, like the r12
    // pre-4:4:4 baseline comparison; assert the mean tight and the
    // max at the documented upsampling bound
    assert(maxDiff <= 32, s"progressive color max pixel diff $maxDiff")
    assert(meanDiff <= 3.0, s"progressive color mean pixel diff $meanDiff")
  }

  test("out-of-scope and corrupt streams return None, never throw") {
    assert(JpegCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(JpegCodec.decode("P5 8 8 255 ".getBytes ++
      Array.fill[Byte](64)(7)).isEmpty)
    val good = JpegCodec.encodeGrayBlocks(16, 16, blockVal)
    // truncate mid-entropy-data
    assert(JpegCodec.decode(good.take(good.length / 2)).isEmpty)
    // flip SOF0 -> SOF2: the baseline scan header (Ss=0, Se=63) is
    // ILLEGAL in progressive (a DC scan must have Se=0) — the
    // progressive path must reject it, not misdecode it
    val prog = good.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    assert(JpegCodec.decode(prog).isEmpty)
  }
}
