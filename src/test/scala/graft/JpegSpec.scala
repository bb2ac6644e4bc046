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

  test("out-of-scope and corrupt streams return None, never throw") {
    assert(JpegCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(JpegCodec.decode("P5 8 8 255 ".getBytes ++
      Array.fill[Byte](64)(7)).isEmpty)
    val good = JpegCodec.encodeGrayBlocks(16, 16, blockVal)
    // truncate mid-entropy-data
    assert(JpegCodec.decode(good.take(good.length / 2)).isEmpty)
    // flip SOF0 -> SOF2 (progressive): explicit out-of-scope
    val prog = good.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    assert(JpegCodec.decode(prog).isEmpty)
  }
}
