package graft.scaleops

/** PNG codec — closes the LAST pixel-decode stub in the multimodal
  * family (JPEG went real in r12's JpegCodec; PNG's only
  * entropy-coded part is DEFLATE, which ships in the JDK as
  * `java.util.zip.Inflater` — no external dependency). Implements
  * the PUBLIC spec (RFC 2083 / ISO 15948):
  *
  *  - DECODER ([[decode]]): chunk walk (IHDR → IDAT* → IEND, CRCs
  *    present but not re-verified — a corrupt stream fails
  *    structurally), concatenated-IDAT inflate, per-scanline
  *    unfilter (None/Sub/Up/Average/Paeth, spec §6.6), 8-bit
  *    grayscale / gray+alpha / RGB / RGBA color types,
  *    non-interlaced (Adam7 returns None — the crawl's long tail;
  *    palette and 16-bit return None likewise, all documented).
  *    PNG is LOSSLESS: decode(encode(pixels)) is the identity, so a
  *    gate fixture replays its pixel formula exactly with no
  *    DC-only construction needed.
  *
  *  - FIXTURE ENCODER ([[encodeGray]]): 8-bit grayscale,
  *    filter-None scanlines, one deflated IDAT — enough to certify
  *    the decoder end-to-end from SQL-replayable bytes (JpegSpec's
  *    cross-decoder discipline applies via javax.imageio in
  *    PngSpec).
  *
  * Per-image executor work inside `mapPartitions`, like every other
  * codec here. */
object PngCodec {

  private val Signature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  private def be32(p: Array[Byte], i: Int): Long =
    ((p(i) & 0xFFL) << 24) | ((p(i + 1) & 0xFFL) << 16) |
      ((p(i + 2) & 0xFFL) << 8) | (p(i + 3) & 0xFFL)

  /** Decoded image: w × h, `comps` ∈ {1, 2, 3, 4} (gray, gray+alpha,
    * RGB, RGBA), samples interleaved row-major. */
  final case class Image(w: Int, h: Int, comps: Int, pixels: Array[Byte])

  def decode(p: Array[Byte]): Option[Image] = {
    try decodeImpl(p)
    catch { case _: Exception => None }
  }

  private def decodeImpl(p: Array[Byte]): Option[Image] = {
    if (p.length < 8 + 25 || !p.take(8).sameElements(Signature)) return None
    var i = 8
    var w = 0
    var h = 0
    var comps = 0
    var seenIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    while (i + 8 <= p.length) {
      val len = be32(p, i).toInt
      if (len < 0 || i + 12 + len > p.length) return None
      val typ = new String(p, i + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(p, i + 8).toInt
          h = be32(p, i + 12).toInt
          val bitDepth = p(i + 16) & 0xFF
          val colorType = p(i + 17) & 0xFF
          val interlace = p(i + 20) & 0xFF
          if (w <= 0 || h <= 0) return None
          if (bitDepth != 8) return None // 16-bit/packed out of scope
          if (interlace != 0) return None // Adam7 out of scope
          comps = colorType match {
            case 0 => 1 // gray
            case 2 => 3 // rgb
            case 4 => 2 // gray+alpha
            case 6 => 4 // rgba
            case _ => return None // palette (3) out of scope
          }
          seenIhdr = true
        case "IDAT" => idat.write(p, i + 8, len)
        case "IEND" =>
          if (!seenIhdr || idat.size() == 0) return None
          return unfilter(inflate(idat.toByteArray), w, h, comps)
        case _ => () // ancillary chunks skipped
      }
      i += 12 + len
    }
    None
  }

  private def inflate(z: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(z)
    val out = new java.io.ByteArrayOutputStream(z.length * 4)
    val buf = new Array[Byte](16384)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      // n == 0 without finished() means the inflater wants something we
      // will never supply (more input, or a preset dictionary — FDICT is
      // invalid in PNG but reachable from corrupt payloads). Any such
      // state must fail structurally, never spin: a hang here would pin
      // an executor task and decode()'s try/catch can't recover it.
      if (n == 0 && !inf.finished()) {
        inf.end()
        throw new java.util.zip.DataFormatException(
          if (inf.needsInput()) "truncated IDAT"
          else if (inf.needsDictionary()) "FDICT preset dictionary (invalid in PNG)"
          else "stalled zlib stream")
      }
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Scanline unfilter, spec §6.6: each row is 1 filter byte +
    * w·comps sample bytes; Sub/Up/Average/Paeth reference the
    * RECONSTRUCTED left/up/up-left bytes. */
  private def unfilter(raw: Array[Byte], w: Int, h: Int,
                       comps: Int): Option[Image] = {
    val stride = w * comps
    if (raw.length < (stride + 1) * h) return None
    val pix = new Array[Byte](stride * h)
    val bpp = comps // 8-bit: bytes per pixel = samples per pixel
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xFF
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val rawB = raw(src + x) & 0xFF
        val left = if (x >= bpp) pix(dst + x - bpp) & 0xFF else 0
        val up = if (y > 0) pix(dst - stride + x) & 0xFF else 0
        val upLeft =
          if (y > 0 && x >= bpp) pix(dst - stride + x - bpp) & 0xFF else 0
        val v = ft match {
          case 0 => rawB
          case 1 => rawB + left
          case 2 => rawB + up
          case 3 => rawB + (left + up) / 2
          case 4 => // Paeth predictor
            val pp = left + up - upLeft
            val pa = math.abs(pp - left)
            val pb = math.abs(pp - up)
            val pc = math.abs(pp - upLeft)
            val pred =
              if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
            rawB + pred
          case _ => return None
        }
        pix(dst + x) = (v & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, comps, pix))
  }

  /** Per-channel pixel sums — the [[Multimodal.decodePixels]]
    * contract (gray replicates into all three; alpha channels are
    * dropped from the sums, they are coverage, not color). */
  private[graft] def channelSums(p: Array[Byte])
      : Option[(Int, Int, Long, Long, Long)] =
    decode(p).map { img =>
      var sr, sg, sb = 0L
      var i = 0
      while (i < img.pixels.length) {
        img.comps match {
          case 1 | 2 =>
            val v = img.pixels(i) & 0xFF
            sr += v; sg += v; sb += v
          case _ =>
            sr += img.pixels(i) & 0xFF
            sg += img.pixels(i + 1) & 0xFF
            sb += img.pixels(i + 2) & 0xFF
        }
        i += img.comps
      }
      (img.w, img.h, sr, sg, sb)
    }

  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0xEDB88320 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c
      n += 1
    }
    t
  }

  private def crc32(bytes: Array[Byte], off: Int, len: Int): Long = {
    var c = 0xFFFFFFFF
    var i = off
    while (i < off + len) {
      c = CrcTable((c ^ bytes(i)) & 0xFF) ^ (c >>> 8)
      i += 1
    }
    (~c).toLong & 0xFFFFFFFFL
  }

  /** Encode an 8-bit grayscale PNG (filter None, one IDAT). PNG is
    * lossless, so [[decode]] returns exactly `pixel(x, y)`. */
  private[graft] def encodeGray(w: Int, h: Int,
                                pixel: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write((len >>> 24) & 0xFF); out.write((len >>> 16) & 0xFF)
      out.write((len >>> 8) & 0xFF); out.write(len & 0xFF)
      val body = typ.getBytes("US-ASCII") ++ data
      out.write(body, 0, body.length)
      val crc = crc32(body, 0, body.length)
      out.write(((crc >>> 24) & 0xFF).toInt); out.write(((crc >>> 16) & 0xFF).toInt)
      out.write(((crc >>> 8) & 0xFF).toInt); out.write((crc & 0xFF).toInt)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >>> 24) & 0xFF).toByte; ihdr(1) = ((w >>> 16) & 0xFF).toByte
    ihdr(2) = ((w >>> 8) & 0xFF).toByte; ihdr(3) = (w & 0xFF).toByte
    ihdr(4) = ((h >>> 24) & 0xFF).toByte; ihdr(5) = ((h >>> 16) & 0xFF).toByte
    ihdr(6) = ((h >>> 8) & 0xFF).toByte; ihdr(7) = (h & 0xFF).toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // gray
    // compression/filter/interlace = 0
    chunk("IHDR", ihdr)
    val raw = new Array[Byte]((w + 1) * h)
    var y = 0
    while (y < h) {
      raw(y * (w + 1)) = 0 // filter None
      var x = 0
      while (x < w) {
        raw(y * (w + 1) + 1 + x) = (pixel(x, y) & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw)
    defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](16384)
    while (!defl.finished()) {
      val n = defl.deflate(buf)
      zout.write(buf, 0, n)
    }
    defl.end()
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
