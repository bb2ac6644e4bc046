package graft.scaleops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star additions, BASELINE.json):
  * image/audio/video as opaque `binary` payloads + typed metadata,
  * with decode / feature-extract / frame-sample stages.
  *
  * The decode step is a clearly-marked DETERMINISTIC STUB (no codec
  * libraries ship in this build); everything around it — the schema,
  * the typed `Dataset` boundary, `mapPartitions` batching, the
  * partition-local iteration pattern a real decoder (JNI codec,
  * model inference) would drop into — is real and tested. At scale
  * the stub body is the only thing that changes.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, modality: String,
                            payload: Array[Byte])
  final case class MediaMeta(media_id: Long, modality: String,
                             byte_len: Int, width: Int, height: Int,
                             n_frames: Int)
  final case class MediaFeatures(media_id: Long, modality: String,
                                 byte_entropy: Double,
                                 histogram: Array[Long])

  /** Fabricate a media table from any text source: payload = UTF-8
    * bytes, modality round-robins by id. Stands in for a real
    * object-store scan of (id, blob) pairs. */
  def fromDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Container-header decode. REAL parsing for the formats whose
    * headers are pure byte layout — JPEG (SOF0/SOF2 frame
    * dimensions), PNG (IHDR width/height), GIF (logical screen
    * descriptor), BMP (BITMAPINFOHEADER), binary netpbm (P5/P6), and
    * WAV (RIFF fmt chunk: sample rate/channels → frame count);
    * payloads that are none of these fall back to the clearly-marked
    * DETERMINISTIC STUB (pseudo-dims from a payload hash) so the
    * pipeline stays total — the stub surface is now only codecs that
    * genuinely need decoder libraries (video frames, compressed
    * audio, JPEG/PNG pixel data; BMP/netpbm PIXELS are really decoded
    * by [[decodePixels]]). Runs per partition: one iterator pass, no
    * per-row task overhead — the shape a full codec (JNI) drops into. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val n = m.payload.length
        parseJpeg(m.payload).orElse(parsePng(m.payload))
          .orElse(parseGif(m.payload)).orElse(parseBmp(m.payload))
          .orElse(parsePnm(m.payload)).orElse(parseWav(m.payload)) match {
          case Some((w, h, frames)) =>
            MediaMeta(m.media_id, m.modality, n, w, h, frames)
          case None => // ---- DECODE STUB (non-container payloads) ----
            val hsh = m.payload.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xFF))
            MediaMeta(m.media_id, m.modality, n,
              width = 16 + math.floorMod(hsh, 1905).toInt,
              height = 16 + math.floorMod(hsh >> 11, 1065).toInt,
              n_frames = if (m.modality == "image") 1
              else 1 + math.floorMod(hsh >> 22, 299).toInt)
        }
      }
    }
  }

  private def u8(b: Byte): Int = b & 0xFF
  private def be16(p: Array[Byte], i: Int): Int = (u8(p(i)) << 8) | u8(p(i + 1))
  private def le16(p: Array[Byte], i: Int): Int = u8(p(i)) | (u8(p(i + 1)) << 8)
  private def le32(p: Array[Byte], i: Int): Long =
    u8(p(i)).toLong | (u8(p(i + 1)).toLong << 8) |
      (u8(p(i + 2)).toLong << 16) | (u8(p(i + 3)).toLong << 24)

  /** JPEG: walk the marker stream to the first SOF0/SOF2 frame header;
    * height/width are big-endian at offsets +3/+5 of the segment. */
  private[graft] def parseJpeg(p: Array[Byte]): Option[(Int, Int, Int)] = {
    if (p.length < 4 || u8(p(0)) != 0xFF || u8(p(1)) != 0xD8) return None
    var i = 2
    while (i + 3 < p.length && u8(p(i)) == 0xFF) {
      val marker = u8(p(i + 1))
      if (marker == 0xC0 || marker == 0xC2) { // SOF0 / SOF2
        if (i + 8 >= p.length) return None
        return Some((be16(p, i + 7), be16(p, i + 5), 1)) // (width, height)
      }
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD9)) i += 2
      else i += 2 + be16(p, i + 2)
    }
    None
  }

  private def be32(p: Array[Byte], i: Int): Long =
    (u8(p(i)).toLong << 24) | (u8(p(i + 1)).toLong << 16) |
      (u8(p(i + 2)).toLong << 8) | u8(p(i + 3)).toLong

  /** PNG: 8-byte signature then the IHDR chunk (required first):
    * 4-byte length, "IHDR", then width and height as big-endian
    * 32-bit at data offsets +0/+4 (PNG spec §11.2.2). */
  private[graft] def parsePng(p: Array[Byte]): Option[(Int, Int, Int)] = {
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    if (p.length < 24 || !sig.indices.forall(i => u8(p(i)) == sig(i))) return None
    if (new String(p.slice(12, 16)) != "IHDR") return None
    val (w, h) = (be32(p, 16), be32(p, 20))
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some((w.toInt, h.toInt, 1))
  }

  /** GIF: "GIF87a"/"GIF89a" then the logical screen descriptor —
    * width/height little-endian 16-bit at offsets 6/8. */
  private[graft] def parseGif(p: Array[Byte]): Option[(Int, Int, Int)] = {
    if (p.length < 10) return None
    val hdr = new String(p.slice(0, 6))
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    val (w, h) = (le16(p, 6), le16(p, 8))
    if (w == 0 || h == 0) None else Some((w, h, 1))
  }

  /** BMP: 'BM' + BITMAPINFOHEADER — width/height little-endian 32-bit
    * at offsets 18/22; a negative height means top-down row order
    * (dims reported as |height|). */
  private[graft] def parseBmp(p: Array[Byte]): Option[(Int, Int, Int)] = {
    if (p.length < 54 || p(0) != 'B'.toByte || p(1) != 'M'.toByte) return None
    val w = le32(p, 18).toInt
    val h = le32(p, 22).toInt
    if (w <= 0 || h == 0) None else Some((w, math.abs(h), 1))
  }

  /** Binary netpbm header (P5 gray / P6 RGB): ASCII magic, then
    * whitespace/`#`-comment-separated width, height, maxval, then ONE
    * whitespace byte before the raw samples. Returns
    * (isRgb, w, h, maxval, dataOffset). */
  /** Parse a binary-PNM header starting at `off` (an offset
    * parameter, not a sliced copy — the multi-frame walk probes a
    * header per frame and slicing the whole remainder each time is
    * O(frames²) bytes of memcpy). The returned data offset is
    * RELATIVE to `off`. */
  private[graft] def pnmHeader(p: Array[Byte], off: Int = 0)
      : Option[(Boolean, Int, Int, Int, Int)] = {
    if (p.length - off < 7 || p(off) != 'P'.toByte ||
      (p(off + 1) != '5'.toByte && p(off + 1) != '6'.toByte)) return None
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    var i = off + 2
    val vals = new Array[Int](3)
    var vi = 0
    while (vi < 3) {
      while (i < p.length && (isWs(p(i)) || p(i) == '#'.toByte)) {
        if (p(i) == '#'.toByte)
          while (i < p.length && p(i) != '\n'.toByte) i += 1
        else i += 1
      }
      var v = 0
      var any = false
      while (i < p.length && p(i) >= '0'.toByte && p(i) <= '9'.toByte) {
        v = v * 10 + (p(i) - '0'); i += 1; any = true
      }
      if (!any) return None
      vals(vi) = v
      vi += 1
    }
    if (i >= p.length || !isWs(p(i))) return None // single ws before data
    if (vals(0) <= 0 || vals(1) <= 0 || vals(2) <= 0) return None
    Some((p(off + 1) == '6'.toByte, vals(0), vals(1), vals(2), i + 1 - off))
  }

  private[graft] def parsePnm(p: Array[Byte]): Option[(Int, Int, Int)] =
    pnmHeader(p).map { case (_, w, h, _, _) => (w, h, 1) }

  /** WAV: RIFF/WAVE with an fmt chunk — channels and sample rate are
    * little-endian; width=channels, height=sampleRate, frames = data
    * bytes / block align. */
  private[graft] def parseWav(p: Array[Byte]): Option[(Int, Int, Int)] = {
    if (p.length < 44) return None
    if (!(p.startsWith("RIFF".getBytes) &&
        new String(p.slice(8, 12)) == "WAVE")) return None
    var i = 12
    var channels, sampleRate, blockAlign = 0
    var dataLen = 0L
    while (i + 8 <= p.length) {
      val id = new String(p.slice(i, i + 4))
      val size = le32(p, i + 4)
      if (id == "fmt ") {
        channels = le16(p, i + 10)
        sampleRate = le32(p, i + 12).toInt
        blockAlign = le16(p, i + 20)
      } else if (id == "data") dataLen = size
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (channels == 0 || blockAlign == 0) None
    else Some((channels, sampleRate, (dataLen / blockAlign).toInt))
  }

  final case class PixelStats(media_id: Long, fmt: String, width: Int,
                              height: Int, n_pixels: Long,
                              sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL pixel decode (no stub, no entropy format left behind one)
    * — 24-bit uncompressed BMP (bottom-up or top-down, 4-byte row
    * padding honored), binary netpbm P5/P6 (1-byte samples), and
    * since r12 both entropy-coded web formats through self-contained
    * decoders: baseline JPEG ([[JpegCodec]]: Huffman + dequant +
    * IDCT + chroma upsampling — a real crawl is overwhelmingly JPEG)
    * and PNG ([[PngCodec]]: JDK-Inflater DEFLATE + scanline
    * unfilter). Returns per-image channel sums (gray replicates into
    * all three), the contract the decode-certification query pins
    * arithmetically. */
  def decodePixels(media: Dataset[MediaRow]): Dataset[PixelStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        bmpPixels(m.payload).map(("bmp", _))
          .orElse(pnmPixels(m.payload).map(("pnm", _)))
          .orElse(JpegCodec.channelSums(m.payload).map(("jpeg", _)))
          .orElse(PngCodec.channelSums(m.payload).map(("png", _)))
          .orElse(GifCodec.channelSums(m.payload).map(("gif", _)))
          .map { case (fmt, (w, h, sr, sg, sb)) =>
            PixelStats(m.media_id, fmt, w, h, w.toLong * h, sr, sg, sb)
          }
      }
    }
  }

  /** BMP24 pixel pass: honors the pixel-array offset from the file
    * header, per-row padding to 4 bytes, and the sign-of-height row
    * order. Channels are stored B,G,R. */
  private[graft] def bmpPixels(p: Array[Byte])
      : Option[(Int, Int, Long, Long, Long)] = {
    if (p.length < 54 || p(0) != 'B'.toByte || p(1) != 'M'.toByte) return None
    val off = le32(p, 10).toInt
    val w = le32(p, 18).toInt
    val hRaw = le32(p, 22).toInt
    val bpp = le16(p, 28)
    val compression = le32(p, 30)
    if (w <= 0 || hRaw == 0 || bpp != 24 || compression != 0L) return None
    val h = math.abs(hRaw)
    val rowBytes = (w * 3 + 3) & ~3
    if (off < 54 || off.toLong + rowBytes.toLong * h > p.length) return None
    var sumB, sumG, sumR = 0L
    var y = 0
    while (y < h) {
      // image row y lives at the bottom for positive heights
      val src = off + (if (hRaw > 0) h - 1 - y else y) * rowBytes
      var x = 0
      while (x < w) {
        val o = src + x * 3
        sumB += u8(p(o)); sumG += u8(p(o + 1)); sumR += u8(p(o + 2))
        x += 1
      }
      y += 1
    }
    Some((w, h, sumR, sumG, sumB))
  }

  /** Binary netpbm pixel pass (maxval ≤ 255 ⇒ 1-byte samples). */
  private[graft] def pnmPixels(p: Array[Byte])
      : Option[(Int, Int, Long, Long, Long)] =
    pnmHeader(p).flatMap { case (rgb, w, h, maxval, off) =>
      val ch = if (rgb) 3 else 1
      if (maxval > 255 || off.toLong + w.toLong * h * ch > p.length) None
      else {
        var sr, sg, sb = 0L
        val n = w * h
        var i = 0
        while (i < n) {
          val o = off + i * ch
          if (rgb) { sr += u8(p(o)); sg += u8(p(o + 1)); sb += u8(p(o + 2)) }
          else { val v = u8(p(o)); sr += v; sg += v; sb += v }
          i += 1
        }
        Some((w, h, sr, sg, sb))
      }
    }

  /** 8×8 block gray sums of a decodable image (24-bit BMP or binary
    * netpbm) whose dims are block-divisible — the downsample step of
    * the perceptual hash. Gray per pixel = R+G+B (a PGM sample
    * replicates into all three, so a gray image hashes identically in
    * either container — spec-pinned). Exact integer sums: every
    * downstream comparison is replayable arithmetic, never float. */
  private[graft] def blockGraySums(p: Array[Byte], grid: Int = 8)
      : Option[(Int, Int, Array[Long])] = {
    def sums(w: Int, h: Int)(pixelGray: (Int, Int) => Int)
        : Option[(Int, Int, Array[Long])] = {
      if (w % grid != 0 || h % grid != 0) return None
      val bw = w / grid
      val bh = h / grid
      val out = new Array[Long](grid * grid)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out((y / bh) * grid + (x / bw)) += pixelGray(x, y)
          x += 1
        }
        y += 1
      }
      Some((w, h, out))
    }
    if (p.length >= 54 && p(0) == 'B'.toByte && p(1) == 'M'.toByte) {
      val off = le32(p, 10).toInt
      val w = le32(p, 18).toInt
      val hRaw = le32(p, 22).toInt
      val bpp = le16(p, 28)
      val compression = le32(p, 30)
      if (w <= 0 || hRaw == 0 || bpp != 24 || compression != 0L) return None
      val h = math.abs(hRaw)
      val rowBytes = (w * 3 + 3) & ~3
      if (off < 54 || off.toLong + rowBytes.toLong * h > p.length) return None
      sums(w, h) { (x, y) =>
        val src = off + (if (hRaw > 0) h - 1 - y else y) * rowBytes + x * 3
        u8(p(src)) + u8(p(src + 1)) + u8(p(src + 2))
      }
    } else pnmHeader(p).map { case (rgb, w, h, maxval, off) =>
      val ch = if (rgb) 3 else 1
      if (maxval > 255 || off.toLong + w.toLong * h * ch > p.length) None
      else sums(w, h) { (x, y) =>
        val o = off + (y * w + x) * ch
        if (rgb) u8(p(o)) + u8(p(o + 1)) + u8(p(o + 2)) else 3 * u8(p(o))
      }
    }.getOrElse {
      // entropy-coded containers (r12): decode through the real
      // codecs, same gray = R+G+B (a gray sample replicates ×3, so
      // the same image hashes identically in ANY container — the
      // spec-pinned container-invariance rule extends to png)
      def fromDecoded(w: Int, h: Int, comps: Int, pix: Array[Byte]) =
        sums(w, h) { (x, y) =>
          comps match {
            case 1 | 2 => 3 * u8(pix((y * w + x) * comps))
            case _ =>
              val o = (y * w + x) * comps
              u8(pix(o)) + u8(pix(o + 1)) + u8(pix(o + 2))
          }
        }
      JpegCodec.decode(p)
        .map(i => fromDecoded(i.w, i.h, i.comps, i.pixels))
        .orElse(PngCodec.decode(p)
          .map(i => fromDecoded(i.w, i.h, i.comps, i.pixels)))
        .orElse(GifCodec.decode(p)
          .map(i => fromDecoded(i.w, i.h, i.comps, i.pixels)))
        .flatten
    }
  }

  /** 56-bit dHash (difference hash — the classic perceptual
    * fingerprint, gradient signs over the 8×8 block downsample): bit
    * `r·7 + c` is set iff blockSum(r, c+1) > blockSum(r, c) — seven
    * horizontal gradients per row, exact integer comparisons. 56 bits
    * keeps every power of two (and any band arithmetic) inside a
    * non-negative BIGINT in both engines. */
  private[graft] def dHash56(p: Array[Byte]): Option[Long] =
    blockGraySums(p).map { case (_, _, s) =>
      var hash = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 7) {
          if (s(r * 8 + c + 1) > s(r * 8 + c)) hash |= 1L << (r * 7 + c)
          c += 1
        }
        r += 1
      }
      hash
    }

  /** Perceptual hashes of every decodable, block-divisible image —
    * (media_id, phash). Non-image/undecodable payloads drop out (a
    * near-dup pass only ranges over what it can hash). */
  def perceptualHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(m => dHash56(m.payload).map(h => (m.media_id, h)))
    }.toDF("media_id", "phash")
  }

  /** Near-duplicate image pairs by perceptual hash, via
    * HAMMING-BUCKET LSH with an EXACTNESS GUARANTEE: the 56-bit hash
    * splits into `maxDist + 1` bands, and two hashes within Hamming
    * distance `maxDist` must agree on ≥ 1 whole band (pigeonhole) —
    * so banding loses NOTHING; candidates verify with one
    * `bit_count(a XOR b)` and the output is exactly the distance-≤
    * maxDist pair set. All candidate generation is a band-keyed
    * self-join (the only corpus-sized shuffle — at 100 TB of images
    * the hash table is 16 B/row and the join is the familiar
    * banded-LSH shape of [[Dedup]]); nothing is all-pairs. Occupancy
    * per 14-bit band bucket is n/2¹⁶ in the random-hash limit, so
    * candidate volume stays near-linear until n ≈ millions per
    * uniform band value; beyond that, raise hash bits (16×16 grid →
    * 240 bits) rather than dropping bands — the guarantee needs
    * bands > maxDist. */
  def nearDupByPHash(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 6, s"maxDist=$maxDist outside [0,6]")
    val bands = maxDist + 1
    val bandBits = 56 / bands
    val mask = (1L << bandBits) - 1
    // the self-join is FORCED to sort-merge via a strategy hint, for
    // two reasons, both learned at sf1 (r14): (a) the banded corpus
    // sits at the broadcast-threshold borderline (~10 MB at sf1) and
    // a stats wobble flipped the plan to a BroadcastHashJoin probed
    // by the documents scan's 1-2 input partitions — one task
    // enumerating every candidate pair (2.3 s → >20 min); at 100 TB
    // broadcasting the corpus's banded hashes is wrong anyway.
    // (b) The hint — NOT an explicit repartition: a user-specified
    // repartition(band, bval) exempts the exchange from AQE's
    // OptimizeSkewedJoin, and hot band values (low-entropy hash
    // families) then serialize on a few partitions (measured 52 s vs
    // 2.3 s on an 8-distinct-hash corpus). ENSURE_REQUIREMENTS
    // exchanges + SMJ keep the skew splitter active — parallelism
    // from AQE, never the file layout.
    val banded = hashes.select(col("media_id"), col("phash"),
      posexplode(array((0 until bands).map(i =>
        shiftright(col("phash"), i * bandBits).bitwiseAND(lit(mask))): _*)))
      .toDF("media_id", "phash", "band", "bval")
    banded
      .join(banded.select(col("band"), col("bval"),
        col("media_id").as("b_id"), col("phash").as("b_phash")).hint("merge"),
        Seq("band", "bval"))
      .filter(col("media_id") < col("b_id"))
      .select(col("media_id").as("a"), col("b_id").as("b"),
        bit_count(col("phash").bitwiseXOR(col("b_phash"))).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }

  // ---- video near-dup (per-frame perceptual hashes) -----------------------

  /** Frame-wise perceptual hashes of a multi-frame clip — either
    * CONCATENATED binary PGMs (each frame self-describes its size via
    * its header, so the walk is a real sequential container decode —
    * the raw-frame-stream layout a frame sampler emits) or an
    * ANIMATED GIF (r14 — [[GifCodec.decodeFrames]] walks every image
    * descriptor; frames re-wrap as P6 so the SAME gray = R+G+B dHash
    * path hashes them, extending the container-invariance rule to
    * moving pictures: identical frame pixels hash identically in
    * either container). Entropy-coded video codecs stay behind the
    * documented stub. Emits one (frame_idx, dHash56) per decodable
    * block-divisible frame. */
  private[graft] def multiPgmFrameHashes(p: Array[Byte]): Seq[(Int, Long)] = {
    if (p.length >= 6 && p(0) == 'G'.toByte && p(1) == 'I'.toByte &&
      p(2) == 'F'.toByte) {
      return GifCodec.decodeFrames(p).toSeq.flatten.zipWithIndex
        .flatMap { case (img, idx) =>
          val header = s"P6\n${img.w} ${img.h}\n255\n".getBytes("US-ASCII")
          val ppm = new Array[Byte](header.length + img.pixels.length)
          System.arraycopy(header, 0, ppm, 0, header.length)
          System.arraycopy(img.pixels, 0, ppm, header.length,
            img.pixels.length)
          dHash56(ppm).map(h => (idx, h))
        }
    }
    val out = Seq.newBuilder[(Int, Long)]
    var off = 0
    var idx = 0
    var ok = true
    while (ok && off < p.length) {
      // header probed in place (offset parse, no remainder copy) and
      // frame length computed in LONG: a corrupt header claiming
      // w·h·ch ≥ 2³¹ would wrap an Int negative, slip past the bounds
      // guard, and crash copyOfRange instead of stopping the walk
      pnmHeader(p, off) match {
        case Some((rgb, w, h, maxval, dataOff)) if maxval <= 255 =>
          val ch = if (rgb) 3 else 1
          val frameLen = dataOff.toLong + w.toLong * h.toLong * ch
          if (off + frameLen > p.length) ok = false
          else {
            val frame = java.util.Arrays.copyOfRange(p, off,
              off + frameLen.toInt)
            dHash56(frame).foreach(h => out += ((idx, h)))
            idx += 1
            off += frameLen.toInt
          }
        case _ => ok = false
      }
    }
    out.result()
  }

  /** (media_id, frame_idx, phash) rows of every clip — the corpus
    * side of the video near-dup pass. */
  def videoFrameHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(m => multiPgmFrameHashes(m.payload)
        .map { case (f, h) => (m.media_id, f, h) })
    }.toDF("media_id", "frame_idx", "phash")
  }

  /** Near-duplicate CLIP pairs from frame hashes: two clips match
    * when ≥ `minMatch` frame POSITIONS agree within Hamming
    * `maxDist` (aligned-frame semantics — production clips are
    * frame-sampled to a common grid first, [[sampleFrames]]'s job).
    * Candidate generation is the per-frame Hamming-band LSH keyed by
    * (frame_idx, band, bval) with the SAME pigeonhole guarantee as
    * [[nearDupByPHash]] — within `maxDist` a frame pair must agree on
    * ≥ 1 whole band, so the per-(pair, frame) match relation is
    * EXACT, and therefore the matched-frame count and the clip pair
    * set are exact too. The only corpus-sized shuffle is the banded
    * self-join; clip scoring is a count over the (already tiny)
    * matched-frame rows. */
  def nearDupByFrameHashes(frameHashes: DataFrame, maxDist: Int = 3,
                           minMatch: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 6, s"maxDist=$maxDist outside [0,6]")
    val bands = maxDist + 1
    val bandBits = 56 / bands
    val mask = (1L << bandBits) - 1
    // same forced-SMJ-via-hint as [[nearDupByPHash]] (and the same
    // two sf1 lessons: no corpus broadcast, no user repartition that
    // would disable AQE's skew splitter)
    val banded = frameHashes.select(col("media_id"), col("frame_idx"),
      col("phash"),
      posexplode(array((0 until bands).map(i =>
        shiftright(col("phash"), i * bandBits).bitwiseAND(lit(mask))): _*)))
      .toDF("media_id", "frame_idx", "phash", "band", "bval")
    val matchedFrames = banded
      .join(banded.select(col("frame_idx"), col("band"), col("bval"),
        col("media_id").as("b_id"), col("phash").as("b_phash")).hint("merge"),
        Seq("frame_idx", "band", "bval"))
      .filter(col("media_id") < col("b_id"))
      .filter(bit_count(col("phash").bitwiseXOR(col("b_phash"))) <= maxDist)
      .select(col("media_id").as("a"), col("b_id").as("b"), col("frame_idx"))
      .distinct()
    matchedFrames.groupBy("a", "b")
      .agg(count(lit(1)).as("n_matched_frames"))
      .filter(col("n_matched_frames") >= minMatch)
  }

  /** Deterministic multi-frame clip: `frames` concatenated binary
    * PGMs of `w`×`h`, pixel p of frame f = `pixel(f, p)`. */
  private[graft] def makeMultiPgm(frames: Int, w: Int, h: Int,
                                  pixel: (Int, Int) => Int): Array[Byte] = {
    val parts = (0 until frames).map(f => makeGrayPgm(w, h, p => pixel(f, p)))
    val out = new Array[Byte](parts.map(_.length).sum)
    var off = 0
    parts.foreach { b =>
      System.arraycopy(b, 0, out, off, b.length); off += b.length
    }
    out
  }

  // ---- audio near-dup (energy-contour fingerprint) -----------------------

  /** Locate the raw sample bytes of an 8-bit MONO PCM WAV — the
    * REAL RIFF chunk walk (same traversal as [[parseWav]], but
    * returning the data-chunk offset and validating the sample
    * format). Returns (dataOff, nSamples); None for any other
    * format/bit depth (compressed audio stays behind the documented
    * codec stub). */
  private[graft] def wavPcm8Mono(p: Array[Byte]): Option[(Int, Int)] = {
    if (p.length < 44) return None
    if (!(p.startsWith("RIFF".getBytes) &&
        new String(p.slice(8, 12)) == "WAVE")) return None
    var i = 12
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0
    while (i + 8 <= p.length) {
      val id = new String(p.slice(i, i + 4))
      // chunk size is UNSIGNED 32-bit: keep it Long — a corrupt size
      // in [2^31, 2^32) cast to Int goes negative and the walk's
      // step `8 + size + pad` becomes ≤ 0, re-reading the same chunk
      // forever (one bad clip would wedge the executor task). A size
      // that can't fit in the remaining payload is equally corrupt:
      // stop the walk, the validity checks below reject the file.
      val size = le32(p, i + 4)
      if (size > p.length.toLong - i - 8) {
        i = p.length // corrupt chunk: terminate the walk
      } else {
        val sz = size.toInt
        if (id == "fmt " && i + 24 <= p.length) {
          val audioFormat = le16(p, i + 8)
          val channels = le16(p, i + 10)
          val bits = le16(p, i + 22)
          fmtOk = audioFormat == 1 && channels == 1 && bits == 8
        } else if (id == "data") {
          dataOff = i + 8
          dataLen = sz
        }
        i += 8 + sz + (sz & 1)
      }
    }
    if (!fmtOk || dataOff < 0 || dataOff + dataLen > p.length ||
      dataLen <= 0) None
    else Some((dataOff, dataLen))
  }

  /** Per-frame loudness of an 8-bit mono PCM WAV: the samples split
    * into `frames` even spans (frame f covers sample indices
    * [f·n/frames, (f+1)·n/frames)) and each frame sums |s − 128| —
    * exact integer arithmetic end to end, so every downstream
    * comparison is replayable in SQL. */
  private[graft] def wavFrameEnergies(p: Array[Byte], frames: Int = 57)
      : Option[Array[Long]] =
    wavPcm8Mono(p).flatMap { case (off, n) =>
      if (n < frames) None
      else {
        val e = new Array[Long](frames)
        var f = 0
        while (f < frames) {
          val start = (n.toLong * f / frames).toInt
          val end = (n.toLong * (f + 1) / frames).toInt
          var t = start
          while (t < end) {
            e(f) += math.abs((p(off + t) & 0xFF) - 128)
            t += 1
          }
          f += 1
        }
        Some(e)
      }
    }

  /** 56-bit audio fingerprint — the ENERGY-CONTOUR hash, the audio
    * counterpart of [[dHash56]]: 57 frame loudnesses give 56 temporal
    * gradients, bit f set iff e(f+1) > e(f). Exact integer
    * comparisons; 56 bits keeps all band arithmetic inside a
    * non-negative BIGINT in both engines, and reuses
    * [[nearDupByPHash]]'s Hamming-band machinery (and its pigeonhole
    * exactness guarantee) unchanged. Invariance properties a contour
    * hash buys: per-clip gain that doesn't clip preserves every
    * gradient sign (energy ordering is scale-invariant), and a
    * localized edit (fade-in, click, onset patch) touches only the
    * gradients adjacent to the edited frames. */
  private[graft] def audioFingerprint56(p: Array[Byte]): Option[Long] =
    wavFrameEnergies(p).map { e =>
      var hash = 0L
      var f = 0
      while (f < 56) {
        if (e(f + 1) > e(f)) hash |= 1L << f
        f += 1
      }
      hash
    }

  /** Energy-contour fingerprints of every decodable 8-bit mono PCM
    * clip — (media_id, phash), column-compatible with
    * [[nearDupByPHash]] so the audio near-dup pass IS the image
    * near-dup operator over a different fingerprint. */
  def audioFingerprints(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(m => audioFingerprint56(m.payload).map(h => (m.media_id, h)))
    }.toDF("media_id", "phash")
  }

  // ---- audio near-dup, SPECTRAL tier (r13) -------------------------------

  /** In-place iterative radix-2 Cooley–Tukey FFT (the textbook
    * public algorithm — bit-reversal permutation then log₂ n
    * butterfly stages). `re.length` must be a power of two. The only
    * consumer is [[spectralPeakBins]]'s fixed 512-point window, so
    * no twiddle caching is needed — this is per-clip executor work,
    * not a hot inner loop. */
  private[graft] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0, "radix-2 needs 2^k")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ar = re(base + k); val ai = im(base + k)
          val br = re(base + k + len / 2); val bi = im(base + k + len / 2)
          val tr = br * cr - bi * ci
          val ti = br * ci + bi * cr
          re(base + k) = ar + tr; im(base + k) = ai + ti
          re(base + k + len / 2) = ar - tr; im(base + k + len / 2) = ai - ti
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Top-`nPeaks` spectral peak bins of an 8-bit mono PCM clip:
    * FFT of the first `win` samples (mean-subtracted, so the DC /
    * loudness level never competes as a "peak"), magnitude spectrum
    * over bins [2, win/2), greedy local-maximum picking with a ±1-bin
    * exclusion zone (a peak's shoulder must not count as a second
    * peak). Returns the bins sorted ASCENDING, or None when the clip
    * is shorter than the window or not 8-bit mono PCM. */
  private[graft] def spectralPeakBins(p: Array[Byte], nPeaks: Int = 4,
                                      win: Int = 512): Option[Array[Int]] =
    wavPcm8Mono(p).flatMap { case (off, n) =>
      if (n < win) None
      else {
        val re = new Array[Double](win)
        val im = new Array[Double](win)
        var mean = 0.0
        var t = 0
        while (t < win) { mean += (p(off + t) & 0xFF); t += 1 }
        mean /= win
        t = 0
        while (t < win) { re(t) = (p(off + t) & 0xFF) - mean; t += 1 }
        fft(re, im)
        val half = win / 2
        val mag = new Array[Double](half)
        var b = 2
        while (b < half) {
          mag(b) = math.sqrt(re(b) * re(b) + im(b) * im(b))
          b += 1
        }
        val picked = new Array[Int](nPeaks)
        var k = 0
        while (k < nPeaks) {
          var best = -1
          var bestMag = 0.0
          b = 2
          while (b < half) {
            if (mag(b) > bestMag) { bestMag = mag(b); best = b }
            b += 1
          }
          if (best < 0) return None // fewer distinct peaks than asked
          picked(k) = best
          // exclusion: the peak and its immediate shoulders
          var e = math.max(2, best - 1)
          while (e <= math.min(half - 1, best + 1)) { mag(e) = 0.0; e += 1 }
          k += 1
        }
        java.util.Arrays.sort(picked)
        Some(picked)
      }
    }

  /** 56-bit PITCH-INVARIANT spectral fingerprint — the constellation
    * idea of Wang's 2003 landmark paper (hash relations BETWEEN
    * spectral peaks, not absolute positions) made transposition-
    * invariant by hashing peak-frequency RATIOS: a pitch shift
    * multiplies every peak frequency by the same factor, so the
    * ratios of the sorted peak bins — and therefore this hash — are
    * unchanged, while the energy-contour hash
    * ([[audioFingerprint56]]) sees a re-rendered loudness timeline
    * and misses (the gap the r12 verdict called: contour is robust
    * to volume, not to pitch). Layout: the 3 consecutive log₂-ratios
    * of the 4 ascending peak bins, each quantized at quarter-octave
    * cells and THERMOMETER-coded into a 14-bit lane (bits
    * `lane·14 + 0..level-1` set) — so a ±1-cell quantization jitter
    * costs exactly 1 Hamming bit per lane, and the existing
    * [[nearDupByPHash]] pigeonhole band-LSH applies unchanged. */
  private[graft] def spectralHash56(p: Array[Byte]): Option[Long] =
    spectralPeakBins(p).map { bins =>
      var hash = 0L
      var j = 0
      while (j < 3) {
        val r = bins(j + 1).toDouble / bins(j)
        val level = math.min(13,
          math.max(0, math.floor(4.0 * math.log(r) / math.log(2.0)).toInt))
        var b = 0
        while (b < level) { hash |= 1L << (j * 14 + b); b += 1 }
        j += 1
      }
      hash
    }

  /** Spectral fingerprints of every decodable clip — (media_id,
    * phash), [[nearDupByPHash]]-compatible like the other two
    * fingerprint families. */
  def spectralFingerprints(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(m => spectralHash56(m.payload).map(h => (m.media_id, h)))
    }.toDF("media_id", "phash")
  }

  /** Deterministic square-wave-mixture clip for the SPECTRAL
    * near-dup certification — every term integer-exact so the DuckDB
    * oracle replays the samples (and therefore the energy-contour
    * hashes) arithmetically:
    *
    *  - 4 square-wave components with id-derived periods from an
    *    8-entry menu (odd stride ⇒ always 4 distinct), fundamentals
    *    at FFT bins 512/P ∈ [10.7, 42.7], pairwise ≥ 2 bins apart
    *    (the peak picker's ±1 exclusion can never swallow a
    *    neighbor); square waves have odd harmonics only, at ≤ 1/3
    *    magnitude — never in the top-4 while 4 fundamentals stand;
    *  - a per-frame loudness envelope g ∈ [140, 147] (±2.5%):
    *    enough integer wiggle to make every contour gradient
    *    deterministic, small enough that envelope sidebands stay ≪
    *    the fundamentals in the spectrum;
    *  - `twin` = the pitch-shifted re-render: every period HALVED
    *    (octave up — all peak frequencies ×2, ratios unchanged) with
    *    its own loudness automation (the envelope timeline
    *    re-indexed), which scrambles the energy contour — the case
    *    the contour hash provably misses and the ratio-constellation
    *    hash provably keeps;
    *  - `offsetSamples` (r14) = the TIME-OFFSET re-render: every
    *    sample evaluated at t + offset (a later capture of the same
    *    source). At offset = 48 = 3 frames the twin's frame energies
    *    are EXACTLY e(f+3), so the contour hash shifts wholesale
    *    (oracle-replayable from one energy table) while the spectrum
    *    keeps the same fundamentals — the offset-robustness the
    *    constellation construction claims, witnessed. */
  private[graft] def makeToneMixWav(id: Long, twin: Boolean,
                                    nSamples: Int = 912,
                                    offsetSamples: Int = 0): Array[Byte] = {
    val menu = Array(12, 16, 20, 24, 28, 32, 40, 48)
    val a = (id % 8).toInt
    val s = 1 + 2 * (id % 4).toInt
    val div = if (twin) 2 else 1
    val p = Array.tabulate(4)(k => menu((a + k * s) % 8) / div)
    makeWav8(nSamples, { t0 =>
      val t = t0 + offsetSamples
      val f = t / 16
      val gidx = if (twin) (2 * f + 5) % 57 else f
      val g = 140 + ((id + 1) * (gidx + 13)) % 97 % 8
      var w = 0
      var k = 0
      while (k < 4) {
        w += (if (t % p(k) < p(k) / 2) 30 else -30)
        k += 1
      }
      ((g * (w + 121)) / 140).toInt
    })
  }

  /** Deterministic 8-bit mono PCM WAV with REAL layout — RIFF/WAVE
    * header, fmt chunk (format 1, 1 channel, 8 kHz, 8-bit), data
    * chunk; sample t = `sample(t)` (values 0..255). A decoder that
    * mis-walks the chunk list or misreads the data offset shifts
    * every frame energy and fails the oracle. */
  private[graft] def makeWav8(nSamples: Int, sample: Int => Int)
      : Array[Byte] = {
    val out = new Array[Byte](44 + nSamples)
    def putLe32(i: Int, v: Int): Unit = {
      out(i) = (v & 0xFF).toByte; out(i + 1) = ((v >> 8) & 0xFF).toByte
      out(i + 2) = ((v >> 16) & 0xFF).toByte; out(i + 3) = ((v >> 24) & 0xFF).toByte
    }
    def putLe16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xFF).toByte; out(i + 1) = ((v >> 8) & 0xFF).toByte
    }
    def putAscii(i: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, j) => out(i + j) = b }
    putAscii(0, "RIFF"); putLe32(4, 36 + nSamples); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLe32(16, 16)
    putLe16(20, 1) // PCM
    putLe16(22, 1) // mono
    putLe32(24, 8000) // sample rate
    putLe32(28, 8000) // byte rate (rate·channels·bytes/sample)
    putLe16(32, 1) // block align
    putLe16(34, 8) // bits per sample
    putAscii(36, "data"); putLe32(40, nSamples)
    var t = 0
    while (t < nSamples) { out(44 + t) = sample(t).toByte; t += 1 }
    out
  }

  /** Deterministic binary PGM (P5): pixel (x,y) = (id·31 + y·w + x)
    * mod 256 — the fabric the decode-certification query rebuilds
    * arithmetically in SQL. */
  private[graft] def makePgm(id: Long, w: Int, h: Int): Array[Byte] =
    makeGrayPgm(w, h, p => ((id * 31 + p) % 256).toInt)

  /** Binary PGM with a caller-supplied pixel function over the
    * row-major index p = y·w + x (values 0..255). */
  private[graft] def makeGrayPgm(w: Int, h: Int,
                                 pixel: Int => Int): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var p = 0
    while (p < w * h) {
      out(header.length + p) = pixel(p).toByte
      p += 1
    }
    out
  }

  /** Deterministic 24-bit BMP with REAL layout — bottom-up rows,
    * 4-byte row padding, 54-byte headers; all three channels carry
    * the same (id·31 + y·w + x) mod 256 value. A decoder that botches
    * padding or row order shifts the sums and fails the oracle. */
  private[graft] def makeBmp(id: Long, w: Int, h: Int): Array[Byte] =
    makeGrayBmp(w, h, p => ((id * 31 + p) % 256).toInt)

  /** 24-bit BMP with a caller-supplied pixel function over the
    * row-major index p = y·w + x (gray value 0..255 into all three
    * channels); real layout — bottom-up rows, 4-byte padding. */
  private[graft] def makeGrayBmp(w: Int, h: Int,
                                 pixel: Int => Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) & ~3
    val dataSize = rowBytes * h
    val out = new Array[Byte](54 + dataSize)
    def putLe32(i: Int, v: Int): Unit = {
      out(i) = (v & 0xFF).toByte; out(i + 1) = ((v >> 8) & 0xFF).toByte
      out(i + 2) = ((v >> 16) & 0xFF).toByte; out(i + 3) = ((v >> 24) & 0xFF).toByte
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    putLe32(2, 54 + dataSize); putLe32(10, 54)
    putLe32(14, 40); putLe32(18, w); putLe32(22, h)
    out(26) = 1; out(28) = 24
    putLe32(34, dataSize)
    var y = 0
    while (y < h) {
      val rowStart = 54 + (h - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < w) {
        val v = pixel(y * w + x).toByte
        val o = rowStart + x * 3
        out(o) = v; out(o + 1) = v; out(o + 2) = v
        x += 1
      }
      y += 1
    }
    out
  }

  /** Feature extraction: byte histogram (16 buckets) + entropy —
    * a real per-byte loop (not a stub), the access pattern an
    * embedding/feature model would use. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val hist = new Array[Long](16)
        var i = 0
        while (i < m.payload.length) {
          hist((m.payload(i) & 0xFF) >> 4) += 1
          i += 1
        }
        val n = math.max(m.payload.length, 1).toDouble
        val entropy = -hist.filter(_ > 0)
          .map { c => val p = c / n; p * math.log(p) / math.log(2) }.sum
        MediaFeatures(m.media_id, m.modality,
          BigDecimal(entropy).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble, hist)
      }
    }
  }

  /** Resize: decimate the payload by `factor` (every factor-th byte)
    * and scale the decoded dimensions to match — the RESIZE STUB (a
    * real resampler replaces the decimation with pixel interpolation;
    * the metadata contract — dims scale, byte length shrinks ~1/f² for
    * images — is what downstream stages depend on and what the spec
    * pins). */
  def resize(media: Dataset[MediaRow], meta: Dataset[MediaMeta],
             factor: Int): DataFrame = {
    import media.sparkSession.implicits._
    // Left join: media rows absent from meta keep flowing (dims 0 =
    // unknown). Dimension scaling applies to images only — audio/text
    // "dims" (channels/sample-rate or hash pseudo-dims) pass through
    // unchanged rather than collapsing to 1×1.
    media.toDF()
      .join(meta.toDF().select("media_id", "width", "height"),
        Seq("media_id"), "left")
      .select(col("media_id"), col("modality"), col("payload"),
        coalesce(col("width"), lit(0)).as("width"),
        coalesce(col("height"), lit(0)).as("height"))
      .as[(Long, String, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, mod, payload, w, h) =>
          // ---- RESIZE STUB: byte decimation stands in for resampling
          val isImage = mod == "image"
          val step = if (isImage) factor * factor else factor
          val out = new Array[Byte]((payload.length + step - 1) / step)
          var i = 0
          while (i < out.length) { out(i) = payload(i * step); i += 1 }
          val (ow, oh) =
            if (isImage && w > 0 && h > 0)
              (math.max(1, w / factor), math.max(1, h / factor))
            else (w, h)
          (id, mod, ow, oh, out)
        }
      }.toDF("media_id", "modality", "width", "height", "payload")
  }

  /** Frame sampling: n evenly-spaced fixed-width slices of the
    * payload (a real video sampler replaces the slice arithmetic with
    * keyframe offsets; the emit-multiple-rows-per-input shape is the
    * point). */
  def sampleFrames(media: Dataset[MediaRow], nFrames: Int,
                   frameBytes: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val len = m.payload.length
      if (len == 0) Iterator.empty
      else (0 until nFrames).iterator.map { f =>
        val start = (len.toLong * f / nFrames).toInt
        val end = math.min(start + frameBytes, len)
        (m.media_id, f, m.payload.slice(start, end))
      }
    }.toDF("media_id", "frame_idx", "frame_payload")
  }
}
