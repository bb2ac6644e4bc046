package graft

import graft.scaleops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media() = Seq(
    Multimodal.MediaRow(0L, "image", "hello world".getBytes("UTF-8")),
    Multimodal.MediaRow(1L, "audio", Array.fill[Byte](256)(7)),
    Multimodal.MediaRow(2L, "video", (0 until 512).map(_.toByte).toArray))
    .toDS()

  test("decode stub: deterministic dims, images single-frame") {
    val meta = Multimodal.decodeMeta(media()).collect()
      .map(m => m.media_id -> m).toMap
    assert(meta(0L).byte_len == 11)
    assert(meta(0L).n_frames == 1) // image
    assert(meta(1L).n_frames >= 1 && meta(2L).n_frames >= 1)
    val again = Multimodal.decodeMeta(media()).collect()
      .map(m => m.media_id -> m.width).toMap
    assert(meta.map { case (k, v) => k -> v.width } == again) // deterministic
    meta.values.foreach { m =>
      assert(m.width >= 16 && m.width < 1921 && m.height >= 16)
    }
  }

  test("JPEG SOF header parses to real dimensions") {
    // minimal JPEG: SOI, APP0 (16 bytes), SOF0 with h=480 w=640, EOI
    val jpeg = Array[Int](
      0xFF, 0xD8,                                     // SOI
      0xFF, 0xE0, 0x00, 0x04, 0x4A, 0x46,             // APP0 len=4
      0xFF, 0xC0, 0x00, 0x0B, 0x08,                   // SOF0 len=11, prec
      0x01, 0xE0,                                     // height 480
      0x02, 0x80,                                     // width 640
      0x03, 0x01, 0x22, 0x00,                         // comps
      0xFF, 0xD9).map(_.toByte)                       // EOI
    val ds = Seq(Multimodal.MediaRow(9L, "image", jpeg)).toDS()
    val meta = Multimodal.decodeMeta(ds).collect().head
    assert(meta.width == 640 && meta.height == 480 && meta.n_frames == 1)
  }

  test("PNG IHDR parses width/height; truncated or non-IHDR-first rejected") {
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + 4 + 13 + 4)
    bb.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes)
      .putInt(800).putInt(600)                       // width, height (BE)
      .put(8.toByte).put(6.toByte)                   // bit depth, color type
      .put(0.toByte).put(0.toByte).put(0.toByte)     // comp, filter, interlace
      .putInt(0)                                     // CRC (unchecked)
    val ds = Seq(Multimodal.MediaRow(11L, "image", bb.array())).toDS()
    val meta = Multimodal.decodeMeta(ds).collect().head
    assert(meta.width == 800 && meta.height == 600 && meta.n_frames == 1)
    assert(Multimodal.parsePng(bb.array().take(20)).isEmpty)
    val badChunk = bb.array().clone()
    System.arraycopy("IDAT".getBytes, 0, badChunk, 12, 4)
    assert(Multimodal.parsePng(badChunk).isEmpty)
  }

  test("GIF logical screen descriptor parses width/height") {
    val gif = "GIF89a".getBytes ++
      Array[Int](0x40, 0x01, 0xF0, 0x00, 0x00, 0x00, 0x00).map(_.toByte)
    assert(Multimodal.parseGif(gif).contains((320, 240, 1)))
    assert(Multimodal.parseGif("GIF99a1234".getBytes).isEmpty)
  }

  test("WAV RIFF header parses channels/rate/frames") {
    val bb = java.nio.ByteBuffer.allocate(44 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 8).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1)            // PCM
      .putShort(2)            // channels
      .putInt(44100)          // sample rate
      .putInt(44100 * 4)      // byte rate
      .putShort(4)            // block align
      .putShort(16)           // bits
    bb.put("data".getBytes).putInt(8).put(Array.fill[Byte](8)(0))
    val ds = Seq(Multimodal.MediaRow(10L, "audio", bb.array())).toDS()
    val meta = Multimodal.decodeMeta(ds).collect().head
    assert(meta.width == 2)        // channels
    assert(meta.height == 44100)   // sample rate
    assert(meta.n_frames == 2)     // 8 data bytes / blockAlign 4
  }

  test("byte histogram partitions all bytes; entropy bounds") {
    val feats = Multimodal.extractFeatures(media()).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).histogram.sum == 256)
    assert(feats(1L).byte_entropy == 0.0) // constant payload
    assert(feats(2L).byte_entropy == 4.0) // uniform over 16 buckets
    assert(feats(0L).histogram.sum == 11)
  }

  test("resize: image dims scale by factor, other modalities pass through") {
    val meta = Multimodal.decodeMeta(media())
    val resized = Multimodal.resize(media(), meta, factor = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getAs[Array[Byte]](4)))
      .toMap
    val origMeta = meta.collect().map(m => m.media_id -> m).toMap
    resized.foreach { case (id, (mod, w, h, payload)) =>
      if (mod == "image") {
        assert(w == math.max(1, origMeta(id).width / 2))
        assert(h == math.max(1, origMeta(id).height / 2))
      } else { // audio/video dims are not pixels — identity
        assert(w == origMeta(id).width && h == origMeta(id).height)
      }
      val step = if (mod == "image") 4 else 2
      val origLen = origMeta(id).byte_len
      assert(payload.length == (origLen + step - 1) / step)
    }
    assert(resized.size == 3)
  }

  test("resize: media rows missing from meta survive with dims 0") {
    val metaMissing = Multimodal.decodeMeta(media()).filter(_.media_id != 1L)
    val resized = Multimodal.resize(media(), metaMissing, factor = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3))).toMap
    assert(resized.size == 3)        // inner join would have dropped id 1
    assert(resized(1L) == ((0, 0)))  // unknown dims flow through as 0
  }

  test("BMP pixel decode honors row padding, bottom-up order, and BGR channels") {
    // hand-built 2×2 BMP24, bottom-up: image pixels (x,y)→(B,G,R):
    //   (0,0)=(1,2,3)   (1,0)=(4,5,6)
    //   (0,1)=(7,8,9)   (1,1)=(10,11,12)
    // rowBytes = (2*3+3)&~3 = 8 → 2 padding bytes per row (0xEE poison:
    // a decoder that reads them corrupts the sums)
    val data = new Array[Byte](54 + 16)
    def le32(i: Int, v: Int): Unit = (0 until 4).foreach(j => data(i + j) = ((v >> (8 * j)) & 0xFF).toByte)
    data(0) = 'B'; data(1) = 'M'; le32(2, 70); le32(10, 54)
    le32(14, 40); le32(18, 2); le32(22, 2); data(26) = 1; data(28) = 24
    le32(34, 16)
    // bottom-up: file row 0 = image row 1
    val fileBytes = Array[Byte](7, 8, 9, 10, 11, 12, 0xEE.toByte, 0xEE.toByte,
      1, 2, 3, 4, 5, 6, 0xEE.toByte, 0xEE.toByte)
    fileBytes.copyToArray(data, 54)
    val Some((w, h, sr, sg, sb)) = Multimodal.bmpPixels(data)
    assert((w, h) == ((2, 2)))
    assert(sb == 1 + 4 + 7 + 10)  // BMP stores B first
    assert(sg == 2 + 5 + 8 + 11)
    assert(sr == 3 + 6 + 9 + 12)
    assert(Multimodal.parseBmp(data).contains((2, 2, 1)))

    // top-down variant (negative height): same image, rows not flipped
    val td = data.clone()
    (0 until 4).foreach(j => td(22 + j) = ((-2 >> (8 * j)) & 0xFF).toByte)
    val topFirst = Array[Byte](1, 2, 3, 4, 5, 6, 0xEE.toByte, 0xEE.toByte,
      7, 8, 9, 10, 11, 12, 0xEE.toByte, 0xEE.toByte)
    topFirst.copyToArray(td, 54)
    val Some((_, _, tr, tg, tb)) = Multimodal.bmpPixels(td)
    assert((tr, tg, tb) == ((sr, sg, sb)), "top-down must sum identically")
  }

  test("PGM/PPM parse headers with comments; generators round-trip exactly") {
    val withComment = ("P5\n# a comment line\n3 2\n255\n" + "ABCDEF")
      .getBytes("US-ASCII")
    assert(Multimodal.parsePnm(withComment).contains((3, 2, 1)))
    val Some((w, h, sr, _, _)) = Multimodal.pnmPixels(withComment)
    assert((w, h) == ((3, 2)))
    assert(sr == "ABCDEF".getBytes.map(_.toLong).sum)

    // generator → decoder closes the loop at the exact arithmetic
    for (id <- Seq(0L, 7L, 123L)) {
      val (gw, gh) = (4 + (id % 5).toInt, 3 + (id % 4).toInt)
      val expect = (0 until gw * gh).map(p => (id * 31 + p) % 256).sum
      val Some((pw, ph, psr, psg, psb)) =
        Multimodal.pnmPixels(Multimodal.makePgm(id, gw, gh))
      assert((pw, ph) == ((gw, gh)) && psr == expect && psg == expect && psb == expect)
      val Some((bw, bh, bsr, bsg, bsb)) =
        Multimodal.bmpPixels(Multimodal.makeBmp(id, gw, gh))
      assert((bw, bh) == ((gw, gh)) && bsr == expect && bsg == expect && bsb == expect)
      assert(Multimodal.parseBmp(Multimodal.makeBmp(id, gw, gh))
        .contains((gw, gh, 1)))
    }
  }

  test("frame sampling emits n evenly-spaced slices per row") {
    val frames = Multimodal.sampleFrames(media(), nFrames = 4, frameBytes = 8)
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId == Map(0L -> 4L, 1L -> 4L, 2L -> 4L))
    val first = frames.filter($"media_id" === 2L && $"frame_idx" === 1)
      .select("frame_payload").head().getAs[Array[Byte]](0)
    assert(first.length == 8)
    assert(first(0) == 128.toByte) // slice starts at len*1/4 = 128
  }

  test("dHash56: container-invariant (BMP ≡ PGM of same pixels), " +
    "sensitive to a real pixel change, bit layout as documented") {
    def pix(seed: Long)(p: Int): Int =
      (((seed * 31 + p) % 256 + (seed * 2654435761L + p * 40503L) % 127)
        % 256).toInt
    val asBmp = Multimodal.makeGrayBmp(32, 32, pix(5L))
    val asPgm = Multimodal.makeGrayPgm(32, 32, pix(5L))
    val hBmp = Multimodal.dHash56(asBmp).get
    val hPgm = Multimodal.dHash56(asPgm).get
    assert(hBmp == hPgm, "same pixels must hash identically across containers")
    assert((hBmp & ~((1L << 56) - 1)) == 0L, "56-bit hash")
    // independent reference: recompute from block sums directly
    val (_, _, s) = Multimodal.blockGraySums(asPgm).get
    val expected = (for (r <- 0 until 8; c <- 0 until 7
      if s(r * 8 + c + 1) > s(r * 8 + c)) yield 1L << (r * 7 + c)).sum
    assert(hBmp == expected)
    // a heavy pixel change in one block region flips at least one bit
    val perturbed = Multimodal.makeGrayPgm(32, 32,
      p => (pix(5L)(p) + (if (p < 8) 60 else 0)) % 256)
    val hPert = Multimodal.dHash56(perturbed).get
    assert(hPert != hBmp)
    // …but stays within the planted radius the gate row relies on
    assert(java.lang.Long.bitCount(hPert ^ hBmp) <= 3)
    // non-divisible dims refuse (no silent ragged blocks)
    assert(Multimodal.dHash56(Multimodal.makeGrayPgm(30, 32, pix(5L))).isEmpty)
  }

  test("nearDupByPHash: pigeonhole banding finds EXACTLY the " +
    "distance-bounded pairs (vs a brute twin on planted fixtures)") {
    def pix(seed: Long)(p: Int): Int =
      (((seed * 31 + p) % 256 + (seed * 2654435761L + p * 40503L) % 127)
        % 256).toInt
    val rows = (0L until 40L).flatMap { i =>
      val orig = Multimodal.MediaRow(i, "image",
        if (i % 2 == 0) Multimodal.makeGrayPgm(32, 32, pix(i))
        else Multimodal.makeGrayBmp(32, 32, pix(i)))
      if (i % 10 == 0)
        Seq(orig, Multimodal.MediaRow(i + 1000L, "image",
          Multimodal.makeGrayBmp(32, 32,
            p => (pix(i)(p) + (if (p < 8) 60 else 0)) % 256)))
      else Seq(orig)
    }
    val hashes = Multimodal.perceptualHashes(rows.toDS())
    val got = Multimodal.nearDupByPHash(hashes, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute twin over the collected hashes
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(got == brute, "banded pair set must equal the exact set")
    // every planted twin is found
    val planted = hs.map(_._1).filter(i => i % 10 == 0 && i < 1000)
      .map(i => (i, i + 1000L)).toSet
    assert(planted.subsetOf(got), s"missing planted: ${planted -- got}")
  }

  test("makeWav8 round-trips through the real chunk walk; frame " +
    "energies are the exact |s-128| sums") {
    val wav = Multimodal.makeWav8(912, t => (t * 7) % 256)
    // the general header parser sees mono / 8 kHz / 912 frames
    assert(Multimodal.parseWav(wav).contains((1, 8000, 912)))
    // the PCM locator finds the data chunk exactly
    assert(Multimodal.wavPcm8Mono(wav).contains((44, 912)))
    // frame energies match a direct recompute from the sample formula
    val e = Multimodal.wavFrameEnergies(wav).get
    assert(e.length == 57)
    val expect = (0 until 57).map(f =>
      (f * 16 until (f + 1) * 16).map(t => math.abs((t * 7) % 256 - 128))
        .sum.toLong)
    assert(e.toSeq == expect)
    // non-PCM / non-mono / 16-bit payloads refuse (codec stub surface)
    val bb = java.nio.ByteBuffer.allocate(44 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 8).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(2)
      .putInt(44100).putInt(44100 * 4).putShort(4).putShort(16)
    bb.put("data".getBytes).putInt(8).put(Array.fill[Byte](8)(0))
    assert(Multimodal.wavPcm8Mono(bb.array()).isEmpty)
  }

  test("audio energy-contour fingerprint: gain-invariant without " +
    "clipping; onset edit flips at most the two adjacent bits; " +
    "banded near-dup equals brute on planted clips") {
    def samp(seed: Long, patched: Boolean)(t: Int): Int =
      ((((seed + 1) * (t + 7919)) % 65521 % 256 +
        (if (patched && t < 32) 60 else 0)) % 256).toInt
    val base = Multimodal.makeWav8(912, samp(5L, patched = false))
    val h = Multimodal.audioFingerprint56(base).get
    // gain without clipping preserves every gradient sign: halve the
    // deviation from the midpoint (integer floor of a positive scale)
    val gained = Multimodal.makeWav8(912,
      t => 128 + (samp(5L, patched = false)(t) - 128) / 2)
    assert(Multimodal.audioFingerprint56(gained).contains(h))
    // the onset edit (frames 0-1 only) flips <= 2 contour bits
    val edited = Multimodal.makeWav8(912, samp(5L, patched = true))
    val hEdit = Multimodal.audioFingerprint56(edited).get
    assert(java.lang.Long.bitCount(hEdit ^ h) <= 2)
    // banded pass over planted fixtures == brute over the fingerprints
    val rows = (0L until 40L).flatMap { i =>
      val orig = Multimodal.MediaRow(i, "audio",
        Multimodal.makeWav8(912, samp(i, patched = false)))
      if (i % 10 == 0)
        Seq(orig, Multimodal.MediaRow(i + 1000L, "audio",
          Multimodal.makeWav8(912, samp(i, patched = true))))
      else Seq(orig)
    }
    val hashes = Multimodal.audioFingerprints(rows.toDS())
    val got = Multimodal.nearDupByPHash(hashes, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(got == brute, "banded pair set must equal the exact set")
    val planted = hs.map(_._1).filter(i => i % 10 == 0 && i < 1000)
      .map(i => (i, i + 1000L)).toSet
    assert(planted.subsetOf(got), s"missing planted: ${planted -- got}")
  }

  test("dHash56 container invariance extends to entropy formats (r12): " +
    "PNG exact for ANY image; JPEG exact for the DC-only fixture class") {
    def pix(p: Int): Int = ((p * 37 + 11) % 251).toInt
    val asPgm = Multimodal.makeGrayPgm(32, 32, pix)
    val asPng = graft.scaleops.PngCodec.encodeGray(32, 32,
      (x, y) => pix(y * 32 + x))
    assert(Multimodal.dHash56(asPng).get == Multimodal.dHash56(asPgm).get,
      "PNG is lossless - identical hash to the raw container")
    // JPEG: constant 8x8 blocks round-trip exactly (unit quant),
    // so the hash equals the PGM holding the same pixel layout
    def blockVal(b: Int): Int = ((b * 29 + 50) % 256).toInt
    val asJpeg = graft.scaleops.JpegCodec.encodeGrayBlocks(32, 32, blockVal)
    val jpegAsPgm = Multimodal.makeGrayPgm(32, 32,
      p => blockVal((p / 32 / 8) * 4 + (p % 32 / 8)))
    assert(Multimodal.dHash56(asJpeg).get ==
      Multimodal.dHash56(jpegAsPgm).get,
      "exactly-representable JPEG must hash like its raw twin")
    // and the banded near-dup operator sees a planted PNG/BMP twin
    // pair exactly like a raw-only pair (the gate fixture's shape)
    val perturbedPng = graft.scaleops.PngCodec.encodeGray(32, 32,
      (x, y) => (pix(y * 32 + x) + (if (y == 0 && x < 8) 60 else 0)) % 256)
    val hOrig = Multimodal.dHash56(asPgm).get
    val hPert = Multimodal.dHash56(perturbedPng).get
    assert(hPert != hOrig &&
      java.lang.Long.bitCount(hPert ^ hOrig) <= 3)
  }

  test("multi-PGM container walk: frame count, per-frame hashes equal " +
    "single-image hashes; truncated tail stops cleanly") {
    def pix(f: Int, p: Int): Int = ((f * 7919 + p * 31) % 256 + 256) % 256
    val clip = Multimodal.makeMultiPgm(3, 16, 16, pix)
    val hashes = Multimodal.multiPgmFrameHashes(clip)
    assert(hashes.map(_._1) == Seq(0, 1, 2))
    // each frame hashes exactly as the standalone image would
    (0 until 3).foreach { f =>
      val single = Multimodal.dHash56(
        Multimodal.makeGrayPgm(16, 16, p => pix(f, p))).get
      assert(hashes(f)._2 == single, s"frame $f hash mismatch")
    }
    // a truncated final frame is ignored, earlier frames kept
    val cut = java.util.Arrays.copyOfRange(clip, 0, clip.length - 10)
    assert(Multimodal.multiPgmFrameHashes(cut).map(_._1) == Seq(0, 1))
  }

  test("corrupt containers terminate, never hang or crash: WAV chunk " +
    "size past the payload, PGM dims overflowing Int") {
    // WAV whose first chunk claims an unsigned size in [2^31, 2^32):
    // the old Int cast made the walk's step <= 0 (infinite loop)
    val bb = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(56).put("WAVE".getBytes)
    bb.put("junk".getBytes).putInt(0xFFFFFFF7) // unsigned 4294967287
    assert(Multimodal.wavPcm8Mono(bb.array()).isEmpty) // returns, no hang
    // PGM header claiming w*h ~ 2.1e9 (wraps Int negative): the walk
    // must stop cleanly, not throw from copyOfRange
    val evil = "P5 46341 46341 255\n".getBytes ++ Array.fill[Byte](64)(7)
    assert(Multimodal.multiPgmFrameHashes(evil).isEmpty)
    // and a valid frame BEFORE the corrupt one is still returned
    def pix(p: Int): Int = (p * 31) % 256
    val good = Multimodal.makeGrayPgm(16, 16, pix)
    assert(Multimodal.multiPgmFrameHashes(good ++ evil).map(_._1) == Seq(0))
  }

  test("video near-dup: banded aligned-frame pairs equal brute; " +
    "frame-0-patched twins match on all frames") {
    def pix(seed: Long, patched: Boolean)(f: Int, p: Int): Int =
      ((((seed + 1) * (p + 7919 + f * 4099)) % 65521 % 256 +
        (if (patched && f == 0 && p < 8) 60 else 0)) % 256).toInt
    val rows = (0L until 40L).flatMap { i =>
      val orig = Multimodal.MediaRow(i, "video",
        Multimodal.makeMultiPgm(4, 32, 32, pix(i, patched = false)))
      if (i % 10 == 0)
        Seq(orig, Multimodal.MediaRow(i + 1000L, "video",
          Multimodal.makeMultiPgm(4, 32, 32, pix(i, patched = true))))
      else Seq(orig)
    }
    val fh = Multimodal.videoFrameHashes(rows.toDS())
    val got = Multimodal.nearDupByFrameHashes(fh, maxDist = 3, minMatch = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute twin over collected frame hashes
    val hs = fh.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val clips = hs.keys.map(_._1).toSeq.distinct.sorted
    val brute = (for {
      a <- clips; b <- clips if a < b
      nm = (0 until 4).count(f =>
        java.lang.Long.bitCount(hs((a, f)) ^ hs((b, f))) <= 3)
      if nm >= 3
    } yield (a, b) -> nm.toLong).toMap
    assert(got == brute, "banded clip pair set must equal the exact set")
    // every planted twin pairs with all 4 frames matched (3 identical
    // + frame 0 within the radius by construction)
    clips.filter(i => i % 10 == 0 && i < 1000).foreach { i =>
      assert(got.get((i, i + 1000L)).contains(4L), s"twin of $i")
    }
  }

  test("fft matches a naive DFT (random signal, both components)") {
    val n = 64
    val rnd = new scala.util.Random(7)
    val x = Array.fill(n)(rnd.nextDouble() * 2 - 1)
    val re = x.clone()
    val im = new Array[Double](n)
    Multimodal.fft(re, im)
    for (k <- 0 until n) {
      var dr = 0.0
      var di = 0.0
      for (t <- 0 until n) {
        val ang = -2.0 * math.Pi * k * t / n
        dr += x(t) * math.cos(ang)
        di += x(t) * math.sin(ang)
      }
      assert(math.abs(re(k) - dr) < 1e-9 && math.abs(im(k) - di) < 1e-9,
        s"bin $k")
    }
  }

  test("spectral peaks land on the square-wave fundamentals " +
    "(|peak - 512/P| <= 1) for orig and octave twin across many ids") {
    val menu = Array(12, 16, 20, 24, 28, 32, 40, 48)
    for (id <- 0L until 64L; twin <- Seq(false, true)) {
      val a = (id % 8).toInt
      val s = 1 + 2 * (id % 4).toInt
      val div = if (twin) 2 else 1
      val expect = Array.tabulate(4)(k => 512.0 / (menu((a + k * s) % 8) / div))
        .sorted
      val peaks = Multimodal.spectralPeakBins(
        Multimodal.makeToneMixWav(id, twin)).get
      for (j <- 0 until 4)
        assert(math.abs(peaks(j) - expect(j)) <= 1.0,
          s"id=$id twin=$twin peaks=${peaks.toSeq} expect=${expect.toSeq}")
    }
  }

  test("spectral ratio hash is pitch-invariant (octave twin within " +
    "Hamming 3) while the energy contour provably misses (> 3)") {
    var contourMin = Int.MaxValue
    var spectralMax = -1
    for (id <- 0L until 128L) {
      val orig = Multimodal.makeToneMixWav(id, twin = false)
      val tw = Multimodal.makeToneMixWav(id, twin = true)
      val sd = java.lang.Long.bitCount(
        Multimodal.spectralHash56(orig).get ^
          Multimodal.spectralHash56(tw).get)
      val cd = java.lang.Long.bitCount(
        Multimodal.audioFingerprint56(orig).get ^
          Multimodal.audioFingerprint56(tw).get)
      spectralMax = math.max(spectralMax, sd)
      contourMin = math.min(contourMin, cd)
    }
    assert(spectralMax <= 3, s"spectral twin distance up to $spectralMax")
    assert(contourMin > 3, s"contour twin distance as low as $contourMin")
  }
}
