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
}
