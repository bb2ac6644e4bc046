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

  /** ---- DECODE STUB ----
    * A real implementation parses the container header (JPEG/WAV/
    * MP4). The stub derives deterministic pseudo-dimensions from the
    * payload bytes so downstream plumbing has stable, testable
    * values. Runs per partition: one iterator pass, no per-row task
    * overhead — the shape a JNI decoder needs. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val n = m.payload.length
        val h = m.payload.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xFF))
        MediaMeta(m.media_id, m.modality, n,
          width = 16 + math.floorMod(h, 1905).toInt,
          height = 16 + math.floorMod(h >> 11, 1065).toInt,
          n_frames = if (m.modality == "image") 1
          else 1 + math.floorMod(h >> 22, 299).toInt)
      }
    }
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
