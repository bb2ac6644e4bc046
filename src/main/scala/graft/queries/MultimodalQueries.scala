package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.scaleops.Multimodal
import graft.sources.Tables

/** Multimodal plumbing queries: the binary-column schema path is
  * oracle-checked (byte lengths / modality routing are pure SQL); the
  * decode/feature stages are rows-only (their stub values are pinned
  * by MultimodalSpec instead). */
object MultimodalQueries {

  private def media(s: SparkSession, d: String) =
    Multimodal.fromDocuments(Tables.load(s, d, "documents"), "doc_id", "text")

  def mediaBytes(s: SparkSession, d: String): DataFrame =
    media(s, d).select(
      col("media_id"), col("modality"),
      octet_length(col("payload")).as("byte_len"),
      ascii(substring(decode(col("payload"), "UTF-8"), 1, 1)).as("first_byte"))

  val mediaBytesOracle: String =
    """SELECT doc_id AS media_id,
      |  (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS modality,
      |  CAST(octet_length(encode(text)) AS INT) AS byte_len,
      |  ascii(substr(text, 1, 1)) AS first_byte
      |FROM documents""".stripMargin

  /** Decode + feature-extract stages over the typed Dataset
    * boundary, aggregated per modality and CERTIFIED: row counts and
    * total payload bytes are recomputed by the oracle (byte_len must
    * survive the decode stage unchanged — octet_length(encode(text))
    * in SQL), while the engine witnesses the decode/feature
    * contracts the stub values must honor: positive dimensions,
    * entropy within [0, 8] bits/byte (real per-byte computation),
    * and single-frame images. Stub VALUES are pinned by
    * MultimodalSpec. */
  def mediaPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = media(s, d).as[Multimodal.MediaRow]
    val meta = Multimodal.decodeMeta(m).toDF()
    val feats = Multimodal.extractFeatures(m).toDF()
    meta.join(feats, Seq("media_id", "modality"))
      .groupBy("modality")
      .agg(count(lit(1)).as("n"),
        sum(col("byte_len")).as("total_bytes"),
        min(col("width") > 0 && col("height") > 0).as("dims_ok"),
        min(col("byte_entropy") >= 0 && col("byte_entropy") <= 8)
          .as("entropy_ok"),
        min(col("modality") =!= "image" || col("n_frames") === 1)
          .as("image_single_frame_ok"))
  }

  val mediaPipelineOracle: String =
    """SELECT (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS modality,
      |  COUNT(*) AS n,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  TRUE AS dims_ok, TRUE AS entropy_ok,
      |  TRUE AS image_single_frame_ok
      |FROM documents GROUP BY 1""".stripMargin

  val all: Seq[Q] = Seq(
    Q("multimodal_bytes", mediaBytes, Some(mediaBytesOracle)),
    Q("multimodal_pipeline", mediaPipeline, Some(mediaPipelineOracle)))
}
