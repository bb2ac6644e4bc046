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

  /** REAL pixel-decode certification (no stub anywhere in this
    * query): the engine fabricates genuine BMP24 / binary-PGM
    * payloads — real headers, bottom-up rows, 4-byte BMP row padding
    * — whose pixel (x,y) carries (doc_id·31 + y·w + x) mod 256,
    * decodes them back through [[Multimodal.decodePixels]]'s
    * byte-layout decoders, and the oracle recomputes the channel sums
    * purely arithmetically. Any padding, row-order, or header-offset
    * bug shifts the sums and breaks the hash; `dims_match` pins the
    * parsed header against the generating dimensions. */
  def mediaDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val imgs = Tables.load(s, d, "documents")
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { i =>
          val w = 4 + (i % 5).toInt
          val h = 3 + (i % 4).toInt
          val payload =
            if (i % 2 == 0) Multimodal.makePgm(i, w, h)
            else Multimodal.makeBmp(i, w, h)
          Multimodal.MediaRow(i, "image", payload)
        }
      }
    Multimodal.decodePixels(imgs).toDF()
      .groupBy("fmt")
      .agg(count(lit(1)).as("n"),
        sum(col("n_pixels")).as("n_pixels"),
        sum(col("sum_r")).as("sum_gray"),
        min(col("sum_r") === col("sum_g") && col("sum_g") === col("sum_b"))
          .as("channels_equal"),
        min(col("width") === lit(4) + pmod(col("media_id"), lit(5)) &&
          col("height") === lit(3) + pmod(col("media_id"), lit(4)))
          .as("dims_match"))
  }

  val mediaDecodeOracle: String =
    """WITH d AS (
      |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, w * h AS np,
      |    list_sum(list_transform(generate_series(0, w * h - 1),
      |      p -> (doc_id * 31 + p) % 256)) AS s
      |  FROM d)
      |SELECT CASE WHEN doc_id % 2 = 0 THEN 'pnm' ELSE 'bmp' END AS fmt,
      |  COUNT(*) AS n, CAST(SUM(np) AS BIGINT) AS n_pixels,
      |  CAST(SUM(s) AS BIGINT) AS sum_gray,
      |  TRUE AS channels_equal, TRUE AS dims_match
      |FROM px GROUP BY 1""".stripMargin

  val all: Seq[Q] = Seq(
    Q("multimodal_bytes", mediaBytes, Some(mediaBytesOracle)),
    Q("multimodal_pipeline", mediaPipeline, Some(mediaPipelineOracle)),
    Q("multimodal_decode", mediaDecode, Some(mediaDecodeOracle)))
}
