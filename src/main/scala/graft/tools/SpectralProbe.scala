package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.scaleops.Multimodal
import graft.sources.Tables

/** One-off: where does multimodal_audio_spectral's sf1 time go —
  * candidate volume, pair volume, per-family breakdown. */
object SpectralProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/repo/target/testdata/sf1"
    val spark = Sessions.local(appName = "spectral-probe")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s -> $r"); r
    }
    val corpus = Tables.load(spark, d, "documents")
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { i =>
          val orig = Multimodal.MediaRow(i, "audio",
            Multimodal.makeToneMixWav(i, twin = false))
          if (i % 10 == 0)
            Iterator(orig, Multimodal.MediaRow(i + 10000000L, "audio",
              Multimodal.makeToneMixWav(i, twin = true)))
          else if (i % 10 == 5)
            Iterator(orig, Multimodal.MediaRow(i + 20000000L, "audio",
              Multimodal.makeToneMixWav(i, twin = false,
                offsetSamples = 48)))
          else Iterator(orig)
        }
      }.localCheckpoint(eager = false)
    val spectral = Multimodal.spectralFingerprints(corpus)
      .localCheckpoint(eager = false)
    time("n hashes")(spectral.count())
    time("distinct hashes")(spectral.select("phash").distinct().count())
    // top hash multiplicities
    val top = spectral.groupBy("phash").count().orderBy(desc("count"))
      .limit(5).collect().map(_.getLong(1)).toSeq
    println(s"top hash multiplicities: $top")
    // banded bucket occupancy
    val bands = 4; val bandBits = 14; val mask = (1L << bandBits) - 1
    val banded = spectral.select(col("media_id"), col("phash"),
      posexplode(array((0 until bands).map(i =>
        shiftright(col("phash"), i * bandBits).bitwiseAND(lit(mask))): _*)))
      .toDF("media_id", "phash", "band", "bval")
    val occ = banded.groupBy("band", "bval").count()
    val cand = occ.agg(sum(col("count") * col("count")).as("c")).head().getLong(0)
    println(s"candidate upper bound (sum n^2): $cand")
    time("planted pairs count")(
      Multimodal.nearDupByPHash(spectral, 3)
        .filter(col("b") === col("a") + lit(10000000L) ||
          col("b") === col("a") + lit(20000000L)).count())
    // r13 shape: single-equality filter, same corpus
    time("r13-shape planted count")(
      Multimodal.nearDupByPHash(spectral, 3)
        .filter(col("b") === col("a") + lit(10000000L)).count())
    // pitch-only corpus (exact r13 corpus)
    val corpus13 = Tables.load(spark, d, "documents")
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { i =>
          val orig = Multimodal.MediaRow(i, "audio",
            Multimodal.makeToneMixWav(i, twin = false))
          if (i % 10 == 0)
            Iterator(orig, Multimodal.MediaRow(i + 10000000L, "audio",
              Multimodal.makeToneMixWav(i, twin = true)))
          else Iterator(orig)
        }
      }.localCheckpoint(eager = false)
    val spectral13 = Multimodal.spectralFingerprints(corpus13)
      .localCheckpoint(eager = false)
    time("r13 corpus n hashes")(spectral13.count())
    time("r13 corpus distinct hashes")(
      spectral13.select("phash").distinct().count())
    time("r13 corpus planted count")(
      Multimodal.nearDupByPHash(spectral13, 3)
        .filter(col("b") === col("a") + lit(10000000L)).count())
    spark.stop()
  }
}
