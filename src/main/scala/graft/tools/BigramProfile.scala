package graft.tools

import graft.Sessions
import graft.scaleops.{TextAnalysis, TrainingData}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Stage timings of the bigram-LM pipeline: `runMain
  * graft.tools.BigramProfile [sfDir] [reps]`. Isolates tokenize,
  * kernel+explode, the two corpus exchanges, and the end-cap window
  * so perf work aims at the measured bottleneck. */
object BigramProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "target/testdata/sf1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Sessions.local(appName = "bigram-profile")

    def docs() = Tables.load(spark, dir, "documents")
    def base() = docs().select(col("doc_id"),
      TextAnalysis.tokens(lower(col("text"))).as("toks"))
    def bigrams() = base()
      .select(col("doc_id"),
        explode(graft.functions.BigramHash.pairs(col("toks"))).as("bg"))
      .select(col("doc_id"), col("bg.h1").as("h1"), col("bg.h2").as("h2"))

    def time(label: String)(f: => Unit): Unit = {
      Sessions.releaseResidue(spark, blocking = true)
      val t0 = System.nanoTime()
      f
      println(f"BIGRAMPROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    (1 to reps).foreach { r =>
      println(s"--- rep $r ---")
      time("tokenize_only") {
        base().select(sum(size(col("toks")))).collect()
      }
      time("kernel_explode") {
        bigrams().select(count(lit(1))).collect()
      }
      time("cbigram_agg") {
        bigrams().groupBy("h1", "h2").agg(count(lit(1)).as("c12"))
          .select(count(lit(1)), sum(col("c12"))).collect()
      }
      time("cuni_agg_stringexplode") {
        base().select(explode(col("toks")).as("term"))
          .select(xxhash64(col("term")).as("h2"))
          .groupBy("h2").agg(count(lit(1)).as("cu"))
          .select(count(lit(1)), sum(col("cu"))).collect()
      }
      time("cuni_agg_kernel") {
        base().select(explode(
            graft.functions.BigramHash.tokenHashes(col("toks"))).as("h2"))
          .groupBy("h2").agg(count(lit(1)).as("cu"))
          .select(count(lit(1)), sum(col("cu"))).collect()
      }
      time("full_lm") {
        TrainingData.bigramCrossEntropy(docs(), "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
      }
      // Rejected variants, measured at the sf1 soak (r11): pre-group
      // by (doc,h1,h2) + long-nanos surprisal sums read 6.65/6.07/5.86
      // vs the shipped two-pass shape's 6.03/5.37/5.66 — the narrow
      // localCheckpoint + extra exchange cost more than the saved
      // second kernel pass (recompute-beats-materialize again).
      time("ppl_buckets_end") {
        graft.queries.Registry.byName("docs_ppl_buckets").run(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
