package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.scaleops.Dedup
import graft.sources.Tables

/** One-off stage timing for the MinHash pipeline. */
object MinHashProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(appName = "minhash-profile")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.load(spark, d, "documents")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    // warm
    docs.count()
    time("shingles only") {
      docs.select(Dedup.shingles(col("text"), 3).as("sh"))
        .select(sum(size(col("sh")))).head()
    }
    val sigs = time("signatures") {
      val s = Dedup.minHashSignatures(docs, "doc_id", col("text")); s.count(); s
    }
    val bands = time("bands") {
      val b = Dedup.lshBands(sigs, "doc_id"); b.count(); b
    }
    val cands = time("candidates") {
      val c = Dedup.candidatePairs(bands, "doc_id"); c.count(); c
    }
    time("full pipeline") {
      Dedup.minHashNearDups(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
