package graft.tools

import graft.Sessions
import graft.scaleops.Dedup
import org.apache.spark.sql.functions._

/** sf0.1-scale witness that the r15 candidate pruning (size-ordered
  * probe, PPJoin index prefix) changes nothing: compares
  * [[Dedup.exactJaccardPairs]] and [[Dedup.containmentPairs]] against
  * the naive all-pairs scan IN SPARK (the DuckDB oracle replays the
  * same comparison at sf0.01 in the gate; at sf0.1 its recursive/
  * quadratic SQL runs for an hour, this runs in minutes).
  * `runMain graft.tools.PairEquivalenceCheck [sfDir]` — prints
  * PAIRCHECK <op> got=N naive=N equal=true|false per operator.
  */
object PairEquivalenceCheck {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local(appName = "pair-equivalence")
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val sh = docs.select(col("doc_id"),
      Dedup.shingles(col("text"), 2).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint(eager = false)
    val base = Sessions.widen(
      sh.select(col("doc_id").as("a"), col("sh").as("sh_a")), col("a"))
      .crossJoin(sh.select(col("doc_id").as("b"), col("sh").as("sh_b")))
      .filter(col("a") < col("b"))
      .withColumn("common",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))

    var allOk = true
    def compare(name: String, got: org.apache.spark.sql.DataFrame,
                naive: org.apache.spark.sql.DataFrame): Unit = {
      val g = got.count()
      val n = naive.count()
      val diff = got.exceptAll(naive).count() + naive.exceptAll(got).count()
      val ok = g == n && diff == 0
      allOk &= ok
      println(s"PAIRCHECK $name got=$g naive=$n symdiff=$diff equal=$ok")
    }
    for (t <- Seq(0.8, 0.5)) {
      compare(s"jaccard_$t",
        Dedup.exactJaccardPairs(docs, "doc_id", "text", 2, t),
        base.withColumn("jaccard", round(col("common") /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
          .filter(col("jaccard") >= t).select("a", "b", "jaccard"))
    }
    compare("containment_0.9",
      Dedup.containmentPairs(docs, "doc_id", "text", 2, 0.9),
      base.withColumn("containment", round(col("common") /
          least(size(col("sh_a")), size(col("sh_b"))), 6))
        .withColumn("jaccard", round(col("common") /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
        .filter(col("containment") >= 0.9)
        .select("a", "b", "containment", "jaccard"))
    println(s"PAIRCHECK ALL ${if (allOk) "EQUAL" else "DIVERGED"}")
    spark.stop()
    if (!allOk) sys.exit(1)
  }
}
