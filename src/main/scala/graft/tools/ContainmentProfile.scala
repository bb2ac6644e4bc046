package graft.tools

import graft.Sessions
import graft.scaleops.Dedup
import org.apache.spark.sql.functions._

/** Candidate-set accounting for the PPJoin-style containment and
  * jaccard pair operators (dev probe, r15 optimization round):
  * `runMain graft.tools.ContainmentProfile [sfDir]`.
  *
  * Prints, for the registered thresholds (containment 0.9 on bigram
  * shingles; jaccard 0.8), the posting-join fan-out BEFORE distinct,
  * the distinct candidate count (= verification intersects paid),
  * the candidates a positional filter would keep, and the surviving
  * output pairs — the numbers that decide whether candidate pruning
  * ahead of the verify join is worth plan surgery (guide §1.1:
  * measure before optimizing).
  */
object ContainmentProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local(appName = "containment-profile")
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))

    // --- replicate containmentPairs internals (t = 0.9, k = 2) ---
    val t = 0.9
    val sh = docs.select(col("doc_id"),
      sort_array(transform(Dedup.shingles(col("text"), 2),
        x => xxhash64(x))).as("hs"))
      .withColumn("sz", size(col("hs")))
      .filter(col("sz") > 0)
      .localCheckpoint(eager = false)
    val inv = sh.select(col("doc_id"), col("sz"), explode(col("hs")).as("h"))
    val dfreq = inv.groupBy("h").agg(count(lit(1)).as("df"))
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df").asc, col("h").asc)
    val ranked = graft.Sessions.widen(inv.join(dfreq, Seq("h")), col("doc_id"))
      .withColumn("rnk", row_number().over(byRarity))
      .localCheckpoint(eager = false)
    val prefix = ranked
      .filter(col("rnk") <= col("sz") - ceil(col("sz") * lit(t) - lit(0.5)) + 1)

    val joined = prefix.select(col("h"), col("doc_id").as("ida"),
        col("rnk").as("rnk_a"), col("sz").as("sz_a"))
      .join(ranked.select(col("h"), col("doc_id").as("idb"),
        col("rnk").as("rnk_b"), col("sz").as("sz_b")), Seq("h"))
      .filter(col("ida") =!= col("idb"))
    def pairsOf(df: org.apache.spark.sql.DataFrame): Long = df
      .select(least(col("ida"), col("idb")).as("a"),
        greatest(col("ida"), col("idb")).as("b")).distinct().count()
    val fanout = joined.count()
    val cands = pairsOf(joined)
    // orientation: completeness only needs the SMALLER side's prefix
    // to hit the index, so matches where the prefix side is larger
    // are redundant
    val ordered = joined.filter(col("sz_a") < col("sz_b") ||
      (col("sz_a") === col("sz_b") && col("ida") < col("idb")))
    val ordFan = ordered.count()
    val ordCands = pairsOf(ordered)
    // positional (a-side only): common <= szA - rnkA + 1 must reach t*szA
    val ordPosA = pairsOf(ordered.filter(
      col("sz_a") - col("rnk_a") + lit(1) >= col("sz_a") * lit(t) - lit(0.5)))
    // positional (both sides): at the FIRST shared shingle,
    // common <= min(szA - i, szB - j) + 1 >= t * min(szA, szB)
    val ordPosAB = pairsOf(ordered.filter(
      least(col("sz_a") - col("rnk_a"), col("sz_b") - col("rnk_b"))
        + lit(1) >= least(col("sz_a"), col("sz_b")) * lit(t) - lit(0.5)))
    val out = Dedup.containmentPairs(docs, "doc_id", "text", 2, t).count()
    println(f"CONTAIN fanout=$fanout%d distinctCands=$cands%d ordFan=$ordFan%d " +
      f"ordCands=$ordCands%d ordPosA=$ordPosA%d ordPosAB=$ordPosAB%d survivors=$out%d")

    // --- jaccard core (t = 0.8): current candidate count vs survivors ---
    val tj = 0.8
    val prefJ = ranked
      .filter(col("rnk") <= col("sz") - ceil(col("sz") * lit(tj)) + 1)
    val alpha = tj / (1 + tj)
    val joinedJ = prefJ.select(col("h"), col("doc_id").as("ida"),
        col("rnk").as("rnk_a"), col("sz").as("sz_a"))
      .join(prefJ.select(col("h"), col("doc_id").as("idb"),
        col("rnk").as("rnk_b"), col("sz").as("sz_b")), Seq("h"))
      .filter(col("ida") < col("idb"))
    val fanJ = joinedJ.count()
    val candJ = joinedJ
      .filter(col("sz_b") >= col("sz_a") * lit(tj) - lit(0.5) &&
        col("sz_a") >= col("sz_b") * lit(tj) - lit(0.5))
      .filter(least(col("sz_a") - col("rnk_a"), col("sz_b") - col("rnk_b"))
        + lit(1) >= (col("sz_a") + col("sz_b")) * lit(alpha) - lit(0.5))
      .select(col("ida").as("a"), col("idb").as("b")).distinct().count()
    // PPJoin index-prefix variant: probe side keeps the full probing
    // prefix, index side only |y| - ceil(2t/(1+t)*|y|) + 1 tokens, and
    // the index side must be the (size, id)-lexicographically smaller
    val cIdx = 2 * tj / (1 + tj)
    val idxJ = ranked.filter(col("rnk") <=
      col("sz") - ceil(col("sz") * lit(cIdx) - lit(0.5)) + 1)
    val joinedJ2 = prefJ.select(col("h"), col("doc_id").as("ida"),
        col("rnk").as("rnk_a"), col("sz").as("sz_a"))
      .join(idxJ.select(col("h"), col("doc_id").as("idb"),
        col("rnk").as("rnk_b"), col("sz").as("sz_b")), Seq("h"))
      .filter(col("sz_b") < col("sz_a") ||
        (col("sz_b") === col("sz_a") && col("idb") < col("ida")))
    val fanJ2 = joinedJ2.count()
    val candJ2 = joinedJ2
      .filter(col("sz_b") >= col("sz_a") * lit(tj) - lit(0.5))
      .filter(least(col("sz_a") - col("rnk_a"), col("sz_b") - col("rnk_b"))
        + lit(1) >= (col("sz_a") + col("sz_b")) * lit(alpha) - lit(0.5))
      .select(least(col("ida"), col("idb")).as("a"),
        greatest(col("ida"), col("idb")).as("b")).distinct().count()
    val outJ = Dedup.exactJaccardPairs(docs, "doc_id", "text", 2, tj).count()
    println(f"JACCARD fanout=$fanJ%d distinctCands=$candJ%d " +
      f"idxFan=$fanJ2%d idxCands=$candJ2%d survivors=$outJ%d")
    spark.stop()
  }
}
