package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity-resolution fuzzy self-join: string pairs within a bounded
  * edit distance, found without an all-pairs scan.
  *
  * Scale pattern (the same inverted-index discipline as the n-gram
  * Jaccard PPJoin path): candidate pairs come from a token-keyed
  * self-join — only strings SHARING a word ever meet — and the exact
  * Levenshtein verify runs on candidates only. Token blocking is the
  * classic record-linkage "blocking key"; recall misses only pairs
  * with NO common token, which at distance ≤ 3 over multi-word names
  * requires a typo in every word simultaneously.
  *
  * `maxDf` is the hot-key guard: a token occurring in more than
  * `maxDf` distinct strings ("inc", "the") fans the candidate join
  * out quadratically while carrying almost no linkage signal —
  * capped tokens are dropped from the index (bounded under-recall,
  * never over-match), exactly the contamination-screen trade. */
object FuzzyJoin {

  /** Distinct-string near-match pairs: (a, b, dist) with
    * `lev(a, b) <= maxDist`, `a < b`, over the DISTINCT values of
    * `strCol` (entity resolution runs on the name dictionary, not the
    * row stream — re-attach rows by equi-join on the name afterwards). */
  def nearMatchPairs(df: DataFrame, strCol: String, maxDist: Int,
                     maxDf: Option[Long] = None): DataFrame = {
    val names = df.select(col(strCol).as("name")).distinct()
    val tokens = names.select(col("name"),
      explode(split(col("name"), "\\s+")).as("tok")).distinct()
    // checkpointed: the index feeds both sides of its own self-join —
    // without it the distinct-names scan, explode, and any maxDf
    // anti-join replay once per side
    val index = (maxDf match {
      case None => tokens
      case Some(cap) =>
        val hot = tokens.groupBy("tok").agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("tok")
        tokens.join(broadcast(hot), Seq("tok"), "left_anti")
    }).localCheckpoint(eager = false)
    val cands = index
      .join(index.select(col("tok"), col("name").as("name_b")), "tok")
      .filter(col("name") < col("name_b"))
      .select(col("name").as("name_a"), col("name_b"))
      .distinct()
    cands
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
  }
}
