package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: all pairs (l, r) sharing `keys` with
  * r.ts ∈ [l.ts − before, l.ts + after] (bounds inclusive, numeric
  * timestamps).
  *
  * The naive formulation — equi-join on the key plus a range filter —
  * degenerates into a per-key cross product whenever a key is hot
  * (every pair of that key's rows is materialized before the filter).
  * This implementation bucketizes time by a width of exactly
  * `before + after`: a left row's admissible window then overlaps at
  * most TWO buckets, so the left side is exploded to ≤ 2 (key, bucket)
  * rows, the right side is keyed by its own bucket, and the join is a
  * plain equi-join on (keys, bucket) followed by the exact range
  * predicate. Shuffle volume is O(|L| + |R|) rows regardless of key
  * skew, and each qualifying pair is produced exactly once (the right
  * row lives in one bucket; the left row's ≤ 2 bucket copies are
  * distinct).
  *
  * Both timestamp columns must be numeric (epoch micros via
  * `unix_micros`, epoch millis, ...) — the same discipline as
  * [[AsOfJoin]].
  */
object RangeJoin {

  /** Inner range join returning matched pairs. Column collisions are
    * the caller's to avoid (rename the right side's columns first). */
  def inner(left: DataFrame, right: DataFrame, keys: Seq[String],
            leftTs: String, rightTs: String,
            before: Long, after: Long): DataFrame = {
    require(before >= 0 && after >= 0 && before + after > 0,
      s"window [−$before, +$after] must be non-negative and non-empty")
    val width = before + after
    // Exact integer floor-division: (x − (x mod W)) / W — the
    // numerator is an exact multiple of W, so the double division is
    // exact. A plain floor(x / W) can round across a bucket boundary
    // and silently drop a qualifying pair.
    def bucketOf(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(width))) / lit(width)).cast("long")
    val l = left.withColumn("_bucket",
      explode(array_distinct(array(
        bucketOf(col(leftTs) - lit(before)),
        bucketOf(col(leftTs) + lit(after))))))
    val r = right.withColumn("_bucket", bucketOf(col(rightTs)))
    l.join(r, keys :+ "_bucket")
      .filter(col(rightTs) >= col(leftTs) - lit(before) &&
        col(rightTs) <= col(leftTs) + lit(after))
      .drop("_bucket")
  }
}
