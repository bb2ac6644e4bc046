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
    // Exact integer floor-division at FULL long range: subtract the
    // non-negative pmod (making the numerator the exact floor
    // multiple, negatives included) and divide in DECIMAL — exact for
    // the integral quotient at any long magnitude. Double division —
    // even of an exact multiple — rounds past 2^53, buckets one off,
    // and silently drops qualifying pairs (e.g. epoch-nanos inputs);
    // integral `div` alone truncates toward zero and mis-buckets
    // negative timestamps.
    def bucketOf(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(width))).cast("decimal(38,0)") /
        lit(width).cast("decimal(38,0)")).cast("long")
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
