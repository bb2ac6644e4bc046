package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the most recent right row
  * with `rightTs <= leftTs` within the same key (the canonical
  * time-series enrichment join — trades/quotes, event/last-state).
  *
  * Spark has no native as-of join; the preference order (compose
  * built-ins before custom plans) applies cleanly here: tag both
  * sides, union, and take a running `last(_, ignoreNulls)` over one
  * (key, time)-ordered window. Cost = one shuffle of |L|+|R| rows and
  * a linear pass — strictly better than the sort-merge-plus-range
  * backtracking a custom SparkPlan would hand-roll, and it inherits
  * AQE/skew handling for free.
  *
  * Within a key, rows sort by (ts, side) with right-before-left at
  * equal timestamps, so a right row at exactly `leftTs` matches —
  * the same inclusive semantics as DuckDB's `ASOF JOIN ... ON
  * b.ts <= a.ts`, which the oracle uses.
  */
object AsOfJoin {

  /** Forward as-of: for each left row, the EARLIEST right row with
    * `rightTs >= leftTs` (pandas merge_asof direction='forward') —
    * expressed as [[backward]] on negated timestamps, so the two
    * directions cannot drift apart semantically. `tolerance` bounds
    * (rightTs − leftTs). */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              tsCol: String, rightValueCols: Seq[String],
              tolerance: Option[Long] = None): DataFrame = {
    def neg(df: DataFrame) =
      df.withColumn(tsCol, -col(tsCol).cast("long"))
    neg(backward(neg(left), neg(right), keys, tsCol, rightValueCols,
      tolerance))
  }

  /** @param tolerance max allowed (leftTs − rightTs), in the ts
    *                  column's own unit; matches older than this are
    *                  nulled out (pandas merge_asof `tolerance`). */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, rightValueCols: Seq[String],
               tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightValueCols.intersect(leftCols).isEmpty,
      s"right value columns collide with left: " +
        rightValueCols.intersect(leftCols).mkString(","))

    // The whole right row travels as ONE struct so the matched
    // timestamp and its values are always from the same row — filling
    // each value column independently lets a newer right row with a
    // null in one column pass the tolerance check with an
    // older-than-tolerance value in that column.
    val rstruct = struct(
      col(tsCol).cast("long").as("_rts") +: rightValueCols.map(col): _*)
    val taggedRight = right
      .select((keys :+ tsCol).map(col) :+ rstruct.as("_rstruct"): _*)
      .withColumn("_side", lit(0))
    val taggedLeft = left
      .withColumn("_rstruct",
        lit(null).cast(taggedRight.schema("_rstruct").dataType))
      .withColumn("_side", lit(1))
    val unioned = taggedLeft
      .select(leftCols.map(col) :+ col("_rstruct") :+ col("_side"): _*)
      .unionByName(taggedRight.select(
        (keys :+ tsCol).map(col) ++
          leftCols.filterNot((keys :+ tsCol).contains)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          Seq(col("_rstruct"), col("_side")): _*))

    // Right-before-left at equal ts (inclusive match). Among right
    // rows tied on ts the struct itself is the final orderBy key, so
    // `last` picks the same row on every run.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc, col("_rstruct").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("_m", last(col("_rstruct"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val matched = tolerance match {
      case Some(tol) => col("_m").isNotNull &&
        col(tsCol).cast("long") - col("_m").getField("_rts") <= tol
      case None => col("_m").isNotNull
    }
    filled.select(leftCols.map(col) ++
      rightValueCols.map(c => when(matched, col("_m").getField(c)).as(c)): _*)
  }
}
