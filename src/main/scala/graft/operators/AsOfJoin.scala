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

    val taggedLeft = left
      .withColumn("_side", lit(1))
      .withColumn("_rts", lit(null).cast("long"))
    val taggedRight = rightValueCols.foldLeft(
      right.select((keys :+ tsCol).map(col) ++ rightValueCols.map(col): _*)
        .withColumn("_side", lit(0))
        .withColumn("_rts", col(tsCol).cast("long"))) { (df, _) => df }
    val unioned = taggedLeft
      .select((leftCols.map(col) :+ col("_side") :+ col("_rts")) ++
        rightValueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
      .unionByName(
        taggedRight.select(
          (keys :+ tsCol).map(col) ++
            leftCols.filterNot((keys :+ tsCol).contains)
              .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
            Seq(col("_side"), col("_rts")) ++ rightValueCols.map(col): _*))

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightValueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }.withColumn("_matched_ts", last(col("_rts"), ignoreNulls = true).over(w))

    val result = filled.filter(col("_side") === 1)
    val toleranced = tolerance match {
      case Some(tol) =>
        val tooOld = col("_matched_ts").isNull ||
          col(tsCol).cast("long") - col("_matched_ts") > tol
        rightValueCols.foldLeft(result) { (df, c) =>
          df.withColumn(c, when(tooOld, lit(null)).otherwise(col(c)))
        }
      case None => result
    }
    toleranced.select((leftCols ++ rightValueCols).map(col): _*)
  }
}
