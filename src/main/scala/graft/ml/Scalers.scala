package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M1/M2 — feature scaling with sklearn-exact semantics.
  *
  * MLlib's `StandardScaler` uses the sample std (ddof=1); sklearn —
  * and therefore the reference (auto_machine_learning.py:15-16) —
  * uses the population std (ddof=0). These column-expression scalers
  * are ddof=0-exact; the MLlib pipeline variant lives in AutoML where
  * protocol-level (not bit-level) equivalence is the contract
  * (SURVEY.md §8.7).
  *
  * Execution: one aggregate pass for all columns' statistics, one
  * broadcast-joined projection — no per-column scans, nothing on the
  * driver but the stats row.
  */
object Scalers {

  /** Fitted affine transform per column: x' = (x − shift) / scale. */
  final case class Fit(stats: Map[String, (Double, Double)]) {
    def transform(df: DataFrame): DataFrame =
      stats.foldLeft(df) { case (d, (c, (shift, scale))) =>
        val s = if (scale == 0.0) 1.0 else scale
        d.withColumn(c, (col(c).cast("double") - lit(shift)) / lit(s))
      }
  }

  /** sklearn StandardScaler: shift = mean, scale = population std. */
  def fitStandard(df: DataFrame, cols: Seq[String]): Fit = {
    val aggs = cols.flatMap(c => Seq(
      avg(col(c)).as(s"${c}__mu"), stddev_pop(col(c)).as(s"${c}__sd")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    Fit(cols.map(c =>
      c -> (r.getAs[Double](s"${c}__mu"), r.getAs[Double](s"${c}__sd"))).toMap)
  }

  /** sklearn MinMaxScaler: x' = (x − min)/(max − min) ∈ [0,1]. */
  def fitMinMax(df: DataFrame, cols: Seq[String]): Fit = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"${c}__lo"),
      max(col(c)).cast("double").as(s"${c}__hi")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    Fit(cols.map { c =>
      val lo = r.getAs[Double](s"${c}__lo")
      c -> (lo, r.getAs[Double](s"${c}__hi") - lo)
    }.toMap)
  }
}
