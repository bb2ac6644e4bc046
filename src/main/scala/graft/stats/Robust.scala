package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust anomaly detection via the median absolute deviation — the
  * data-quality screen that survives what breaks z-scores: a mean/σ
  * pair is itself dragged by the outliers it is supposed to flag
  * (masking), while the median and MAD have a 50% breakdown point.
  * The classic rule: x is anomalous iff |x − median| > k·1.4826·MAD
  * (1.4826 scales MAD to σ under normality, Hampel's consistency
  * constant).
  *
  * Exactly two corpus passes, inherent to exact MAD (the second
  * median is over deviations FROM the first): pass 1 computes the
  * per-group median, pass 2 the deviation median + outlier counts.
  * Both medians are exact `percentile` aggregates (≡ DuckDB
  * `quantile_cont`, the equivalence the quantile queries pin), the
  * group medians broadcast back — no row ever shuffles twice. For a
  * sketch-based single-pass variant at 100 TB, the KLL aggregate is
  * the drop-in (rank error ≤ 5% certified) — this operator is the
  * exact twin that certifies it.
  */
object Robust {

  /** @return per-group (n, med, mad, n_outliers, max_absdev) with the
    *         k·1.4826·MAD rule applied; medians exact. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 3.0): DataFrame = {
    val v = col(valueCol).cast("double")
    val med = df.groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val dev = df.select(col(groupCol), v.as("v"))
      .join(broadcast(med), groupCol)
      .withColumn("absdev", abs(col("v") - col("med")))
      .localCheckpoint(eager = false) // feeds the MAD agg AND the report
    val mad = dev.groupBy(groupCol)
      .agg(expr("percentile(absdev, 0.5)").as("mad"))
    dev.join(broadcast(mad), groupCol)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        round(min(col("med")), 6).as("med"),
        round(min(col("mad")), 6).as("mad"),
        sum(when(col("absdev") > lit(k * 1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"),
        round(max(col("absdev")), 6).as("max_absdev"))
  }
}
