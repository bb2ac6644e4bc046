package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D1 — auto-binned histogram (SURVEY.md §2.4 D1).
  *
  * Reproduces numpy's `bins='auto'` used by the reference's
  * per-column histogram plots (reference data_analysis.py:44-55):
  * bin width = min(Sturges width, Freedman–Diaconis width), i.e.
  * bin count = max(ceil(log2 n + 1), ceil(range / (2·IQR·n^{-1/3}))),
  * equal-width over [min, max], last bin right-closed.
  *
  * Job shape: one multi-aggregate pass for (n, min, max), the
  * distributed-sort exact-quantile lookup for the IQR (a sample job,
  * a range-partitioned sort, and an O(|probs|) boundary collect —
  * see [[exactQuantiles]]), then one map-side-combinable groupBy on
  * the bin index. ~5 jobs per column, every one distributed; no
  * single-reducer percentile state, no driver-side data beyond the
  * bin spec.
  *
  * Intermediates are rounded to 9 dp before `ceil` so a 1-ulp libm
  * difference (log2/cbrt across engines) cannot flip a bin count —
  * the oracle SQL applies the identical rounding.
  */
object Histogram {

  final case class BinSpec(n: Long, lo: Double, hi: Double, nBins: Int) {
    def width: Double = (hi - lo) / nBins
  }

  /** Exact quantiles by distributed sort + positional lookup, with
    * numpy/`quantile_cont` linear interpolation at (n−1)·p. Unlike
    * the `percentile` aggregate — whose buffer is every distinct
    * value on ONE reducer — the sort is a range-partitioned shuffle
    * and the lookup collects only the O(|probs|) boundary values, so
    * the op stays distributed on a distinct-heavy column at any
    * scale. */
  def exactQuantiles(df: DataFrame, column: String, probs: Seq[Double],
                     n: Long): Seq[Double] = {
    if (n == 0) return probs.map(_ => Double.NaN)
    val sorted = df.filter(col(column).isNotNull)
      .select(col(column).cast("double")).rdd.map(_.getDouble(0))
      .sortBy(identity).zipWithIndex().map(_.swap)
    val wanted = probs.map { p =>
      val pos = (n - 1) * p
      val lo = math.floor(pos).toLong
      p -> (lo, math.ceil(pos).toLong, pos - lo)
    }
    val idxs = wanted.flatMap { case (_, (lo, hi, _)) => Seq(lo, hi) }.toSet
    val found = sorted.filter { case (i, _) => idxs.contains(i) }
      .collect().toMap
    wanted.map { case (_, (lo, hi, frac)) =>
      val vlo = found(lo)
      vlo + (found(hi) - vlo) * frac
    }
  }

  /** @param exactQuantiles exact IQR via the distributed sort above —
    *        oracle parity without single-reducer percentile state; the
    *        approximate sketch remains as the cheap path (bin counts
    *        shift by at most ±1 on pathological IQRs). */
  def autoBinSpec(df: DataFrame, column: String,
                  exactQuantiles: Boolean = true): BinSpec = {
    val baseAggs = Seq(
      count(col(column)).as("n"),
      min(col(column)).cast("double").as("lo"),
      max(col(column)).cast("double").as("hi"))
    val qAggs =
      if (exactQuantiles) Nil
      else Seq(
        expr(s"approx_percentile($column, 0.25, 10000)").cast("double").as("q1"),
        expr(s"approx_percentile($column, 0.75, 10000)").cast("double").as("q3"))
    val aggs = baseAggs ++ qAggs
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getAs[Long]("n")
    val lo = r.getAs[Double]("lo")
    val hi = r.getAs[Double]("hi")
    val iqr =
      if (exactQuantiles) {
        val qs = this.exactQuantiles(df, column, Seq(0.25, 0.75), n)
        qs(1) - qs(0)
      } else r.getAs[Double]("q3") - r.getAs[Double]("q1")
    val sturges = math.ceil(round9(math.log(n.toDouble) / math.log(2.0) + 1.0)).toLong
    val fd =
      if (iqr > 0 && hi > lo)
        math.ceil(round9((hi - lo) / (2.0 * iqr / math.cbrt(n.toDouble)))).toLong
      else 0L
    BinSpec(n, lo, hi, math.max(math.max(sturges, fd), 1L).toInt)
  }

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Equal-width bin counts: (bin, cnt), bin ∈ [0, nBins). Values at
    * the top edge fold into the last bin (numpy right-closed last
    * bin). */
  def histogram(df: DataFrame, column: String): DataFrame = {
    val spec = autoBinSpec(df, column)
    // Degenerate range (constant column): everything in bin 0 — and no
    // division at all, since Spark 4's ANSI mode makes x/0 an error.
    val binExpr =
      if (spec.hi > spec.lo)
        least(
          floor((col(column).cast("double") - lit(spec.lo)) / lit(spec.width)),
          lit(spec.nBins - 1L)).cast("int")
      else lit(0)
    df.filter(col(column).isNotNull)
      .select(binExpr.as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("cnt"))
  }

  /** The oracle-SQL template computing the same histogram in DuckDB. */
  def oracleSql(table: String, column: String): String =
    s"""WITH s AS (
       |  SELECT COUNT($column) n, CAST(MIN($column) AS DOUBLE) lo,
       |    CAST(MAX($column) AS DOUBLE) hi,
       |    quantile_cont($column, 0.25) q1, quantile_cont($column, 0.75) q3
       |  FROM $table WHERE $column IS NOT NULL),
       |b AS (
       |  SELECT n, lo, hi,
       |    GREATEST(
       |      CAST(CEIL(ROUND(LOG2(n) + 1, 9)) AS BIGINT),
       |      CASE WHEN q3 > q1 AND hi > lo
       |        THEN CAST(CEIL(ROUND((hi - lo) / (2 * (q3 - q1) / CBRT(n)), 9)) AS BIGINT)
       |        ELSE 0 END,
       |      1) nb
       |  FROM s)
       |SELECT CAST(LEAST(FLOOR((CAST($column AS DOUBLE) - lo) / ((hi - lo) / nb)), nb - 1) AS INT) AS bin,
       |  COUNT(*) AS cnt
       |FROM $table, b WHERE $column IS NOT NULL GROUP BY 1""".stripMargin
}
