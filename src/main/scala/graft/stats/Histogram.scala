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
                     n: Long): Seq[Double] =
    exactQuantilesMulti(df, Seq(column), probs, Map(column -> n))(column)

  /** Multi-column exact quantiles without sorting the data itself:
    * distinct (columnIdx, value) pairs are counted (one shuffle over
    * at-most-|distinct| rows), range-partition-sorted, and walked
    * once with per-partition prefix offsets — the classic
    * distributed order-statistic on a compressed domain. Each
    * column's global positions live at offset = Σ earlier columns'
    * non-null counts. Job count and reducer state are independent of
    * both row count and column count; no RDD row-sort, no
    * single-reducer percentile buffer. */
  def exactQuantilesMulti(df: DataFrame, columns: Seq[String],
                          probs: Seq[Double],
                          ns: Map[String, Long]): Map[String, Seq[Double]] = {
    import df.sparkSession.implicits._
    val present = columns.filter(c => ns(c) > 0)
    if (present.isEmpty)
      return columns.map(c => c -> probs.map(_ => Double.NaN)).toMap

    val entries = present.zipWithIndex.map { case (c, ci) =>
      struct(lit(ci).as("ci"), col(c).cast("double").as("v"))
    }
    val parts = math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    val counts = df
      .select(explode(array(entries: _*)).as("e"))
      .filter(col("e.v").isNotNull)
      .groupBy(col("e.ci").as("ci"), col("e.v").as("v"))
      .agg(count(lit(1)).as("cnt"))
      .repartitionByRange(parts, col("ci"), col("v"))
      .sortWithinPartitions(col("ci"), col("v"))
      .as[(Int, Double, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Pass 1: per-partition total counts → global prefix per partition.
      val partTotals = counts.rdd.mapPartitions { it =>
        var s = 0L; it.foreach(s += _._3); Iterator.single(s)
      }.collect()
      val partPrefix = partTotals.scanLeft(0L)(_ + _)

      // Global target indexes: column offset + interpolation endpoints.
      val offsets = present.map(ns).scanLeft(0L)(_ + _)
      val wanted = for {
        (c, ci) <- present.zipWithIndex
        p <- probs
      } yield {
        val pos = (ns(c) - 1) * p
        val lo = math.floor(pos).toLong
        (c, p) -> (offsets(ci) + lo, offsets(ci) + math.ceil(pos).toLong, pos - lo)
      }
      val targets = wanted
        .flatMap { case (_, (lo, hi, _)) => Seq(lo, hi) }.distinct.sorted
      val targetsB = df.sparkSession.sparkContext.broadcast(targets.toArray)

      // Pass 2: walk each partition once, emitting the values that
      // cover a target index ([running, running+cnt) interval hit).
      val found = counts.rdd.mapPartitionsWithIndex { (pid, it) =>
        val tg = targetsB.value
        var running = partPrefix(pid)
        it.flatMap { case (_, v, cnt) =>
          val from = java.util.Arrays.binarySearch(tg, running) match {
            case i if i >= 0 => i
            case i           => -i - 1
          }
          val hits = Iterator.range(from, tg.length)
            .takeWhile(i => tg(i) < running + cnt)
            .map(i => (tg(i), v)).toVector
          running += cnt
          hits
        }
      }.collect().toMap

      val byCol = wanted.map { case ((c, p), (lo, hi, frac)) =>
        val vlo = found(lo)
        (c, p) -> (vlo + (found(hi) - vlo) * frac)
      }.toMap
      columns.map(c => c ->
        (if (ns(c) == 0) probs.map(_ => Double.NaN)
         else probs.map(p => byCol((c, p))))).toMap
    } finally counts.unpersist(blocking = false)
  }

  /** Auto-bin specs for many columns: one (n, min, max) aggregate
    * pass + one [[exactQuantilesMulti]] sort — the scan count stays
    * O(1) in the number of columns. */
  def autoBinSpecs(df: DataFrame, columns: Seq[String]): Map[String, BinSpec] = {
    val aggs = columns.flatMap(c => Seq(
      count(col(c)).as(s"__n_$c"),
      min(col(c)).cast("double").as(s"__lo_$c"),
      max(col(c)).cast("double").as(s"__hi_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val ns = columns.map(c => c -> r.getAs[Long](s"__n_$c")).toMap
    val qs = exactQuantilesMulti(df, columns, Seq(0.25, 0.75), ns)
    columns.map { c =>
      val n = ns(c)
      val lo = r.getAs[Double](s"__lo_$c")
      val hi = r.getAs[Double](s"__hi_$c")
      val iqr = qs(c)(1) - qs(c)(0)
      c -> binSpecFrom(n, lo, hi, iqr)
    }.toMap
  }

  private def binSpecFrom(n: Long, lo: Double, hi: Double,
                          iqr: Double): BinSpec = {
    val sturges = math.ceil(round9(math.log(n.toDouble) / math.log(2.0) + 1.0)).toLong
    val fd =
      if (iqr > 0 && hi > lo)
        math.ceil(round9((hi - lo) / (2.0 * iqr / math.cbrt(n.toDouble)))).toLong
      else 0L
    BinSpec(n, lo, hi, math.max(math.max(sturges, fd), 1L).toInt)
  }

  /** All columns' histograms in one binning pass: each row emits one
    * (column, bin) struct per non-null column via explode, then a
    * single map-side-combinable groupBy counts every column's bins
    * together. Output: (column_name, bin, cnt). */
  def histogramAll(df: DataFrame, columns: Seq[String]): DataFrame = {
    val specs = autoBinSpecs(df, columns)
    val entries = columns.map { c =>
      val spec = specs(c)
      val bin =
        if (spec.hi > spec.lo)
          least(
            floor((col(c).cast("double") - lit(spec.lo)) / lit(spec.width)),
            lit(spec.nBins - 1L)).cast("int")
        else lit(0)
      struct(lit(c).as("column_name"),
        when(col(c).isNotNull, bin).as("bin"))
    }
    df.select(explode(array(entries: _*)).as("cb"))
      .filter(col("cb.bin").isNotNull)
      .groupBy(col("cb.column_name").as("column_name"),
        col("cb.bin").as("bin"))
      .agg(count(lit(1)).as("cnt"))
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
    // one formula, shared with the multi-column path — the oracle SQL
    // is pinned to binSpecFrom and must never diverge per path
    binSpecFrom(n, lo, hi, iqr)
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
