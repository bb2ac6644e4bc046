package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling / lag feature engineering for grouped time series — the
  * feature stage a time-series AutoML pipeline feeds its learners
  * (extends the reference's fixed W2 windowing with the standard
  * rolling-statistic family).
  *
  * All features share one (group, order) window partitioning: a
  * single shuffle produces every column, and window state is O(max
  * window), independent of series length.
  */
object RollingFeatures {

  def features(df: DataFrame, groupCol: String, orderCols: Seq[Column],
               valueCol: String, windows: Seq[Int] = Seq(3, 10)): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCols: _*)
    val v = col(valueCol)
    val base = df
      .withColumn("lag_1", lag(v, 1).over(w))
      .withColumn("diff_1", round(v - lag(v, 1).over(w), 6))
    windows.foldLeft(base) { (d, n) =>
      val frame = w.rowsBetween(-(n - 1), 0)
      d.withColumn(s"roll_mean_$n", round(avg(v).over(frame), 6))
        .withColumn(s"roll_min_$n", min(v).over(frame))
        .withColumn(s"roll_max_$n", max(v).over(frame))
        .withColumn(s"roll_count_$n", count(v).over(frame))
    }
  }

  /** Exponentially-weighted moving average per group —
    * order-dependent recurrence (`e_t = α·x_t + (1−α)·e_{t−1}`) that
    * window frames can't express. The scalable formulation:
    * repartition by group, sortWithinPartitions by (group, order),
    * then one sequential `mapPartitions` scan — each partition holds
    * whole groups in order, state is O(1) per group, no driver
    * collection. (This is the disciplined escape hatch of the
    * preference order — (d) in SURVEY.md's custom-op ranking.)
    */
  def ewma(df: DataFrame, groupCol: String, orderCols: Seq[Column],
           valueCol: String, alpha: Double, idCol: String): DataFrame = {
    import df.sparkSession.implicits._
    groupIntegral(df, groupCol)
    val prepped = df
      .select(col(groupCol).cast("long").as("g") +:
        col(idCol).cast("long").as("id") +:
        col(valueCol).cast("double").as("x") +: orderCols: _*)
      .transform(graft.Sessions.widen(_, col("g"))) // explicit count (r15)
      .sortWithinPartitions(col("g") +: orderCols: _*)
      .select("g", "id", "x")
      .as[(Long, Long, Double)]
    prepped.mapPartitions { rows =>
      // First-row state is an explicit flag, not a sentinel group
      // value — a group keyed Long.MinValue must still seed with x.
      var seen = false
      var curGroup = 0L
      var state = 0.0
      rows.map { case (g, id, x) =>
        if (!seen || g != curGroup) { seen = true; curGroup = g; state = x }
        else state = alpha * x + (1 - alpha) * state
        // BigDecimal(double) is shortest-repr decimal + HALF_UP — the
        // same semantics as Spark's round(), hence oracle-matchable.
        (g, id, x, BigDecimal(state)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toDF(groupCol + "_g", idCol + "_i", "x", "ewma")
      .withColumnRenamed(groupCol + "_g", groupCol)
      .withColumnRenamed(idCol + "_i", idCol)
  }

  /** The ewma state carrier keys groups by a long — a fractional or
    * string group column would silently truncate/collide under the
    * cast, so require an integral type up front. */
  /** Holt linear-trend (double exponential) smoothing per group — the
    * level+trend recurrence one order up from [[ewma]]:
    * `l_t = α·x_t + (1−α)(l_{t−1}+b_{t−1})`,
    * `b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}`, seeded l₀=x₀, b₀=0; the
    * one-step-ahead forecast is l+b (the trend-aware baseline the
    * seasonal-naive backtest lacks). Same scalable formulation as
    * ewma: repartition by group, sortWithinPartitions, one sequential
    * mapPartitions scan with O(1) state per group — no window frame
    * expresses a two-variable recurrence, no driver collection at any
    * scale. State stays full-precision; only outputs round (the
    * oracle replays every step with identical IEEE expressions via a
    * recursive CTE). */
  def holt(df: DataFrame, groupCol: String, orderCols: Seq[Column],
           valueCol: String, alpha: Double, beta: Double,
           idCol: String): DataFrame = {
    import df.sparkSession.implicits._
    groupIntegral(df, groupCol)
    val prepped = df
      .select(col(groupCol).cast("long").as("g") +:
        col(idCol).cast("long").as("id") +:
        col(valueCol).cast("double").as("x") +: orderCols: _*)
      .transform(graft.Sessions.widen(_, col("g"))) // explicit count (r15)
      .sortWithinPartitions(col("g") +: orderCols: _*)
      .select("g", "id", "x")
      .as[(Long, Long, Double)]
    prepped.mapPartitions { rows =>
      var seen = false
      var curGroup = 0L
      var l = 0.0
      var b = 0.0
      def r6(v: Double): Double = BigDecimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      rows.map { case (g, id, x) =>
        if (!seen || g != curGroup) {
          seen = true; curGroup = g; l = x; b = 0.0
        } else {
          val lNew = alpha * x + (1 - alpha) * (l + b)
          val bNew = beta * (lNew - l) + (1 - beta) * b
          l = lNew; b = bNew
        }
        (g, id, x, r6(l), r6(b), r6(l + b))
      }
    }.toDF(groupCol + "_g", idCol + "_i", "x", "level", "trend", "forecast")
      .withColumnRenamed(groupCol + "_g", groupCol)
      .withColumnRenamed(idCol + "_i", idCol)
  }

  /** Two-sided CUSUM change detection per group (Page 1954): with
    * dev = x − μ_g (μ_g the group mean, decimal-exact so both engines
    * hold identical bits),
    *
    *   s⁺_t = max(0, s⁺_{t−1} + dev_t − slack)
    *   s⁻_t = max(0, s⁻_{t−1} − dev_t − slack),  s⁺₀ = s⁻₀ = 0
    *
    * and an alarm where either side exceeds `threshold`. Slack and
    * threshold are in raw value units — the deliberately
    * σ-free formulation, so every arithmetic step is reproducible
    * (a σ-standardized variant would fold an engine-specific stddev
    * summation order into every state). Same scalable shape as
    * [[ewma]]: one keyed aggregate for μ, one repartition+sorted
    * partition scan, O(1) state per group. The oracle replays the
    * fold with `list_reduce` over a zero-seeded prefix list. */
  def cusum(df: DataFrame, groupCol: String, orderCols: Seq[Column],
            valueCol: String, slack: Double, threshold: Double,
            idCol: String): DataFrame = {
    import df.sparkSession.implicits._
    groupIntegral(df, groupCol)
    val mu = df.groupBy(groupCol).agg(
      (sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .cast("double") / count(lit(1))).as("mu"))
    val prepped = df.join(mu, groupCol)
      .select(col(groupCol).cast("long").as("g") +:
        col(idCol).cast("long").as("id") +:
        col(valueCol).cast("double").as("x") +:
        col("mu") +: orderCols: _*)
      .transform(graft.Sessions.widen(_, col("g"))) // explicit count (r15)
      .sortWithinPartitions(col("g") +: orderCols: _*)
      .select("g", "id", "x", "mu")
      .as[(Long, Long, Double, Double)]
    prepped.mapPartitions { rows =>
      var seen = false
      var curGroup = 0L
      var sPos = 0.0
      var sNeg = 0.0
      def r6(v: Double): Double = BigDecimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      rows.map { case (g, id, x, m) =>
        if (!seen || g != curGroup) { seen = true; curGroup = g; sPos = 0.0; sNeg = 0.0 }
        val dev = x - m
        sPos = math.max(0.0, sPos + dev - slack)
        sNeg = math.max(0.0, sNeg - dev - slack)
        (g, id, x, r6(sPos), r6(sNeg),
          sPos > threshold || sNeg > threshold)
      }
    }.toDF(groupCol + "_g", idCol + "_i", "x", "cusum_pos", "cusum_neg", "alarm")
      .withColumnRenamed(groupCol + "_g", groupCol)
      .withColumnRenamed(idCol + "_i", idCol)
  }

  /** DuckDB twin of [[cusum]] (constants interpolated through Scala
    * double toString — shortest-round-trip, identical bits). */
  def cusumOracleSql(table: String, groupCol: String, valueCol: String,
                     slack: Double, threshold: Double,
                     filterSql: String): String =
    s"""WITH m AS (
       |  SELECT $groupCol,
       |    CAST(CAST(SUM(CAST($valueCol AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS mu
       |  FROM $table WHERE $filterSql GROUP BY 1),
       |o AS (
       |  SELECT e.$groupCol, event_id, $valueCol AS x,
       |    list($valueCol - mu) OVER (PARTITION BY e.$groupCol
       |      ORDER BY CAST(ts AS TIMESTAMP), event_id
       |      ROWS UNBOUNDED PRECEDING) AS pfx
       |  FROM $table e JOIN m USING ($groupCol) WHERE $filterSql)
       |SELECT $groupCol, event_id, x,
       |  ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), pfx),
       |    (acc, z) -> GREATEST(CAST(0.0 AS DOUBLE), acc + z - CAST($slack AS DOUBLE))), 6) AS cusum_pos,
       |  ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), pfx),
       |    (acc, z) -> GREATEST(CAST(0.0 AS DOUBLE), acc - z - CAST($slack AS DOUBLE))), 6) AS cusum_neg,
       |  (list_reduce(list_prepend(CAST(0.0 AS DOUBLE), pfx),
       |    (acc, z) -> GREATEST(CAST(0.0 AS DOUBLE), acc + z - CAST($slack AS DOUBLE))) > CAST($threshold AS DOUBLE)
       |   OR list_reduce(list_prepend(CAST(0.0 AS DOUBLE), pfx),
       |    (acc, z) -> GREATEST(CAST(0.0 AS DOUBLE), acc - z - CAST($slack AS DOUBLE))) > CAST($threshold AS DOUBLE)) AS alarm
       |FROM o""".stripMargin

  private def groupIntegral(df: DataFrame, groupCol: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(groupCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"ewma group column '$groupCol' must be integral, got $dt")
  }

  /** DuckDB oracle template over the events table. */
  def oracleSql(table: String, groupCol: String, valueCol: String,
                windows: Seq[Int], filterSql: String): String = {
    val rollCols = windows.map { n =>
      s"""ROUND(AVG($valueCol) OVER (PARTITION BY $groupCol ORDER BY CAST(ts AS TIMESTAMP), event_id
         |    ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW), 6) AS roll_mean_$n,
         |  MIN($valueCol) OVER (PARTITION BY $groupCol ORDER BY CAST(ts AS TIMESTAMP), event_id
         |    ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW) AS roll_min_$n,
         |  MAX($valueCol) OVER (PARTITION BY $groupCol ORDER BY CAST(ts AS TIMESTAMP), event_id
         |    ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW) AS roll_max_$n,
         |  COUNT($valueCol) OVER (PARTITION BY $groupCol ORDER BY CAST(ts AS TIMESTAMP), event_id
         |    ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW) AS roll_count_$n""".stripMargin
    }.mkString(",\n  ")
    s"""SELECT $groupCol, event_id, $valueCol AS value,
       |  LAG($valueCol) OVER (PARTITION BY $groupCol ORDER BY CAST(ts AS TIMESTAMP), event_id) AS lag_1,
       |  ROUND($valueCol - LAG($valueCol) OVER (PARTITION BY $groupCol ORDER BY CAST(ts AS TIMESTAMP), event_id), 6) AS diff_1,
       |  $rollCols
       |FROM $table WHERE $filterSql""".stripMargin
  }
}
