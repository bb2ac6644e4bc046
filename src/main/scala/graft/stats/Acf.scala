package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D5 — per-group autocorrelation function (SURVEY.md §2.4 D5).
  *
  * statsmodels-`acf` semantics (reference data_analysis.py:110-112):
  * the series is null-compacted FIRST (reference data_analysis.py:110
  * drops NaNs before lagging — P6's compact-then-lag rule), then
  *   r_k = Σ_{t>k} (x_t − x̄)(x_{t−k} − x̄) / Σ_t (x_t − x̄)²
  * with x̄ the full-series mean and r_0 = 1.
  *
  * Execution shape: one groupBy for per-group means, a broadcast join
  * back, then a single window pass producing all K lags at once (one
  * physical Window node — same partition/order spec), one final
  * aggregate. Two shuffles on the group key total, independent of K;
  * no per-group driver loops (the reference loops groups × features
  * in Python, data_analysis.py:105-111).
  */
object Acf {

  def acf(df: DataFrame, groupCol: String, orderCols: Seq[Column],
          valueCol: String, nLags: Int): DataFrame = {
    val compact = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol) +: col(valueCol).cast("double").as("x") +:
        orderCols: _*)
    val means = compact.groupBy(groupCol).agg(avg(col("x")).as("mu"))
    val w = Window.partitionBy(groupCol).orderBy(orderCols: _*)
    val withLags = compact
      .join(broadcast(means), groupCol)
      .withColumn("d0", col("x") - col("mu"))
      .select(
        col(groupCol) +: col("d0") +:
          (1 to nLags).map(k => (lag(col("x"), k).over(w) - col("mu")).as(s"d$k")): _*)
    val aggs =
      sum(col("d0") * col("d0")).as("denom") +:
        (1 to nLags).map(k => sum(col("d0") * col(s"d$k")).as(s"num$k"))
    val sums = withLags.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
    // nullif guards the constant-series case (denom = 0): ANSI mode
    // would make the division an error; statsmodels yields NaN there.
    val stackExpr = (1 to nLags)
      .map(k => s"$k, round(num$k / nullif(denom, 0.0d), 6)")
      .mkString(s"stack($nLags, ", ", ", ") as (lag, acf)")
    sums.selectExpr(groupCol, stackExpr)
  }

  /** The single-aggregation formulation via the custom
    * `TypedImperativeAggregate` (see AcfAggregate for the state
    * trade-off): one shuffle, same output shape as `acf`. `ordCol`
    * must be numeric (cast timestamps to `unix_micros` first);
    * `ord2Col` is the deterministic tiebreak for tied ordinals —
    * required for oracle parity whenever the primary order can
    * collide. */
  def acfViaAggregate(df: DataFrame, groupCol: String, ordCol: Column,
                      valueCol: String, nLags: Int,
                      ord2Col: Column = lit(0L)): DataFrame = {
    val agged = df
      .filter(col(valueCol).isNotNull)
      .groupBy(groupCol)
      .agg(graft.functions.AcfAggregate(ordCol, ord2Col,
        col(valueCol).cast("double"), nLags).as("acfs"))
    val stackExpr = (1 to nLags)
      .map(k => s"$k, round(acfs[${k - 1}], 6)")
      .mkString(s"stack($nLags, ", ", ", ") as (lag, acf)")
    agged.selectExpr(groupCol, stackExpr)
  }

  /** DuckDB oracle for `acf` over (table, group, µs-order, value). */
  def oracleSql(table: String, groupCol: String, valueCol: String,
                nLags: Int): String = {
    val lagCols = (1 to nLags)
      .map(k => s"LAG(x, $k) OVER (PARTITION BY $groupCol ORDER BY ord1, ord2) AS x$k")
      .mkString(", ")
    val numSums = (1 to nLags)
      .map(k => s"SUM((x - mu) * (x$k - mu)) AS num$k")
      .mkString(", ")
    val unioned = (1 to nLags)
      .map(k => s"SELECT $groupCol, $k AS lag, ROUND(num$k / denom, 6) AS acf FROM sums")
      .mkString(" UNION ALL ")
    s"""WITH compact AS (
       |  SELECT $groupCol, CAST($valueCol AS DOUBLE) x,
       |    CAST(ts AS TIMESTAMP) ord1, event_id ord2
       |  FROM $table WHERE $valueCol IS NOT NULL),
       |m AS (SELECT $groupCol, AVG(x) mu FROM compact GROUP BY 1),
       |lagged AS (
       |  SELECT c.$groupCol, c.x, m.mu, $lagCols
       |  FROM compact c JOIN m USING ($groupCol)),
       |sums AS (
       |  SELECT $groupCol, SUM((x - mu) * (x - mu)) AS denom, $numSums
       |  FROM lagged GROUP BY 1)
       |$unioned""".stripMargin
  }
}
