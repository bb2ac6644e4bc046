package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Resampling an irregular per-group series onto a fixed time grid
  * with last-observation-carried-forward — the alignment step between
  * raw event streams and the fixed-step windowing (W2) a time-series
  * learner consumes. The reference has no resampler (its series are
  * assumed row-regular — SURVEY.md §1.1); this supplies the missing
  * prep for irregular data.
  *
  * Shape: one aggregate for per-group bounds, `sequence()` + explode
  * to materialize each group's grid distributively (no driver loops,
  * no cross join against a global calendar), then the engine's own
  * backward as-of join carries the last value forward. Grid points
  * are exact multiples of `stepUs` (integer arithmetic — same
  * discipline as RangeJoin buckets).
  */
object Resample {

  /** @param tsUsCol  numeric epoch-micros column (same discipline as
    *                 AsOfJoin/RangeJoin)
    * @return (groupCol, grid_us, value) — `value` is the latest
    *         observation at or before each grid point; the first grid
    *         point floors the group's first timestamp to the step, so
    *         it is null exactly when that timestamp is off-grid.
    *         Duplicate (group, ts) rows are collapsed to max(value)
    *         first so the carry is deterministic. */
  def locf(df: DataFrame, groupCol: String, tsUsCol: String,
           valueCol: String, stepUs: Long): DataFrame = {
    require(stepUs > 0, "stepUs must be positive")
    val compact = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(tsUsCol).as("us"))
      .agg(max(col(valueCol)).as("value"))
    val grid = compact.groupBy(groupCol)
      .agg(min(col("us")).as("tmin"), max(col("us")).as("tmax"))
      .select(col(groupCol), explode(sequence(
        col("tmin") - pmod(col("tmin"), lit(stepUs)),
        col("tmax") - pmod(col("tmax"), lit(stepUs)),
        lit(stepUs))).as("us"))
    graft.operators.AsOfJoin.backward(
      grid, compact, keys = Seq(groupCol), tsCol = "us",
      rightValueCols = Seq("value"))
      .withColumnRenamed("us", "grid_us")
  }

  /** Linear interpolation onto the same grid: each grid point blends
    * the surrounding observations,
    * `v = v_prev + (v_next − v_prev)·(t − t_prev)/(t_next − t_prev)`.
    * Both neighbors come from one backward and one forward as-of join,
    * each carrying (observation ts, value) in a single struct fill so
    * timestamp and value can never come from different rows. Grid
    * points outside the observed span (only the floored first point
    * can be) are null; on-observation points return the observation
    * exactly. Rounded to 6 dp — oracle-matchable like every bounded
    * ratio in the engine. */
  def interpolate(df: DataFrame, groupCol: String, tsUsCol: String,
                  valueCol: String, stepUs: Long): DataFrame = {
    require(stepUs > 0, "stepUs must be positive")
    val compact = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(tsUsCol).as("us"))
      .agg(max(col(valueCol)).as("v"))
    val grid = compact.groupBy(groupCol)
      .agg(min(col("us")).as("tmin"), max(col("us")).as("tmax"))
      .select(col(groupCol), explode(sequence(
        col("tmin") - pmod(col("tmin"), lit(stepUs)),
        col("tmax") - pmod(col("tmax"), lit(stepUs)),
        lit(stepUs))).as("us"))
    val prevSide = compact.select(col(groupCol), col("us"),
      col("v").as("v_prev"), col("us").as("t_prev"))
    val nextSide = compact.select(col(groupCol), col("us"),
      col("v").as("v_next"), col("us").as("t_next"))
    val withPrev = graft.operators.AsOfJoin.backward(
      grid, prevSide, keys = Seq(groupCol), tsCol = "us",
      rightValueCols = Seq("v_prev", "t_prev"))
    val withBoth = graft.operators.AsOfJoin.forward(
      withPrev, nextSide, keys = Seq(groupCol), tsCol = "us",
      rightValueCols = Seq("v_next", "t_next"))
    withBoth
      .withColumn("value", round(
        when(col("t_next") === col("t_prev"), col("v_prev"))
          .otherwise(col("v_prev") + (col("v_next") - col("v_prev")) *
            (col("us") - col("t_prev")) / (col("t_next") - col("t_prev"))),
        6))
      .select(col(groupCol), col("us").as("grid_us"), col("value"))
  }
}
