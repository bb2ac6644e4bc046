package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase dynamic pivot: a bounded driver-side distinct discovers
  * the pivot values, then the pivot runs with explicit values so
  * Spark skips its own implicit discovery pass AND the output schema
  * is deterministic (sorted).
  *
  * Scale guard: a pivot's output schema is one column per domain
  * value, so an unbounded domain is an unbounded schema — not a
  * bigger shuffle but a plan that cannot exist. The discovery query
  * is `limit(maxDomain + 1)` so the driver never materializes more
  * than the cap, and the operator fails fast with a diagnosis instead
  * of OOMing mid-collect when a key column (user id, URL…) is passed
  * by mistake.
  */
object DynamicPivot {

  /** Pivot `df` on `pivotCol` (grouped by `groupCols`), applying
    * `agg` per cell, null cells filled with `fill` when given. */
  def pivot(df: DataFrame, groupCols: Seq[String], pivotCol: String,
            agg: Column, fill: Option[Long] = None,
            maxDomain: Int = 10000): DataFrame = {
    val domain = df.select(pivotCol).distinct()
      .limit(maxDomain + 1).collect().map(_.get(0))
    require(domain.length <= maxDomain,
      s"dynamic pivot domain for '$pivotCol' exceeds $maxDomain distinct " +
        "values; a pivot this wide is an unbounded output schema — " +
        "pre-bucket the column or aggregate long-form instead")
    val values = domain.map(String.valueOf).sorted.toSeq
    val pivoted = df.groupBy(groupCols.map(col): _*)
      .pivot(pivotCol, values).agg(agg)
    fill.map(v => pivoted.na.fill(v, values)).getOrElse(pivoted)
  }
}
