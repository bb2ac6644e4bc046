package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D3 — Pearson correlation of each feature against the label in a
  * single aggregate pass (reference `corrwith`,
  * data_analysis.py:125-139: one loop per column; here one scan total
  * regardless of column count — the formulation that survives 100 TB).
  */
object Correlation {

  /** Wide result: one row, a `corr_<feature>` column per feature. */
  def corrWithWide(df: DataFrame, features: Seq[String], label: String): DataFrame =
    df.agg(
      round(corr(col(features.head), col(label)), 6).as(s"corr_${features.head}"),
      features.tail.map(f => round(corr(col(f), col(label)), 6).as(s"corr_$f")): _*)

  /** Long result: (feature, r) — one row per feature, still one scan
    * (the stack happens after the aggregate). */
  def corrWithLong(df: DataFrame, features: Seq[String], label: String): DataFrame = {
    val wide = corrWithWide(df, features, label)
    val stackExpr = features
      .map(f => s"'$f', corr_$f")
      .mkString(s"stack(${features.size}, ", ", ", ") as (feature, r)")
    wide.selectExpr(stackExpr)
  }
}
