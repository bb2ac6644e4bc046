package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the validation gate a
  * training pipeline runs before ingesting a new data drop: per-column
  * rules checked in ONE aggregate pass over the table (however many
  * rules), emitting a violations report instead of throwing.
  *
  * The one-pass shape is the point at scale: N rules over a 100 TB
  * table is still a single scan with map-side partial aggregation;
  * per-rule scans (the naive formulation) would be N scans.
  */
object Expectations {

  /** One rule: bounds and/or a null-ratio cap for a column. */
  final case class Rule(column: String,
                       minValue: Option[Double] = None,
                       maxValue: Option[Double] = None,
                       maxNullRatio: Option[Double] = None)

  /** @return one row per rule: (column, n_rows, n_null, n_below,
    *         n_above, null_ratio, passed). */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.map(_.column).distinct.size == rules.size,
      "one rule per column (aggregate aliases are column-keyed); " +
        "fold multiple bounds into one Rule")
    val aggs = rules.flatMap { r =>
      val c = col(r.column)
      Seq(
        count(lit(1)).as(s"__rows_${r.column}"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"__null_${r.column}"),
        sum(r.minValue.map(m => when(c < m, 1L).otherwise(0L))
          .getOrElse(lit(0L))).as(s"__below_${r.column}"),
        sum(r.maxValue.map(m => when(c > m, 1L).otherwise(0L))
          .getOrElse(lit(0L))).as(s"__above_${r.column}"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val reports = rules.map { r =>
      val rows = col(s"__rows_${r.column}")
      val nulls = col(s"__null_${r.column}")
      val below = col(s"__below_${r.column}")
      val above = col(s"__above_${r.column}")
      val nullRatio = round(nulls.cast("double") / rows, 6)
      val passed = below === 0 && above === 0 &&
        r.maxNullRatio.map(m => nullRatio <= m).getOrElse(lit(true))
      struct(lit(r.column).as("column_name"), rows.as("n_rows"),
        nulls.as("n_null"), below.as("n_below"), above.as("n_above"),
        nullRatio.as("null_ratio"), passed.as("passed"))
    }
    wide.select(explode(array(reports: _*)).as("r")).select("r.*")
  }
}
