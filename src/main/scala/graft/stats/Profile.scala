package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Column profiler — the "describe+" data-quality operator: per
  * column, one row of (count, nulls, distinct, numeric min/max/mean,
  * string min/max).
  *
  * One aggregate job for all metrics of all columns; the only heavy
  * metric is exact `count(distinct)` (needed for oracle parity —
  * `approxDistinct = true` swaps in HLL `approx_count_distinct` for
  * the 100 TB path). */
object Profile {

  def profile(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      val distinct =
        if (approxDistinct) approx_count_distinct(c)
        else countDistinct(c)
      Seq(
        count(c).as(s"${f.name}__n"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        distinct.as(s"${f.name}__distinct")) ++ (f.dataType match {
        case _: NumericType => Seq(
          min(c).cast("double").as(s"${f.name}__min_num"),
          max(c).cast("double").as(s"${f.name}__max_num"),
          // decimal-exact mean: a plain double sum of ~1e5-magnitude
          // values accumulates ~1e-7 error — enough to flip ROUND(,6)
          // against the oracle; decimal sums are order-independent
          round(sum(c.cast("decimal(28,6)")).cast("double") / count(c), 6)
            .as(s"${f.name}__mean"))
        case StringType => Seq(
          min(c).as(s"${f.name}__min_str"),
          max(c).as(s"${f.name}__max_str"))
        case _ => Seq.empty
      })
    }
    val wide = df.agg(aggs.head, aggs.tail.toSeq: _*)
    // Pure DataFrame assembly (struct-explode) — no temp view, so
    // concurrent profiles on one SparkSession cannot clobber each
    // other's registration.
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val reports = cols.map { f =>
      val (minNum, maxNum, mean, minStr, maxStr) = f.dataType match {
        case _: NumericType =>
          (col(s"${f.name}__min_num"), col(s"${f.name}__max_num"),
            col(s"${f.name}__mean"), nullS, nullS)
        case StringType =>
          (nullD, nullD, nullD,
            col(s"${f.name}__min_str"), col(s"${f.name}__max_str"))
        case _ => (nullD, nullD, nullD, nullS, nullS)
      }
      struct(lit(f.name).as("column_name"),
        col(s"${f.name}__n").as("n"),
        col(s"${f.name}__nulls").as("n_null"),
        col(s"${f.name}__distinct").as("n_distinct"),
        minNum.as("min_num"), maxNum.as("max_num"), mean.as("mean"),
        minStr.cast("string").as("min_str"),
        maxStr.cast("string").as("max_str"))
    }
    wide.select(explode(array(reports.toSeq: _*)).as("r")).select("r.*")
  }

  /** DuckDB oracle for `profile` over a known schema:
    * (name, isNumeric, isString) triples. */
  def oracleSql(table: String,
                cols: Seq[(String, Boolean, Boolean)]): String =
    cols.map { case (name, isNum, isStr) =>
      val minNum = if (isNum) s"CAST(MIN($name) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val maxNum = if (isNum) s"CAST(MAX($name) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mean =
        if (isNum)
          s"ROUND(CAST(CAST(SUM(CAST($name AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) / COUNT($name), 6)"
        else "CAST(NULL AS DOUBLE)"
      val minStr = if (isStr) s"MIN($name)" else "CAST(NULL AS VARCHAR)"
      val maxStr = if (isStr) s"MAX($name)" else "CAST(NULL AS VARCHAR)"
      s"""SELECT '$name' AS column_name, COUNT($name) AS n,
         |  CAST(SUM(CASE WHEN $name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  COUNT(DISTINCT $name) AS n_distinct,
         |  $minNum AS min_num, $maxNum AS max_num, $mean AS mean,
         |  $minStr AS min_str, $maxStr AS max_str
         |FROM $table""".stripMargin
    }.mkString(" UNION ALL ")
}
