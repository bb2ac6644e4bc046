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
