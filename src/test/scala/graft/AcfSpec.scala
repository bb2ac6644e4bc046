package graft

import org.apache.spark.sql.functions._
import graft.stats.Acf

class AcfSpec extends SparkSpec {
  import spark.implicits._

  test("ACF matches the statsmodels formula on a pinned fixture") {
    // series [2,4,1,7,5,3,8,6]; expected r_1..r_3 computed offline
    // with the full-series-mean formula (SURVEY.md §2.4 D5).
    val xs = Seq(2.0, 4.0, 1.0, 7.0, 5.0, 3.0, 8.0, 6.0)
    val df = xs.zipWithIndex.map { case (v, i) => (1, i, v) }.toDF("g", "ord", "x")
    val got = Acf.acf(df, "g", Seq(col("ord")), "x", nLags = 3)
      .orderBy("lag").collect()
      .map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(got(1) == -0.125)
    assert(got(2) == 0.035714)
    assert(got(3) == 0.196429)
  }

  test("TypedImperativeAggregate ACF equals the window-lag formulation") {
    val ev = graft.sources.Tables.load(spark, sf, "events")
    val viaWindow = Acf.acf(ev, "user_id",
      Seq(col("ts"), col("event_id")), "value", nLags = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val viaAgg = Acf.acfViaAggregate(ev, "user_id",
      unix_micros(col("ts")), "value", nLags = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(viaAgg.keySet == viaWindow.keySet)
    viaAgg.foreach { case (k, v) => assert(v == viaWindow(k), s"at $k") }
  }

  test("nulls are compacted before lagging (P6 compact-then-lag)") {
    // With the null at position 2 removed, the series is [1,2,3,4]:
    // adjacent pairs re-form across the gap.
    val df = Seq((1, 0, Some(1.0)), (1, 1, Some(2.0)), (1, 2, None),
      (1, 3, Some(3.0)), (1, 4, Some(4.0)))
      .toDF("g", "ord", "x")
    val got = Acf.acf(df, "g", Seq(col("ord")), "x", nLags = 1).collect()
    // [1,2,3,4]: r_1 = sum((x-2.5)(lag-2.5)) / sum((x-2.5)^2) = 1.25/5
    assert(got.head.getDouble(2) == 0.25)
  }
}
