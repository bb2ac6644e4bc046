package graft

import org.apache.spark.sql.functions._
import graft.stats.EvalMetrics

class EvalMetricsSpec extends SparkSpec {
  import spark.implicits._

  // (y, pred): two correct positives, one false positive, one false
  // negative, one true negative under threshold 10 (positive = < 10)
  private def preds() = Seq(
    (5.0, 6.0),   // tp
    (8.0, 9.0),   // tp
    (12.0, 7.0),  // fp (truth 0, pred 1)
    (4.0, 11.0),  // fn (truth 1, pred 0)
    (15.0, 14.0)) // tn
    .toDF("y", "pred")

  test("confusion counts and F1 match sklearn formulas") {
    val r = EvalMetrics.report(preds(), col("y"), col("pred"), 10.0).head()
    assert(r.getAs[Long]("tp") == 2 && r.getAs[Long]("fp") == 1 &&
      r.getAs[Long]("fn") == 1 && r.getAs[Long]("tn") == 1)
    assert(r.getAs[Double]("f1") == 0.666667) // 2TP/(2TP+FP+FN), rounded to 6dp
    assert(r.getAs[Double]("precision") == 0.666667)
    assert(r.getAs[Double]("recall") == 0.666667)
  }

  test("rmse matches mean_squared_error(squared=False)") {
    val r = EvalMetrics.report(preds(), col("y"), col("pred"), 10.0).head()
    val exp = math.sqrt((1.0 + 1 + 25 + 49 + 1) / 5)
    assert(math.abs(r.getAs[Double]("rmse") - exp) < 1e-6)
  }

  test("degenerate case: no positives → f1 = 0, not NaN") {
    val df = Seq((20.0, 21.0), (30.0, 29.0)).toDF("y", "pred")
    val r = EvalMetrics.report(df, col("y"), col("pred"), 10.0).head()
    assert(r.getAs[Double]("f1") == 0.0)
  }
}
