package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.ml.AutoML

/** Runs the reference's FULL AutoML protocol once — 18-combo GBT grid
  * × 5 folds (90 fold-fits) + refit, parallelism 8 — on the C-MAPSS-
  * shaped synthetic frame, and prints timing + selection. The specs
  * pin the protocol shape; this proves the full fan-out executes.
  */
object FullGridRun {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(appName = "graft-full-grid")
    import spark.implicits._
    val rows = for (engine <- 1 to 10; cycle <- 1 to 120) yield {
      val rul = 120 - cycle
      val noise = math.sin(engine * 7.0 + cycle * 1.3)
      (engine, cycle, 100.0 - rul * 0.8 + noise, 50.0 + rul * 0.3 - noise,
        rul.toDouble)
    }
    val df = rows.toDF("engine_no", "cycle", "sensor_2", "sensor_7", "RUL")
    val t0 = System.nanoTime()
    val trained = AutoML.train(df, "RUL", Seq("sensor_2", "sensor_7"),
      AutoML.Regression, numFolds = 5, parallelism = 8, quick = false)
    val secs = (System.nanoTime() - t0) / 1e9
    val best = trained.model.bestModel
      .asInstanceOf[org.apache.spark.ml.PipelineModel]
      .stages.last.asInstanceOf[org.apache.spark.ml.regression.GBTRegressionModel]
    println(f"""{"grid_fits": ${trained.model.getEstimatorParamMaps.length * 5 + 1}, """ +
      f""""seconds": $secs%.1f, "best_maxIter": ${best.getMaxIter}, """ +
      f""""best_maxDepth": ${best.getMaxDepth}, "best_stepSize": ${best.getStepSize}, """ +
      f""""cv_rmse": ${trained.model.avgMetrics.min}%.4f}""")
    spark.stop()
  }
}
