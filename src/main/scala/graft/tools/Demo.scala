package graft.tools

import org.apache.spark.sql.functions._
import graft.api.{AnalysisSession, TaskConfig}
import graft.ml.AutoML

/** The reference's README walkthrough (reference README.md:25-61) as
  * a runnable main — the complete user journey on the engine's API:
  * upload → display → pre-analyze (NaN drop) → supervised options →
  * visualize (histogram / corr) → train (grid CV) → upload test →
  * evaluate with an RUL threshold → importances.
  *
  * Run: `sbt "runMain graft.tools.Demo"` (synthesizes a C-MAPSS-shaped
  * frame; pass a CSV path to run on real data:
  * `sbt "runMain graft.tools.Demo /path/train.csv /path/test.csv"`).
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(appName = "graft-demo")
    import spark.implicits._

    val (train, test) = args match {
      case Array(trainCsv, testCsv) =>
        (graft.sources.Tables.csvWithRowId(spark, trainCsv),
          graft.sources.Tables.csvWithRowId(spark, testCsv))
      case _ => // synthetic C-MAPSS shape: 4 engines × 80 cycles
        val rows = for {
          engine <- 1 to 4
          cycle <- 1 to 80
        } yield {
          val rul = 80 - cycle
          val noise = math.sin(engine * 7.0 + cycle * 1.3) * 0.1
          (engine, cycle, 100.0 - rul * 0.8 + noise,
            50.0 + rul * 0.3 - noise, 1.0, Option.empty[Double], rul.toDouble)
        }
        val df = rows.toDF("engine_no", "time_in_cycles", "sensor_2",
          "sensor_7", "op_setting_3", "sensor_16", "RUL")
        (df.filter($"engine_no" <= 3), df.filter($"engine_no" === 4))
    }

    // upload → display (S5: first rows in explicit order)
    var session = AnalysisSession(TaskConfig("demo")).withTrainFrame(train)
    println("== head ==")
    session.displayData.show(truncate = false)

    // pre-analyze: P1 all-null column drop
    session = session.preAnalyze
    println(s"== dropped all-null columns: ${session.config.nanColumns} ==")

    // supervised options: label + exclusions (README protocol)
    session = session
      .setSupervisedOptions("RUL",
        excluded = Seq("engine_no", "time_in_cycles", "op_setting_3"))
      .startMl("regression")
    println(s"== features: ${session.featureCols} ==")

    // visualization result tables (D1 / D3)
    println("== histogram(sensor_2) ==")
    session.histogramOf("sensor_2").show(5)
    println("== corr(features, RUL) ==")
    session.correlations.show()

    // train: grid CV (quick grid for the demo)
    val trained = session.confirmTraining(quick = true)
    println(s"== trained: ${trained.trained.get.zooName}, " +
      s"cv rmse ${trained.trained.get.cvMetric} ==")

    // evaluate @ threshold (P8 binarize < threshold, D7-D9 metrics).
    // Test columns to drop come from the SESSION (NaN-dropped +
    // user-excluded), not a hardcoded list — on real CSVs the
    // all-null set is data-dependent.
    val dropCols = (trained.config.nanColumns ++
      trained.config.excludedFeatures).distinct
      .filter(test.columns.contains)
    val testClean = test.drop(dropCols: _*)
    println("== evaluation @ RUL<20 ==")
    trained.uploadTest(testClean).evaluate(Some(20.0)).show(truncate = false)

    // D10 importances
    println("== importances ==")
    trained.importances.foreach { case (f, w) => println(f"  $f%-12s $w%.4f") }

    spark.stop()
  }
}
