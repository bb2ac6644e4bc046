package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.ml.AutoML
import graft.sources.Tables

/** Profiles the m5_automl_full_grid cost structure at a given SF dir:
  * single worst-case fits (maxIter=100 × maxDepth∈{3,10}) and the full
  * 18×5 CV at varying parallelism, to locate where the gate's wall
  * time goes before choosing a mitigation. */
object GridProfile {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val mode = if (args.length > 1) args(1) else "single"
    val spark = Sessions.local(appName = "graft-grid-profile")
    val modArg = if (args.length > 3) args(3).toLong else 97L
    val li = Tables.load(spark, d, "lineitem")
      .select("l_orderkey", "l_quantity", "l_discount", "l_tax",
        "l_extendedprice")
      .filter(col("l_orderkey") % modArg === 0)
      .withColumn("label", col("l_extendedprice").cast("double"))
      .repartition(1)
      .cache()
    val n = li.count()
    println(s"rows=$n")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    if (mode == "single") {
      import org.apache.spark.ml.{Pipeline}
      import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
      import org.apache.spark.ml.regression.GBTRegressor
      val assembler = new VectorAssembler()
        .setInputCols(Array("l_quantity", "l_discount", "l_tax"))
        .setOutputCol("features_raw")
      val scaler = new StandardScaler().setInputCol("features_raw")
        .setOutputCol("features_scaled").setWithMean(true).setWithStd(true)
      for ((iters, depth) <- Seq((10, 3), (100, 3), (100, 10))) {
        val gbt = new GBTRegressor().setFeaturesCol("features_scaled")
          .setLabelCol("label").setSeed(42).setMaxIter(iters)
          .setMaxDepth(depth).setStepSize(0.1)
        val p = new Pipeline().setStages(Array(assembler, scaler, gbt))
        time(s"fit iters=$iters depth=$depth")(p.fit(li))
      }
    } else {
      val par = if (args.length > 2) args(2).toInt else 16
      time(s"full grid par=$par")(
        AutoML.train(li, "l_extendedprice",
          Seq("l_quantity", "l_discount", "l_tax"),
          AutoML.Regression, numFolds = 5, parallelism = par,
          quick = false))
    }
    spark.stop()
  }
}
