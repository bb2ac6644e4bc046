package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on
  * `SPARK_GRAFT_SF_DIR`, materializing results through the `noop`
  * sink (forces full column computation — `.count()` lets Spark prune
  * the plan), and prints one JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = Sessions.local(appName = "graft-bench")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // JVM/codegen warmup on the smallest SF so steady-state throughput
    // is what gets measured, not JIT compilation of query 1.
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // Drop warmup residue (cache entries, localCheckpoint blocks whose
    // frames are now unreachable) before timing starts — leftover
    // blocks otherwise raise memory pressure mid-measurement.
    spark.catalog.clearCache()
    System.gc()
    Thread.sleep(2000)

    val results = SparkEntry.queries.toSeq.zipWithIndex.map {
      case ((name, fn), i) =>
        // periodic inter-query cleanup: keeps one query's residue
        // (checkpoint blocks, fresh tenured garbage) from inflating a
        // LATER query's time; runs outside any timed window
        if (i % 20 == 19) { spark.catalog.clearCache(); System.gc() }
        val t0 = System.nanoTime()
        try run(fn) catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
