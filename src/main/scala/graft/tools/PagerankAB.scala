package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** A/B probe for the r11 `graph_pagerank` drift finding (1.71 →
  * 2.37 s sf0.1 with no code change attached; suspect was the
  * round-global ObjectHashAggregate fallback-threshold change):
  * times the query in two fresh sessions that differ ONLY in
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * (Spark's 128 default vs the session's 256k).
  * `runMain graft.tools.PagerankAB [sfDir] [reps] [query]`. */
object PagerankAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 4
    val qName = if (args.length > 2) args(2) else "graph_pagerank"
    val q = Registry.byName(qName)
    for (threshold <- Seq("128", (256 * 1024).toString)) {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val spark = SparkSession.builder()
        .master("local[32]")
        .appName(s"pagerank-ab-$threshold")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          threshold)
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      (1 to reps).foreach { i =>
        graft.Sessions.releaseResidue(spark, blocking = true)
        System.gc()
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"PAGERANK_AB threshold=$threshold rep$i " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      spark.stop()
    }
  }
}
