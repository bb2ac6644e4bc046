package graft.tools

import graft.Sessions
import graft.queries.Registry

/** Time one registered query: `runMain graft.tools.TimeQuery <name>
  * <sfDir> [reps]`. Same noop-sink materialization as Bench. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val q = Registry.byName(name)
    val spark = Sessions.local(appName = s"time-$name")
    (1 to reps).foreach { i =>
      Sessions.releaseResidue(spark, blocking = true)
      val t0 = System.nanoTime()
      q.run(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"TIMEQUERY $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
