package graft.tools

import graft.Sessions
import graft.queries.Registry

/** Show one registered query's result rows: `runMain
  * graft.tools.ShowQuery <name> [sfDir] [numRows]`. The dev loop for
  * a new gate row — eyeball witnesses/routes before the full
  * Verify+oracle pass. */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val n = if (args.length > 2) args(2).toInt else 20
    val q = Registry.byName(name)
    val spark = Sessions.local(appName = s"show-$name")
    q.run(spark, dir).show(n, truncate = false)
    spark.stop()
  }
}
