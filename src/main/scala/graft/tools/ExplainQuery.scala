package graft.tools

import graft.Sessions
import graft.queries.Registry
import org.apache.spark.sql.execution.FormattedMode

/** Dump one or more registered queries' physical plans: `runMain
  * graft.tools.ExplainQuery <name[,name2,…]> [sfDir] [outDir]`.
  * Writes `<outDir>/<name>.txt` with the `.explain("formatted")`
  * output (initial plan — with AQE on this shows
  * `AdaptiveSparkPlan isFinalPlan=false`, which is the committed
  * evidence format for plans/r{N}). Queries whose `run` launches its
  * own jobs before returning (index builds, streaming) still return a
  * final DataFrame; the plan dumped is that DataFrame's. */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 2) args(2) else "plans/scratch"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = Sessions.local(appName = "explain-query")
    names.foreach { name =>
      val q = Registry.byName(name)
      val df = q.run(spark, dir)
      val plan = df.queryExecution.explainString(FormattedMode)
      val p = java.nio.file.Paths.get(outDir, s"$name.txt")
      java.nio.file.Files.write(p, plan.getBytes("UTF-8"))
      println(s"EXPLAIN wrote $p (${plan.length} chars)")
    }
    spark.stop()
  }
}
