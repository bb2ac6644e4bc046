package graft

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for the named queries (all, if no
  * names given) — the review loop for pushdown/broadcast/codegen
  * checks. Usage: runMain graft.PlanAudit [sfDir] [query...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else graft.queries.Registry.all.map(_.name)
    val spark: SparkSession = Sessions.local(appName = "graft-plan-audit")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      try println(graft.queries.Registry.byName(name)
        .run(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
    }
    spark.stop()
  }
}
