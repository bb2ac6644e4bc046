package graft.tools

import graft.Sessions
import graft.queries.Registry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.mutable

/** Job/stage-level profile of one registered query (dev tool):
  * `runMain graft.tools.JobProfile <name> [sfDir] [reps]`.
  * Attaches a listener, runs the query through the noop sink, and
  * prints every Spark job (duration, callsite) plus the heaviest
  * stages (duration, task count, callsite) — the "which internal
  * action dominates this row" question the bench total can't answer
  * (guide §1.1/§7.1; the UI is disabled in the harness, so this is
  * the stage page in text form). */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val q = Registry.byName(name)
    val spark = Sessions.local(appName = s"profile-$name")

    final case class JobRec(id: Int, desc: String, var ms: Long)
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val jobStart = mutable.Map[Int, Long]()
    final case class StageRec(id: Int, nameStr: String, ms: Long, tasks: Int)
    val stages = mutable.ArrayBuffer[StageRec]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs.synchronized {
          jobs(e.jobId) = JobRec(e.jobId, site, 0L)
          jobStart(e.jobId) = e.time
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach(_.ms = e.time - jobStart(e.jobId))
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val ms = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(0L)
        stages.synchronized {
          stages += StageRec(i.stageId, i.name.take(90), ms, i.numTasks)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    (1 to reps).foreach { rep =>
      jobs.synchronized { jobs.clear(); jobStart.clear() }
      stages.synchronized { stages.clear() }
      Sessions.releaseResidue(spark, blocking = true)
      System.gc()
      val t0 = System.nanoTime()
      q.run(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the async listener bus drain
      println(f"PROFILE $name rep$rep total $sec%.2f s, ${jobs.size} jobs")
      val byDesc = jobs.values.toSeq.groupBy(_.desc).map { case (d, js) =>
        (d, js.map(_.ms).sum, js.size)
      }.toSeq.sortBy(-_._2)
      byDesc.take(15).foreach { case (d, ms, n) =>
        println(f"  JOBS   ${ms / 1e3}%7.2f s  n=$n%-4d $d")
      }
      stages.toSeq.sortBy(-_.ms).take(12).foreach { s =>
        println(f"  STAGE  ${s.ms / 1e3}%7.2f s  tasks=${s.tasks}%-4d ${s.nameStr}")
      }
    }
    spark.stop()
  }
}
