package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.scaleops.Similarity
import graft.sources.Tables

/** Stage-level timing of the knnGraph descent tier (dev tool). */
object KnnGraphStageProfile {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/repo/target/testdata/sf1"
    val spark = Sessions.local(appName = "knn-graph-stage-profile")
    val n = Tables.load(spark, d, "embeddings").count()
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      // fresh load per rep: releaseResidue drops checkpoint blocks,
      // so a rep-spanning checkpointed frame would die mid-rep-2
      val emb = Tables.load(spark, d, "embeddings")
      val p = Similarity.knnGraphParams(n)
      val index = timed("ivfBuild")(
        Similarity.ivfBuild(emb, "vec_id", "embedding", p.nList,
          42L, knownN = Some(n)))
      timed("indexedCount")(index.indexed.localCheckpoint().count())
      timed("seed+descent(rounds=0)")(
        Similarity.knnGraph(emb, "vec_id", "embedding", 5, rounds = 0)
          .write.format("noop").mode("overwrite").save())
      timed("full(rounds=2)")(
        Similarity.knnGraph(emb, "vec_id", "embedding", 5)
          .write.format("noop").mode("overwrite").save())
      Sessions.releaseResidue(spark, blocking = true)
    }
    spark.stop()
  }
}
