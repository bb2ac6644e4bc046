package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.scaleops.Similarity
import graft.sources.Tables

/** Attribution profile for the dedup_semantic gate query (r6 judge
  * item 4: name where the seconds go — index build, multi-probe pair
  * search, the capped exact twin, connected components, or the
  * certification consumers). Times each piece cumulatively, min-of-N.
  * `runMain graft.tools.SemDedupProfile [sfDir] [reps]` */
object SemDedupProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local(appName = "semdedup-profile")
    val emb = Tables.load(spark, d, "embeddings")
    val n = emb.count()
    val k = Similarity.semDedupDerivedK(n)
    def time(label: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        Sessions.releaseResidue(spark, blocking = true)
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SEMPROF $label min=${ts.min}%.2f all=${
        ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("ivf_build")(Similarity.ivfBuild(emb, "vec_id", "embedding", k))
    val index = Similarity.ivfBuild(emb, "vec_id", "embedding", k)
    time("pairs_indexed")(
      noop(Similarity.semDedupPairsIndexed(index, 0.4, assignProbes = 3)))
    time("pairs_cc_keep") {
      val pairs = Similarity.semDedupPairsIndexed(index, 0.4, assignProbes = 3)
        .localCheckpoint(eager = false)
      noop(Similarity.keepFromPairs(emb, "vec_id", pairs))
    }
    val permille = math.min(1000L, 1000000L / math.max(1L, n))
    time("exact_twin_sampled") {
      val keep = graft.scaleops.TrainingData.mixtureKeep(
        col("vec_id"), lit(permille.toDouble / 1000.0))
      noop(Similarity.nearDupPairs(emb.filter(keep), "vec_id", "embedding", 0.4))
    }
    time("full_gate_query")(
      noop(graft.queries.ScaleQueries.dedupSemantic(spark, d)))
    spark.stop()
  }
}
