package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.scaleops.Similarity
import graft.sources.Tables

/** Focused SemDeDup recall probe: one brute evaluation (checkpointed),
  * the gate's derived-k configuration only — RecallProbe's full grid
  * recomputes the O(n²) twin per row, prohibitive at soak SFs. */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(appName = "semdedup-probe")
    val (dirs, kOverride) = args.toSeq.partition(!_.startsWith("k="))
    for (d <- dirs) {
      val emb = Tables.load(spark, d, "embeddings")
      val exact = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.4)
        .select("a", "b").localCheckpoint(eager = true)
      val k = kOverride.headOption.map(_.stripPrefix("k=").toInt)
        .getOrElse(Similarity.semDedupDerivedK(emb.count()))
      val sem = Similarity.semDedupPairs(emb, "vec_id", "embedding",
        0.4, nClusters = k, assignProbes = 3).select("a", "b")
      val mc = sem.join(exact, Seq("a", "b")).count()
      val pe = exact.count(); val ma = sem.count()
      println(f"$d semdedup k=$k common=$mc exact=$pe approx=$ma " +
        f"recall=${mc.toDouble / pe}%.3f")
      Sessions.releaseResidue(spark, blocking = true)
    }
    spark.stop()
  }
}
