package graft.tools

import graft.Sessions
import graft.scaleops.Similarity
import graft.sources.Tables

/** Soak measurement (r6 judge item 2): the derived-params LSH pair
  * path timed ALONE against the brute twin ALONE at a given SF — the
  * gate query `dedup_embedding_lsh` runs both plus certification
  * joins, so its single number can't show the LSH-vs-brute ratio the
  * derivation is supposed to win. Done-criterion: LSH ≤ ⅓ brute at
  * sf1. `runMain graft.tools.LshVsBrute [sfDir] [reps]` — prints
  * min-of-reps for each side plus the chosen params.
  */
object LshVsBrute {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/target/testdata/sf1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local(appName = "lsh-vs-brute")
    val emb = Tables.load(spark, d, "embeddings")
    val n = emb.count()
    val p = Similarity.lshDerivedParams(n, 0.4)
    def time(label: String, mk: () => org.apache.spark.sql.DataFrame): Double = {
      val times = (1 to reps).map { _ =>
        Sessions.releaseResidue(spark, blocking = true)
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      println(f"LSHVSBRUTE $label n=$n reps=$reps min=$best%.2f all=${
        times.map(t => f"$t%.2f").mkString(",")}")
      best
    }
    val brute = time("brute", () =>
      Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.4))
    val lsh = time(s"lsh_derived planes=${p.numPlanes} tables=${p.numTables}",
      () => Similarity.nearDupPairsLshDerived(emb, "vec_id", "embedding",
        0.4, dim = 64))
    println(f"LSHVSBRUTE ratio lsh/brute=${lsh / brute}%.3f (target <= 0.333)")
    spark.stop()
  }
}
