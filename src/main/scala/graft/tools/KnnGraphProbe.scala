package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.scaleops.Similarity
import graft.sources.Tables

/** Measure knn_graph sampled recall + vertex coverage per SF:
  * `runMain graft.tools.KnnGraphProbe [sfDir ...]`. Prints, per dir:
  * n, graph params, sampled-query recall vs brute top-5, distinct
  * vertices in the graph, and min/max per-vertex degree. */
object KnnGraphProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "knn-graph-probe")
    dirs.foreach { d =>
      val emb = Tables.load(spark, d, "embeddings")
      val n = emb.count()
      val p = Similarity.knnGraphParams(n)
      val cMod = math.max(1L, n / 64L)
      val exact = Similarity.knnBrute(emb, "vec_id", "embedding",
        emb.filter(pmod(col("vec_id"), lit(cMod)) === 0), k = 5)
        .localCheckpoint()
      val nExact = exact.count()
      val strong = exact.filter(col("cos") >= 0.5).localCheckpoint()
      val nStrong = strong.count()
      (0 to 2).foreach { rounds =>
        val t0 = System.nanoTime()
        val g = Similarity.knnGraph(emb, "vec_id", "embedding", k = 5,
          rounds = rounds).localCheckpoint()
        val secs = (System.nanoTime() - t0) / 1e9
        val cert = g.filter(pmod(col("query_id"), lit(cMod)) === 0)
        val nCommon = cert.select("query_id", "neighbor_id")
          .join(exact.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id")).count()
        val nStrongCommon = cert.select("query_id", "neighbor_id")
          .join(strong.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id")).count()
        val deg = g.groupBy("query_id").agg(count(lit(1)).as("c"))
          .agg(min("c").as("mn"), max("c").as("mx"),
            count(lit(1)).as("vertices")).head()
        println(f"KNNGRAPH $d n=$n nList=${p.nList} nProbe=${p.nProbe} " +
          f"cMod=$cMod rounds=$rounds recall=${nCommon.toDouble / nExact}%.3f " +
          f"strong=${nStrongCommon.toDouble / math.max(1L, nStrong)}%.3f/$nStrong " +
          f"vertices=${deg.getLong(2)} degMin=${deg.getLong(0)} " +
          f"degMax=${deg.getLong(1)} build=${secs}%.2f s")
      }
    }
    spark.stop()
  }
}
