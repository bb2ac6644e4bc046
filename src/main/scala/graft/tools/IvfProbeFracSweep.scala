package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.scaleops.Similarity
import graft.sources.Tables

/** Calibration sweep for the knn cost-router's IVF sizing: measured
  * recall of the derived-IVF tier vs brute at several probe
  * fractions, per SF — the router's default must hold the knn_auto
  * gate row's ≥0.9 certification at every SF with margin.
  * `runMain graft.tools.IvfProbeFracSweep [sfDirs...]` */
object IvfProbeFracSweep {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(appName = "ivf-probefrac-sweep")
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    for (d <- sfs) {
      val emb = Tables.load(spark, d, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val exact = Similarity.knnBrute(emb, "vec_id", "embedding", q, 5)
        .select("query_id", "neighbor_id").localCheckpoint(eager = true)
      val ne = exact.count()
      val n = emb.count()
      for (pf <- Seq(0.35, 0.5, 0.6, 0.75)) {
        val p = Similarity.ivfDerivedParams(n, pf)
        val approx = Similarity.knnIvf(emb, "vec_id", "embedding", q, 5,
          nList = p.nList, nProbe = p.nProbe, knownN = Some(n))
          .select("query_id", "neighbor_id")
        val c = approx.join(exact, Seq("query_id", "neighbor_id")).count()
        println(f"IVFSWEEP $d pf=$pf nlist=${p.nList} nprobe=${p.nProbe} " +
          f"recall=${c.toDouble / ne}%.3f")
      }
      Sessions.releaseResidue(spark, blocking = true)
    }
    spark.stop()
  }
}
