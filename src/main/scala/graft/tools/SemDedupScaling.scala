package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.scaleops.Similarity
import graft.sources.Tables

/** Scaling evidence for the UNCLAMPED SemDeDup pair law (r8 judge
  * item 1): grow a synthetic corpus past the old k = 64 clamp
  * boundary and time the pair stage at the derived k (cells held at
  * ~1250 vectors, two-level routing engaged above 64 cells) against
  * a frozen k = 16 contrast (the old clamp's effective config, whose
  * candidate count grows as n²/32).
  *
  * Corpus growth is deterministic and structure-preserving: replica
  * r of the real sf1 embeddings is the CIRCULAR SHIFT of each vector
  * by r positions — shifted copies of a random-ish vector are
  * near-orthogonal, so replication multiplies corpus size without
  * planting artificial duplicate mass (a perturbed-copy scheme would
  * add R² near-dup pairs per base vector and measure the plant, not
  * the law).
  *
  * `runMain graft.tools.SemDedupScaling [sfDir] [reps]` */
object SemDedupScaling {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("target/testdata/sf1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Sessions.local(appName = "semdedup-scaling")
    val base = Tables.load(spark, d, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val dim = 64

    def corpus(replicas: Int): org.apache.spark.sql.DataFrame = {
      val shifted = (0 until replicas).map { r =>
        val off = r % dim
        val v =
          if (off == 0) col("embedding")
          else concat(slice(col("embedding"), off + 1, dim - off),
            slice(col("embedding"), 1, off))
        base.select((col("vec_id") + lit(r.toLong * 10000000L)).as("vec_id"),
          v.as("embedding"))
      }
      shifted.reduce(_ unionByName _)
    }

    def time(label: String)(body: => Long): Unit = {
      val runs = (1 to reps).map { _ =>
        Sessions.releaseResidue(spark, blocking = true)
        val t0 = System.nanoTime()
        val pairs = body
        ((System.nanoTime() - t0) / 1e9, pairs)
      }
      println(f"SEMSCALE $label min=${runs.map(_._1).min}%.2f " +
        f"pairs=${runs.head._2} all=${
          runs.map(t => f"${t._1}%.2f").mkString(",")}")
    }

    // materialize each synthetic corpus to parquet and read it back:
    // the timed runs scan from disk exactly like the gate queries do
    // (and releaseResidue between reps would evict an in-memory
    // checkpoint mid-measurement)
    def materialize(replicas: Int): org.apache.spark.sql.DataFrame = {
      val path = s"/tmp/semscale_corpus_$replicas"
      corpus(replicas).write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }

    for (replicas <- Seq(1, 2, 5)) {
      val c = materialize(replicas)
      val n = c.count()
      val k = Similarity.semDedupDerivedK(n)
      time(s"derived  n=$n k=$k") {
        Similarity.semDedupPairs(c, "vec_id", "embedding",
          threshold = 0.4, nClusters = k, assignProbes = 3,
          knownN = Some(n)).count()
      }
    }
    // the old clamp's contrast: frozen k=16 at 5x the corpus — the
    // n²/(2k)·probes² candidate law with no divisor growth
    val c5 = materialize(5)
    val n5 = c5.count()
    time(s"frozen   n=$n5 k=16") {
      Similarity.semDedupPairs(c5, "vec_id", "embedding",
        threshold = 0.4, nClusters = 16, assignProbes = 3,
        knownN = Some(n5)).count()
    }
    spark.stop()
  }
}
