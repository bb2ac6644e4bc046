package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.scaleops.{Dedup, Similarity}
import graft.sources.Tables

/** One-off: measured recall of each approximate operator vs its
  * exact twin, per SF — used to calibrate the certification bounds
  * in ScaleQueries (bounds must hold with margin at every SF the
  * driver checks). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(appName = "recall-probe")
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    // RECALL_FILTERED_ONLY=1: run just the filtered-ANN section —
    // the sf1 soak (r14 verdict #3) needs the filtered tiers' recall
    // at 50k vectors, where this probe's exact near-dup-pair twins
    // (all-pairs at τ=0.4, simhash cross join) are the O(n²) part
    // that doesn't inform that question
    val filteredOnly = sys.env.contains("RECALL_FILTERED_ONLY")
    for (d <- sfs) {
      val emb = Tables.load(spark, d, "embeddings")
      val docs = Tables.load(spark, d, "documents")
      val q = emb.filter(col("vec_id") < 10)

      val exactKnn = Similarity.knnBrute(emb, "vec_id", "embedding", q, 5)
        .select("query_id", "neighbor_id")
      def recallOf(approx: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
        val a = approx.select("query_id", "neighbor_id")
        val common = a.join(exactKnn, Seq("query_id", "neighbor_id")).count()
        (common, exactKnn.count(), a.count())
      }
      val nEmb = emb.count()
      if (!filteredOnly) {
      val knnP = Similarity.lshMultiProbeParams(nEmb, 0.5, targetRecall = 0.95)
      val (lc, le, la) = recallOf(
        Similarity.knnLshDerived(emb, "vec_id", "embedding", q, 5, 64))
      println(f"$d knn_lsh  planes=${knnP.numPlanes} tables=${knnP.numTables} " +
        f"common=$lc exact=$le approx=$la recall=${lc.toDouble / le}%.3f")
      val (ic, ie, ia) = recallOf(
        Similarity.knnIvf(emb, "vec_id", "embedding", q, 5, nList = 8, nProbe = 3))
      println(f"$d knn_ivf  common=$ic exact=$ie approx=$ia recall=${ic.toDouble / ie}%.3f")
      val ivfP = Similarity.ivfDerivedParams(nEmb)
      val (dc, de, da) = recallOf(
        Similarity.knnIvfDerived(emb, "vec_id", "embedding", q, 5))
      println(f"$d ivf_drv  nlist=${ivfP.nList} nprobe=${ivfP.nProbe} " +
        f"common=$dc exact=$de approx=$da recall=${dc.toDouble / de}%.3f")
      val (xc, xe, xa) = recallOf(
        Similarity.knnIvfSq8Derived(emb, "vec_id", "embedding", q, 5))
      println(f"$d ivfsq8d  nlist=${ivfP.nList} nprobe=${ivfP.nProbe} " +
        f"common=$xc exact=$xe approx=$xa recall=${xc.toDouble / xe}%.3f")
      val (pqc, pqe, pqa) = recallOf(
        Similarity.knnIvfPq(emb, "vec_id", "embedding", q, 5))
      println(f"$d ivf_pq   nlist=${ivfP.nList} nprobe=${ivfP.nProbe} " +
        f"common=$pqc exact=$pqe approx=$pqa recall=${pqc.toDouble / pqe}%.3f")
      if (sys.env.contains("PQ_REFINE_SWEEP"))
        for (rf <- Seq(32, 64, 128)) {
          val (c2, e2, _) = recallOf(
            Similarity.knnIvfPq(emb, "vec_id", "embedding", q, 5,
              refineOverride = Some(rf)))
          println(f"$d ivf_pq_r$rf recall=${c2.toDouble / e2}%.3f")
        }
      val (qc, qe, qa) = recallOf(
        Similarity.knnSq8(emb, "vec_id", "embedding", q, 5, refine = 4))
      println(f"$d knn_sq8  common=$qc exact=$qe approx=$qa recall=${qc.toDouble / qe}%.3f")
      val (vc, ve, va) = recallOf(
        Similarity.knnIvfSq8(emb, "vec_id", "embedding", q, 5,
          nList = 8, nProbe = 3, refine = 4))
      println(f"$d ivf_sq8  common=$vc exact=$ve approx=$va recall=${vc.toDouble / ve}%.3f")
      }

      // FILTERED quantized tiers (r14 — the ADVICE refine-convention
      // fix): recall vs brute-over-filtered truth, NEW k-multiplier
      // refine vs the OLD k-divided pool, so the fix's effect is a
      // measured number, not an argument
      locally {
        val pred = col("vec_id") % 5 =!= 0
        val filtered = emb.filter(pred)
        val allowed = filtered.select(col("vec_id"))
        val exactF = Similarity.knnBrute(filtered, "vec_id", "embedding",
          q, 5).select("query_id", "neighbor_id")
        val eF = exactF.count()
        def recallF(a: org.apache.spark.sql.DataFrame): Double =
          a.select("query_id", "neighbor_id")
            .join(exactF, Seq("query_id", "neighbor_id")).count()
            .toDouble / eF
        val p = Similarity.ivfDerivedParams(nEmb, Similarity.knnAutoProbeFrac)
        val idx = Similarity.ivfBuild(emb, "vec_id", "embedding", p.nList,
          knownN = Some(nEmb))
        val sq8c = Similarity.sq8Codes(idx)
        val cb = Similarity.pqTrain(emb, "vec_id", "embedding",
          knownN = Some(nEmb))
        val pqc2 = Similarity.pqCodes(idx, cb)
        val newRef = Similarity.pqDerivedRefine(nEmb, p)
        val oldRef = math.max(1, (newRef + 4) / 5) // the pre-r14 /k pool
        for ((tag, ref) <- Seq(("new", newRef), ("old", oldRef))) {
          val rs = recallF(Similarity.ivfSearchFilteredSq8(idx, sq8c,
            "vec_id", "embedding", q, 5, p.nProbe, ref, allowed))
          val rp = recallF(Similarity.ivfSearchFilteredPq(idx, pqc2, cb,
            "vec_id", "embedding", q, 5, 8, 256, p.nProbe, ref, allowed))
          println(f"$d filt_$tag refine=$ref sq8=$rs%.3f pq=$rp%.3f")
        }
      }

      if (filteredOnly) {
        spark.sqlContext.clearCache()
        // skip the O(n²) exact-pair twins below
        // (scala.util.control.Breaks-free: just jump to next d)
      } else {
      val exactPairs = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.4)
        .select("a", "b")
      val pairP = Similarity.lshDerivedParams(nEmb, 0.4)
      val lshPairs = Similarity.nearDupPairsLshDerived(emb, "vec_id",
        "embedding", 0.4, 64).select("a", "b")
      val pc = lshPairs.join(exactPairs, Seq("a", "b")).count()
      val pe = exactPairs.count(); val pa = lshPairs.count()
      println(f"$d emb_lsh  planes=${pairP.numPlanes} tables=${pairP.numTables} " +
        f"common=$pc exact=$pe approx=$pa recall=${pc.toDouble / pe}%.3f")

      // the gate's derived k (ScaleQueries.dedupSemantic) plus the
      // fixed configs around it, all at the gate threshold
      val derivedK = Similarity.semDedupDerivedK(emb.count())
      val grid = (Seq((derivedK, 3), (8, 3), (16, 3), (16, 2))
        .distinct: Seq[(Int, Int)])
      for ((k, probes) <- grid) {
        val semPairs = Similarity.semDedupPairs(emb, "vec_id", "embedding",
          0.4, nClusters = k, assignProbes = probes).select("a", "b")
        val mc = semPairs.join(exactPairs, Seq("a", "b")).count()
        val ma = semPairs.count()
        println(f"$d semdedup k=$k p=$probes common=$mc exact=$pe " +
          f"approx=$ma recall=${mc.toDouble / pe}%.3f")
      }

      val sigs = Dedup.simHashSignatures(docs, "doc_id", "text")
      val l = sigs.select(col("doc_id").as("a"), col("sig").as("sig_a"))
      val r = sigs.select(col("doc_id").as("b"), col("sig").as("sig_b"))
      val brute = l.crossJoin(r).filter(col("a") < col("b"))
        .select(col("a"), col("b"),
          Dedup.hamming(col("sig_a"), col("sig_b")).as("dist"))
        .filter(col("dist") <= 3)
      val approxSim = Dedup.simHashNearDups(docs, "doc_id", "text", 3)
      val sc = approxSim.select("a", "b").join(brute.select("a", "b"), Seq("a", "b")).count()
      val se = brute.count(); val sa = approxSim.count()
      println(f"$d simhash  common=$sc brute=$se approx=$sa (must be equal)")
      }
    }
    spark.stop()
  }
}
