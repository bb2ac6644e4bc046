package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ml.Scalers
import graft.stats.EvalMetrics
import graft.ts.TimeSeries

/** Property-based invariants (SURVEY.md §5.2), driven by ScalaCheck
  * generators with fixed seeds (the scalatest bridge isn't in the
  * offline dependency set; explicit sampling keeps runs reproducible
  * anyway). Case counts are small — each case is a real Spark job. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("W2 window count = sum over groups of max(n_g − lookBack, 0)") {
    val cases = samples(
      Gen.zip(Gen.listOfN(3, Gen.choose(1, 12)), Gen.choose(2, 4)), 6)
    cases.foreach { case (sizes, lookBack) =>
      val rows = sizes.zipWithIndex.flatMap { case (n, g) =>
        (1 to n).map(i => (g, i, i.toDouble))
      }
      val df = rows.toDF("g", "ord", "v")
      val got = TimeSeries.slidingWindows(df, "g", Seq(col("ord")),
        Seq("v"), "v", lookBack).count()
      val expected = sizes.map(n => math.max(n - lookBack, 0)).sum
      assert(got == expected, s"sizes=$sizes lookBack=$lookBack")
    }
  }

  test("W1 split: train = floor(0.8n); train+test = n + min(lookBack, train)") {
    samples(Gen.zip(Gen.choose(5, 40), Gen.choose(1, 4)), 6)
      .foreach { case (n, lookBack) =>
        val df = (1 to n).map(i => (1, i)).toDF("g", "ord")
        val split = TimeSeries.orderedSplit(df, "g", Seq(col("ord")), lookBack)
        val train = split.filter(col("split").isin("train", "both")).count()
        val test = split.filter(col("split").isin("test", "both")).count()
        val cut = math.floor(0.8 * n).toLong
        assert(train == cut, s"n=$n lookBack=$lookBack")
        assert(train + test == n + math.min(lookBack, cut),
          s"n=$n lookBack=$lookBack")
      }
  }

  test("standard-scaled column has mean≈0, pop-std≈1 (non-constant input)") {
    samples(Gen.listOfN(20, Gen.choose(-1000.0, 1000.0)), 4)
      .filter(_.distinct.size > 1)
      .foreach { xs =>
        val df = xs.toDF("x")
        val scaled = Scalers.fitStandard(df, Seq("x")).transform(df)
        val r = scaled.agg(avg("x"), stddev_pop("x")).head()
        assert(math.abs(r.getDouble(0)) < 1e-9)
        assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
      }
  }

  test("approx_percentile stays within its rank-error bound vs exact (sketch path)") {
    // the 100 TB path for quantiles is the sketch; this pins the bound
    // that makes it substitutable: accuracy a ⇒ rank error ≤ n/a
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("value").isNotNull)
    val accuracy = 100
    val n = ev.count()
    val sorted = ev.select(col("value").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    for (p <- Seq(0.25, 0.5, 0.9)) {
      val approx = ev.agg(
        expr(s"approx_percentile(value, $p, $accuracy)").cast("double"))
        .head().getDouble(0)
      val rank = sorted.count(_ <= approx)
      val target = p * n
      val maxRankErr = n.toDouble / accuracy + 1
      assert(math.abs(rank - target) <= maxRankErr,
        s"p=$p: rank $rank vs target $target (bound $maxRankErr)")
    }
  }

  test("KLL rank error holds under adversarial input orders") {
    // random-halving sketches are stressed hardest by sorted streams
    // (every compaction drops correlated neighbors); the 5% bound the
    // gate certifies must hold for ascending, descending, and
    // organ-pipe orders, not just shuffled data
    val n = 30000
    val base = (1 to n).map(_.toDouble)
    val orders = Map(
      "asc" -> base,
      "desc" -> base.reverse,
      "organ-pipe" -> (base.grouped(2).map(_.head).toSeq ++
        base.grouped(2).flatMap(_.tail).toSeq.reverse))
    orders.foreach { case (name, vals) =>
      import graft.functions.KllSketch
      val sk = vals.toDF("v").coalesce(1) // single partition: stream order preserved
        .agg(KllSketch.agg(col("v")).as("sk"))
        .select(KllSketch.quantileOf(col("sk"), 0.5).as("p50"),
          KllSketch.quantileOf(col("sk"), 0.9).as("p90"))
        .head()
      def rankErr(est: Double, q: Double) =
        math.abs(est / n - q) // values are 1..n, so rank(v) = v/n
      assert(rankErr(sk.getDouble(0), 0.5) <= 0.05,
        s"$name p50 ${sk.getDouble(0)}")
      assert(rankErr(sk.getDouble(1), 0.9) <= 0.05,
        s"$name p90 ${sk.getDouble(1)}")
    }
  }

  test("SQ8 quantized dot stays within the per-term error bound on random vectors") {
    // |approx − exact| ≤ Σᵢ (|a_i|·εb + |b_i|·εa + εa·εb) with
    // ε = scale/2 per rounded term — the bound that justifies the
    // refine margin in knnSq8
    val rnd = new scala.util.Random(13)
    val dim = 32
    val cases = (1 to 40).map { _ =>
      (Array.fill(dim)(rnd.nextGaussian() * (1 + rnd.nextInt(5))),
        Array.fill(dim)(rnd.nextGaussian() * (1 + rnd.nextInt(5))))
    }
    val df = cases.toDF("a", "b")
    import graft.functions.Sq8
    val rows = df.select(
      (Sq8.scaleOf(col("a")) * Sq8.scaleOf(col("b")) *
        Sq8.intDot(Sq8.encodeMaxAbs(col("a")), Sq8.encodeMaxAbs(col("b")))
          .cast("double")).as("approx"),
      graft.functions.ArrayDot(col("a"), col("b")).as("exact"),
      Sq8.scaleOf(col("a")).as("sa"), Sq8.scaleOf(col("b")).as("sb"),
      col("a"), col("b")).collect()
    rows.foreach { r =>
      val (sa, sb) = (r.getDouble(2), r.getDouble(3))
      val a = r.getSeq[Double](4); val b = r.getSeq[Double](5)
      val bound = a.zip(b).map { case (x, y) =>
        math.abs(x) * sb / 2 + math.abs(y) * sa / 2 + sa * sb / 4
      }.sum + 1e-9
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= bound,
        s"approx=${r.getDouble(0)} exact=${r.getDouble(1)} bound=$bound")
    }
  }

  test("mixture sampling tracks any fraction within binomial-style tolerance") {
    import graft.scaleops.TrainingData
    val n = 8000
    val docs = (0L until n.toLong).map(i => (i, "g")).toDF("id", "g")
    for (frac <- Seq(0.05, 0.33, 0.62, 0.97)) {
      val kept = TrainingData.mixtureSample(docs, "id", "g", Map("g" -> frac))
        .count()
      // the keep rule is equidistributed over id·PRIME mod 1000; allow
      // 4σ of a binomial plus the mod-1000 quantization step
      val tol = 4 * math.sqrt(n * frac * (1 - frac)) + n / 1000.0 + 1
      assert(math.abs(kept - n * frac) <= tol,
        s"frac=$frac kept=$kept expected=${n * frac} tol=$tol")
    }
  }

  test("F1 from confusion counts equals the direct formula on random labels") {
    samples(Gen.listOfN(30, Gen.zip(Gen.oneOf(0, 1), Gen.oneOf(0, 1))), 6)
      .foreach { pairs =>
        val df = pairs.map { case (y, p) => (y.toDouble, p.toDouble) }
          .toDF("y", "p")
        // threshold 0.5 with positive = value < 0.5 ⇒ label 0 is positive
        val r = EvalMetrics.report(df, col("y"), col("p"), 0.5).head()
        val tp = pairs.count { case (y, p) => y == 0 && p == 0 }
        val fp = pairs.count { case (y, p) => y == 1 && p == 0 }
        val fn = pairs.count { case (y, p) => y == 0 && p == 1 }
        assert(r.getAs[Long]("tp") == tp)
        val expF1 = if (2 * tp + fp + fn == 0) 0.0
          else BigDecimal(2.0 * tp / (2 * tp + fp + fn))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getAs[Double]("f1") == expF1)
      }
  }

  test("HLL estimates stay within relative-error bounds of exact counts") {
    // the error bounds are computed INSIDE the certified queries now;
    // the spec asserts the witnesses hold and the estimates exist
    val approx = graft.queries.Events.approxDistinct(spark, sf).head()
    assert(approx.getAs[Long]("exact_users") > 0)
    assert(approx.getAs[Boolean]("approx_users_ok"))
    assert(approx.getAs[Boolean]("approx_events_ok"))
    // merged daily sketches estimate the ALL-DAYS distinct, not the
    // sum of daily distincts (a user active on k days counts once)
    val merged = graft.queries.Events.hllDailyMerge(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("sum_daily_exact"),
          r.getAs[Long]("exact_users_all_days"),
          r.getAs[Boolean]("merged_est_ok"))).toMap
    merged.foreach { case (tpe, (_, _, estOk)) =>
      assert(estOk, s"$tpe: merged sketch estimate outside 5% of exact")
    }
    // STRICT double-counting check: users span multiple days in this
    // data, so the per-day sum must EXCEED the all-days distinct for
    // at least one type (≥ alone would hold vacuously for any impl)
    assert(merged.exists { case (_, (sumDaily, exactAll, _)) =>
      sumDaily > exactAll
    })
  }

  test("connected components equal a driver-side union-find on random graphs") {
    val edgeGen = Gen.listOfN(25,
      Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 14L)))
    samples(edgeGen, 4).foreach { edges =>
      // limit 0 forces the DISTRIBUTED propagation loop — the oracle
      // below is itself a union-find, so letting the small-graph
      // driver path run would compare an implementation to itself
      val got = graft.operators.ConnectedComponents
        .components(edges.toDF("a", "b"), "a", "b", smallGraphEdgeLimit = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // oracle: plain union-find
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val expected = verts.map(v => v -> find(v)).toMap
      assert(got == expected)
    }
  }

  test("upsert key algebra: survivors = (snapshot ∪ inserts) − deletes") {
    val snapGen = Gen.listOfN(12, Gen.choose(0L, 19L)).map(_.distinct)
    val chgGen = Gen.listOfN(10,
      Gen.zip(Gen.choose(0L, 24L), Gen.oneOf(true, false)))
      .map(_.distinctBy(_._1))
    samples(Gen.zip(snapGen, chgGen), 4).foreach { case (snapKeys, chgs) =>
      val snap = snapKeys.map(k => (k, k * 1.0)).toDF("k", "v")
      val changes = chgs.map { case (k, del) => (k, k * 2.0, del) }
        .toDF("k", "v", "del")
      val got = graft.operators.Upsert.merge(snap, changes, "k", "del")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val chgMap = chgs.toMap
      val expectedKeys = (snapKeys ++ chgs.filter(!_._2).map(_._1)).distinct
        .filterNot(k => chgMap.getOrElse(k, false))
      assert(got.keySet == expectedKeys.toSet)
      got.foreach { case (k, v) =>
        if (chgMap.contains(k)) assert(v == k * 2.0) // changeset wins
        else assert(v == k * 1.0)                    // snapshot kept
      }
    }
  }
}
