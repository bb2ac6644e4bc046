package graft

import graft.queries.{Registry, StatsQueries}

/** Plan-shape regression guards: the scale properties (broadcast
  * joins, column pruning, single-shuffle windows) asserted on the
  * physical plans, so a refactor can't silently trade them away. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf).queryExecution.executedPlan.toString

  test("q5: all three dimension joins broadcast; fact side never shuffles") {
    val p = plan("q5_regional_revenue")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) == 3)
    assert(!p.contains("SortMergeJoin"))
    // only the final aggregate exchanges — and it carries aggregated
    // rows, not the fact table
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 1)
  }

  test("d1 histogram: scan reads exactly the binned column") {
    val p = plan("d1_hist_quantity")
    assert(p.contains("ReadSchema: struct<l_quantity:double>"))
  }

  test("q1: aggregation is partially applied map-side (partial_sum)") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("partial_sum"))
  }

  test("w2 windows: one exchange, reused by window and both aggregates") {
    val p = StatsQueries.windowStats(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1)
  }

  test("scatter sample: filter is pushed into the parquet scan") {
    val p = plan("d2_scatter_sample")
    assert(p.contains("PushedFilters:") && p.contains("l_orderkey"))
  }

  test("q6: ALL predicates pushed into the parquet scan, shipdate included") {
    val p = plan("q6_filtered_revenue")
    val pushedLine = p.linesIterator.find(_.contains("PushedFilters:")).getOrElse("")
    assert(pushedLine.contains("l_discount") && pushedLine.contains("l_quantity"))
    assert(pushedLine.contains("l_shipdate"),
      s"shipdate range must reach the scan:\n$pushedLine")
  }

  test("emb_silhouette: the k-row centroid table broadcasts (one " +
    "nested-loop against a broadcast, never a shuffled product)") {
    val p = plan("emb_silhouette")
    assert(!p.contains("CartesianProduct"))
    // the n×k expansion is a BroadcastNestedLoopJoin whose build side
    // is the k-row centroid frame — the corpus side never shuffles
    // for the distance pass
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 1)
    // centroid aggregate is map-side partial
    assert(p.contains("partial_sum") || p.contains("partial_count"))
  }

  test("knn_auto: no shuffled cartesian anywhere in the routed plans") {
    val p = plan("knn_auto")
    assert(!p.contains("CartesianProduct"))
  }

  test("range join: equi-join on (key, bucket), never a nested-loop product") {
    val p = plan("range_join_clicks")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("cube: one Expand node feeding one aggregate — no re-scans") {
    val p = plan("q_cube_quantity")
    assert(p.linesIterator.count(_.contains("Expand")) == 1)
    assert(p.linesIterator.count(_.contains("FileScan")) == 1)
  }

  test("window running: scan prunes to the four needed orders columns") {
    val p = plan("q_window_running")
    // timestamp vs timestamp_ntz depends on session inference config —
    // assert pruning by what is ABSENT, not the exact type name
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint," +
      "o_totalprice:double,o_orderdate:timestamp"))
    assert(!p.contains("o_orderstatus") && !p.contains("o_orderpriority"))
    // one shuffle on custkey serves row_number, running sum, and lag
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1)
  }

  test("unpivot: zero-shuffle Expand with map-side partial aggregation") {
    val p = plan("q_unpivot_measures")
    assert(p.linesIterator.count(_.contains("Expand")) == 1)
    assert(p.contains("partial_sum"))
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 1)
  }

  test("q18: the HAVING aggregate runs before the joins, not after") {
    val p = plan("q18_large_orders")
    // the quantity filter applies to the aggregate's output; customer
    // is broadcast — the fact table shuffles once, on l_orderkey
    assert(p.contains("BroadcastHashJoin"))
    val aggIdx = p.indexOf("partial_sum")
    val joinIdx = p.indexOf("BroadcastHashJoin")
    assert(aggIdx >= 0 && joinIdx >= 0)
  }

  test("q19: the partkey equi-join is broadcast; brackets filter post-join") {
    val p = plan("q19_brackets")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
  }

  test("q8: promo filter hits the fact before the fact-fact join; dims broadcast") {
    val p = plan("q8_market_share")
    // the selective dimension predicates reach their scans
    assert(p.contains("EqualTo(p_type,PROMO)") && p.contains("EqualTo(r_name,ASIA)"))
    // every dimension attach is a broadcast (part, supplier, both
    // nation roles, customer, region — orders also broadcasts at this
    // SF); nothing falls back to a product
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 5)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // the promo part join applies DIRECTLY to the lineitem side (the
    // fact is thinned before anything wider happens to it)
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin [l_partkey")))
    // lineitem scan reads exactly the five needed columns
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint," +
      "l_suppkey:bigint,l_extendedprice:double,l_discount:double>"))
    // one data shuffle total: the final year aggregate
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1)
  }

  test("q21: per-supplier aggregate before enrichment; self-join shuffles, supplier broadcasts") {
    val lines = plan("q21_waiting_suppliers").linesIterator.toVector
    val p = lines.mkString("\n")
    // the (order, supplier) lateness aggregate runs on the raw join
    // output BEFORE the supplier name attach — printed deeper than it
    val aggIdx = lines.indexWhere(_.contains("partial_max"))
    val suppJoinIdx = lines.indexWhere(l =>
      l.contains("BroadcastHashJoin") && l.contains("s_suppkey"))
    assert(aggIdx >= 0 && suppJoinIdx >= 0 && aggIdx > suppJoinIdx)
    // the aggregated perSupp × perOrder self-join is the one
    // shuffle-side join (two big aggregates — broadcast would be
    // wrong at scale); never a product
    assert(p.linesIterator.count(_.contains("SortMergeJoin")) == 1)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // status filter pushed; limit plans as distributed top-k
    assert(p.contains("EqualTo(o_orderstatus,F)"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q22: scalar stats attach as one-row broadcast; idle check is an anti join") {
    val p = plan("q22_idle_customers")
    // the positive-balance average is a one-row broadcast (scalar
    // subquery shape), not a shuffled join
    assert(p.contains("IdentityBroadcastMode"))
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 1)
    // "no recent order" is a broadcast LeftAnti, with the date filter
    // pushed into the orders scan
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti")))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"))
  }

  test("vocabulary: top-k plans as distributed TakeOrdered, not a global window sort") {
    val p = plan("text_vocabulary")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("bloom semi join: the pruning filter sits under the join, over the scan") {
    val lines = plan("q_bloom_semi_revenue").linesIterator.toVector
    // anchor on the Filter NODE carrying the codegen bloom probe
    // (might_contain over xxhash64 — r9 replaced the udf probe)
    val filterIdx = lines.indexWhere(l =>
      l.contains("Filter") && l.contains("might_contain"))
    val joinIdx = lines.indexWhere(_.contains("Join"))
    assert(filterIdx >= 0 && joinIdx >= 0 && filterIdx > joinIdx,
      "bloom Filter node must print deeper in the tree than the join")
  }

  test("pack_sequences: one Exchange (the per-shard window), map-side partials") {
    val p = plan("docs_pack_sequences")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1)
    assert(p.contains("partial_count"))
    // the window is partitioned — the single-task global-sort trap
    // would print an empty partition spec
    assert(!p.contains("windowspecdefinition(") ||
      p.contains("windowspecdefinition(source"))
  }

  test("contamination: benchmark side broadcast, source filters pushed to scan") {
    val p = plan("docs_contamination")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("PushedFilters") && p.contains("src19"))
    assert(!p.contains("CartesianProduct"))
  }

  test("knn_sq8: stage-1 candidate shuffle carries codes, never float vectors") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = queries.Registry.byName("knn_sq8").run(spark, sf)
    // inspect the INITIAL adaptive plan — after execution AQE replaces
    // exchanges with opaque QueryStageExec leaves that a tree collect
    // cannot see through
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // walk the TREE (Exchange.toString prints partitioning only, so a
    // string match can't see the shuffled schema): the approx-stage
    // exchange is the one carrying the quantized score `qcos`; it
    // must ship byte codes, never the float arrays — those join in
    // for the k·refine survivors only, after the window filter
    val shuffles = root.collectWithSubqueries {
      case e: ShuffleExchangeLike => e.output.map(_.name)
    }
    val approxStage = shuffles.filter(_.exists(_.startsWith("qcos")))
    assert(approxStage.nonEmpty, s"approx-stage shuffle missing: $shuffles")
    approxStage.foreach { cols =>
      assert(!cols.exists(c => c.startsWith("neighborv") || c.startsWith("queryv")),
        s"float vectors in the candidate shuffle: $cols")
    }
  }

  test("mixture sample: pure map-side filter, no shuffle before the report agg") {
    val p = plan("docs_mixture_sample")
    // one exchange for the final groupBy(source); the keep-rule filter
    // itself adds none
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 1)
    assert(p.contains("partial_count") || p.contains("partial_sum"))
  }

  test("stratified sample: the mod predicate reaches the scan's data filters") {
    val p = plan("events_stratified_sample")
    // not pushable into parquet (CASE on another column), but must sit
    // directly on the scan, before any shuffle
    assert(p.contains("FileScan"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q7: all four dims broadcast; shipdate band reaches the scan") {
    val p = plan("q7_volume_shipping")
    // 4 dims always broadcast; at tiny SF the orders join may too
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 4)
    val pushedLine = p.linesIterator.find(_.contains("PushedFilters:")).getOrElse("")
    assert(pushedLine.contains("l_shipdate"),
      s"shipdate band must reach the scan:\n$pushedLine")
  }

  test("q18-family heavy aggregates run BEFORE their enrichment joins") {
    // q15: the per-supplier aggregate feeds the max + name joins; the
    // fact table itself must never reach a join operator. (Plan
    // strings print root-first, so string-index ordering between
    // operators is the REVERSE of execution order — assert the join
    // strategy outright instead.)
    val p = plan("q15_top_supplier")
    assert(p.contains("partial_sum"))
    assert(!p.contains("SortMergeJoin"),
      "enrichment joins over the aggregated (tiny) side must broadcast")
  }

  test("fuzzy join: inverted-index candidates, never a cartesian product") {
    val p = plan("fuzzy_join_parts")
    assert(!p.contains("CartesianProduct"),
      "token blocking must bound candidates — an all-pairs scan leaked in")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("zorder layout: map-side interleave, one exchange for the cell agg") {
    val p = plan("zorder_layout")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 1)
    assert(p.contains("partial_min") || p.contains("partial_count"))
    assert(p.contains("ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint>"))
  }

  test("source caps: rank-limit pushdown prunes map-side, one exchange") {
    // the scale contract: Catalyst's WindowGroupLimit (SPARK-37099)
    // must turn `row_number <= cap` into a partial per-group top-cap
    // BEFORE the exchange, so a mega-group never materializes through
    // the shuffle; a refactor that breaks pushdown eligibility (rank
    // over a non-prefix filter, an extra sort key after the filter)
    // fails here
    val p = plan("docs_source_caps")
    assert(p.linesIterator.count(_.contains("WindowGroupLimit")) >= 2,
      s"expected partial+final WindowGroupLimit:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      "one group-keyed exchange only")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      "scan must prune to (id, group) — priorities are derived, not read")
  }

  test("jsonl ingest: the json scan carries the explicit schema (no inference)") {
    val p = plan("jsonl_ingest")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string," +
      "lang:string,source:string,n_chars:bigint>"),
      s"explicit read schema must reach the json scan:\n$p")
  }

  test("bm25: top-k cut is TakeOrdered, term stats broadcast — " +
    "no global sort, no shuffled join") {
    val p = plan("text_bm25_rank")
    assert(p.contains("TakeOrderedAndProject"),
      s"orderBy+limit must stay a TakeOrdered:\n$p")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 1,
      "df-stats join must broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("knn lsh: ONE fused codegen bucket kernel per side — no " +
    "interpreted HOF bucket columns, no per-table re-scan") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
    val p = graft.scaleops.Similarity.knnLshDerived(emb, "vec_id",
      "embedding", emb.filter(col("vec_id") < 5), k = 3, dim = 64)
      .queryExecution.executedPlan.toString
    // both sides bucket through the kernel (corpus single-probe +
    // query multi-probe), each computed once then posexploded
    assert(p.contains("lsh_buckets"), s"fused kernel missing:\n$p")
    // the legacy shape built buckets from interpreted aggregate/
    // zip_with HOFs — none may remain in the bucket path
    assert(!p.contains("zip_with"),
      "interpreted HOF bucket arithmetic resurfaced")
  }

  test("high-tau pair LSH: SQ8 prescore kills candidates INSIDE the " +
    "join stage, before the distinct shuffle") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
    val df = graft.scaleops.Similarity.nearDupPairsLsh(emb, "vec_id",
      "embedding", threshold = 0.9, dim = 64, numPlanes = 6, numTables = 4)
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case q => q
    }
    val s = root.toString
    assert(s.contains("sq8intdot") || s.contains("sq8_intdot"),
      s"prescore kernel missing from the plan:\n$s")
    // no shuffle may carry the prescore codes OUT of the join stage:
    // survivors leave as bare id pairs (the codes exist only inside
    // the bucket join's pipelined rows and the linear bucket shuffle)
    val shuffles = root.collectWithSubqueries {
      case e: ShuffleExchangeLike => e.output.map(_.name)
    }
    val pairShuffles = shuffles.filter(cols =>
      cols.exists(_.startsWith("a_id")) && cols.exists(_.startsWith("b_id")))
    assert(pairShuffles.nonEmpty)
    pairShuffles.foreach(cols =>
      assert(!cols.exists(_.contains("code")),
        s"prescore codes leaked past the join stage: $cols"))
  }

  test("bigram LM: every shuffle carries dictionary keys, never token " +
    "strings; the pair stream comes from the fused kernel") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.types.StringType
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val df = graft.scaleops.TrainingData
      .bigramCrossEntropy(docs, "doc_id", "text")
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case q => q
    }
    val s = root.toString
    assert(s.contains("bigram_hash_pairs"),
      s"fused bigram kernel missing from the plan:\n$s")
    assert(s.contains("token_hashes"),
      s"unigram token-hash kernel missing from the plan:\n$s")
    // the r10 shape shuffled the corpus-sized position stream on
    // string-pair keys; now no exchange anywhere in the LM may carry
    // a string column (strings die in the map-side projections)
    val shuffles = root.collectWithSubqueries {
      case e: ShuffleExchangeLike => e.output.map(a => (a.name, a.dataType))
    }
    assert(shuffles.nonEmpty)
    shuffles.foreach(cols =>
      assert(!cols.exists(_._2 == StringType),
        s"token strings leaked into an exchange: ${cols.map(_._1)}"))
  }

  test("clean pipeline scoring: the text splits exactly twice per row " +
    "(raw + lowered) — shared by quality, langid and fingerprint") {
    import org.apache.spark.sql.functions._
    // the scored projection BEFORE the checkpoint barrier (the
    // checkpointed gate plan truncates to a LogicalRDD)
    val ta = graft.scaleops.TextAnalysis
    val scored = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        ta.tokens(col("text")).as("_toks"),
        ta.tokens(lower(col("text"))).as("_toksl"))
      .withColumn("_mc", ta.markerCounts(col("_toks")))
      .select(col("doc_id"),
        ta.qualityScoreCounted(col("_toks"), col("text"),
          element_at(col("_mc"), 1)).as("quality"),
        ta.langIdScores(ta.langMarkers.zipWithIndex.map {
          case ((lang, _), i) => lang -> element_at(col("_mc"), i + 2)
        }).as("pred_lang"),
        ta.fingerprintOf(col("_toksl")).as("fp"))
    val p = scored.queryExecution.executedPlan.toString
    val splits = "split\\(".r.findAllIn(p).length
    assert(splits == 2, s"expected exactly 2 regex splits, got $splits:\n$p")
    assert(p.contains("marker_counts"), "fused marker kernel missing")
  }

  test("rake: per-doc top-k rank filter gets WindowGroupLimit pruning") {
    // unlike source_caps there is no partial/final pair here: the
    // window's input arrives already hash-partitioned on doc_id from
    // the upstream phrase join, so Catalyst needs no exchange and a
    // single Final WindowGroupLimit prunes in place (a cast between
    // row_number and the filter would kill even that — regression
    // this pin exists to catch)
    val p = plan("text_rake_keywords")
    assert(p.linesIterator.count(_.contains("WindowGroupLimit")) >= 1,
      s"expected a WindowGroupLimit on the rank<=k cut:\n$p")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 1,
      "word-stats join must broadcast")
  }

  test("knn graph descent tier: top-k is a hash aggregate with a " +
    "map-side partial, never a window sort; sq8 codes score the seed; " +
    "no forced broadcast") {
    // pin the SEED fragment directly (the operator checkpoints
    // between stages, which truncates the returned df's visible
    // plan; the gate row also routes brute at harness sizes — this
    // pin guards the 100 TB path)
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
    val S = graft.scaleops.Similarity
    val n = emb.count()
    val gp = S.knnGraphParams(n)
    val index = S.ivfBuild(emb, "vec_id", "embedding", gp.nList, 42L,
      knownN = Some(n))
    val q = emb.select(col("vec_id").as("query_id"),
      transform(col("embedding"), x => x.cast("double")).as("queryv"))
      .withColumn("querynorm",
        sqrt(graft.functions.ArrayDot(col("queryv"), col("queryv"))))
    val qCells = S.probedCellsForTest(index, q, gp.nProbe)
      .select("query_id", "queryv", "querynorm", "cell")
    val vt = q.select(col("query_id").as("vid"), col("queryv").as("vv"),
      col("querynorm").as("vn"))
    val df = S.knnGraphSeed(index, qCells, vt, k = 5)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"),
      s"top-k must run as an object hash aggregate:\n$p")
    assert(p.contains("partial_topkbyscore"),
      "top-k must combine map-side (partial aggregate)")
    // the CANDIDATE top-k cuts must be aggregates; the only window
    // allowed is centroid routing's nProbe-of-nList cell rank (k-row
    // input per query, WindowGroupLimit-pruned)
    assert(!p.linesIterator.exists(l =>
        l.contains("Window") && l.contains("qcos")),
      "candidate fan-out sorted under a window instead of aggregated")
    assert(p.contains("sq8intdot") || p.contains("sq8_intdot"),
      "seed candidates must score on sq8 codes")
    // no FORCED broadcast of corpus-sized relations: the code must
    // leave join strategy to size estimation (Spark legitimately
    // auto-broadcasts at the harness's tiny SFs and switches to
    // shuffle joins at scale; an explicit broadcast() would pin the
    // non-scalable choice). The one allowed hint is centroid
    // routing's LocalRelation (nList rows on the driver by
    // construction).
    val hintedOverCorpus = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
        if !h.child.collectLeaves().forall(
          _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]) => h
    }
    assert(hintedOverCorpus.isEmpty,
      s"corpus-sized relation under a broadcast hint:\n$hintedOverCorpus")
  }

  test("filtered ANN: the id filter prunes the cell scan BEFORE " +
    "scoring (semi join upstream of the probed join), never a " +
    "post-filter on scored candidates") {
    import org.apache.spark.sql.functions._
    val S = graft.scaleops.Similarity
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
    val n = emb.count()
    val gp = S.ivfDerivedParams(n, S.knnAutoProbeFrac)
    val index = S.ivfBuild(emb, "vec_id", "embedding", gp.nList, 42L,
      knownN = Some(n))
    val df = S.ivfSearchFiltered(index, "vec_id", "embedding",
      emb.filter(col("vec_id") < 10), k = 3, nProbe = gp.nProbe,
      allowedIds = emb.filter(col("label") > 0).select(col("vec_id")))
    val p = df.queryExecution.executedPlan.toString
    // the allowed-id restriction must run as a SEMI join (rows that
    // fail the filter never reach the scoring join)...
    assert(p.contains("LeftSemi"), s"filter must compose as a semi join:\n$p")
    // ...fed by a scan whose label predicate reached the parquet scan
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(label,0)"),
      "label predicate must push to the parquet scan")
    // and no cartesian anywhere in the search
    assert(!p.contains("CartesianProduct"))
    // the semi join must sit UPSTREAM of the cosine scoring: no plan
    // line computes cos before the semi join has pruned (scored rows
    // appear only above the LeftSemi in the tree rendering)
    val lines = p.linesIterator.toVector
    val semiAt = lines.indexWhere(_.contains("LeftSemi"))
    val scoreAt = lines.indexWhere(_.contains("arraydot"))
    assert(semiAt >= 0 && (scoreAt < 0 || scoreAt < semiAt),
      "scoring must happen above (after) the semi-join prune")
  }

  test("filtered ANN, quantized tier: the id filter prunes the CODE " +
    "scan before int8 scoring (semi join upstream), no cartesian") {
    import org.apache.spark.sql.functions._
    val S = graft.scaleops.Similarity
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
    val n = emb.count()
    val gp = S.ivfDerivedParams(n, S.knnAutoProbeFrac)
    val index = S.ivfBuild(emb, "vec_id", "embedding", gp.nList, 42L,
      knownN = Some(n))
    val df = S.ivfSearchFilteredSq8(index, S.sq8Codes(index),
      "vec_id", "embedding", emb.filter(col("vec_id") < 10), k = 3,
      nProbe = gp.nProbe, refine = 6,
      allowedIds = emb.filter(col("label") > 0).select(col("vec_id")))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"filter must compose as a semi join:\n$p")
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(label,0)"),
      "label predicate must push to the parquet scan")
    assert(!p.contains("CartesianProduct"))
    // the semi prune must sit upstream of the int8 candidate scoring
    val lines = p.linesIterator.toVector
    val semiAt = lines.indexWhere(_.contains("LeftSemi"))
    val qScoreAt = lines.indexWhere(_.toLowerCase.contains("sq8intdot"))
    assert(semiAt >= 0 && (qScoreAt < 0 || qScoreAt < semiAt),
      "int8 scoring must happen above (after) the semi-join prune")
  }
}
