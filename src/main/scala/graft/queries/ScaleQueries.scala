package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.scaleops.{Dedup, Similarity, TextAnalysis}
import graft.sources.Tables

/** Queries for the training-data-pipeline operators (dedup,
  * similarity search, text analysis) with DuckDB oracles wherever the
  * semantics are SQL-expressible; hash-based ops (SimHash, LSH-ANN)
  * get rows-only checks plus ScalaTest invariants. */
object ScaleQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  /** Width-before-weight load for per-row-HEAVY ops (shingling,
    * n-gram scoring, tokenize-everything maps) over a bytes-small
    * table: one parquet file is ONE scan partition at any
    * maxPartitionBytes (a row group is unsplittable), so without an
    * explicit repartition the heavy map runs on a single core of 32.
    * The shuffle costs megabytes; the map is the dominant term
    * (measured on text_pii_redact at the sf1 soak: 8.7 → 2.3 s).
    * Only for heavy maps — plain column scans and filters stay on
    * [[t]] (an unconditional shuffle would tax every cheap query). */
  private def tw(s: SparkSession, d: String, n: String,
                 key: String): DataFrame =
    t(s, d, n).repartition(col(key))

  // ---- text analysis ---------------------------------------------------
  def textTokens(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      length(col("text")).as("n_chars"),
      TextAnalysis.fingerprint(col("text")).as("fingerprint"))

  val textTokensOracle: String =
    """SELECT doc_id,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens,
      |  CAST(length(text) AS INT) AS n_chars,
      |  md5(array_to_string(list_sort(list_distinct(
      |    string_split_regex(trim(lower(text)), '\s+'))), ' ')) AS fingerprint
      |FROM documents""".stripMargin

  def textQuality(s: SparkSession, d: String): DataFrame = {
    val docs = tw(s, d, "documents", "doc_id")
    val withCols = TextAnalysis.qualityColumns(col("text"))
      .foldLeft(docs) { case (df, (name, c)) => df.withColumn(name, c) }
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
    withCols.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      round(avg(col("alpha_ratio")), 6).as("avg_alpha"),
      round(avg(col("stopword_ratio")), 6).as("avg_stopword"),
      round(avg(col("quality")), 6).as("avg_quality"))
  }

  val textQualityOracle: String = {
    val stops = TextAnalysis.stopwords.map(TextAnalysis.sqlLit).mkString(", ")
    s"""WITH q AS (
       |  SELECT source,
       |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       |    length(text) AS n_chars,
       |    length(regexp_replace(text, '[^a-z ]', '', 'g')) AS n_alpha,
       |    len(list_filter(string_split_regex(trim(text), '\\s+'),
       |      t -> t IN ($stops))) AS n_stops
       |  FROM documents),
       |r AS (
       |  SELECT source, n_tokens,
       |    ROUND(CAST(n_alpha AS DOUBLE) / n_chars, 6) AS alpha_ratio,
       |    ROUND(CAST(n_stops AS DOUBLE) / n_tokens, 6) AS stopword_ratio
       |  FROM q),
       |s AS (
       |  SELECT source, alpha_ratio, stopword_ratio,
       |    ROUND(LEAST(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.3 +
       |      alpha_ratio * 0.4 +
       |      LEAST(1.0, stopword_ratio * 5.0) * 0.3, 6) AS quality
       |  FROM r)
       |SELECT source, COUNT(*) AS n_docs,
       |  ROUND(AVG(alpha_ratio), 6) AS avg_alpha,
       |  ROUND(AVG(stopword_ratio), 6) AS avg_stopword,
       |  ROUND(AVG(quality), 6) AS avg_quality
       |FROM s GROUP BY source""".stripMargin
  }

  def textLangId(s: SparkSession, d: String): DataFrame =
    tw(s, d, "documents", "doc_id")
      .select(col("lang"), TextAnalysis.langId(col("text")).as("pred_lang"))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n"))

  val textLangIdOracle: String = {
    val scores = TextAnalysis.langMarkers.map { case (lang, markers) =>
      val set = markers.map(TextAnalysis.sqlLit).mkString(", ")
      s"len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t IN ($set))) AS s_$lang"
    }.mkString(",\n      |    ")
    s"""WITH s AS (
       |  SELECT lang, $scores
       |  FROM documents)
       |SELECT lang,
       |  CASE
       |    WHEN s_zh > GREATEST(s_en, s_de, s_es, s_fr) THEN 'zh'
       |    WHEN s_fr > GREATEST(s_en, s_de, s_es) THEN 'fr'
       |    WHEN s_es > GREATEST(s_en, s_de) THEN 'es'
       |    WHEN s_de > s_en THEN 'de'
       |    ELSE 'en' END AS pred_lang,
       |  COUNT(*) AS n
       |FROM s GROUP BY 1, 2""".stripMargin
  }

  // ---- dedup -----------------------------------------------------------
  def dedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exactStats(t(s, d, "documents"),
      Dedup.normalizedText(col("text")))

  val dedupExactOracle: String =
    """WITH g AS (
      |  SELECT regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS k,
      |    COUNT(*) AS c
      |  FROM documents GROUP BY 1)
      |SELECT COUNT(*) AS n_distinct, CAST(SUM(c) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT) AS n_redundant,
      |  CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups
      |FROM g""".stripMargin

  def dedupMinHash(s: SparkSession, d: String): DataFrame =
    Dedup.minHashNearDups(tw(s, d, "documents", "doc_id"), "doc_id", "text",
      shingleK = 3, minJaccard = 0.6)

  /** Brute-force exact-Jaccard oracle — valid because the Spark side
    * verifies every LSH candidate exactly and r=2/b=32 banding has
    * < 1e-6 miss probability at jaccard ≥ 0.6. */
  val dedupMinHashOracle: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN len(toks) >= 3
      |      THEN list_transform(generate_series(1, len(toks) - 2),
      |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |      ELSE [] END) AS s
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |        FROM documents)),
      |pairs AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b,
      |    ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
      |      len(list_distinct(a.s || b.s)), 6) AS jaccard
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |SELECT a, b, jaccard FROM pairs WHERE jaccard >= 0.6""".stripMargin

  /** SimHash certification: the bucketed pipeline must equal a
    * brute-force all-pairs hamming scan EXACTLY — maxDist = 3 is the
    * regime where 4×16-bit chunk banding has pigeonhole-guaranteed
    * recall (any pair within 3 differing bits shares an intact
    * chunk), so approx ≡ brute is a theorem the engine must witness.
    * Signature values are engine hashes (not SQL-derivable), so the
    * oracle checks the DuckDB-computable document count plus the
    * protocol constants and the Spark-verified equality flags; a
    * broken bucketing flips `equals_brute` to false → hash mismatch.
    * The O(n²) brute twin is harness-SF-only certification cost —
    * production callers use [[Dedup.simHashNearDups]] alone. */
  def dedupSimHash(s: SparkSession, d: String): DataFrame = {
    val sigs = Dedup.simHashSignatures(t(s, d, "documents"), "doc_id", "text")
      .localCheckpoint(eager = false) // feeds approx + both brute sides
    val approx = Dedup.simHashNearDupsFromSigs(sigs, "doc_id", maxDist = 3)
    val brute = sigs.select(col("doc_id").as("a"), col("sig").as("sig_a"))
      .crossJoin(sigs.select(col("doc_id").as("b"), col("sig").as("sig_b")))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        Dedup.hamming(col("sig_a"), col("sig_b")).as("dist"))
      .filter(col("dist") <= 3)
    val missing = brute.join(approx, Seq("a", "b", "dist"), "left_anti")
    val extra = approx.join(brute, Seq("a", "b", "dist"), "left_anti")
    t(s, d, "documents").agg(count(lit(1)).as("n_docs"))
      .crossJoin(missing.agg(count(lit(1)).as("n_missing")))
      .crossJoin(extra.agg(count(lit(1)).as("n_extra")))
      .select(col("n_docs"), lit(4).as("n_chunks"), lit(3).as("max_dist"),
        (col("n_missing") === 0 && col("n_extra") === 0).as("equals_brute"))
  }

  val dedupSimHashOracle: String =
    """SELECT COUNT(*) AS n_docs, 4 AS n_chunks, 3 AS max_dist,
      |  TRUE AS equals_brute
      |FROM documents""".stripMargin

  /** The deterministic ~1000-vertex id-hash sample shared by every
    * O(n²)-witness twin in the embedding-dedup gate rows (the same
    * `mixtureKeep` arithmetic the oracle replays integer-for-integer;
    * proven on dedup_semantic's twin in r6). Rationale: the gate must
    * certify the OPERATORS, but a witness that replays brute-force
    * O(n²) pairs grows quadratically with the soak SF — at sf1 the
    * three full-corpus brute twins were 44% of the whole soak. A
    * ~1000-vertex sample caps every twin at O(cap²) while keeping the
    * witnesses statistically meaningful (59 exact pairs at sf0.01,
    * 231 at sf0.1 inside the sample). Full-corpus sizing/routing is
    * still pinned — via the COUNT(*)-driven parameter formulas, which
    * cost one metadata scan, not a pair join. */
  private def embSample(emb: DataFrame, n: Long): (DataFrame, Long) = {
    val permille = math.min(1000L, 1000000L / math.max(1L, n))
    val keep = graft.scaleops.TrainingData.mixtureKeep(
      col("vec_id"), lit(permille.toDouble / 1000.0))
    (emb.filter(keep), permille)
  }

  /** The matching oracle CTE: `s(vec_id, v)` = the sampled vectors,
    * double-cast. */
  private val embSampleCte: String =
    """perm AS (
      |  SELECT LEAST(1000, 1000000 // GREATEST(1, COUNT(*))) AS permille
      |  FROM embeddings),
      |s AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings, perm
      |  WHERE ((((vec_id % 1000003) + 1000003) % 1000003) * 2654435761)
      |    % 1000 < permille)""".stripMargin

  /** Exact near-dup pairs, hash-pinned on the deterministic sample —
    * the brute-force PAIR OPERATOR's correctness row ([[embSample]]
    * rationale; at sf0.01 the sample IS the full corpus, so the
    * operator is still pinned un-sampled where the driver's oracle
    * compares hashes). Production callers at corpus scale use
    * [[Similarity.nearDupPairsAuto]], which routes away from brute
    * exactly when n makes this shape quadratic-expensive. */
  def dedupEmbedding(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val (sampled, _) = embSample(emb, emb.count())
    Similarity.nearDupPairs(sampled, "vec_id", "embedding", threshold = 0.4)
  }

  /** Certification of the bucketed scale path against its exact
    * twin: every LSH-found pair must appear in the brute set with an
    * identical score (`subset_ok` — candidates are exact-verified, so
    * a false here means broken scoring), and measured recall must
    * clear 0.8. Plane/table counts are CORPUS-DERIVED
    * ([[Similarity.lshDerivedParams]]: planes ≈ log2(n/512) capped by
    * what 32 tables can recover at the threshold angle) — the rule
    * the production path runs, so the gate certifies the same config
    * at every SF (500 vecs → 1 plane × 4 tables, 2k → 2 × 4, 20k →
    * 6 × 30; measured recall 1.000/0.908/0.913 at sf0.01/0.1/sf1).
    * The oracle recomputes the DuckDB-computable exact-pair count;
    * the booleans flip on any engine defect → hash mismatch. The
    * brute twin is harness-SF certification cost — production callers
    * use [[Similarity.nearDupPairsLshDerived]] alone. */
  def dedupEmbeddingLsh(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val n = emb.count()
    // full-corpus sizing as formula values (one COUNT, no pair work):
    // what production derives at this SF — the oracle replays it
    val pFull = Similarity.lshDerivedParams(n, 0.4)
    // operator + twin both on the deterministic sample ([[embSample]]):
    // subset/recall witnesses stay non-vacuous at O(cap²) cost
    val (sampled, _) = embSample(emb, n)
    val approx = Similarity.nearDupPairsLshDerived(sampled, "vec_id",
      "embedding", threshold = 0.4, dim = 64)
    val exact = Similarity.nearDupPairs(sampled, "vec_id", "embedding",
      threshold = 0.4)
    val notInExact = approx.join(exact, Seq("a", "b", "cos"), "left_anti")
    val common = approx.select("a", "b")
      .join(exact.select("a", "b"), Seq("a", "b"))
    // Provenance pin (judge r6 item 7): the params the derived rule
    // stamped on the frame become RESULT columns, and the oracle
    // recomputes them from COUNT(*) with the same arithmetic — a
    // future caller silently reverting to static plane counts loses
    // the stamp and this throws before any rows flow.
    val p = Similarity.lshParamsOf(approx).getOrElse(throw new IllegalStateException(
      "dedup_embedding_lsh must use the corpus-derived LSH path"))
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(notInExact.agg(count(lit(1)).as("n_bad")))
      .crossJoin(common.agg(count(lit(1)).as("n_common")))
      .select(col("n_exact"),
        lit(p.numPlanes).as("lsh_planes"), lit(p.numTables).as("lsh_tables"),
        lit(pFull.numPlanes).as("lsh_planes_full"),
        lit(pFull.numTables).as("lsh_tables_full"),
        (col("n_bad") === 0).as("subset_ok"),
        // zero-pair guard (same as dedup_semantic's): n_exact is the
        // SAMPLED exact count now — a sample with no qualifying pair
        // would make n_common/0 NULL vs the oracle's literal TRUE
        (col("n_exact") === 0 ||
          col("n_common").cast("double") / col("n_exact") >= 0.8)
          .as("recall_ok"))
  }

  /** DuckDB replay of [[Similarity.lshDerivedParams]] at threshold
    * `tau`, double-forced literals throughout — DuckDB evaluates bare
    * numeric literals as DECIMAL, whose exact `1.0 - 0.85` differs
    * from IEEE double subtraction in the engine by 1 ulp, enough to
    * flip a ceil/floor at a boundary. Shared by the pair + knn LSH
    * oracles. Emits one row (planes, tabs) given a one-row input
    * relation `sz(n)`. `recall` mirrors the engine's targetRecall —
    * 0.85 for the pair path, 0.95 for knn (cheap tables on the
    * query-bounded side; restores the 0.9 floor's margin at sf1). */
  private def lshParamsSql(tau: Double, recall: Double = 0.85,
                           src: String = "sz", suffix: String = ""): String =
    s"""par$suffix AS (
       |  SELECT GREATEST(1, LEAST(
       |      CAST(CEIL(LN(GREATEST(CAST(1.0 AS DOUBLE), n / CAST(512.0 AS DOUBLE)))
       |        / LN(CAST(2.0 AS DOUBLE))) AS INT),
       |      CAST(FLOOR(LN(CAST(1.0 AS DOUBLE)
       |          - POWER(CAST(1.0 AS DOUBLE) - CAST($recall AS DOUBLE),
       |                  CAST(1.0 AS DOUBLE) / CAST(32.0 AS DOUBLE)))
       |        / LN(CAST(1.0 AS DOUBLE) - ACOS(CAST($tau AS DOUBLE)) / PI())) AS INT),
       |      30)) AS planes
       |  FROM $src),
       |tab$suffix AS (
       |  SELECT planes, GREATEST(4, LEAST(32,
       |    CAST(CEIL(LN(CAST(1.0 AS DOUBLE) - CAST($recall AS DOUBLE))
       |      / LN(CAST(1.0 AS DOUBLE)
       |          - POWER(CAST(1.0 AS DOUBLE) - ACOS(CAST($tau AS DOUBLE)) / PI(),
       |                  planes))) AS INT))) AS tabs
       |  FROM par$suffix)""".stripMargin

  val dedupEmbeddingLshOracle: String =
    s"""WITH $embSampleCte,
       |p AS (
       |  SELECT a.vec_id AS a, b.vec_id AS b,
       |    ROUND(list_dot_product(a.v, b.v) /
       |      (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))), 6) AS cos
       |  FROM s a JOIN s b ON a.vec_id < b.vec_id),
       |sz AS (SELECT COUNT(*) AS n FROM embeddings),
       |szs AS (SELECT COUNT(*) AS n FROM s),
       |${lshParamsSql(0.4)},
       |${lshParamsSql(0.4, src = "szs", suffix = "_s")},
       |cnt AS (SELECT COUNT(*) AS n_exact FROM p WHERE cos >= 0.4)
       |SELECT n_exact, tab_s.planes AS lsh_planes, tab_s.tabs AS lsh_tables,
       |  tab.planes AS lsh_planes_full, tab.tabs AS lsh_tables_full,
       |  TRUE AS subset_ok, TRUE AS recall_ok
       |FROM cnt, tab, tab_s""".stripMargin

  val dedupEmbeddingOracle: String =
    s"""WITH $embSampleCte,
       |p AS (
       |  SELECT a.vec_id AS a, b.vec_id AS b,
       |    ROUND(list_dot_product(a.v, b.v) /
       |      (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))), 6) AS cos
       |  FROM s a JOIN s b ON a.vec_id < b.vec_id)
       |SELECT a, b, cos FROM p WHERE cos >= 0.4""".stripMargin

  /** Cost-routed pair search ([[Similarity.nearDupPairsAuto]]): the
    * router predicts LSH candidate volume from (n, τ) and takes the
    * LSH path only when it forecasts ≥3× fewer candidates than brute
    * — at τ=0.4 the recall cap freezes planes at 6, candidates grow
    * quadratically again, and the sf1 soak MEASURED derived-LSH at
    * 1.56× brute wall-time, so routing to brute here is the correct
    * call, not a cop-out. The oracle replays the sizing formula AND
    * the routing inequality from COUNT(*), and pins the routed
    * output (pair count + exact decimal cosine mass) against the
    * brute definition — if the engine ever mis-routes to LSH at a
    * gate SF, `routed_lsh` flips and the subset output breaks
    * `n_pairs`/`sum_cos` too. */
  def dedupEmbeddingAuto(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val n = emb.count()
    // the FULL-corpus routing decision is pure arithmetic on n — the
    // thing the router exists for — emitted and oracle-replayed
    // without running any full-corpus pair join (r8 witness
    // discipline, [[embSample]]); the routed EXECUTION is pinned on
    // the sample, where the oracle can recompute the exact output
    val pFull = Similarity.lshDerivedParams(n, 0.4)
    val routedFull = Similarity.lshWorthIt(n, pFull)
    val (sampled, _) = embSample(emb, n)
    val auto = Similarity.nearDupPairsAuto(sampled, "vec_id", "embedding",
      threshold = 0.4, dim = 64)
    val p = Similarity.lshParamsOf(auto).getOrElse(
      throw new IllegalStateException(
        "dedup_embedding_auto must come from the routed path"))
    val routedS = Similarity.lshRoutedOf(auto).getOrElse(
      throw new IllegalStateException(
        "dedup_embedding_auto must carry the routing decision"))
    emb.agg(count(lit(1)).as("n_vectors"))
      .crossJoin(sampled.agg(count(lit(1)).as("n_sample")))
      .crossJoin(auto.agg(count(lit(1)).as("n_pairs"),
        sum(col("cos").cast("decimal(18,6)")).cast("double").as("sum_cos")))
      .select(col("n_vectors"), col("n_sample"),
        lit(pFull.numPlanes).as("lsh_planes"), lit(pFull.numTables).as("lsh_tables"),
        lit(routedFull).as("routed_lsh"),
        lit(p.numPlanes).as("lsh_planes_sample"),
        lit(routedS).as("routed_lsh_sample"),
        col("n_pairs"), col("sum_cos"))
  }

  val dedupEmbeddingAutoOracle: String =
    s"""WITH $embSampleCte,
       |p AS (
       |  SELECT a.vec_id AS a, b.vec_id AS b,
       |    ROUND(list_dot_product(a.v, b.v) /
       |      (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))), 6) AS cos
       |  FROM s a JOIN s b ON a.vec_id < b.vec_id),
       |sz AS (SELECT COUNT(*) AS n FROM embeddings),
       |szs AS (SELECT COUNT(*) AS n FROM s),
       |${lshParamsSql(0.4)},
       |${lshParamsSql(0.4, src = "szs", suffix = "_s")},
       |route AS (
       |  SELECT n, planes, tabs,
       |    (tabs * CAST(n AS DOUBLE) * n / POWER(CAST(2.0 AS DOUBLE), planes)
       |        / CAST(2.0 AS DOUBLE)) * CAST(3.0 AS DOUBLE)
       |      <= CAST(n AS DOUBLE) * (n - 1) / CAST(2.0 AS DOUBLE) AS routed
       |  FROM sz, tab),
       |route_s AS (
       |  SELECT planes, (tabs * CAST(n AS DOUBLE) * n
       |        / POWER(CAST(2.0 AS DOUBLE), planes)
       |        / CAST(2.0 AS DOUBLE)) * CAST(3.0 AS DOUBLE)
       |      <= CAST(n AS DOUBLE) * (n - 1) / CAST(2.0 AS DOUBLE) AS routed
       |  FROM szs, tab_s),
       |agg AS (
       |  SELECT COUNT(*) AS n_pairs,
       |    CAST(SUM(CAST(cos AS DECIMAL(18,6))) AS DOUBLE) AS sum_cos
       |  FROM p WHERE cos >= 0.4)
       |SELECT route.n AS n_vectors, (SELECT n FROM szs) AS n_sample,
       |  route.planes AS lsh_planes, route.tabs AS lsh_tables,
       |  route.routed AS routed_lsh,
       |  route_s.planes AS lsh_planes_sample,
       |  route_s.routed AS routed_lsh_sample,
       |  n_pairs, sum_cos
       |FROM route, route_s, agg""".stripMargin

  /** High-threshold LSH certification on PLANTED near-duplicates —
    * the regime hyperplane LSH is FOR (τ=0.9: the size rule, not the
    * recall cap, picks the planes; the router's measured 0.207×-brute
    * win). The natural corpus has ZERO pairs above cos 0.8 at every
    * SF, so τ=0.4 rows can't witness this regime non-vacuously;
    * instead every 20th vector gets a deterministic perturbed twin
    * (id+10⁷, v′ᵢ = vᵢ + 0.3·v₍ᵢ mod d₎₊₁ — double arithmetic both
    * engines replay bit-for-bit, cos(v,v′) ≈ 0.96) and the operator
    * runs on the full planted corpus at corpus-derived params.
    * Witnesses: `subset_ok` — every found planted pair carries the
    * identical exact rounded cosine (the verify stage is exact);
    * `recall_ok` — found planted pairs ≥ 0.9 of the LINEARLY-computed
    * planted-pair truth (no O(n²) anywhere engine-side);
    * `no_spurious` — nothing found outside the planted set (backed by
    * the measured corpus fact above; the oracle recomputes the
    * planted truth and the derived params from COUNT(*)). Engine
    * cost: LSH candidates (sub-quadratic at τ=0.9 by construction)
    * plus an O(n_planted) exact side. */
  def dedupEmbeddingPlanted(s: SparkSession, d: String): DataFrame = {
    import graft.functions.ArrayDot
    val emb = t(s, d, "embeddings")
    val e = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val pl = e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + lit(10000000L)).as("vec_id"),
        transform(sequence(lit(1), lit(64)), i =>
          element_at(col("v"), i) +
            lit(0.3) * element_at(col("v"), pmod(i, lit(64)) + lit(1)))
          .as("v"))
    val corpus = e.unionByName(pl)
    val approx = Similarity.nearDupPairsLshDerived(corpus, "vec_id", "v",
      threshold = 0.9, dim = 64)
    val p = Similarity.lshParamsOf(approx).getOrElse(
      throw new IllegalStateException(
        "dedup_embedding_planted must use the corpus-derived LSH path"))
    // the planted-pair truth is LINEAR: original joined to its twin
    // by id arithmetic, exact cosine recomputed directly
    def n2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      sqrt(ArrayDot(c, c))
    val plantedPairs = e.select(col("vec_id").as("a"), col("v").as("av"))
      .join(pl.select((col("vec_id") - lit(10000000L)).as("a"),
        col("vec_id").as("b"), col("v").as("bv")), "a")
      .withColumn("cos", round(
        ArrayDot(col("av"), col("bv")) / (n2(col("av")) * n2(col("bv"))), 6))
      .filter(col("cos") >= 0.9)
      .select("a", "b", "cos")
      .localCheckpoint(eager = false) // feeds 3 certification consumers
    val foundPlanted = approx.join(plantedPairs, Seq("a", "b", "cos"))
    val foundPlantedAnyCos = approx.select("a", "b")
      .join(plantedPairs.select("a", "b"), Seq("a", "b"))
    val foundOther = approx
      .join(plantedPairs.select("a", "b"), Seq("a", "b"), "left_anti")
    pl.agg(count(lit(1)).as("n_planted"))
      .crossJoin(corpus.agg(count(lit(1)).as("n_corpus")))
      .crossJoin(plantedPairs.agg(count(lit(1)).as("n_planted_above")))
      .crossJoin(foundPlanted.agg(count(lit(1)).as("n_found_exactcos")))
      .crossJoin(foundPlantedAnyCos.agg(count(lit(1)).as("n_found")))
      .crossJoin(foundOther.agg(count(lit(1)).as("n_other")))
      .select(col("n_corpus"), col("n_planted"), col("n_planted_above"),
        lit(p.numPlanes).as("lsh_planes"), lit(p.numTables).as("lsh_tables"),
        (col("n_found_exactcos") === col("n_found")).as("subset_ok"),
        (col("n_found").cast("double") / col("n_planted_above") >= 0.9)
          .as("recall_ok"),
        (col("n_other") === 0).as("no_spurious"))
  }

  val dedupEmbeddingPlantedOracle: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |pl AS (
       |  SELECT vec_id + 10000000 AS vec_id,
       |    list_transform(generate_series(1, 64),
       |      i -> v[i] + CAST(0.3 AS DOUBLE) * v[(i % 64) + 1]) AS v
       |  FROM e WHERE vec_id % 20 = 0),
       |sz AS (SELECT (SELECT COUNT(*) FROM e) + (SELECT COUNT(*) FROM pl) AS n),
       |${lshParamsSql(0.9)},
       |planted AS (
       |  SELECT o.vec_id AS a, p.vec_id AS b,
       |    ROUND(list_dot_product(o.v, p.v) /
       |      (SQRT(list_dot_product(o.v, o.v)) * SQRT(list_dot_product(p.v, p.v))), 6) AS cos
       |  FROM e o JOIN pl p ON p.vec_id = o.vec_id + 10000000)
       |SELECT (SELECT n FROM sz) AS n_corpus,
       |  (SELECT COUNT(*) FROM pl) AS n_planted,
       |  (SELECT COUNT(*) FROM planted WHERE cos >= 0.9) AS n_planted_above,
       |  planes AS lsh_planes, tabs AS lsh_tables,
       |  TRUE AS subset_ok, TRUE AS recall_ok, TRUE AS no_spurious
       |FROM tab""".stripMargin

  /** SemDeDup certification (Abbas et al. 2023 cluster-then-prune,
    * [[Similarity.semDedupPairs]]): KMeans cells with 3-probe soft
    * assignment bound the pair search, connected components pick the
    * min-id survivor. Certified against the brute exact twin:
    * `subset_ok` — every cluster-found pair (within the certification
    * sample) is an exact pair with an identical rounded cosine
    * (candidates are exact-verified, so a false here means broken
    * scoring); `recall_ok` — pair recall ≥ 0.8 on the sampled pair
    * domain (full-corpus recall measured with probes=3 at the derived
    * k: 1.000/1.000/0.965 at sf0.001/0.01/0.1 (k=8) and 0.820 at the
    * 20k-vector sf1 soak (k=16) — SemDedupProbe); `drop_sound` —
    * every dropped doc is a vertex of some found pair; `partition_ok`
    * — kept + dropped = corpus (both FULL-corpus). The exact twin is
    * capped to a ~1000-vertex deterministic id-hash sample so the
    * certification pays O(cap²), not O(n²) — the sampled exact pair
    * set is what the oracle replays; production callers use
    * [[Similarity.semDedup]] alone and never pay any twin. */
  def dedupSemantic(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    // cells sized to the corpus (k ∝ n, the SemDeDup paper's own
    // discipline — fixed k lets per-cell population, and the n²/k
    // candidate count, grow quadratically; since r8 the rule is
    // UNCLAMPED above, with the KMeans fit sample-bounded and cell
    // routing two-level — see semDedupDerivedK). The
    // ~1250-vectors/cell target is the τ = 0.4 recall floor:
    // SemDedupProbe at the sf1 soak measured recall 0.820/0.668/0.530
    // at k = 16/32/64 — 66°-apart "duplicates" simply straddle fine
    // clusters, so a low threshold caps how small cells may get
    // (recall ≥ 0.8 ⇒ cells ≥ ~1250). The CANDIDATE VOLUME is thus
    // recall-mandated (≈ n²·probes²/(2k) ≈ 0.28·n² at τ = 0.4) — but
    // volume is not wall-clock: the r9 carry-through + sliced-key
    // rewrite of semDedupPairsIndexed (vectors ride the cell
    // self-join, candidates die in-stage, a-side sliced for
    // parallelism) took the sf1 soak row 121.2 → 10.2 s and the
    // sf1/sf0.1 ratio 16.7× → ~3× with a BIT-IDENTICAL pair set
    // (SemDedupProbe re-pinned 0.965/0.820). At high τ — SemDeDup's
    // design regime — fine cells keep recall (SimilaritySpec pins
    // ≥ 0.9 planted-pair recall at τ = 0.9 with k = 80 two-level
    // cells), so the unclamped rule scales sub-quadratically exactly
    // where production runs it; at low τ on corpora too big for the
    // 0.28·n² stream the honest tools are the router's brute path or
    // the sampled certification the other embedding rows use.
    // Derived: gate SFs → 8, sf1 soak → 16.
    val n = emb.count()
    val nClusters = Similarity.semDedupDerivedK(n)
    // The KMeans cell index is a pure function of (corpus, k, seed) —
    // memoize it on disk exactly like knn_ivf_prebuilt, so repeated
    // runs (bench warm reps; a nightly re-dedup of an unchanged base
    // corpus) pay assignment + within-cell verification only, never
    // the fit. The fingerprint stamp invalidates on data change, and
    // k is derived from n, so a changed corpus can never be served a
    // stale or mis-sized index.
    // tag = derived k (the knn_ivf_prebuilt discipline): a
    // semDedupDerivedK recalibration must invalidate the memo — this
    // row emits no k column, so a stale-k index would otherwise keep
    // passing the gate while certifying a config the code no longer
    // derives
    val index = ivfLoadOrBuild(s, "target/ivf_index_semantic", d,
      tag = s"k=$nClusters")(
      Similarity.ivfBuild(emb, "vec_id", "embedding", nClusters,
        knownN = Some(n)))
    val semPairs = Similarity.semDedupPairsIndexed(index,
      threshold = 0.4, assignProbes = 3)
      .localCheckpoint(eager = false) // feeds 4 certification consumers
    // The exact twin is restricted to a DETERMINISTIC id-hash sample
    // of ~1000 vertices (the engine's id-arithmetic sampling rule —
    // TrainingData.mixtureKeep — so the oracle replays the SAME
    // restriction exactly): certification cost is O(cap²) however big
    // the corpus, instead of O(n²). Pairs whose endpoints BOTH land in
    // the sample are an unbiased pair sample, so the recall and
    // subset witnesses keep their meaning; drop-soundness and the
    // kept/dropped partition stay FULL-corpus. Integer permille =
    // min(1000, 1_000_000/n) so Spark and DuckDB compare identical
    // integers (cap·1000/n with cap = 1000).
    val (sampled, permille) = embSample(emb, n)
    val exactS = Similarity.nearDupPairs(sampled, "vec_id", "embedding",
      threshold = 0.4)
      .localCheckpoint(eager = false) // sampled twin, 3 consumers below
    // keep-list from the SAME pair set — the KMeans build and pair
    // search run once, not twice
    val kept = Similarity.keepFromPairs(emb, "vec_id", semPairs)
    val semPairsS = semPairs
      .filter(graft.scaleops.TrainingData.mixtureKeep(
          col("a"), lit(permille.toDouble / 1000.0)) &&
        graft.scaleops.TrainingData.mixtureKeep(
          col("b"), lit(permille.toDouble / 1000.0)))
    val notInExact = semPairsS.join(exactS, Seq("a", "b", "cos"), "left_anti")
    val common = semPairsS.select("a", "b")
      .join(exactS.select("a", "b"), Seq("a", "b"))
    val dropped = emb.select(col("vec_id"))
      .join(kept, Seq("vec_id"), "left_anti")
    val pairVertices = semPairs.select(col("a").as("vec_id"))
      .union(semPairs.select(col("b").as("vec_id"))).distinct()
    val orphanDropped = dropped.join(pairVertices, Seq("vec_id"), "left_anti")
    exactS.agg(count(lit(1)).as("n_exact_sampled"))
      .crossJoin(emb.agg(count(lit(1)).as("n_docs")))
      .crossJoin(sampled.agg(count(lit(1)).as("n_sample")))
      .crossJoin(notInExact.agg(count(lit(1)).as("n_bad")))
      .crossJoin(common.agg(count(lit(1)).as("n_common")))
      .crossJoin(kept.agg(count(lit(1)).as("n_kept")))
      .crossJoin(dropped.agg(count(lit(1)).as("n_dropped")))
      .crossJoin(orphanDropped.agg(count(lit(1)).as("n_orphan")))
      .select(col("n_docs"), col("n_sample"), col("n_exact_sampled"),
        (col("n_bad") === 0).as("subset_ok"),
        // zero-pair guard: n_common/0 would be NULL, and the oracle's
        // literal TRUE would then read as a hash mismatch for a
        // vacuously-correct run
        (col("n_exact_sampled") === 0 ||
          col("n_common").cast("double") / col("n_exact_sampled") >= 0.8)
          .as("recall_ok"),
        (col("n_orphan") === 0).as("drop_sound"),
        (col("n_kept") + col("n_dropped") === col("n_docs")).as("partition_ok"))
  }

  val dedupSemanticOracle: String =
    s"""WITH $embSampleCte,
      |p AS (
      |  SELECT a.vec_id AS a, b.vec_id AS b,
      |    ROUND(list_dot_product(a.v, b.v) /
      |      (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))), 6) AS cos
      |  FROM s a JOIN s b ON a.vec_id < b.vec_id)
      |SELECT (SELECT COUNT(*) FROM embeddings) AS n_docs,
      |  (SELECT COUNT(*) FROM s) AS n_sample,
      |  COUNT(*) AS n_exact_sampled, TRUE AS subset_ok, TRUE AS recall_ok,
      |  TRUE AS drop_sound, TRUE AS partition_ok
      |FROM p WHERE cos >= 0.4""".stripMargin

  // ---- similarity search ----------------------------------------------
  def knnBrute(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    Similarity.knnBrute(emb, "vec_id", "embedding",
      queries = emb.filter(col("vec_id") < 10), k = 5)
  }

  val knnBruteOracle: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
      |s AS (
      |  SELECT query_id, e.vec_id AS neighbor_id,
      |    ROUND(list_dot_product(qv, v) /
      |      (SQRT(list_dot_product(qv, qv)) * SQRT(list_dot_product(v, v))), 6) AS cos
      |  FROM q, e WHERE e.vec_id <> query_id),
      |r AS (
      |  SELECT query_id, neighbor_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
      |  FROM s)
      |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 5""".stripMargin

  /** One-row ANN certification vs the exact twin: exact-side counts
    * the oracle recomputes in SQL, plus Spark-witnessed properties —
    * recall over exact top-k ≥ `minRecall`, and per-query ranks dense
    * from 1 (min(rank)=1, max(rank)=count). `min` over the boolean
    * column is conjunction. Returned ANN scores are exact cosines by
    * construction (candidates are exact-scored), so score equality
    * needs no separate witness. */
  private def knnCertify(approx: DataFrame, exact: DataFrame,
                         minRecall: Double): DataFrame = {
    val common = approx.select("query_id", "neighbor_id")
      .join(exact.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"))
    val ranks = approx.groupBy("query_id")
      .agg(min("rank").as("mn"), max("rank").as("mx"), count(lit(1)).as("c"))
      .agg(min(col("mn") === 1 && col("mx") === col("c")).as("ranks_dense"))
    exact.agg(countDistinct("query_id").as("n_queries"),
        max("rank").as("k"), count(lit(1)).as("n_exact"))
      .crossJoin(common.agg(count(lit(1)).as("n_common")))
      .crossJoin(ranks)
      .select(col("n_queries"), col("k"), col("n_exact"),
        (col("n_common").cast("double") / col("n_exact") >= minRecall)
          .as("recall_ok"),
        col("ranks_dense"))
  }

  /** Exact-top-k CTE shared by the ANN certification oracles. */
  private val knnExactTopkCte: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
      |s AS (
      |  SELECT query_id, e.vec_id AS neighbor_id,
      |    ROUND(list_dot_product(qv, v) /
      |      (SQRT(list_dot_product(qv, qv)) * SQRT(list_dot_product(v, v))), 6) AS cos
      |  FROM q, e WHERE e.vec_id <> query_id),
      |r AS (
      |  SELECT query_id, neighbor_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
      |  FROM s),
      |topk AS (SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5)""".stripMargin

  /** Multi-table MULTI-PROBE LSH ANN certified against brute top-k,
    * at CORPUS-DERIVED plane/table counts
    * ([[Similarity.lshMultiProbeParams]] with the default minCos=0.5
    * neighbor floor, targetRecall 0.95 — HIGHER than the pair path's
    * 0.85 since knn candidates are query-bounded). Since r9 the
    * query side probes its bucket plus every one-flipped-plane
    * neighbor: recall lives on the |Q|-bounded side, so 7 tables
    * replace 22 at the sf1 soak and the plane cap stops freezing
    * bucket growth (the single-probe rule's 10.6×-for-10×-data
    * defect; measured after: 4.2×, recall 1.00/1.00/1.00/0.96).
    * Bound 0.9 (raised from the static-era 0.5 once derivation
    * landed — r6 ADVICE). The chosen plane/table counts are result
    * columns read from the provenance stamp
    * ([[Similarity.lshParamsOf]]); the oracle recomputes them from
    * COUNT(*) — reverting to static or single-probe sizing throws
    * here and hash-mismatches there. */
  def knnLsh(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val approx =
      Similarity.knnLshDerived(emb, "vec_id", "embedding", q, k = 5, dim = 64)
    val p = Similarity.lshParamsOf(approx).getOrElse(throw new IllegalStateException(
      "knn_lsh must use the corpus-derived LSH path"))
    knnCertify(
      approx,
      Similarity.knnBrute(emb, "vec_id", "embedding", q, k = 5),
      minRecall = 0.9)
      .select(col("n_queries"), col("k"), col("n_exact"),
        lit(p.numPlanes).as("lsh_planes"), lit(p.numTables).as("lsh_tables"),
        col("recall_ok"), col("ranks_dense"))
  }

  /** DuckDB replay of [[Similarity.lshMultiProbeParams]] — the
    * multi-probe knn sizing. `c`, the per-plane agreement
    * probability, is spelled inline; the plane recall-cap is a MAX
    * over generate_series(1,30) of the p whose per-table multi-probe
    * collision `c^p + p·c^(p−1)·(1−c)` still reaches the per-table
    * floor `1 − (1−R)^(1/32)` — the same scan the Scala rule runs. */
  private def lshMultiProbeParamsSql(tau: Double, recall: Double): String = {
    val c = s"(CAST(1.0 AS DOUBLE) - ACOS(CAST($tau AS DOUBLE)) / PI())"
    val floorExpr = s"(CAST(1.0 AS DOUBLE) - POWER(CAST(1.0 AS DOUBLE) " +
      s"- CAST($recall AS DOUBLE), CAST(1.0 AS DOUBLE) / CAST(32.0 AS DOUBLE)))"
    s"""mpp AS (
       |  SELECT GREATEST(1, LEAST(LEAST(
       |      CAST(CEIL(LN(GREATEST(CAST(1.0 AS DOUBLE), n / CAST(512.0 AS DOUBLE)))
       |        / LN(CAST(2.0 AS DOUBLE))) AS INT),
       |      GREATEST(1, COALESCE((
       |        SELECT MAX(p) FROM generate_series(1, 30) AS g(p)
       |        WHERE POWER($c, p) + p * POWER($c, p - 1)
       |            * (CAST(1.0 AS DOUBLE) - $c) >= $floorExpr), 1))),
       |    30)) AS planes
       |  FROM sz),
       |mpt AS (
       |  SELECT planes, GREATEST(4, LEAST(32,
       |    CAST(CEIL(LN(CAST(1.0 AS DOUBLE) - CAST($recall AS DOUBLE))
       |      / LN(CAST(1.0 AS DOUBLE) - LEAST(POWER($c, planes)
       |        + planes * POWER($c, planes - 1)
       |          * (CAST(1.0 AS DOUBLE) - $c),
       |        CAST(1.0 AS DOUBLE) - CAST(1e-9 AS DOUBLE)))) AS INT))) AS tabs
       |  FROM mpp)""".stripMargin
  }

  val knnLshOracle: String =
    s"""$knnExactTopkCte,
       |sz AS (SELECT COUNT(*) AS n FROM embeddings),
       |${lshMultiProbeParamsSql(0.5, recall = 0.95)}
       |SELECT COUNT(DISTINCT query_id) AS n_queries,
       |  CAST(MAX(rank) AS INT) AS k, COUNT(*) AS n_exact,
       |  planes AS lsh_planes, tabs AS lsh_tables,
       |  TRUE AS recall_ok, TRUE AS ranks_dense
       |FROM topk, mpt
       |GROUP BY planes, tabs""".stripMargin

  /** DuckDB replay of [[Similarity.ivfDerivedParams]] — nList ≈ √n
    * (floor 8), nProbe = ceil(0.35·nList) (floor 3, cap nList), all
    * IEEE-double ceil/sqrt so the engine's arithmetic reproduces
    * exactly. Emits one row (nlist, nprobe) given a one-row relation
    * `sz(n)`. */
  private val ivfParamsSql: String =
    """ivfp AS (
      |  SELECT GREATEST(8, CAST(CEIL(SQRT(CAST(n AS DOUBLE))) AS INT)) AS nlist
      |  FROM sz),
      |ivfq AS (
      |  SELECT nlist, LEAST(nlist, GREATEST(3,
      |    CAST(CEIL(CAST(0.35 AS DOUBLE) * nlist) AS INT))) AS nprobe
      |  FROM ivfp)""".stripMargin

  /** IVF ANN at CORPUS-DERIVED sizing ([[Similarity.knnIvfDerived]]:
    * nList ≈ √n cells, nProbe a fixed 0.35 fraction of them — the
    * same derivation discipline as the LSH rows; static 8/3 was the
    * thinnest certification margin in the registry, 0.68 measured vs
    * a 0.6 floor at sf1). Measured recall under the derived rule
    * (RecallProbe): 0.84 / 0.84 / 0.84 / 0.88 at
    * sf0.001 / 0.01 / 0.1 / sf1-soak — bound 0.75. The chosen
    * nList/nProbe are result columns read from the provenance stamp
    * ([[Similarity.ivfParamsOf]]); the oracle recomputes them from
    * COUNT(*) — reverting to static sizing throws here and
    * hash-mismatches there. The exact-search regime is pinned
    * separately by knn_ivf_full (nProbe = nList ≡ brute,
    * hash-matched). */
  def knnIvf(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val approx = Similarity.knnIvfDerived(emb, "vec_id", "embedding", q, k = 5)
    val p = Similarity.ivfParamsOf(approx).getOrElse(
      throw new IllegalStateException(
        "knn_ivf must use the corpus-derived IVF path"))
    knnCertify(approx,
      Similarity.knnBrute(emb, "vec_id", "embedding", q, k = 5),
      minRecall = 0.75)
      .select(col("n_queries"), col("k"), col("n_exact"),
        lit(p.nList).as("n_list"), lit(p.nProbe).as("n_probe"),
        col("recall_ok"), col("ranks_dense"))
  }

  val knnIvfOracle: String =
    s"""$knnExactTopkCte,
       |sz AS (SELECT COUNT(*) AS n FROM embeddings),
       |$ivfParamsSql
       |SELECT COUNT(DISTINCT query_id) AS n_queries,
       |  CAST(MAX(rank) AS INT) AS k, COUNT(*) AS n_exact,
       |  nlist AS n_list, nprobe AS n_probe,
       |  TRUE AS recall_ok, TRUE AS ranks_dense
       |FROM topk, ivfq
       |GROUP BY nlist, nprobe""".stripMargin

  /** Incremental dedup: docs with `doc_id % 5 = 4` play today's
    * arriving batch; pairs must touch the batch (new×old, new×new —
    * old×old was settled by prior runs). The oracle recomputes the
    * full pair set and applies the same restriction. */
  def dedupIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    Dedup.exactJaccardPairsIncremental(
      docs.filter(col("doc_id") % 5 =!= 4),
      docs.filter(col("doc_id") % 5 === 4),
      "doc_id", "text", shingleK = 2, minJaccard = 0.8)
  }

  val dedupIncrementalOracle: String =
    s"""WITH $jaccardPairCtes
       |SELECT a, b, jaccard FROM pairs
       |WHERE jaccard >= 0.8 AND (a % 5 = 4 OR b % 5 = 4)""".stripMargin

  /** Graph analytics over the near-dup edge set: triangle count
    * (two self-joins on oriented a<b edges — the standard distributed
    * formulation, shuffle bounded by edge count not node pairs),
    * wedge count from degrees, and the global clustering coefficient
    * 3·triangles/wedges. The oracle recomputes the same graph from
    * the shared Jaccard-pair CTE. */
  def dedupTriangles(s: SparkSession, d: String): DataFrame = {
    val edges = Dedup.exactJaccardPairs(t(s, d, "documents"), "doc_id",
      "text", shingleK = 2, minJaccard = 0.8)
      .select(col("a"), col("b"))
      .localCheckpoint(eager = false)
    val tri = edges.as("e1")
      .join(edges.as("e2"), col("e1.b") === col("e2.a"))
      .join(edges.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .agg(count(lit(1)).as("n_triangles"))
    val deg = edges.select(col("a").as("id"))
      .unionAll(edges.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val wedges = deg.agg(
      sum(col("deg") * (col("deg") - 1) / 2).cast("long").as("n_wedges"),
      count(lit(1)).as("n_nodes"))
    edges.agg(count(lit(1)).as("n_edges"))
      .crossJoin(tri).crossJoin(wedges)
      .select(col("n_edges"), col("n_nodes"), col("n_triangles"),
        col("n_wedges"),
        round(when(col("n_wedges") > 0,
          col("n_triangles") * 3.0 / col("n_wedges")).otherwise(0.0), 6)
          .as("clustering_coeff"))
  }

  val dedupTrianglesOracle: String =
    s"""WITH $jaccardPairCtes,
       |e AS (SELECT a, b FROM pairs WHERE jaccard >= 0.8),
       |tri AS (
       |  SELECT COUNT(*) AS n_triangles
       |  FROM e e1 JOIN e e2 ON e1.b = e2.a
       |    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
       |deg AS (
       |  SELECT id, COUNT(*) AS deg FROM (
       |    SELECT a AS id FROM e UNION ALL SELECT b FROM e)
       |  GROUP BY id),
       |w AS (
       |  SELECT CAST(SUM(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges,
       |    COUNT(*) AS n_nodes
       |  FROM deg)
       |SELECT (SELECT COUNT(*) FROM e) AS n_edges, n_nodes, n_triangles,
       |  n_wedges,
       |  ROUND(CASE WHEN n_wedges > 0
       |    THEN n_triangles * 3.0 / n_wedges ELSE 0.0 END, 6)
       |    AS clustering_coeff
       |FROM tri, w""".stripMargin

  /** PageRank centrality over the near-dup graph — ranks each doc by
    * how central it is to its duplication neighborhood (the canonical-
    * doc-per-cluster signal; see [[graft.operators.PageRank]]). Five
    * synchronous rounds at α=0.85; every iteration's arithmetic is
    * 9-dp-rounded with DECIMAL(18,9) contribution sums, so the oracle
    * replays ALL five rounds bit-for-bit as chained (unrolled) CTEs —
    * the whole trajectory is pinned, not just the fixpoint shape. */
  def graphPagerank(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.exactJaccardPairs(t(s, d, "documents"), "doc_id",
      "text", shingleK = 2, minJaccard = 0.8)
    graft.operators.PageRank.pagerank(pairs, "a", "b",
      damping = 0.85, iters = 5)
      .select(col("id").as("doc_id"), col("pagerank"))
  }

  val graphPagerankOracle: String = {
    // one chained CTE per synchronous round — DuckDB disallows
    // aggregates in a recursive term, so the fixed iteration count is
    // unrolled instead (same arithmetic as the engine, incl. the
    // double-forced damping constants: a bare `1.0 - 0.85` would be
    // DECIMAL arithmetic, a DIFFERENT double than the engine's)
    val rounds = (1 to 5).map { i =>
      s"""pr$i AS (
         |  SELECT e.b AS id,
         |    ROUND((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
         |        / (SELECT n FROM nv)
         |      + CAST(0.85 AS DOUBLE) * CAST(SUM(CAST(
         |          ROUND(p.score / d.deg, 9) AS DECIMAL(18,9))) AS DOUBLE),
         |      9) AS score
         |  FROM pr${i - 1} p
         |  JOIN deg d ON p.id = d.id
         |  JOIN edges e ON p.id = e.a
         |  GROUP BY e.b)""".stripMargin
    }.mkString(",\n")
    s"""WITH $jaccardPairCtes,
       |edges AS (
       |  SELECT a, b FROM pairs WHERE jaccard >= 0.8
       |  UNION SELECT b, a FROM pairs WHERE jaccard >= 0.8),
       |deg AS (SELECT a AS id, COUNT(*) AS deg FROM edges GROUP BY a),
       |nv AS (SELECT COUNT(*) AS n FROM deg),
       |pr0 AS (
       |  SELECT id, ROUND(CAST(1.0 AS DOUBLE) / (SELECT n FROM nv), 9)
       |    AS score
       |  FROM deg),
       |$rounds
       |SELECT id AS doc_id, score AS pagerank FROM pr5""".stripMargin
  }

  /** Label-propagation communities over the near-dup graph — the
    * community stage beside [[graphPagerank]]: 3 synchronous rounds,
    * labels start as doc ids, each vertex takes the MODE of its
    * neighbors' labels (min label on ties). Pure integer arithmetic,
    * so the oracle unrolls all three rounds as chained CTEs and the
    * per-vertex label table is hash-pinned exactly — trajectory, not
    * shape. See [[graft.operators.LabelPropagation]] (size-adaptive:
    * driver loop under the 2M-edge broadcast-discipline bound,
    * distributed join+argmax rounds above). */
  def graphCommunities(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.exactJaccardPairs(t(s, d, "documents"), "doc_id",
      "text", shingleK = 2, minJaccard = 0.8)
    graft.operators.LabelPropagation.propagate(pairs, "a", "b", iters = 3)
      .select(col("id").as("doc_id"), col("label"))
  }

  val graphCommunitiesOracle: String = {
    val rounds = (1 to 3).map { i =>
      s"""r$i AS (
         |  SELECT e.src, l.label, COUNT(*) AS c
         |  FROM edges e JOIN l${i - 1} l ON e.dst = l.id
         |  GROUP BY 1, 2),
         |l$i AS (
         |  SELECT src AS id, label FROM (
         |    SELECT src, label,
         |      ROW_NUMBER() OVER (PARTITION BY src
         |        ORDER BY c DESC, label ASC) AS rn
         |    FROM r$i)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    // MATERIALIZED: edges is referenced by l0 and all three rounds —
    // DuckDB inlines CTEs by default, which would re-evaluate the
    // shingle-pair join once per reference (the BPE-oracle lesson)
    s"""WITH $jaccardPairCtes,
       |edges AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM pairs WHERE jaccard >= 0.8
       |  UNION ALL SELECT b, a FROM pairs WHERE jaccard >= 0.8),
       |l0 AS (SELECT DISTINCT src AS id, src AS label FROM edges),
       |$rounds
       |SELECT id AS doc_id, label FROM l3""".stripMargin
  }

  /** SQ8-quantized ANN (int8 codes + exact re-rank, refine=4)
    * certified against brute top-k — see [[Similarity.knnSq8]]: the
    * candidate scan reads 64 B codes instead of 256 B floats (the
    * 100 TB IO dial, complementary to LSH/IVF's candidate dial).
    * int8 on this corpus barely perturbs ranking, so the bound is
    * high: measured recall (RecallProbe) 1.000 at every SF
    * (sf0.001 / 0.01 / 0.1); bound 0.9. */
  def knnSq8(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    knnCertify(
      Similarity.knnSq8(emb, "vec_id", "embedding", q, k = 5, refine = 4),
      Similarity.knnBrute(emb, "vec_id", "embedding", q, k = 5),
      minRecall = 0.9)
  }

  val knnSq8Oracle: String =
    s"""$knnExactTopkCte
       |SELECT COUNT(DISTINCT query_id) AS n_queries,
       |  CAST(MAX(rank) AS INT) AS k, COUNT(*) AS n_exact,
       |  TRUE AS recall_ok, TRUE AS ranks_dense
       |FROM topk""".stripMargin

  /** IVF×SQ8 composed ANN (cells bound the candidates, int8 codes
    * bound the bytes, exact refine restores scores — the standard
    * vector-store shape) certified against brute top-k at the same
    * corpus-derived routing as knn_ivf ([[Similarity
    * .knnIvfSq8Derived]]). Measured recall under the derived rule is
    * IDENTICAL to plain IVF at every SF (RecallProbe: 0.84/0.84/0.84
    * at sf0.001/0.01/0.1) — the SQ8 + refine stage loses nothing;
    * all loss is cell routing. Bound 0.75. */
  def knnIvfSq8(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val approx =
      Similarity.knnIvfSq8Derived(emb, "vec_id", "embedding", q, k = 5,
        refine = 4)
    val p = Similarity.ivfParamsOf(approx).getOrElse(
      throw new IllegalStateException(
        "knn_ivf_sq8 must use the corpus-derived IVF path"))
    knnCertify(approx,
      Similarity.knnBrute(emb, "vec_id", "embedding", q, k = 5),
      minRecall = 0.75)
      .select(col("n_queries"), col("k"), col("n_exact"),
        lit(p.nList).as("n_list"), lit(p.nProbe).as("n_probe"),
        col("recall_ok"), col("ranks_dense"))
  }

  val knnIvfSq8Oracle: String =
    s"""$knnExactTopkCte,
       |sz AS (SELECT COUNT(*) AS n FROM embeddings),
       |$ivfParamsSql
       |SELECT COUNT(DISTINCT query_id) AS n_queries,
       |  CAST(MAX(rank) AS INT) AS k, COUNT(*) AS n_exact,
       |  nlist AS n_list, nprobe AS n_probe,
       |  TRUE AS recall_ok, TRUE AS ranks_dense
       |FROM topk, ivfq
       |GROUP BY nlist, nprobe""".stripMargin

  /** IVF×SQ8 over a PREBUILT index + PERSISTED codes table — the
    * production (search-only) shape of the designated 100 TB ANN
    * architecture: centroids + cell assignments are fitted and saved
    * once ([[ivfLoadOrBuild]]), the int8 codes parquet is written
    * once beside them ([[Similarity.sq8Codes]] is a pure function of
    * the cell table, so the persisted codes are exactly what a
    * rebuild would produce), and every later search pays load +
    * route + code-scan + refine only — never a KMeans refit or a
    * corpus re-encode per query batch (the knn_ivf_prebuilt
    * precedent: 11.6 → 1.1 s). Same derived sizing and 0.75 bound as
    * knn_ivf_sq8; the codes memo invalidates with the index (the
    * loadOrBuild rebuild deletes it). */
  def knnIvfSq8Prebuilt(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val nCorpus = emb.count()
    val p = Similarity.ivfDerivedParams(nCorpus)
    val index = ivfLoadOrBuild(s, "target/ivf_index_sq8", d,
      tag = s"nList=${p.nList}")(
      Similarity.ivfBuild(emb, "vec_id", "embedding", p.nList,
        knownN = Some(nCorpus)))
    val codesPath = ivfMemoDir("target/ivf_index_sq8", d) + "/sq8_codes"
    if (!new java.io.File(s"$codesPath/_SUCCESS").exists)
      Similarity.sq8Codes(index).write.mode("overwrite").parquet(codesPath)
    val codes = s.read.parquet(codesPath)
    knnCertify(
      Similarity.knnIvfSq8Indexed(index, codes, "vec_id", "embedding", q,
        k = 5, nProbe = p.nProbe, refine = 4),
      Similarity.knnBrute(emb, "vec_id", "embedding", q, k = 5),
      minRecall = 0.75)
      .select(col("n_queries"), col("k"), col("n_exact"),
        lit(p.nList).as("n_list"), lit(p.nProbe).as("n_probe"),
        col("recall_ok"), col("ranks_dense"))
  }

  /** IVF×PQ composed ANN (faiss `IVF<n>,PQ8` — cells bound the
    * candidates, 8-BYTE product-quantization codes bound the bytes
    * (32× under floats, 8× under SQ8), ADC table lookups score, exact
    * refine restores scores — see [[Similarity.knnIvfPq]] /
    * [[graft.functions.Pq]]) certified against brute top-k at the
    * same corpus-derived routing as knn_ivf. PQ ranks coarser than
    * SQ8, so the refine pool is DERIVED from the probed-set size
    * ([[Similarity.pqDerivedRefine]] — max(16, ceil(√probed)):
    * refine=16 measured 0.68 at the sf1 soak because the probed set
    * grows ~linearly with n; the derived pool recovers 0.820 = plain
    * IVF there, and the sweep saturates at ≥32, so residual loss is
    * all routing) and the codebook is the faiss-default 8
    * bits/subspace (ks=256; ks=16 measured 0.48 at sf0.1 — 4-bit
    * cells are too coarse for ADC ordering). Measured recall
    * (RecallProbe): 0.840/0.820/0.880/0.820 at sf0.001/0.01/0.1/sf1
    * vs plain IVF's 0.840/0.840/0.880/0.820. Bound 0.75, same as
    * knn_ivf; the oracle replays nList/nProbe AND the refine rule
    * from COUNT(*). */
  def knnIvfPq(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val approx = Similarity.knnIvfPq(emb, "vec_id", "embedding", q, k = 5)
    val p = Similarity.ivfParamsOf(approx).getOrElse(
      throw new IllegalStateException(
        "knn_ivf_pq must use the corpus-derived IVF path"))
    val nCorpus = emb.count()
    knnCertify(approx,
      Similarity.knnBrute(emb, "vec_id", "embedding", q, k = 5),
      minRecall = 0.75)
      .select(col("n_queries"), col("k"), col("n_exact"),
        lit(p.nList).as("n_list"), lit(p.nProbe).as("n_probe"),
        lit(8).as("pq_m"), lit(256).as("pq_ks"),
        lit(Similarity.pqDerivedRefine(nCorpus, p)).as("pq_refine"),
        col("recall_ok"), col("ranks_dense"))
  }

  /** IVF×PQ over a PREBUILT index + PERSISTED codebook and codes —
    * the production (search-only) shape of the deepest-compression
    * ANN tier, completing the prebuilt family (knn_ivf_prebuilt
    * 11.6→1.1 s, knn_ivf_sq8_prebuilt): KMeans cells, the PQ
    * codebook (a pure function of the id-hash fit sample, ~130 KB at
    * m8/ks256/64-dim) and the 8-byte codes parquet are all written
    * once under the index memo ([[ivfLoadOrBuild]] invalidates them
    * with the index); every later search pays load + route + one ADC
    * code scan + exact refine — never a KMeans/PQ refit or corpus
    * re-encode. Same derived sizing, refine rule and 0.75 bound as
    * knn_ivf_pq, so the same oracle applies. */
  def knnIvfPqPrebuilt(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val nCorpus = emb.count()
    val p = Similarity.ivfDerivedParams(nCorpus)
    val index = ivfLoadOrBuild(s, "target/ivf_index_pq", d,
      tag = s"nList=${p.nList}")(
      Similarity.ivfBuild(emb, "vec_id", "embedding", p.nList,
        knownN = Some(nCorpus)))
    val base = ivfMemoDir("target/ivf_index_pq", d)
    val cbPath = s"$base/pq_cb"
    if (!new java.io.File(s"$cbPath/_SUCCESS").exists) {
      val cb = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8,
        ks = 256, knownN = Some(nCorpus))
      import s.implicits._
      cb.toSeq.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")
        .coalesce(1).write.mode("overwrite").parquet(cbPath)
    }
    val cb = s.read.parquet(cbPath).orderBy("i").collect()
      .map(_.getDouble(1))
    val codesPath = s"$base/pq_codes"
    if (!new java.io.File(s"$codesPath/_SUCCESS").exists)
      Similarity.pqCodes(index, cb).write.mode("overwrite")
        .parquet(codesPath)
    val codes = s.read.parquet(codesPath)
    knnCertify(
      Similarity.knnIvfPqIndexed(index, codes, cb, "vec_id", "embedding",
        q, k = 5, nProbe = p.nProbe,
        refine = Similarity.pqDerivedRefine(nCorpus, p)),
      Similarity.knnBrute(emb, "vec_id", "embedding", q, k = 5),
      minRecall = 0.75)
      .select(col("n_queries"), col("k"), col("n_exact"),
        lit(p.nList).as("n_list"), lit(p.nProbe).as("n_probe"),
        lit(8).as("pq_m"), lit(256).as("pq_ks"),
        lit(Similarity.pqDerivedRefine(nCorpus, p)).as("pq_refine"),
        col("recall_ok"), col("ranks_dense"))
  }

  val knnIvfPqOracle: String =
    s"""$knnExactTopkCte,
       |sz AS (SELECT COUNT(*) AS n FROM embeddings),
       |$ivfParamsSql
       |SELECT COUNT(DISTINCT query_id) AS n_queries,
       |  CAST(MAX(rank) AS INT) AS k, COUNT(*) AS n_exact,
       |  nlist AS n_list, nprobe AS n_probe,
       |  8 AS pq_m, 256 AS pq_ks,
       |  GREATEST(16, CAST(CEIL(SQRT(nprobe * CAST((SELECT n FROM sz) AS DOUBLE)
       |    / nlist)) AS INT)) AS pq_refine,
       |  TRUE AS recall_ok, TRUE AS ranks_dense
       |FROM topk, ivfq
       |GROUP BY nlist, nprobe""".stripMargin

  /** Greedy MMR diverse top-5 for query vector 0 over the top-20
    * relevance pool ([[Similarity.mmrSelect]], λ=0.7) — the
    * diversity-aware re-rank stage after ANN retrieval. Every pick of
    * the greedy chain is hash-pinned: the oracle unrolls all five
    * argmax rounds (MATERIALIZED pool/similarity CTEs — referenced
    * once per round, DuckDB would otherwise re-inline the corpus
    * scan), with 6-dp-rounded cosines and the 0.7/0.3 literal weights
    * shared by both engines. */
  def knnMmr(s: SparkSession, d: String): DataFrame =
    Similarity.mmrSelect(t(s, d, "embeddings"), "vec_id", "embedding",
      queryId = 0L)

  val knnMmrOracle: String = {
    val rounds = (2 to 5).map { r =>
      s"""s$r AS (
         |  SELECT vec_id, rel, score FROM (
         |    SELECT c.vec_id, c.rel,
         |      CAST(0.7 AS DOUBLE) * c.rel - CAST(0.3 AS DOUBLE) * (
         |        SELECT MAX(sim) FROM sim
         |        WHERE ia = c.vec_id
         |          AND ib IN (SELECT vec_id FROM sel${r - 1})) AS score
         |    FROM cand c
         |    WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${r - 1}))
         |  ORDER BY score DESC, vec_id ASC LIMIT 1),
         |sel$r AS (SELECT vec_id FROM sel${r - 1}
         |  UNION ALL SELECT vec_id FROM s$r)""".stripMargin
    }.mkString(",\n")
    val out = (1 to 5).map(r =>
      s"SELECT $r AS rank, vec_id, rel, ROUND(score, 6) AS score FROM s$r")
      .mkString("\nUNION ALL\n")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |relv AS (
       |  SELECT e.vec_id,
       |    ROUND(list_dot_product(qv, v) /
       |      (SQRT(list_dot_product(qv, qv)) * SQRT(list_dot_product(v, v))), 6) AS rel,
       |    e.v
       |  FROM e, q WHERE e.vec_id <> 0),
       |cand AS MATERIALIZED (
       |  SELECT * FROM relv ORDER BY rel DESC, vec_id ASC LIMIT 20),
       |sim AS MATERIALIZED (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib,
       |    ROUND(list_dot_product(a.v, b.v) /
       |      (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))), 6) AS sim
       |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
       |s1 AS (
       |  SELECT vec_id, rel, CAST(0.7 AS DOUBLE) * rel AS score
       |  FROM cand ORDER BY rel DESC, vec_id ASC LIMIT 1),
       |sel1 AS (SELECT vec_id FROM s1),
       |$rounds
       |$out""".stripMargin
  }

  /** IVF at nProbe = nList degenerates to exact search, so the
    * brute-force oracle applies — this pins the whole IVF path
    * (build, cell routing, scoring) to a hash-match, while `knn_ivf`
    * exercises the approximate regime. */
  def knnIvfFull(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    Similarity.knnIvf(emb, "vec_id", "embedding",
      queries = emb.filter(col("vec_id") < 10), k = 5,
      nList = 8, nProbe = 8)
  }

  /** IVF search over a PREBUILT on-disk index — the build/search
    * split that matters at 100 TB: centroids + cell assignments are
    * fitted and persisted ONCE ([[Similarity.ivfSave]]); every later
    * search pays only load + route + probe, never a KMeans refit per
    * query batch (every other IVF gate query rebuilds, ~3.4 s of pure
    * build at sf0.1). The index memoizes under `target/ivf_index/<sf>`
    * — the first run (the bench's untimed warm-up rep) builds and
    * saves, so the timed rep measures the search-only path. Certified
    * like knn_ivf: recall vs brute ≥ 0.6 at the same nList=8/nProbe=3
    * routing (the loaded index is a seed-42 build on this corpus, so
    * measured recall matches knn_ivf's 0.66/0.84/0.70). Save/load
    * fidelity — loaded search ≡ the saved in-memory index's search,
    * row for row — is pinned by SimilaritySpec. */
  /** Load a memoized on-disk IVF index, building + saving it on first
    * use — the shared protocol of both prebuilt-index gate queries
    * (one definition, so a change to the memoization contract — e.g.
    * partial-write invalidation — lands everywhere at once). */
  /** In-JVM residency for loaded IVF indexes: an index handle is a
    * driver-side KMeansModel plus a LAZY scan of the cells parquet,
    * and a hot index re-read from disk on every query batch is not
    * how a serving path behaves — vector stores keep live indexes
    * resident. Keyed by (session, dir, source fingerprint) so a
    * regenerated dataset or a new session can never be served a stale
    * handle; bounded at 8 entries (a handle is kilobytes). */
  private val ivfResident =
    new java.util.concurrent.ConcurrentHashMap[String, Similarity.IvfIndex]()

  private def ivfMemoDir(baseDir: String, d: String): String =
    baseDir + "/" + d.replaceAll("[^A-Za-z0-9.]+", "_")

  private def ivfLoadOrBuild(s: SparkSession, baseDir: String, d: String,
                             tag: String = "")
                            (build: => Similarity.IvfIndex): Similarity.IvfIndex = {
    val dir = ivfMemoDir(baseDir, d)
    // stale-index guard: the memo is keyed by dataset DIR NAME, so a
    // regenerated dataset under the same path would otherwise serve an
    // index fitted on the old rows — surfacing as a baffling gate
    // failure instead of a rebuild. Stamp the saved index with a
    // fingerprint of the source parquet (per-file name+size+mtime) —
    // plus the caller's `tag` (e.g. the derived nList, so a sizing-
    // rule change invalidates too) — and rebuild on mismatch.
    val src = new java.io.File(s"$d/embeddings.parquet")
    val srcFiles =
      if (src.isDirectory) src.listFiles.toSeq.sortBy(_.getName) else Seq(src)
    val fingerprint = (srcFiles
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}") :+ tag)
      .mkString("\n")
    val stampFile = new java.io.File(s"$dir/source_fingerprint.txt")
    val fresh = new java.io.File(s"$dir/cells/_SUCCESS").exists &&
      stampFile.exists && {
        val st = java.nio.file.Files.readString(stampFile.toPath)
        st == fingerprint
      }
    val key = s"${System.identityHashCode(s)}\n$dir\n$fingerprint"
    if (fresh) {
      val resident = ivfResident.get(key)
      if (resident != null) return resident
    }
    if (!fresh) {
      // derived artifacts beside the index (the SQ8/PQ codes
      // parquets, the PQ codebook) are pure functions of the cell
      // table / source corpus: a rebuilt index must invalidate them
      // with it
      for (name <- Seq("sq8_codes", "pq_codes", "pq_cb")) {
        val codes = new java.io.File(s"$dir/$name")
        if (codes.exists) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(codes.toPath).iterator().asScala.toSeq
            .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
      Similarity.ivfSave(build, dir)
      java.nio.file.Files.writeString(stampFile.toPath, fingerprint)
    }
    val loaded = Similarity.ivfLoad(s, dir)
    if (ivfResident.size >= 8) ivfResident.clear()
    ivfResident.put(key, loaded)
    loaded
  }

  def knnIvfPrebuilt(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    // same corpus-derived sizing as knn_ivf (the tag invalidates the
    // saved index if the derivation rule ever changes); the loaded
    // seed-42 build is identical to knn_ivf's, so recall matches
    val nCorpus = emb.count()
    val p = Similarity.ivfDerivedParams(nCorpus)
    val index = ivfLoadOrBuild(s, "target/ivf_index", d,
      tag = s"nList=${p.nList}")(
      Similarity.ivfBuild(emb, "vec_id", "embedding", p.nList,
        knownN = Some(nCorpus)))
    knnCertify(
      Similarity.ivfSearch(index, "vec_id", "embedding", q, k = 5,
        nProbe = p.nProbe),
      Similarity.knnBrute(emb, "vec_id", "embedding", q, k = 5),
      minRecall = 0.75)
      .select(col("n_queries"), col("k"), col("n_exact"),
        lit(p.nList).as("n_list"), lit(p.nProbe).as("n_probe"),
        col("recall_ok"), col("ranks_dense"))
  }

  /** Cost-routed DEFAULT k-NN ([[Similarity.knnAuto]]) certified in
    * BOTH routing regimes at once: a one-shot call (reuse=1) must
    * route to exact brute — witnessed row-identical against the brute
    * twin (`one_exact_ok`) — because at the recall-0.9-mandated probe
    * fraction a single small batch can never repay an index build;
    * an amortized call (reuse=100 query batches over the index
    * lifetime) must route to the derived-IVF tier and hold recall
    * ≥ 0.9 (floor raised above the 0.75 of the explicit-tier rows —
    * a DEFAULT must be safe; IvfProbeFracSweep measured 0.96-1.00 at
    * probeFrac 0.6 across all four SFs). Both routing booleans are
    * emitted and the oracle REPLAYS the cost model from COUNT(*)
    * ([[Similarity.knnIvfWorthIt]] — plain IEEE doubles both
    * engines), so a formula drift flips the hash. LSH is absent from
    * the default path by design: its table count grows with n to
    * hold recall (10.6× wall-clock for 10× data at the sf1 soak,
    * structural) while the IVF tier re-sizes as √n (≤ 1.4×
    * measured); [[Similarity.knnLshDerived]] remains the certified
    * explicit fallback (`knn_lsh`). */
  def knnAutoQ(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val n = emb.count()
    val p = Similarity.ivfDerivedParams(n, Similarity.knnAutoProbeFrac)
    val one = Similarity.knnAuto(emb, "vec_id", "embedding", q, k = 5,
      reuse = 1L)
    val many = Similarity.knnAuto(emb, "vec_id", "embedding", q, k = 5,
      reuse = 100L)
    val brute = Similarity.knnBrute(emb, "vec_id", "embedding", q, k = 5)
      .localCheckpoint(eager = false) // twin feeds 2 certifications
    val oneCommon = one.select("query_id", "rank", "neighbor_id", "cos")
      .join(brute, Seq("query_id", "rank", "neighbor_id", "cos"))
    knnCertify(many, brute, minRecall = 0.9)
      .crossJoin(oneCommon.agg(count(lit(1)).as("n_one_common")))
      .select(col("n_queries"), col("k"), col("n_exact"),
        lit(p.nList).as("n_list"), lit(p.nProbe).as("n_probe"),
        lit(Similarity.knnRoutedOf(one).get).as("route_one_ivf"),
        lit(Similarity.knnRoutedOf(many).get).as("route_many_ivf"),
        (col("n_one_common") === col("n_exact")).as("one_exact_ok"),
        col("recall_ok"), col("ranks_dense"))
  }

  val knnAutoOracle: String =
    s"""$knnExactTopkCte,
       |sz AS (SELECT COUNT(*) AS n FROM embeddings),
       |nq AS (SELECT COUNT(*) AS m FROM embeddings WHERE vec_id < 10),
       |pp AS (
       |  SELECT n, GREATEST(8, CAST(CEIL(SQRT(CAST(n AS DOUBLE))) AS INT)) AS nlist
       |  FROM sz),
       |p2 AS (
       |  SELECT n, nlist, LEAST(nlist, GREATEST(3,
       |    CAST(CEIL(CAST(0.6 AS DOUBLE) * nlist) AS INT))) AS nprobe
       |  FROM pp),
       |cost AS (
       |  SELECT n, nlist, nprobe,
       |    CASE WHEN nlist <= 64 THEN CAST(nlist AS DOUBLE)
       |      ELSE CEIL(SQRT(CAST(nlist AS DOUBLE)))
       |        + CAST(3.0 AS DOUBLE) * nlist / CEIL(SQRT(CAST(nlist AS DOUBLE)))
       |    END AS assign
       |  FROM p2),
       |dec AS (
       |  SELECT nlist, nprobe,
       |    ((CAST(n AS DOUBLE) * assign + CAST(1 AS DOUBLE) * m
       |        * (assign + CAST(nprobe AS DOUBLE) * n / nlist))
       |      * CAST(1.2 AS DOUBLE) <= CAST(1 AS DOUBLE) * m * n) AS route_one_ivf,
       |    ((CAST(n AS DOUBLE) * assign + CAST(100 AS DOUBLE) * m
       |        * (assign + CAST(nprobe AS DOUBLE) * n / nlist))
       |      * CAST(1.2 AS DOUBLE) <= CAST(100 AS DOUBLE) * m * n) AS route_many_ivf
       |  FROM cost, nq)
       |SELECT COUNT(DISTINCT query_id) AS n_queries,
       |  CAST(MAX(rank) AS INT) AS k, COUNT(*) AS n_exact,
       |  nlist AS n_list, nprobe AS n_probe,
       |  route_one_ivf, route_many_ivf,
       |  TRUE AS one_exact_ok, TRUE AS recall_ok, TRUE AS ranks_dense
       |FROM topk, dec
       |GROUP BY nlist, nprobe, route_one_ivf, route_many_ivf""".stripMargin

  /** Incremental IVF maintenance ([[Similarity.ivfAddBatch]]): a base
    * index fitted on the old corpus absorbs today's batch by frozen-
    * centroid assignment — no refit. Certified two ways: `union_ok`
    * witnesses that the incrementally-extended cell table is
    * ROW-IDENTICAL to transforming the full corpus with the same
    * model (assignment is a pure function of (model, vector), so any
    * divergence means a broken union/transform); then the standard
    * recall-vs-brute bound on a search over the extended index, with
    * queries drawn from the NEW batch — the freshly ingested rows
    * must be findable. Base model memoizes beside the prebuilt-query
    * index (`target/ivf_index_base/<sf>`), so the timed rep pays
    * assignment + search only — the per-batch cost at scale. */
  def knnIvfIncremental(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val batch = emb.filter(col("vec_id") < 100)
    val base = emb.filter(col("vec_id") >= 100)
    val baseIndex = ivfLoadOrBuild(s, "target/ivf_index_base", d)(
      Similarity.ivfBuild(base, "vec_id", "embedding", nList = 8))
    val incr = Similarity.ivfAddBatch(baseIndex, batch, "vec_id", "embedding")
    val full = Similarity.ivfAddBatch(
      Similarity.IvfIndex(baseIndex.model,
        baseIndex.indexed.limit(0)), emb, "vec_id", "embedding")
    val keyCols = Seq("cell", "neighbor_id")
    val unionOk =
      incr.indexed.select(keyCols.map(col): _*)
        .unionByName(full.indexed.select(keyCols.map(col): _*))
        .groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("c"))
        .agg(min(col("c") === 2).as("union_ok")) // every row in BOTH tables
    val q = emb.filter(col("vec_id") < 10) // queries ⊂ the new batch
    knnCertify(
      Similarity.ivfSearch(incr, "vec_id", "embedding", q, k = 5, nProbe = 3),
      Similarity.knnBrute(emb, "vec_id", "embedding", q, k = 5),
      minRecall = 0.6)
      .crossJoin(unionOk)
      .select(col("n_queries"), col("k"), col("n_exact"),
        col("union_ok"), col("recall_ok"), col("ranks_dense"))
  }

  val knnIvfIncrementalOracle: String =
    s"""$knnExactTopkCte
       |SELECT COUNT(DISTINCT query_id) AS n_queries,
       |  CAST(MAX(rank) AS INT) AS k, COUNT(*) AS n_exact,
       |  TRUE AS union_ok, TRUE AS recall_ok, TRUE AS ranks_dense
       |FROM topk""".stripMargin

  /** Exact bigram-Jaccard near-dup pairs (no LSH) — prefix-filtered
    * inverted index; oracle is the brute-force pair scan. t = 0.8 is
    * the standard near-dup regime AND the regime where prefix
    * filtering has teeth: this corpus' shingle vocabulary is tiny
    * (median df ≈ 285/5000 docs at sf0.1), so at t = 0.5 the
    * candidate set degenerates to nearly all n²/2 pairs for ANY exact
    * algorithm — that's what MinHash banding (dedup_minhash) is for. */
  def ngramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.exactJaccardPairs(tw(s, d, "documents", "doc_id"), "doc_id",
      "text", shingleK = 2, minJaccard = 0.8)

  /** Shared CTE text: bigram shingles + brute-force Jaccard pairs —
    * used by both the pair query's oracle and the connected-components
    * oracle so the two stay pinned to one definition. */
  // lazy: referenced by oracle vals that appear EARLIER in source
  // order (Scala initializes vals top-down; a plain val would be null
  // inside them)
  private lazy val jaccardPairCtes: String =
    """sh AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN len(toks) >= 2
      |      THEN list_transform(generate_series(1, len(toks) - 1),
      |        i -> toks[i] || ' ' || toks[i+1])
      |      ELSE [] END) AS s
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |        FROM documents)),
      |pairs AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b,
      |    ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
      |      len(list_distinct(a.s || b.s)), 6) AS jaccard
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)""".stripMargin

  val ngramJaccardOracle: String =
    s"""WITH $jaccardPairCtes
       |SELECT a, b, jaccard FROM pairs WHERE jaccard >= 0.8""".stripMargin

  /** Near-subset detection: containment C = common/min(|A|,|B|) at
    * 0.9 — catches a short doc quoted inside a long one, where
    * Jaccard collapses with the size gap. */
  def textContainment(s: SparkSession, d: String): DataFrame =
    Dedup.containmentPairs(tw(s, d, "documents", "doc_id"), "doc_id",
      "text", shingleK = 2, minContainment = 0.9)

  val textContainmentOracle: String =
    s"""WITH $jaccardPairCtes,
       |cpairs AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b,
       |    ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
       |      LEAST(len(a.s), len(b.s)), 6) AS containment,
       |    ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
       |      len(list_distinct(a.s || b.s)), 6) AS jaccard
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE len(a.s) > 0 AND len(b.s) > 0)
       |SELECT a, b, containment, jaccard FROM cpairs
       |WHERE containment >= 0.9""".stripMargin

  /** Near-dup clustering end-to-end: exact-Jaccard pair edges →
    * distributed connected components → (doc, component) assignment.
    * The oracle recomputes the same edges and closes them with a
    * recursive CTE — transitive "A~B, B~C ⇒ {A,B,C} one cluster"
    * semantics pinned across engines. */
  def dedupComponents(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.exactJaccardPairs(t(s, d, "documents"), "doc_id",
      "text", shingleK = 2, minJaccard = 0.8)
    graft.operators.ConnectedComponents.components(pairs, "a", "b")
      .select(col("id").as("doc_id"), col("comp").as("component"))
  }

  val dedupComponentsOracle: String =
    s"""WITH RECURSIVE $jaccardPairCtes,
       |edges AS (
       |  SELECT a, b FROM pairs WHERE jaccard >= 0.8
       |  UNION ALL SELECT b, a FROM pairs WHERE jaccard >= 0.8),
       |reach(id, comp) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.id)
       |SELECT id AS doc_id, MIN(comp) AS component
       |FROM reach GROUP BY id""".stripMargin

  /** Survivorship — the dedup end-cap: within each near-dup cluster,
    * the canonical document wins by RULE (longest text, then lowest
    * id) and the cluster report carries member count + chars saved.
    * Composes components → broadcast-join doc metadata → one rank
    * window over the (tiny) clustered subset. */
  def dedupSurvivorship(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.exactJaccardPairs(t(s, d, "documents"), "doc_id",
      "text", shingleK = 2, minJaccard = 0.8)
    val comps = graft.operators.ConnectedComponents.components(pairs, "a", "b")
      .select(col("id").as("doc_id"), col("comp").as("component"))
    val meta = t(s, d, "documents").select("doc_id", "n_chars")
    val w = Window.partitionBy("component")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    comps.join(meta, "doc_id")
      .withColumn("rk", row_number().over(w))
      .groupBy("component")
      .agg(count(lit(1)).as("n_members"),
        max(when(col("rk") === 1, col("doc_id"))).as("survivor_doc"),
        sum(col("n_chars")).as("total_chars"),
        sum(when(col("rk") =!= 1, col("n_chars")).otherwise(0L))
          .as("chars_removed"))
  }

  val dedupSurvivorshipOracle: String =
    s"""WITH RECURSIVE $jaccardPairCtes,
       |edges AS (
       |  SELECT a, b FROM pairs WHERE jaccard >= 0.8
       |  UNION ALL SELECT b, a FROM pairs WHERE jaccard >= 0.8),
       |reach(id, comp) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.id),
       |cc AS (SELECT id AS doc_id, MIN(comp) AS component
       |       FROM reach GROUP BY id),
       |ranked AS (
       |  SELECT cc.component, cc.doc_id, d.n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY cc.component
       |      ORDER BY d.n_chars DESC, cc.doc_id ASC) AS rk
       |  FROM cc JOIN documents d ON cc.doc_id = d.doc_id)
       |SELECT component, COUNT(*) AS n_members,
       |  MAX(CASE WHEN rk = 1 THEN doc_id END) AS survivor_doc,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       |  CAST(COALESCE(SUM(CASE WHEN rk <> 1 THEN n_chars ELSE 0 END), 0)
       |    AS BIGINT) AS chars_removed
       |FROM ranked GROUP BY component""".stripMargin

  /** The dedup pipeline END-TO-END in one corpus pass: pair edges →
    * connected components → survivorship + per-cluster edge stats.
    * The standalone queries (text_ngram_jaccard / dedup_components /
    * dedup_survivorship) each recompute the pair table — fine as
    * focused surfaces, but at 100 TB that is three shingle passes
    * over the corpus where one suffices. Here the pair table is
    * materialized ONCE (eager local checkpoint — the iterative CC
    * scans it every round, the edge stats scan it once more) and
    * every downstream stage reuses the materialized blocks. Decimal
    * sum keeps the per-cluster jaccard total order-independent. */
  def dedupPipeline(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val pairs = Dedup.exactJaccardPairs(docs, "doc_id", "text",
      shingleK = 2, minJaccard = 0.8)
      .localCheckpoint(eager = false) // materialized by CC's first pass
    val comps = graft.operators.ConnectedComponents.components(pairs, "a", "b")
      .select(col("id").as("doc_id"), col("comp").as("component"))
    val meta = docs.select("doc_id", "n_chars")
    val w = Window.partitionBy("component")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val memberStats = comps.join(meta, "doc_id")
      .withColumn("rk", row_number().over(w))
      .groupBy("component")
      .agg(count(lit(1)).as("n_members"),
        max(when(col("rk") === 1, col("doc_id"))).as("survivor_doc"),
        sum(when(col("rk") =!= 1, col("n_chars")).otherwise(0L))
          .as("chars_removed"))
    val edgeStats = pairs
      .join(comps.withColumnRenamed("doc_id", "a"), "a")
      .groupBy("component")
      .agg(count(lit(1)).as("n_edges"),
        round(sum(col("jaccard").cast("decimal(18,6)")).cast("double"), 6)
          .as("sum_jaccard"))
    memberStats.join(edgeStats, "component")
  }

  val dedupPipelineOracle: String =
    s"""WITH RECURSIVE $jaccardPairCtes,
       |edges AS (SELECT a, b, jaccard FROM pairs WHERE jaccard >= 0.8),
       |sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
       |reach(id, comp) AS (
       |  SELECT a, a FROM sym
       |  UNION
       |  SELECT e.a, r.comp FROM sym e JOIN reach r ON e.b = r.id),
       |cc AS (SELECT id AS doc_id, MIN(comp) AS component
       |       FROM reach GROUP BY id),
       |ranked AS (
       |  SELECT cc.component, cc.doc_id, d.n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY cc.component
       |      ORDER BY d.n_chars DESC, cc.doc_id ASC) AS rk
       |  FROM cc JOIN documents d ON cc.doc_id = d.doc_id),
       |members AS (
       |  SELECT component, COUNT(*) AS n_members,
       |    MAX(CASE WHEN rk = 1 THEN doc_id END) AS survivor_doc,
       |    CAST(COALESCE(SUM(CASE WHEN rk <> 1 THEN n_chars ELSE 0 END), 0)
       |      AS BIGINT) AS chars_removed
       |  FROM ranked GROUP BY component),
       |estats AS (
       |  SELECT cc.component, COUNT(*) AS n_edges,
       |    ROUND(CAST(SUM(CAST(e.jaccard AS DECIMAL(18,6))) AS DOUBLE), 6)
       |      AS sum_jaccard
       |  FROM edges e JOIN cc ON e.a = cc.doc_id
       |  GROUP BY cc.component)
       |SELECT m.component, m.n_members, m.survivor_doc, m.chars_removed,
       |  s.n_edges, s.sum_jaccard
       |FROM members m JOIN estats s ON m.component = s.component""".stripMargin

  /** Document fingerprint dedup: group by the order-insensitive
    * content fingerprint (md5 of sorted distinct tokens), report each
    * duplicate group. Catches token-reordered near-copies that exact
    * normalization misses. */
  def dedupFingerprint(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
      .filter(col("n_docs") > 1)

  val dedupFingerprintOracle: String =
    """SELECT md5(array_to_string(list_sort(list_distinct(
      |    string_split_regex(trim(lower(text)), '\s+'))), ' ')) AS fp,
      |  COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
      |FROM documents GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin

  /** Filtered kNN: nearest neighbors restricted to one label class —
    * the filter composes BEFORE the scan (predicate pushdown shrinks
    * the corpus), which is the whole point of filtered vector search:
    * never score what the metadata already excludes. */
  def knnFiltered(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    Similarity.knnBrute(emb.filter(col("label") === 1), "vec_id", "embedding",
      queries = emb.filter(col("vec_id") < 10), k = 3)
  }

  val knnFilteredOracle: String =
    """WITH e AS (
      |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
      |s AS (
      |  SELECT query_id, e.vec_id AS neighbor_id,
      |    ROUND(list_dot_product(qv, v) /
      |      (SQRT(list_dot_product(qv, qv)) * SQRT(list_dot_product(v, v))), 6) AS cos
      |  FROM q, e WHERE e.vec_id <> query_id AND e.label = 1),
      |r AS (
      |  SELECT query_id, neighbor_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
      |  FROM s)
      |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 3""".stripMargin

  /** Whitespace vs BPE-ish token counts side by side — the sub-word
    * segmentation surface (word pieces + digits + punctuation as
    * separate tokens), aggregated per source. */
  def textBpeish(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .groupBy("source")
      .agg(
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("ws_tokens"),
        sum(size(TextAnalysis.bpeishTokens(col("text"))).cast("long"))
          .as("bpeish_tokens"))

  val textBpeishOracle: String =
    """SELECT source,
      |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS ws_tokens,
      |  CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS bpeish_tokens
      |FROM documents GROUP BY source""".stripMargin

  /** TF-IDF top-3 terms per doc (df/N over the FULL corpus, output
    * restricted to the first 20 docs to keep the result bounded). */
  def textTfidf(s: SparkSession, d: String): DataFrame =
    TextAnalysis.tfidfTopTerms(t(s, d, "documents"), "doc_id", "text", 3)
      .filter(col("doc_id") < 20)

  val textTfidfOracle: String =
    """WITH terms AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |scored AS (
      |  SELECT doc_id, term,
      |    ROUND(tf * (LN((n + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
      |  FROM tf JOIN df USING (term), n),
      |r AS (
      |  SELECT doc_id, term, tfidf,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY tfidf DESC, term ASC) AS INT) AS rank
      |  FROM scored)
      |SELECT doc_id, rank, term, tfidf FROM r
      |WHERE rank <= 3 AND doc_id < 20""".stripMargin

  /** Stratified downsampling by deterministic systematic selection:
    * per event_type, keep rows whose event_id mod 100 falls under the
    * stratum's quota — class rebalancing that is reproducible across
    * engines and runs (seeded Bernoulli `sampleBy` is engine-specific
    * RNG; systematic selection on a uniform key is the
    * oracle-checkable twin). */
  def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    val quota = typedLit(Map(
      "click" -> 10, "view" -> 5, "purchase" -> 100,
      "signup" -> 100, "error" -> 50))
    t(s, d, "events")
      // `%` not pmod: same truncated-modulo semantics as the oracle's
      // DuckDB `%` if event_ids were ever negative.
      .filter(col("event_id") % 100 <
        coalesce(quota(col("event_type")), lit(0)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_sampled"),
        QUtil.moneySum(QUtil.dec6(col("value"))).as("sum_value"))
  }

  val stratifiedSampleOracle: String =
    """SELECT event_type, COUNT(*) AS n_sampled,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE event_id % 100 < CASE event_type
      |  WHEN 'click' THEN 10 WHEN 'view' THEN 5 WHEN 'purchase' THEN 100
      |  WHEN 'signup' THEN 100 WHEN 'error' THEN 50 ELSE 0 END
      |GROUP BY event_type""".stripMargin

  /** The FULL curation pipeline a 100 TB pretraining corpus runs, as
    * ONE composed query with every stage's count replayed in SQL:
    * Gopher rule gate → duplicated-span filter (Lee 2022 coverage,
    * integer 2·dup ≤ n so no rounding boundary) → embedding-cosine
    * dedup keep-list (exact pairs ≥ 0.4 over the survivors'
    * embeddings → connected components → min-id survivor; the
    * SQL-replayable twin of the SemDeDup prune — production swaps in
    * [[Similarity.semDedup]] on the same keep-list contract) →
    * 64/48 chunking → 512-token sequence packing. Stage COMPOSITION
    * is what this row certifies: schema drift or filter reordering
    * between any two stages moves a count and flips the hash. Every
    * stage reuses an already-oracled operator; each intermediate is
    * checkpoint-pinned because it feeds ≥2 consumers (the stage
    * filter and the stage count). */
  def docsCurationE2e(s: SparkSession, d: String): DataFrame = {
    // deliberately NOT width-repartitioned ([[tw]]): measured at the
    // sf1 soak, the extra exchange under the checkpoint-pinned stage
    // chain costs more than the map work it parallelizes here
    // (9.4 s vs 7.0 s min-of-3) — this row's time is stage
    // composition, not a single heavy scan map
    val docs = t(s, d, "documents")
    val gated = graft.scaleops.TrainingData
      .gopherGate(docs, "doc_id", "text", minTokens = 10)
      .filter(col("passed"))
      .select("doc_id", "source", "text")
      .localCheckpoint(eager = false) // feeds span build, span join, count
    val spanCov = graft.scaleops.TrainingData
      .duplicatedSpans(gated, "doc_id", "text", k = 8)
      .select(col("doc_id"), col("dup_tokens"), col("n_tokens"))
    val spanPass = gated.join(spanCov, Seq("doc_id"))
      .filter(lit(2L) * col("dup_tokens") <= col("n_tokens"))
      .select("doc_id", "source", "text")
      .localCheckpoint(eager = false) // feeds emb semi-join, anti, count
    val embS = t(s, d, "embeddings")
      .join(spanPass.select(col("doc_id").as("vec_id")), Seq("vec_id"),
        "left_semi")
    val pairs = Similarity.nearDupPairs(embS, "vec_id", "embedding",
      threshold = 0.4)
    val dropped = graft.operators.ConnectedComponents
      .components(pairs, "a", "b")
      .filter(col("comp") =!= col("id"))
      .select(col("id").as("doc_id"))
      .localCheckpoint(eager = false) // feeds anti join + count
    val survivors = spanPass.join(dropped, Seq("doc_id"), "left_anti")
      .localCheckpoint(eager = false) // feeds chunk, pack, count
    val chunks = graft.scaleops.TrainingData
      .chunkDocs(survivors, "doc_id", "text", chunkSize = 64, stride = 48)
    val packed = graft.scaleops.TrainingData
      .packSequences(survivors, "doc_id", "text", shardCol = "source",
        seqLen = 512)
    docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(gated.agg(count(lit(1)).as("n_gate_pass")))
      .crossJoin(spanPass.agg(count(lit(1)).as("n_span_pass")))
      .crossJoin(dropped.agg(count(lit(1)).as("n_sem_dropped")))
      .crossJoin(survivors.agg(count(lit(1)).as("n_survivors")))
      .crossJoin(chunks.agg(count(lit(1)).as("n_chunks")))
      .crossJoin(packed.agg(count(lit(1)).as("n_sequences"),
        sum(col("n_tokens")).as("n_packed_tokens")))
  }

  val docsCurationE2eOracle: String = {
    val stops = TextAnalysis.stopwords.map(TextAnalysis.sqlLit).mkString(", ")
    s"""WITH RECURSIVE tok AS (
       |  SELECT doc_id, source,
       |    string_split_regex(trim(lower(text)), '\\s+') AS toks
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, source, toks, len(toks) AS n,
       |    list_sum(list_transform(toks, t -> length(t))) AS sum_len,
       |    len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS n_alpha,
       |    len(list_distinct(toks)) AS n_dist,
       |    len(list_intersect(list_distinct(toks), [$stops])) AS n_stops
       |  FROM tok),
       |gated AS (
       |  SELECT doc_id, source, toks, n FROM m
       |  WHERE n >= 10 AND n <= 100000 AND 3 * n <= sum_len
       |    AND sum_len <= 10 * n AND 5 * n_alpha >= 4 * n
       |    AND n_stops >= 2 AND 10 * n_dist >= 3 * n),
       |spans AS (
       |  SELECT doc_id, s - 1 AS start,
       |    array_to_string(toks[s:s+7], ' ') AS span
       |  FROM gated, UNNEST(generate_series(1, n - 7)) AS g(s)
       |  WHERE n >= 8),
       |dup AS (SELECT span FROM spans GROUP BY span HAVING COUNT(*) >= 2),
       |flagged AS (
       |  SELECT doc_id, start, start + 7 AS e
       |  FROM spans SEMI JOIN dup USING (span)),
       |isl AS (
       |  SELECT doc_id, start, e,
       |    CASE WHEN start > COALESCE(MAX(e) OVER (PARTITION BY doc_id
       |      ORDER BY start ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      -1) THEN 1 ELSE 0 END AS ni
       |  FROM flagged),
       |isl2 AS (
       |  SELECT doc_id, start, e,
       |    SUM(ni) OVER (PARTITION BY doc_id ORDER BY start
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM isl),
       |cov0 AS (
       |  SELECT doc_id, island, MIN(start) AS i_start, MAX(e) AS i_end
       |  FROM isl2 GROUP BY 1, 2),
       |cov AS (
       |  SELECT doc_id, CAST(SUM(i_end - i_start + 1) AS BIGINT) AS dup_tokens
       |  FROM cov0 GROUP BY 1),
       |span_pass AS (
       |  SELECT g.doc_id, g.source, g.n FROM gated g
       |  LEFT JOIN cov USING (doc_id)
       |  WHERE 2 * COALESCE(cov.dup_tokens, 0) <= g.n),
       |e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings SEMI JOIN span_pass ON vec_id = doc_id),
       |p AS (
       |  SELECT a.vec_id AS a, b.vec_id AS b
       |  FROM e a JOIN e b ON a.vec_id < b.vec_id
       |  WHERE ROUND(list_dot_product(a.v, b.v) /
       |    (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))), 6) >= 0.4),
       |sym AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
       |reach(id, comp) AS (
       |  SELECT a, a FROM sym
       |  UNION
       |  SELECT s2.a, r.comp FROM sym s2 JOIN reach r ON s2.b = r.id),
       |cc AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id),
       |dropped AS (SELECT id FROM cc WHERE comp <> id),
       |survivors AS (
       |  SELECT sp.doc_id, sp.source, sp.n FROM span_pass sp
       |  ANTI JOIN dropped d ON sp.doc_id = d.id),
       |pk AS (
       |  SELECT source, n,
       |    COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
       |  FROM survivors),
       |seqs AS (
       |  SELECT DISTINCT source, CAST(FLOOR(prior / 512) AS BIGINT) AS seq_id
       |  FROM pk)
       |SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
       |  (SELECT COUNT(*) FROM gated) AS n_gate_pass,
       |  (SELECT COUNT(*) FROM span_pass) AS n_span_pass,
       |  (SELECT COUNT(*) FROM dropped) AS n_sem_dropped,
       |  (SELECT COUNT(*) FROM survivors) AS n_survivors,
       |  (SELECT CAST(SUM(((n - 1) // 48) + 1) AS BIGINT) FROM survivors
       |    WHERE n >= 1) AS n_chunks,
       |  (SELECT COUNT(*) FROM seqs) AS n_sequences,
       |  (SELECT CAST(SUM(n) AS BIGINT) FROM survivors) AS n_packed_tokens""".stripMargin
  }

  /** The end-to-end cleaning pipeline a training corpus goes through,
    * as ONE composed query: quality-score filter → language match →
    * fingerprint dedup (keep lowest doc_id) → per-source survivor
    * stats. Each stage reuses an already-oracled operator; the
    * composition itself is what this query pins. */
  def docsCleanPipeline(s: SparkSession, d: String): DataFrame = {
    // project to the 4 surviving columns, THEN pin: the scored frame
    // feeds both the keep-aggregation and the semi join — without the
    // checkpoint all the regex/tokenize scoring runs twice, and
    // without the projection the checkpoint would materialize text
    val docs = tw(s, d, "documents", "doc_id")
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("pred_lang", TextAnalysis.langId(col("text")))
      .filter(col("quality") >= 0.5 && col("pred_lang") === col("lang"))
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .select("doc_id", "source", "quality", "fp")
      .localCheckpoint(eager = false)
    val keep = docs.groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
    docs.join(keep, Seq("fp", "doc_id"), "left_semi")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("quality")), 6).as("avg_quality"))
  }

  val docsCleanPipelineOracle: String = {
    val stops = TextAnalysis.stopwords.map(TextAnalysis.sqlLit).mkString(", ")
    val langScores = TextAnalysis.langMarkers.map { case (lang, markers) =>
      val set = markers.map(TextAnalysis.sqlLit).mkString(", ")
      s"len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t IN ($set))) AS s_$lang"
    }.mkString(",\n      |    ")
    s"""WITH q AS (
       |  SELECT doc_id, source, lang, text,
       |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       |    length(text) AS n_chars,
       |    length(regexp_replace(text, '[^a-z ]', '', 'g')) AS n_alpha,
       |    len(list_filter(string_split_regex(trim(text), '\\s+'),
       |      t -> t IN ($stops))) AS n_stops,
       |    $langScores
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, source, lang, text,
       |    ROUND(LEAST(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.3 +
       |      ROUND(CAST(n_alpha AS DOUBLE) / n_chars, 6) * 0.4 +
       |      LEAST(1.0, ROUND(CAST(n_stops AS DOUBLE) / n_tokens, 6) * 5.0) * 0.3,
       |      6) AS quality,
       |    CASE
       |      WHEN s_zh > GREATEST(s_en, s_de, s_es, s_fr) THEN 'zh'
       |      WHEN s_fr > GREATEST(s_en, s_de, s_es) THEN 'fr'
       |      WHEN s_es > GREATEST(s_en, s_de) THEN 'es'
       |      WHEN s_de > s_en THEN 'de'
       |      ELSE 'en' END AS pred_lang
       |  FROM q),
       |kept AS (
       |  SELECT doc_id, source, quality,
       |    md5(array_to_string(list_sort(list_distinct(
       |      string_split_regex(trim(lower(text)), '\\s+'))), ' ')) AS fp
       |  FROM scored WHERE quality >= 0.5 AND pred_lang = lang),
       |dedup AS (
       |  SELECT fp, MIN(doc_id) AS doc_id FROM kept GROUP BY fp)
       |SELECT source, COUNT(*) AS n_docs,
       |  ROUND(AVG(quality), 6) AS avg_quality
       |FROM kept JOIN dedup USING (fp, doc_id)
       |GROUP BY source""".stripMargin
  }

  /** Vocabulary build — the tokenizer-training precursor: lowercase,
    * alpha-token split, global frequency count, rank by (freq desc,
    * word asc), top 100 → (rank, word, freq). One explode + one
    * map-side-combinable groupBy; the rank window runs on the
    * already-tiny aggregate. */
  def textVocabulary(s: SparkSession, d: String): DataFrame = {
    // Top-k FIRST (sort+limit plans as a distributed
    // TakeOrderedAndProject — per-partition top-100s, merged), THEN
    // the rank window over the 100 surviving rows. A global
    // row_number window over the raw aggregate would funnel the whole
    // vocabulary through one task.
    val w = Window.orderBy(col("freq").desc, col("word").asc)
    t(s, d, "documents")
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc).limit(100)
      .withColumn("rank", row_number().over(w).cast("int"))
      .select("rank", "word", "freq")
  }

  val textVocabularyOracle: String =
    """WITH toks AS (
      |  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
      |  FROM documents),
      |freqs AS (
      |  SELECT word, COUNT(*) AS freq FROM toks WHERE word <> ''
      |  GROUP BY word)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, word ASC) AS INT)
      |    AS rank, word, freq
      |FROM freqs QUALIFY rank <= 100""".stripMargin

  /** Per-label embedding centroids, one row per (label, dimension) —
    * class prototypes for nearest-centroid search / IVF seeding.
    * posexplode + one groupBy: scan count independent of dimension;
    * decimal-exact sums so the mean is order-independent. */
  def embCentroids(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(
        round((sum(col("v").cast("double").cast("decimal(27,12)")) /
          count(lit(1)).cast("decimal(27,12)")).cast("double"), 6)
          .as("centroid"),
        count(lit(1)).as("n_vectors"))

  val embCentroidsOracle: String =
    """SELECT label, CAST(pos - 1 AS INT) AS pos,
      |  ROUND(CAST(SUM(CAST(CAST(embedding[pos] AS DOUBLE) AS DECIMAL(27,12))) /
      |    CAST(COUNT(*) AS DECIMAL(27,12)) AS DOUBLE), 6) AS centroid,
      |  COUNT(*) AS n_vectors
      |FROM embeddings, range(1, 65) t(pos)
      |GROUP BY label, pos""".stripMargin

  /** Per-label SIMPLIFIED SILHOUETTE (Hruschka et al. 2004 — the
    * centroid-based silhouette: a(i) = dist to own cluster centroid,
    * b(i) = min dist to any other centroid, s = (b−a)/max(a,b)) over
    * the label clustering of the embedding corpus — the clustering-
    * quality metric an embedding pipeline reports (full silhouette is
    * O(n²) pairwise; the simplified form is the scale variant: one
    * linear pass against a k-row broadcast centroid table).
    *
    * Cross-engine exactness (the ml_pca_power discipline throughout):
    * centroids are DECIMAL-exact means rounded to 6 dp (shared with
    * `emb_centroids`'s certified arithmetic); every squared-diff term
    * quantizes via pure-IEEE `floor(x·10⁹ + 0.5)` into exact-integer
    * micro-units (terms ≤ 9e11 ≪ 2^53) whose 64-dim sums are exact in
    * ANY order and engine; per-point s is IEEE arithmetic on those
    * identical doubles; the per-label mean sums floor-quantized
    * s-micros exactly. No ROUND(double) anywhere — at 9 dp over the
    * ~256k terms of the gate corpus a multiply-based engine ROUND
    * would flip ~1e-4 of terms vs BigDecimal rounding. */
  def embSilhouette(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val cent = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(round((sum(col("v").cast("double").cast("decimal(27,12)")) /
        count(lit(1)).cast("decimal(27,12)")).cast("double"), 6).as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x("c")).as("cvec"))
      .select(col("label").as("clabel"), col("cvec"))
    val dists = emb
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("x"))
      .crossJoin(broadcast(cent))
      .withColumn("dist", sqrt(
        aggregate(
          zip_with(col("x"), col("cvec"), (a, b) =>
            floor((a - b) * (a - b) * lit(1000000000.0) + lit(0.5))),
          lit(0L), (acc, v) => acc + v).cast("double") /
          lit(1000000000.0)))
    val ab = dists.groupBy("vec_id", "label")
      .agg(max(when(col("clabel") === col("label"), col("dist"))).as("a"),
        min(when(col("clabel") =!= col("label"), col("dist"))).as("b"))
    val sil = ab.select(col("label"),
      when(greatest(col("a"), col("b")) === 0.0, lit(0L))
        .otherwise(floor((col("b") - col("a")) /
          greatest(col("a"), col("b")) * lit(1000000.0) + lit(0.5)))
        .as("s_micro"))
    sil.groupBy("label")
      .agg(count(lit(1)).as("n_vectors"),
        (floor(sum(col("s_micro")).cast("double") / count(lit(1)) + lit(0.5))
          / lit(1000000.0)).as("silhouette"))
  }

  val embSilhouetteOracle: String =
    """WITH c AS (
      |  SELECT label, pos,
      |    ROUND(CAST(SUM(CAST(CAST(embedding[pos] AS DOUBLE) AS DECIMAL(27,12))) /
      |      CAST(COUNT(*) AS DECIMAL(27,12)) AS DOUBLE), 6) AS cval
      |  FROM embeddings, range(1, 65) t(pos)
      |  GROUP BY label, pos),
      |cv AS (SELECT label AS clabel, list(cval ORDER BY pos) AS cvec
      |  FROM c GROUP BY label),
      |dists AS (
      |  SELECT e.vec_id, e.label, cv.clabel,
      |    SQRT(list_sum(list_transform(generate_series(1, 64), i ->
      |      FLOOR((CAST(e.embedding[i] AS DOUBLE) - cv.cvec[i])
      |        * (CAST(e.embedding[i] AS DOUBLE) - cv.cvec[i])
      |        * 1000000000.0 + 0.5))) / 1000000000.0) AS dist
      |  FROM embeddings e, cv),
      |ab AS (
      |  SELECT vec_id, label,
      |    MAX(CASE WHEN clabel = label THEN dist END) AS a,
      |    MIN(CASE WHEN clabel <> label THEN dist END) AS b
      |  FROM dists GROUP BY vec_id, label),
      |sil AS (
      |  SELECT label,
      |    CASE WHEN GREATEST(a, b) = 0 THEN 0
      |      ELSE FLOOR((b - a) / GREATEST(a, b) * 1000000.0 + 0.5)
      |    END AS s_micro
      |  FROM ab)
      |SELECT label, COUNT(*) AS n_vectors,
      |  FLOOR(CAST(SUM(s_micro) AS DOUBLE) / COUNT(*) + 0.5) / 1000000.0
      |    AS silhouette
      |FROM sil GROUP BY label""".stripMargin

  /** Sparse document cosine similarity via an INVERTED-INDEX join —
    * the scale path for pairwise TF-IDF similarity: weights self-join
    * on term (so only docs SHARING a term ever meet — no dense n²
    * pair scan), partial dot products aggregate per pair, norms join
    * in last. Weights are fixed to integer micro-units before the
    * join, so every sum is exact decimal arithmetic and the pair
    * scores are order-independent — the oracle is the identical
    * formulation in SQL. */
  def tfidfCosinePairs(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").filter(col("doc_id") < 150)
    val terms = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val n = docs.count()
    val dfreq = terms.distinct().groupBy("term").agg(count(lit(1)).as("df"))
    // Materialized once (lazy local checkpoint): three consumers
    // (norms, both join sides) would otherwise recompute the
    // tf × df join — AQE's exchange reuse only caches the shuffles,
    // not the join itself.
    val weights = tf.join(dfreq, "term")
      .withColumn("wi",
        round(col("tf") * (log(lit(n + 1.0) / (col("df") + 1.0)) + 1.0) * 1e6, 0)
          .cast("decimal(19,0)"))
      .select("doc_id", "term", "wi")
      .localCheckpoint(eager = false)
    val norms = weights.groupBy("doc_id")
      .agg(sum(col("wi") * col("wi")).as("norm2"))
    val a = weights.select(col("doc_id").as("a"), col("term"),
      col("wi").as("wa"))
    val b = weights.select(col("doc_id").as("b"), col("term"),
      col("wi").as("wb"))
    a.join(b, "term").filter(col("a") < col("b"))
      .groupBy("a", "b").agg(sum(col("wa") * col("wb")).as("dot"))
      .join(norms.select(col("doc_id").as("a"), col("norm2").as("na")), "a")
      .join(norms.select(col("doc_id").as("b"), col("norm2").as("nb")), "b")
      .withColumn("cos", round(col("dot").cast("double") /
        (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 6))
      .filter(col("cos") >= 0.3)
      .select("a", "b", "cos")
  }

  val tfidfCosineOracle: String =
    """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 150),
      |terms AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM docs),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
      |dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n FROM docs),
      |w AS (
      |  SELECT doc_id, term,
      |    CAST(ROUND(tf * (LN((n + 1.0) / (df + 1.0)) + 1.0) * 1e6, 0)
      |      AS DECIMAL(19,0)) AS wi
      |  FROM tf JOIN dfreq USING (term), n),
      |norms AS (SELECT doc_id, SUM(wi * wi) AS norm2 FROM w GROUP BY 1),
      |dots AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b, SUM(a.wi * b.wi) AS dot
      |  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT a, b,
      |  ROUND(CAST(dot AS DOUBLE) /
      |    (SQRT(CAST(na.norm2 AS DOUBLE)) * SQRT(CAST(nb.norm2 AS DOUBLE))), 6) AS cos
      |FROM dots
      |JOIN norms na ON na.doc_id = a
      |JOIN norms nb ON nb.doc_id = b
      |WHERE ROUND(CAST(dot AS DOUBLE) /
      |    (SQRT(CAST(na.norm2 AS DOUBLE)) * SQRT(CAST(nb.norm2 AS DOUBLE))), 6) >= 0.3""".stripMargin

  /** Rolling z-score anomaly flags — the data-cleaning outlier pass a
    * training pipeline runs per entity: each event scored against the
    * 10 events BEFORE it (exclusive frame, so the anomaly doesn't
    * contaminate its own baseline). Decimal-exact rolling sums make
    * mean/variance order-independent; one shuffle on user_id. */
  def zscoreOutliers(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id")).rowsBetween(-10, -1)
    val vd = QUtil.dec6(col("value"))
    val scored = t(s, d, "events")
      .withColumn("s1", sum(vd).over(w))
      .withColumn("s2", sum(vd * vd).over(w))
      .withColumn("n10", count(col("value")).over(w))
      .filter(col("n10") === 10)
      .withColumn("mean", col("s1").cast("double") / 10)
      .withColumn("vars",
        (col("s2").cast("double") - col("s1").cast("double") *
          col("s1").cast("double") / 10) / 9)
      .filter(col("vars") > 0)
      .withColumn("z", round((col("value") - col("mean")) / sqrt(col("vars")), 6))
    scored.filter(abs(col("z")) > 3)
      .select(col("user_id"), col("event_id"), col("value"), col("z"))
  }

  val zscoreOutliersOracle: String =
    """WITH f AS (
      |  SELECT user_id, event_id, value,
      |    SUM(CAST(value AS DECIMAL(18,6))) OVER w AS s1,
      |    SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) OVER w AS s2,
      |    COUNT(value) OVER w AS n10
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
      |    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
      |scored AS (
      |  SELECT user_id, event_id, value,
      |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 10) / 9 AS vars,
      |    CAST(s1 AS DOUBLE) / 10 AS mean
      |  FROM f WHERE n10 = 10)
      |SELECT user_id, event_id, value,
      |  ROUND((value - mean) / SQRT(vars), 6) AS z
      |FROM scored
      |WHERE vars > 0 AND ABS(ROUND((value - mean) / SQRT(vars), 6)) > 3""".stripMargin

  /** Deterministic per-group sampling: the first k events per user in
    * event-time order — the reproducible "few examples per entity"
    * sample a debugging / eval set wants. One window pass. */
  def perGroupSample(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(s, d, "events")
      .withColumn("rn", row_number().over(w).cast("int"))
      .filter(col("rn") <= 3)
      .select(col("user_id"), col("rn"), col("event_id"),
        col("event_type"))
  }

  val perGroupSampleOracle: String =
    """SELECT user_id, CAST(rn AS INT) AS rn, event_id, event_type
      |FROM (
      |  SELECT user_id, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      |  FROM events)
      |WHERE rn <= 3""".stripMargin

  val all: Seq[Q] = Seq(
    Q("text_tokens", textTokens, Some(textTokensOracle)),
    Q("text_quality", textQuality, Some(textQualityOracle)),
    Q("text_langid", textLangId, Some(textLangIdOracle)),
    Q("dedup_exact", dedupExact, Some(dedupExactOracle)),
    Q("dedup_minhash", dedupMinHash, Some(dedupMinHashOracle), bench = true),
    Q("dedup_simhash", dedupSimHash, Some(dedupSimHashOracle), bench = true),
    Q("dedup_embedding", dedupEmbedding, Some(dedupEmbeddingOracle), bench = true),
    Q("dedup_embedding_lsh", dedupEmbeddingLsh, Some(dedupEmbeddingLshOracle)),
    Q("dedup_embedding_auto", dedupEmbeddingAuto, Some(dedupEmbeddingAutoOracle)),
    Q("dedup_embedding_planted", dedupEmbeddingPlanted,
      Some(dedupEmbeddingPlantedOracle)),
    Q("dedup_semantic", dedupSemantic, Some(dedupSemanticOracle)),
    Q("knn_brute", knnBrute, Some(knnBruteOracle), bench = true),
    Q("knn_lsh", knnLsh, Some(knnLshOracle)),
    Q("knn_sq8", knnSq8, Some(knnSq8Oracle)),
    Q("knn_ivf_sq8", knnIvfSq8, Some(knnIvfSq8Oracle)),
    Q("knn_ivf_sq8_prebuilt", knnIvfSq8Prebuilt, Some(knnIvfSq8Oracle)),
    Q("knn_ivf_pq", knnIvfPq, Some(knnIvfPqOracle)),
    Q("knn_ivf_pq_prebuilt", knnIvfPqPrebuilt, Some(knnIvfPqOracle)),
    Q("knn_mmr_diverse", knnMmr, Some(knnMmrOracle)),
    Q("dedup_triangles", dedupTriangles, Some(dedupTrianglesOracle)),
    Q("graph_pagerank", graphPagerank, Some(graphPagerankOracle)),
    Q("graph_communities", graphCommunities, Some(graphCommunitiesOracle)),
    Q("dedup_incremental", dedupIncremental, Some(dedupIncrementalOracle)),
    Q("knn_ivf", knnIvf, Some(knnIvfOracle)),
    Q("knn_auto", knnAutoQ, Some(knnAutoOracle)),
    Q("knn_ivf_full", knnIvfFull, Some(knnBruteOracle)),
    Q("knn_ivf_prebuilt", knnIvfPrebuilt, Some(knnIvfOracle)),
    Q("knn_ivf_incremental", knnIvfIncremental, Some(knnIvfIncrementalOracle)),
    Q("knn_filtered", knnFiltered, Some(knnFilteredOracle)),
    Q("text_ngram_jaccard", ngramJaccard, Some(ngramJaccardOracle)),
    Q("text_containment", textContainment, Some(textContainmentOracle)),
    Q("dedup_components", dedupComponents, Some(dedupComponentsOracle)),
    Q("dedup_survivorship", dedupSurvivorship, Some(dedupSurvivorshipOracle)),
    Q("dedup_pipeline", dedupPipeline, Some(dedupPipelineOracle), bench = true),
    Q("text_vocabulary", textVocabulary, Some(textVocabularyOracle)),
    Q("emb_centroids", embCentroids, Some(embCentroidsOracle)),
    Q("emb_silhouette", embSilhouette, Some(embSilhouetteOracle)),
    Q("text_tfidf_cosine", tfidfCosinePairs, Some(tfidfCosineOracle)),
    Q("ts_zscore_outliers", zscoreOutliers, Some(zscoreOutliersOracle)),
    Q("events_per_group_sample", perGroupSample, Some(perGroupSampleOracle)),
    Q("text_tfidf", textTfidf, Some(textTfidfOracle)),
    Q("text_bpeish", textBpeish, Some(textBpeishOracle)),
    Q("dedup_fingerprint", dedupFingerprint, Some(dedupFingerprintOracle)),
    Q("events_stratified_sample", stratifiedSample, Some(stratifiedSampleOracle)),
    Q("docs_clean_pipeline", docsCleanPipeline, Some(docsCleanPipelineOracle)),
    Q("docs_curation_e2e", docsCurationE2e, Some(docsCurationE2eOracle),
      bench = true))
}
