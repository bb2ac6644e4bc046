package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.scaleops.TrainingData
import graft.sources.Tables

/** Harness queries for the training-data curation operators
  * ([[graft.scaleops.TrainingData]]). The synthetic corpus carries no
  * real PII, so the PII query injects deterministic synthetic PII
  * derived from `doc_id` — both engines derive the identical text, so
  * detection AND redaction stay hash-checkable. */
object TrainingDataQueries {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  // ---- PII redaction ----------------------------------------------------

  /** doc_id-keyed synthetic PII: every 5th doc an email, 7th a phone,
    * 11th an IP, 13th a card. */
  private def withPii(d: DataFrame): DataFrame =
    d.withColumn("text2", concat(col("text"),
      when(col("doc_id") % 5 === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit(" call 555-123-4567")).otherwise(lit("")),
      when(col("doc_id") % 11 === 0, lit(" from 192.168.1.77")).otherwise(lit("")),
      when(col("doc_id") % 13 === 0, lit(" card 4111 1111 1111 1111"))
        .otherwise(lit(""))))

  /** Per-source PII audit: hit counts per class on the raw text, and
    * the engine-witnessed `all_redacted` flag — re-running detection
    * on the REDACTED text must find zero residual hits (a broken
    * pattern or replacement order flips it). */
  def piiRedact(s: SparkSession, d: String): DataFrame = {
    // WIDTH BEFORE WEIGHT: the documents table is bytes-small (one
    // parquet file → ONE scan partition at any maxPartitionBytes —
    // a row group is unsplittable), but this query is regex-heavy
    // per row, so without an explicit repartition every pass runs on
    // a single core. A ~20 MB shuffle buys 32-way parallelism for
    // the dominant cost (measured at the sf1 soak: the single-task
    // plan was the floor under every regex-count optimization).
    val base = withPii(graft.Sessions.widen(docs(s, d), col("doc_id")))
    // guarded per-class passes throughout (r8): a combined-alternation
    // fold was tried first and MEASURED SLOWER (23.9 s vs 12.0 s at
    // sf1 — see TrainingData.piiGuard); the cheap exact guards skip
    // regex work on every digit-free/'@'-free document instead. Same
    // oracle: DuckDB counts per class independently, unguarded.
    val counts = TrainingData.piiCounts(col("text2"))
    // per-class staged redaction (piiRedactStaged): the single-Column
    // chain re-evaluates inner classes up to 3^k times (guard + both
    // branches reference the previous class, and subexpression
    // elimination skips conditional branches) — staged attributes
    // evaluate each class once per row
    val staged = TrainingData.piiRedactStaged(base, "text2", "red")
    val residual = TrainingData.piiResidualCount(col("red"))
    staged
      .select(Seq(col("source"), residual.as("resid")) ++
        counts.map { case (n, c) => c.as(n) }: _*)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_email")).as("n_emails"),
        sum(col("n_phone")).as("n_phones"),
        sum(col("n_ip")).as("n_ips"),
        sum(col("n_card")).as("n_cards"),
        (sum(col("resid")) === 0).as("all_redacted"))
  }

  private val piiInjectSql: String =
    """SELECT source,
      |  text
      |  || CASE WHEN doc_id % 5 = 0
      |       THEN ' contact user' || doc_id || '@example.com' ELSE '' END
      |  || CASE WHEN doc_id % 7 = 0 THEN ' call 555-123-4567' ELSE '' END
      |  || CASE WHEN doc_id % 11 = 0 THEN ' from 192.168.1.77' ELSE '' END
      |  || CASE WHEN doc_id % 13 = 0 THEN ' card 4111 1111 1111 1111' ELSE '' END
      |  AS text2
      |FROM documents""".stripMargin

  val piiRedactOracle: String = {
    val pats = TrainingData.piiPatterns.map { case (pat, tag) =>
      val name = tag.stripPrefix("<").stripSuffix(">").toLowerCase
      // single-quoted SQL string: escape embedded quotes (none) only
      s"CAST(SUM(len(regexp_extract_all(text2, '$pat'))) AS BIGINT) AS n_${name}s"
    }
    // assembled with plain concatenation — stripMargin over interpolated
    // SQL would eat the leading `|` of a `||` concat at line starts
    "WITH t AS (" + piiInjectSql + ")\n" +
      "SELECT source, COUNT(*) AS n_docs,\n  " +
      pats.mkString(",\n  ") +
      ",\n  TRUE AS all_redacted\nFROM t GROUP BY source"
  }

  // ---- repetition metrics ----------------------------------------------

  /** Per-doc repetition metrics for a bounded id range (the detail
    * report shape; the thresholds are the Gopher-style gate). */
  def repetition(s: SparkSession, d: String): DataFrame =
    TrainingData.repetitionMetrics(
      docs(s, d).filter(col("doc_id") < 20), "doc_id", "text")

  val repetitionOracle: String =
    """WITH base AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      |  FROM documents WHERE doc_id < 20),
      |m AS (
      |  SELECT doc_id, len(toks) AS n_tokens,
      |    len(list_distinct(toks)) AS n_distinct,
      |    CASE WHEN len(toks) >= 2
      |      THEN list_transform(generate_series(1, len(toks) - 1),
      |        i -> toks[i] || ' ' || toks[i+1])
      |      ELSE [] END AS bigrams
      |  FROM base),
      |bg AS (
      |  SELECT doc_id, bigram, COUNT(*) AS cnt
      |  FROM (SELECT doc_id, UNNEST(bigrams) AS bigram FROM m)
      |  GROUP BY doc_id, bigram),
      |top AS (SELECT doc_id, MAX(cnt) AS top_cnt FROM bg GROUP BY doc_id)
      |SELECT m.doc_id, CAST(m.n_tokens AS INT) AS n_tokens,
      |  ROUND(1.0 - CAST(m.n_distinct AS DOUBLE) / NULLIF(m.n_tokens, 0), 6)
      |    AS dup_token_fraction,
      |  ROUND(CAST(COALESCE(top.top_cnt, 0) AS DOUBLE) * 2.0
      |    / NULLIF(m.n_tokens, 0), 6) AS top_bigram_fraction,
      |  (ROUND(1.0 - CAST(m.n_distinct AS DOUBLE) / NULLIF(m.n_tokens, 0), 6) <= 0.95
      |   AND ROUND(CAST(COALESCE(top.top_cnt, 0) AS DOUBLE) * 2.0
      |     / NULLIF(m.n_tokens, 0), 6) <= 0.2) AS passed
      |FROM m LEFT JOIN top USING (doc_id)""".stripMargin

  /** Corpus-unigram cross-entropy for a bounded id range — the
    * perplexity-style quality signal (the LM is the corpus itself, so
    * the whole computation is relational and oracle-checkable). */
  def unigramLogprob(s: SparkSession, d: String): DataFrame =
    TrainingData.unigramCrossEntropy(docs(s, d), "doc_id", "text")
      .filter(col("doc_id") < 20)

  val unigramLogprobOracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT term, COUNT(*) AS cnt FROM t GROUP BY term),
      |tot AS (SELECT COUNT(*) AS total FROM t)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  ROUND(CAST(SUM(CAST(ROUND(-LOG2(CAST(cnt AS DOUBLE) / total), 9)
      |    AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6) AS bits_per_token
      |FROM t JOIN tf USING (term) CROSS JOIN tot
      |WHERE doc_id < 20 GROUP BY doc_id""".stripMargin

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): every doc
    * scores under the corpus bigram LM, then splits into
    * head/middle/tail TERCILES per source — the classic
    * quality-stratification step before mixture sampling (train
    * mostly on the head, keep a controlled middle slice, drop or
    * down-weight the tail). Buckets assign by NTILE(3) over the
    * 6-dp-rounded bits ordered (bits, doc_id) — a total order, so the
    * split is deterministic and the oracle replays it exactly; docs
    * with fewer than two tokens have no bigram score and are excluded
    * by both engines alike. One window shuffle on source beyond the
    * LM's term-keyed aggregates — linear at any corpus size. */
  def pplBuckets(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ce = TrainingData.bigramCrossEntropy(docs(s, d), "doc_id", "text",
      lambda = 0.9)
    val w = Window.partitionBy("source")
      .orderBy(col("bits_per_bigram").asc, col("doc_id").asc)
    docs(s, d).select(col("doc_id"), col("source"))
      .join(ce, "doc_id")
      .withColumn("bucket", ntile(3).over(w))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("bits_per_bigram")).as("min_bits"),
        max(col("bits_per_bigram")).as("max_bits"))
  }

  val pplBucketsOracle: String =
    """WITH base AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      |  FROM base, UNNEST(generate_series(1, len(toks) - 1)) AS g(i)
      |  WHERE len(toks) >= 2),
      |c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
      |c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
      |uni AS (
      |  SELECT UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM documents),
      |cu AS (SELECT term, COUNT(*) AS cu FROM uni GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS n_total FROM uni),
      |ce AS (
      |  SELECT doc_id,
      |    ROUND(CAST(SUM(CAST(ROUND(-LOG2(
      |        0.9 * CAST(c12 AS DOUBLE) / c1 +
      |        (CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE)) * CAST(cu AS DOUBLE) / n_total), 9)
      |      AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6) AS bits_per_bigram
      |  FROM bg
      |  JOIN c12 USING (w1, w2)
      |  JOIN c1 USING (w1)
      |  JOIN cu ON bg.w2 = cu.term
      |  CROSS JOIN tot
      |  GROUP BY doc_id),
      |b AS (
      |  SELECT d.source, ce.bits_per_bigram,
      |    NTILE(3) OVER (PARTITION BY d.source
      |      ORDER BY ce.bits_per_bigram ASC, ce.doc_id ASC) AS bucket
      |  FROM ce JOIN documents d USING (doc_id))
      |SELECT source, CAST(bucket AS INT) AS bucket, COUNT(*) AS n_docs,
      |  MIN(bits_per_bigram) AS min_bits, MAX(bits_per_bigram) AS max_bits
      |FROM b GROUP BY source, bucket""".stripMargin

  // ---- deterministic mixture sampling -----------------------------------

  private val mixFractions = Map(
    "src0" -> 0.25, "src1" -> 0.5, "src2" -> 0.1, "src3" -> 0.75)

  /** Per-source kept counts under the deterministic mixture filter —
    * the oracle reproduces the keep rule arithmetically, so the whole
    * sample is pinned (not just its size). */
  def mixtureSample(s: SparkSession, d: String): DataFrame =
    TrainingData.mixtureSample(docs(s, d), "doc_id", "source", mixFractions)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))

  val mixtureSampleOracle: String = {
    val fracSql = mixFractions.foldLeft("1.0") { case (acc, (g, f)) =>
      s"CASE WHEN source = '$g' THEN $f ELSE $acc END"
    }
    s"""SELECT source, COUNT(*) AS n_kept,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
       |FROM documents
       |WHERE ((((doc_id % 1000003) + 1000003) % 1000003) * 2654435761) % 1000
       |  < ($fracSql) * 1000
       |GROUP BY source""".stripMargin
  }

  /** Temperature mixture sampling
    * ([[TrainingData.temperatureSample]], α = 0.5, budget = half the
    * corpus): per-source targets derive from √n_s — the whole
    * derivation (micro-quantized roots, integer-div targets and
    * permilles, the id-hash keep rule) replays in the oracle from
    * COUNT(*), and the kept SET is pinned per source (count, char
    * sum, min/max id), not just its size. */
  def temperatureMix(s: SparkSession, d: String): DataFrame = {
    val (kept, plan) = TrainingData.temperatureSample(
      docs(s, d), "doc_id", "source")
    kept.groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .join(plan.select(col("source"), col("n_s"), col("t_target"),
        col("permille")), Seq("source"))
  }

  val temperatureMixOracle: String =
    """WITH c AS (
      |  SELECT source, COUNT(*) AS n_s,
      |    CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5)
      |      AS BIGINT) AS sq_micros
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_total,
      |  CAST(SUM(sq_micros) AS BIGINT) AS sum_sq FROM c),
      |plan AS (
      |  SELECT source, n_s, sq_micros,
      |    CAST(((CAST(n_total AS HUGEINT) // 2) * 1 * sq_micros) // sum_sq
      |      AS BIGINT) AS t_target,
      |    CAST(LEAST(1000, (1000 * (((CAST(n_total AS HUGEINT) // 2) * 1
      |      * sq_micros) // sum_sq)) // n_s) AS BIGINT) AS permille
      |  FROM c, t),
      |kept AS (
      |  SELECT d.source, d.doc_id, d.n_chars
      |  FROM documents d JOIN plan p USING (source)
      |  WHERE ((((d.doc_id % 1000003) + 1000003) % 1000003) * 2654435761)
      |    % 1000 < p.permille)
      |SELECT k.source, COUNT(*) AS n_kept,
      |  CAST(SUM(k.n_chars) AS BIGINT) AS sum_chars,
      |  MIN(k.doc_id) AS min_id, MAX(k.doc_id) AS max_id,
      |  p.n_s, p.t_target, CAST(p.permille AS BIGINT) AS permille
      |FROM kept k JOIN plan p USING (source)
      |GROUP BY k.source, p.n_s, p.t_target, p.permille""".stripMargin

  // ---- duplicated spans ---------------------------------------------------

  /** Per-doc duplicated-span coverage (k=8 windows, ≥2 occurrences
    * corpus-wide) — the Lee-et-al dedup report shape. */
  def dupSpans(s: SparkSession, d: String): DataFrame =
    // width-before-weight (see ScaleQueries.tw): k-gram span explode
    // over a one-file scan partition runs single-core without this
    TrainingData.duplicatedSpans(graft.Sessions.widen(docs(s, d), col("doc_id")),
      "doc_id", "text", k = 8)

  val dupSpansOracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      |  FROM documents),
      |base AS (SELECT doc_id, toks, len(toks) AS n FROM t),
      |spans AS (
      |  SELECT doc_id, s - 1 AS start,
      |    array_to_string(toks[s:s+7], ' ') AS span
      |  FROM base, UNNEST(generate_series(1, n - 7)) AS g(s)
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
      |  SELECT doc_id, CAST(SUM(i_end - i_start + 1) AS BIGINT) AS dup_tokens,
      |    COUNT(*) AS n_islands
      |  FROM cov0 GROUP BY 1)
      |SELECT b.doc_id, CAST(b.n AS INT) AS n_tokens,
      |  COALESCE(dup_tokens, 0) AS dup_tokens,
      |  COALESCE(n_islands, 0) AS n_islands,
      |  ROUND(COALESCE(dup_tokens, 0) / NULLIF(b.n, 0), 6) AS dup_fraction
      |FROM base b LEFT JOIN cov USING (doc_id)""".stripMargin

  // ---- chunking -----------------------------------------------------------

  /** Fixed-size overlapping token chunks (size 64, stride 48 → 16
    * tokens of overlap) for a bounded id range — the RAG /
    * context-window prep shape, fully replayed by the oracle
    * including the overlap arithmetic and the short final chunk. */
  def chunkDocs(s: SparkSession, d: String): DataFrame =
    TrainingData.chunkDocs(docs(s, d).filter(col("doc_id") < 40),
      "doc_id", "text", chunkSize = 64, stride = 48)

  val chunkDocsOracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      |  FROM documents WHERE doc_id < 40),
      |b AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 1)
      |SELECT doc_id, CAST(g // 48 AS INT) AS chunk_id,
      |  CAST(g AS INT) AS start_tok,
      |  CAST(LEAST(64, n - g) AS INT) AS n_toks,
      |  array_to_string(toks[g + 1:g + 64], ' ') AS chunk_text
      |FROM b, UNNEST(generate_series(0, n - 1, 48)) AS u(g)""".stripMargin

  // ---- importance weights (DSIR-style) ------------------------------------

  /** Per-doc importance weights against the `src1` target slice for a
    * bounded id range — mean per-token log-likelihood ratio between
    * the add-one-smoothed target and corpus unigram models, with the
    * oracle replaying both models and the decimal sum exactly. */
  def importanceWeights(s: SparkSession, d: String): DataFrame =
    TrainingData.importanceWeights(docs(s, d), "doc_id", "text",
      col("source") === "src1")
      .filter(col("doc_id") < 20)

  val importanceWeightsOracle: String =
    """WITH t AS (
      |  SELECT doc_id, source = 'src1' AS is_target,
      |    UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM documents),
      |tf AS (
      |  SELECT term, COUNT(*) AS c_cnt,
      |    CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS t_cnt
      |  FROM t GROUP BY term),
      |tot AS (
      |  SELECT CAST(SUM(c_cnt) AS BIGINT) AS c_total,
      |    CAST(SUM(t_cnt) AS BIGINT) AS t_total,
      |    COUNT(*) AS vocab
      |  FROM tf),
      |d AS (
      |  SELECT doc_id, COUNT(*) AS n_tokens,
      |    ROUND(CAST(SUM(CAST(ROUND(LOG2(
      |        (CAST(t_cnt + 1 AS DOUBLE) / (t_total + vocab)) /
      |        (CAST(c_cnt + 1 AS DOUBLE) / (c_total + vocab))), 9)
      |      AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6)
      |      AS logratio_bits_per_token
      |  FROM t JOIN tf USING (term) CROSS JOIN tot
      |  WHERE doc_id < 20 GROUP BY doc_id)
      |SELECT doc_id, n_tokens, logratio_bits_per_token,
      |  logratio_bits_per_token > 0 AS keep
      |FROM d""".stripMargin

  /** Interpolated-bigram LM cross-entropy for a bounded id range — the
    * CCNet-style quality signal one context-order up from
    * `text_unigram_logprob`; the oracle replays both count models, the
    * λ-interpolation, and the decimal surprisal sum. The `1 − λ`
    * weight must be a DOUBLE subtraction in the SQL too
    * (`CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE)` = 0.09999999999999998,
    * the engine's `1.0 - lambda`): a bare `1.0 - 0.9` is DECIMAL
    * arithmetic in DuckDB and yields exactly 0.1 — a DIFFERENT double
    * that diverges at 9-dp rounding boundaries. */
  def bigramLogprob(s: SparkSession, d: String): DataFrame =
    TrainingData.bigramCrossEntropy(docs(s, d), "doc_id", "text",
      lambda = 0.9)
      .filter(col("doc_id") < 20)

  val bigramLogprobOracle: String =
    """WITH base AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      |  FROM base, UNNEST(generate_series(1, len(toks) - 1)) AS g(i)
      |  WHERE len(toks) >= 2),
      |c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
      |c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
      |uni AS (
      |  SELECT UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM documents),
      |cu AS (SELECT term, COUNT(*) AS cu FROM uni GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS n_total FROM uni)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  ROUND(CAST(SUM(CAST(ROUND(-LOG2(
      |      0.9 * CAST(c12 AS DOUBLE) / c1 +
      |      (CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE)) * CAST(cu AS DOUBLE) / n_total), 9)
      |    AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6) AS bits_per_bigram
      |FROM bg
      |JOIN c12 USING (w1, w2)
      |JOIN c1 USING (w1)
      |JOIN cu ON bg.w2 = cu.term
      |CROSS JOIN tot
      |WHERE doc_id < 20 GROUP BY doc_id""".stripMargin

  /** Per-source Gopher-gate report: how many docs each rule rejects
    * and how many pass the full stack — the go/no-go summary a corpus
    * build reads first. minTokens=10 fits the short synthetic docs
    * (the classic 50 would reject everything — the RULES are what's
    * certified, not the magic numbers). */
  def qualityGate(s: SparkSession, d: String): DataFrame =
    TrainingData.gopherGate(docs(s, d), "doc_id", "text", minTokens = 10)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("word_count_ok"), 0L).otherwise(1L)).as("n_fail_count"),
        sum(when(col("mean_len_ok"), 0L).otherwise(1L)).as("n_fail_len"),
        sum(when(col("alpha_ok"), 0L).otherwise(1L)).as("n_fail_alpha"),
        sum(when(col("stopword_ok"), 0L).otherwise(1L)).as("n_fail_stop"),
        sum(when(col("repetition_ok"), 0L).otherwise(1L)).as("n_fail_rep"),
        sum(when(col("passed"), 1L).otherwise(0L)).as("n_pass"))

  val qualityGateOracle: String = {
    val stops = graft.scaleops.TextAnalysis.stopwords
      .map(graft.scaleops.TextAnalysis.sqlLit).mkString(", ")
    s"""WITH m AS (
       |  SELECT source, len(toks) AS n,
       |    list_sum(list_transform(toks, t -> length(t))) AS sum_len,
       |    len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS n_alpha,
       |    len(list_distinct(toks)) AS n_dist,
       |    len(list_intersect(list_distinct(toks), [$stops])) AS n_stops
       |  FROM (SELECT source,
       |          string_split_regex(trim(lower(text)), '\\s+') AS toks
       |        FROM documents)),
       |f AS (
       |  SELECT source,
       |    n >= 10 AND n <= 100000 AS word_count_ok,
       |    3 * n <= sum_len AND sum_len <= 10 * n AS mean_len_ok,
       |    5 * n_alpha >= 4 * n AS alpha_ok,
       |    n_stops >= 2 AS stopword_ok,
       |    10 * n_dist >= 3 * n AS repetition_ok
       |  FROM m)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN word_count_ok THEN 0 ELSE 1 END) AS BIGINT) AS n_fail_count,
       |  CAST(SUM(CASE WHEN mean_len_ok THEN 0 ELSE 1 END) AS BIGINT) AS n_fail_len,
       |  CAST(SUM(CASE WHEN alpha_ok THEN 0 ELSE 1 END) AS BIGINT) AS n_fail_alpha,
       |  CAST(SUM(CASE WHEN stopword_ok THEN 0 ELSE 1 END) AS BIGINT) AS n_fail_stop,
       |  CAST(SUM(CASE WHEN repetition_ok THEN 0 ELSE 1 END) AS BIGINT) AS n_fail_rep,
       |  CAST(SUM(CASE WHEN word_count_ok AND mean_len_ok AND alpha_ok
       |    AND stopword_ok AND repetition_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
       |FROM f GROUP BY source""".stripMargin
  }

  // ---- distribution drift (PSI) -----------------------------------------

  /** Event-type distribution drift between the first and second half
    * of the events month (split 2024-01-16) — per-bin PSI terms with
    * the add-one smoothing replayed exactly by the oracle. */
  def psiDrift(s: SparkSession, d: String): DataFrame =
    TrainingData.psiCategorical(Tables.load(s, d, "events"), "event_type",
      unix_micros(col("ts")) < 1705363200000000L)

  val psiDriftOracle: String =
    """WITH counts AS (
      |  SELECT event_type AS bin,
      |    CAST(SUM(CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) < 1705363200000000
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
      |    CAST(SUM(CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) < 1705363200000000
      |      THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
      |  FROM events GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
      |    CAST(SUM(n_cur) AS BIGINT) AS t_cur, COUNT(*) AS n_bins
      |  FROM counts)
      |SELECT bin, n_ref, n_cur,
      |  ROUND(CAST(n_ref + 1 AS DOUBLE) / (t_ref + n_bins), 6) AS p_ref,
      |  ROUND(CAST(n_cur + 1 AS DOUBLE) / (t_cur + n_bins), 6) AS p_cur,
      |  ROUND((CAST(n_cur + 1 AS DOUBLE) / (t_cur + n_bins) -
      |         CAST(n_ref + 1 AS DOUBLE) / (t_ref + n_bins)) *
      |    LN((CAST(n_cur + 1 AS DOUBLE) / (t_cur + n_bins)) /
      |       (CAST(n_ref + 1 AS DOUBLE) / (t_ref + n_bins))), 6) AS psi_term
      |FROM counts, tot""".stripMargin

  /** Deterministic corpus shuffle into 4 shards — the whole
    * permutation (shard AND within-shard position of every doc) is
    * pinned by the oracle, which replays the id-hash arithmetic. */
  def shuffleShards(s: SparkSession, d: String): DataFrame =
    TrainingData.shuffleShards(docs(s, d), "doc_id", nShards = 4)

  val shuffleShardsOracle: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    ((((doc_id % 1000003) + 1000003) % 1000003) * 2654435761) % 1000003 AS h
      |  FROM documents)
      |SELECT doc_id, h % 4 AS shard,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY h % 4 ORDER BY h, doc_id) - 1
      |    AS BIGINT) AS pos
      |FROM h""".stripMargin

  /** Per-doc out-of-vocabulary rate against the deterministic
    * top-30-term vocabulary — tokenizer coverage; the oracle rebuilds
    * the same vocab cut ((count desc, term asc) total order) and the
    * same join. */
  def oovRate(s: SparkSession, d: String): DataFrame =
    TrainingData.oovRate(docs(s, d), "doc_id", "text", vocabSize = 30)

  val oovRateOracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS term
      |  FROM documents),
      |v AS (
      |  SELECT term, 1 AS in_vocab FROM (
      |    SELECT term, COUNT(*) AS cnt FROM t GROUP BY term
      |    ORDER BY cnt DESC, term ASC LIMIT 30))
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  CAST(SUM(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_oov,
      |  ROUND(CAST(SUM(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END)
      |    AS DOUBLE) / COUNT(*), 6) AS oov_rate
      |FROM t LEFT JOIN v USING (term)
      |GROUP BY doc_id""".stripMargin

  /** Quality-weighted selection: keep 5 docs per source weighted by
    * `n_chars` (longer ≈ higher-value here), deterministically — the
    * oracle replays the hash-uniform, the Efraimidis–Spirakis key,
    * and the per-group cut, pinning the entire sample. */
  def weightedSample(s: SparkSession, d: String): DataFrame =
    TrainingData.weightedSample(docs(s, d), "doc_id", "n_chars",
      "source", k = 5)

  val weightedSampleOracle: String =
    """WITH h AS (
      |  SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS weight,
      |    ROUND(LN(
      |      CAST((((((doc_id % 1000003) + 1000003) % 1000003) * 2654435761)
      |        % 1000003 + 1) AS DOUBLE) / CAST(1000004 AS DOUBLE))
      |      / CAST(n_chars AS DOUBLE), 9) AS es_key
      |  FROM documents WHERE CAST(n_chars AS DOUBLE) > 0)
      |SELECT source, rk, doc_id, weight, es_key FROM (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source
      |    ORDER BY es_key DESC, doc_id ASC) AS INT) AS rk
      |  FROM h)
      |WHERE rk <= 5""".stripMargin

  // ---- contamination screen ---------------------------------------------

  /** Benchmark-contamination screen: src19 is the held-out benchmark;
    * corpus docs sharing ≥ 2 distinct word trigrams with any
    * benchmark doc are flagged with their strongest match (this
    * corpus' trigram overlap tops out at 3 shared — threshold 2
    * flags the ~90-doc tail, exercising both branches). */
  def contamination(s: SparkSession, d: String): DataFrame = {
    // width-before-weight (see ScaleQueries.tw) for the shingle build
    val all = graft.Sessions.widen(docs(s, d), col("doc_id"))
    TrainingData.contamination(
      all.filter(col("source") =!= "src19"),
      all.filter(col("source") === "src19"),
      "doc_id", "text", shingleK = 3, minShared = 2)
  }

  val contaminationOracle: String =
    """WITH sh AS (
      |  SELECT doc_id, source,
      |    list_distinct(CASE WHEN len(toks) >= 3
      |      THEN list_transform(generate_series(1, len(toks) - 2),
      |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |      ELSE [] END) AS s
      |  FROM (SELECT doc_id, source,
      |          string_split_regex(trim(lower(text)), '\s+') AS toks
      |        FROM documents)),
      |hits AS (
      |  SELECT c.doc_id, b.doc_id AS bench_id, COUNT(*) AS n_shared
      |  FROM (SELECT doc_id, UNNEST(s) AS shingle FROM sh
      |        WHERE source <> 'src19') c
      |  JOIN (SELECT doc_id, UNNEST(s) AS shingle FROM sh
      |        WHERE source = 'src19') b USING (shingle)
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      |SELECT doc_id, bench_id AS top_bench_id, n_shared
      |FROM hits
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
      |  ORDER BY n_shared DESC, bench_id ASC) = 1""".stripMargin

  // ---- sequence packing -------------------------------------------------

  /** Concatenate-then-chunk packing into 512-token sequences, shards
    * = sources (per-shard windows — no global sort at any scale). */
  def packSequences(s: SparkSession, d: String): DataFrame =
    TrainingData.packSequences(docs(s, d), "doc_id", "text",
      shardCol = "source", seqLen = 512)

  val packSequencesOracle: String =
    """WITH t AS (
      |  SELECT source, doc_id,
      |    len(string_split_regex(trim(text), '\s+')) AS n_tokens
      |  FROM documents),
      |p AS (
      |  SELECT source, doc_id, n_tokens,
      |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      |  FROM t),
      |q AS (
      |  SELECT source, n_tokens,
      |    CAST(FLOOR(prior / 512) AS BIGINT) AS seq_id
      |  FROM p)
      |SELECT source AS shard, seq_id,
      |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |  seq_id * 512 AS starts_at_token
      |FROM q GROUP BY 1, 2""".stripMargin

  // ---- per-source caps (domain balancing) ---------------------------------

  /** Domain caps: at most 15 docs survive per source (sf0.01 has ~25
    * per source, so the cap binds), selected by the deterministic
    * id-hash priority — the oracle replays the hash and the per-group
    * rank, pinning the ENTIRE kept set and its ordering. */
  def sourceCaps(s: SparkSession, d: String): DataFrame =
    TrainingData.sourceCaps(docs(s, d), "doc_id", "source", cap = 15)

  val sourceCapsOracle: String =
    """WITH h AS (
      |  SELECT source, doc_id,
      |    ((((doc_id % 1000003) + 1000003) % 1000003) * 2654435761)
      |      % 1000003 AS pri
      |  FROM documents)
      |SELECT source, doc_id, rk, pri FROM (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source
      |    ORDER BY pri, doc_id) AS INT) AS rk
      |  FROM h)
      |WHERE rk <= 15""".stripMargin

  // ---- group-disjoint folds ------------------------------------------------

  /** GroupKFold over events by user: per-fold distinct-user and event
    * counts, plus the engine-witnessed leakage check — the fold-wise
    * distinct-user counts must sum to the corpus total (they can only
    * if no user appears in two folds; a row-level split would flip
    * it). The oracle replays the group-hash fold arithmetic. */
  def groupFoldSplit(s: SparkSession, d: String): DataFrame = {
    val folds = TrainingData.groupFolds(
      Tables.load(s, d, "events"), "user_id", k = 5)
    val total = folds.agg(countDistinct("user_id")).first().getLong(0)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("fold").rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    folds.groupBy("fold")
      .agg(countDistinct("user_id").as("n_users"),
        count(lit(1)).as("n_events"))
      .withColumn("groups_disjoint",
        sum(col("n_users")).over(w) === total)
      .orderBy("fold")
  }

  val groupFoldSplitOracle: String =
    """WITH f AS (
      |  SELECT ((((user_id % 1000003) + 1000003) % 1000003) * 2654435761)
      |    % 5 AS fold, user_id
      |  FROM events)
      |SELECT fold, COUNT(DISTINCT user_id) AS n_users,
      |  COUNT(*) AS n_events, TRUE AS groups_disjoint
      |FROM f GROUP BY fold ORDER BY fold""".stripMargin

  /** PMI collocation mining — the classic corpus-statistics operator
    * a tokenizer/phrase pipeline runs before merging multiword units:
    * pmi(w1,w2) = log2(P(w1,w2) / (P(w1)·P(w2))) over ADJACENT word
    * pairs, minimum pair count 5, top-20 by (quantized pmi desc,
    * pair asc). All probabilities are integer-count ratios evaluated
    * in ONE spelled-out double expression order both engines restate
    * verbatim; emission floor-quantizes to 6 dp (pure-IEEE — no
    * ROUND). Plan shape: one corpus-sized bigram groupBy + one
    * unigram groupBy, then vocabulary-sized joins and a TakeOrdered
    * top-20 — no corpus re-scan, no global sort. */
  def pmiCollocations(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"),
      graft.scaleops.TextAnalysis.tokens(lower(col("text"))).as("toks"))
    val bigrams = base
      .select(explode(when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - 1), i =>
          struct(element_at(col("toks"), i).as("w1"),
            element_at(col("toks"), i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
        .as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val cBigram = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val nBigrams = cBigram.agg(sum(col("c12")).as("n_big"))
    val cUni = base.select(explode(col("toks")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cu"))
    val nToks = cUni.agg(sum(col("cu")).as("n_tok"))
    val pmi = log2(col("c12").cast("double") * col("n_tok") * col("n_tok") /
      col("n_big") / col("cu1") / col("cu2"))
    cBigram.filter(col("c12") >= 5)
      .join(cUni.select(col("term").as("w1"), col("cu").as("cu1")), "w1")
      .join(cUni.select(col("term").as("w2"), col("cu").as("cu2")), "w2")
      .crossJoin(broadcast(nBigrams))
      .crossJoin(broadcast(nToks))
      .withColumn("pmi_micro",
        floor(pmi * lit(1000000.0) + lit(0.5)).cast("long"))
      .orderBy(col("pmi_micro").desc, col("w1").asc, col("w2").asc)
      .limit(20)
      .select(col("w1"), col("w2"), col("c12").as("pair_count"),
        (col("pmi_micro").cast("double") / lit(1000000.0)).as("pmi"))
  }

  val pmiCollocationsOracle: String =
    """WITH base AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      |  FROM documents),
      |bg AS (
      |  SELECT toks[i] AS w1, toks[i + 1] AS w2
      |  FROM base, UNNEST(generate_series(1, len(toks) - 1)) AS g(i)
      |  WHERE len(toks) >= 2),
      |c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
      |nb AS (SELECT SUM(c12) AS n_big FROM c12),
      |cu AS (
      |  SELECT term, COUNT(*) AS cu FROM (
      |    SELECT UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS term
      |    FROM documents) GROUP BY 1),
      |nt AS (SELECT SUM(cu) AS n_tok FROM cu),
      |scored AS (
      |  SELECT w1, w2, c12,
      |    CAST(FLOOR(LOG2(CAST(c12 AS DOUBLE) * n_tok * n_tok
      |        / n_big / a.cu / b.cu)
      |      * 1000000.0 + 0.5) AS BIGINT) AS pmi_micro
      |  FROM c12
      |  JOIN cu a ON c12.w1 = a.term
      |  JOIN cu b ON c12.w2 = b.term
      |  CROSS JOIN nb CROSS JOIN nt
      |  WHERE c12 >= 5)
      |SELECT w1, w2, c12 AS pair_count,
      |  CAST(pmi_micro AS DOUBLE) / 1000000.0 AS pmi
      |FROM scored
      |ORDER BY pmi_micro DESC, w1 ASC, w2 ASC
      |LIMIT 20""".stripMargin

  /** Sequential-pattern mining, length-2 (the PrefixSpan seed step —
    * Pei et al. 2001): pattern (a → b) holds for a user iff SOME
    * a-event strictly precedes SOME b-event, which reduces to
    * min_ts(a) < max_ts(b) — so the whole mine is one per-(user,type)
    * aggregate (≤ |event types| rows per user) and a per-user
    * self-join of that TINY frame; support is exact integer ppm.
    * Never touches event pairs — the n² that makes naive sequence
    * mining explode. Patterns below 5% user support are cut. */
  def seqPatterns(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.load(s, d, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val perType = ev.groupBy("user_id", "event_type")
      .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"))
      .localCheckpoint(eager = false) // both sides of its own self-join
    // the distinct-user total comes off the (tiny, pinned) per-type
    // frame — same user set, no second corpus scan
    val total = perType.agg(countDistinct(col("user_id")).as("n_total"))
    perType.select(col("user_id"), col("event_type").as("a_type"),
        col("first_us"))
      .join(perType.select(col("user_id"), col("event_type").as("b_type"),
        col("last_us")), "user_id")
      .filter(col("a_type") =!= col("b_type") &&
        col("first_us") < col("last_us"))
      .groupBy("a_type", "b_type").agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(total))
      .filter(col("n_users") * 20 >= col("n_total"))
      .select(col("a_type"), col("b_type"), col("n_users"),
        // integer division (`div`), mirroring the oracle's `//` —
        // a double `/` + cast could round up across an integer
        // boundary for non-representable quotients
        expr("(n_users * CAST(1000000 AS BIGINT)) div n_total")
          .as("support_ppm"))
  }

  val seqPatternsOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |pt AS (
      |  SELECT user_id, event_type, MIN(us) AS first_us, MAX(us) AS last_us
      |  FROM e GROUP BY 1, 2),
      |tot AS (SELECT COUNT(DISTINCT user_id) AS n_total FROM e),
      |p AS (
      |  SELECT a.event_type AS a_type, b.event_type AS b_type,
      |    COUNT(*) AS n_users
      |  FROM pt a JOIN pt b
      |    ON a.user_id = b.user_id AND a.event_type <> b.event_type
      |  WHERE a.first_us < b.last_us
      |  GROUP BY 1, 2)
      |SELECT a_type, b_type, n_users,
      |  CAST(n_users * 1000000 // n_total AS BIGINT) AS support_ppm
      |FROM p, tot WHERE n_users * 20 >= n_total""".stripMargin

  val all: Seq[Q] = Seq(
    Q("text_pmi_collocations", pmiCollocations, Some(pmiCollocationsOracle)),
    Q("events_seq_patterns", seqPatterns, Some(seqPatternsOracle)),
    Q("docs_source_caps", sourceCaps, Some(sourceCapsOracle)),
    Q("ml_group_folds", groupFoldSplit, Some(groupFoldSplitOracle)),
    Q("text_pii_redact", piiRedact, Some(piiRedactOracle)),
    Q("text_repetition", repetition, Some(repetitionOracle)),
    Q("text_unigram_logprob", unigramLogprob, Some(unigramLogprobOracle)),
    Q("text_bigram_logprob", bigramLogprob, Some(bigramLogprobOracle)),
    Q("docs_ppl_buckets", pplBuckets, Some(pplBucketsOracle)),
    Q("events_psi_drift", psiDrift, Some(psiDriftOracle)),
    Q("docs_quality_gate", qualityGate, Some(qualityGateOracle)),
    Q("docs_mixture_sample", mixtureSample, Some(mixtureSampleOracle)),
    Q("docs_temperature_mix", temperatureMix, Some(temperatureMixOracle)),
    Q("docs_shuffle_shards", shuffleShards, Some(shuffleShardsOracle)),
    Q("docs_oov_rate", oovRate, Some(oovRateOracle)),
    Q("docs_weighted_sample", weightedSample, Some(weightedSampleOracle)),
    Q("text_dup_spans", dupSpans, Some(dupSpansOracle)),
    Q("docs_chunk", chunkDocs, Some(chunkDocsOracle)),
    Q("docs_importance_weights", importanceWeights, Some(importanceWeightsOracle)),
    Q("docs_contamination", contamination, Some(contaminationOracle)),
    Q("docs_pack_sequences", packSequences, Some(packSequencesOracle)))
}
