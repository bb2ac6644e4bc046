package graft.scaleops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data curation operators — the pipeline stages between raw
  * crawl and tokenizer that the reference's analytics surface never
  * had but any 100 TB corpus build needs (north-star additions,
  * SURVEY.md §2.5): PII redaction, repetition-based quality gates,
  * deterministic mixture sampling, contamination screening, and
  * sequence packing.
  *
  * Design rules shared by every op here:
  *   - pure codegen'd built-ins on the per-row path (regexes, array
  *     ops) — zero shuffles until an aggregate the caller asks for;
  *   - any randomness is replaced by deterministic arithmetic on ids
  *     (reproducible AND expressible in the DuckDB oracle);
  *   - window functions are always partitioned (per-source), never a
  *     global single-task sort.
  */
object TrainingData {

  // ---- PII redaction ----------------------------------------------------

  /** (pattern, replacement) pairs — simple RE2/Java-common syntax so
    * the same regex runs in Spark and the SQL oracle (`\b` and the
    * octet alternation are in the common subset; no backrefs or
    * lookaround). Order matters: cards before phones (a 16-digit run
    * would otherwise match the phone pattern first).
    *
    * Word boundaries keep digit runs embedded in identifiers
    * ("v1.2.3.4", "build20240101") from matching, and the IP octets
    * are range-checked (≤ 255) so "999.1.2.3" is not an IP. A bare
    * dotted quad that IS a section number ("see 1.2.3.4") still
    * redacts — indistinguishable from an IP by syntax alone; curation
    * favors over-redaction on that residual ambiguity. */
  private val octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
  val piiPatterns: Seq[(String, String)] = Seq(
    "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}" -> "<EMAIL>",
    "\\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\\b" -> "<CARD>",
    "\\+?\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b" -> "<PHONE>",
    s"\\b$octet(\\.$octet){3}\\b" -> "<IP>")

  /** Exact cheap pre-guard per class — NOT a regex: the email
    * pattern cannot match without a literal '@' (substring probe),
    * and card/phone/IP cannot match a digit-free string (`translate`
    * strip-and-compare, a single char-map pass). A guarded document
    * skips the regex traversal entirely, with IDENTICAL results —
    * the guard is an implication of the pattern, not a heuristic.
    *
    * This, not pass-fusion, is the measured win (r8, sf1 solo): the
    * four classes folded into ONE alternation regex ran 23.9 s vs
    * the sequential passes' 12.0 s — Java regex alternation pays
    * every branch's per-position attempt with no literal fast path,
    * so fusing traversals FUSES THEIR COSTS TOO. The guards instead
    * remove regex work outright: prose without digits or '@' (most
    * of any natural corpus) pays two memchr-grade probes and zero
    * regex. Guard cost is ~1% of a regex pass even when it never
    * skips. Null text yields 0 under a guard (vs NULL unguarded) —
    * PII audits treat absent text as zero hits. */
  private def piiGuard(tag: String, text: Column): Column =
    if (tag == "<EMAIL>") instr(text, "@") > 0
    else length(translate(text, "0123456789", "")) < length(text)

  /** Replace every PII occurrence with its tag. One guarded pass per
    * pattern class, all inside WholeStageCodegen ([[piiGuard]] —
    * unguarded documents pass through byte-identical without regex
    * work).
    *
    * EXPRESSION-NESTING HAZARD: as a single Column, each class's
    * output feeds the next class's guard, then-branch AND
    * else-branch — three references — and Spark's subexpression
    * elimination skips conditional branches, so the nested chain
    * re-evaluates inner classes up to 3^k times. Fine on test-sized
    * data; corpus-sized callers must use [[piiRedactStaged]], which
    * stages each class as its own projection column (attribute
    * references, linear evaluation). */
  def piiRedact(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, tag)) =>
      when(piiGuard(tag, c), regexp_replace(c, pat, tag)).otherwise(c)
    }

  /** [[piiRedact]] with each class staged as its own projection step
    * writing `outCol` — the corpus-scale shape: every guard/branch
    * references the PREVIOUS stage's materialized attribute (cheap),
    * so the chain evaluates each class exactly once per row
    * (CollapseProject keeps the stages split: the stage expression is
    * non-cheap and multiply-referenced). */
  def piiRedactStaged(df: DataFrame, inCol: String,
                      outCol: String): DataFrame =
    piiPatterns.zipWithIndex.foldLeft(
      df.withColumn(outCol, col(inCol))) {
      case (acc, ((pat, tag), _)) =>
        acc.withColumn(outCol,
          when(piiGuard(tag, col(outCol)),
            regexp_replace(col(outCol), pat, tag))
            .otherwise(col(outCol)))
    }

  /** Count of PII hits per class (before redaction) — the audit
    * columns a curation report needs. One guarded traversal per
    * class ([[piiGuard]]). */
  def piiCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (pat, tag) =>
      val name = tag.stripPrefix("<").stripSuffix(">").toLowerCase
      s"n_$name" -> when(piiGuard(tag, text),
        size(regexp_extract_all(text, lit(pat), lit(0)))).otherwise(lit(0))
    }

  /** Total residual PII spans — the re-detection audit over
    * already-redacted text (any hit at all is a defect, no per-class
    * split needed). Sum of the guarded per-class counts; on redacted
    * text the replacement tags carry no digits or '@', so a fully
    * redacted corpus short-circuits to pure guard cost. */
  def piiResidualCount(text: Column): Column =
    piiCounts(text).map(_._2).reduce(_ + _)

  // ---- repetition / quality gates ---------------------------------------

  /** Gopher-style repetition metrics per document:
    *   - dup_token_fraction: 1 − distinct/total tokens (word-level
    *     repetition);
    *   - top_bigram_fraction: tokens covered by the single most
    *     frequent bigram / total tokens (boilerplate loops);
    * plus the pass flag at the given thresholds. All relational
    * (explode → count → max), so the oracle can recompute exactly. */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String,
                        maxDupTokens: Double = 0.95,
                        maxTopBigram: Double = 0.2): DataFrame = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    val base = docs.select(col(idCol), toks.as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_distinct", size(array_distinct(col("toks"))))
    val bigrams = base.select(col(idCol), col("n_tokens"),
      explode(when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - 1), i =>
          concat_ws(" ", element_at(col("toks"), i),
            element_at(col("toks"), i + 1))))
        .otherwise(array().cast("array<string>"))).as("bigram"))
    val topBigram = bigrams.groupBy(idCol, "n_tokens", "bigram")
      .agg(count(lit(1)).as("cnt"))
      .groupBy(idCol, "n_tokens").agg(max(col("cnt")).as("top_bigram_cnt"))
    base.join(topBigram, Seq(idCol, "n_tokens"), "left")
      .select(col(idCol), col("n_tokens"),
        round(lit(1.0) - col("n_distinct").cast("double") /
          nullif(col("n_tokens"), lit(0)), 6).as("dup_token_fraction"),
        round(coalesce(col("top_bigram_cnt"), lit(0L)).cast("double") * 2.0 /
          nullif(col("n_tokens"), lit(0)), 6).as("top_bigram_fraction"))
      .withColumn("passed",
        col("dup_token_fraction") <= maxDupTokens &&
          col("top_bigram_fraction") <= maxTopBigram)
  }

  /** Per-document cross-entropy (bits/token) under the corpus's OWN
    * unigram distribution — the relational stand-in for LM-perplexity
    * quality filtering (docs far above the corpus-typical rate are
    * gibberish/rare-token soup; far below are boilerplate). Two
    * aggregates (term counts, total) + one term-keyed join; every
    * stage map-side-combinable. Per-term surprisals are rounded to
    * 9 dp and summed as DECIMAL so the per-doc total is associative —
    * exact under any partitioning AND reproducible by the SQL oracle
    * (a raw double sum would be partition-order-dependent). */
  def unigramCrossEntropy(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val terms = docs.select(col(idCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
    val tf = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = terms.agg(count(lit(1)).as("total"))
    val surprisal = round(-log2(col("cnt").cast("double") / col("total")), 9)
      .cast(DecimalType(18, 9))
    terms.join(tf, "term").crossJoin(broadcast(total))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(surprisal).as("bits"))
      .select(col(idCol), col("n_tokens"),
        round(col("bits").cast("double") / col("n_tokens"), 6)
          .as("bits_per_token"))
  }

  /** Per-doc cross-entropy (bits/token) under an interpolated BIGRAM
    * model of the corpus — the CCNet-style LM-quality signal one step
    * up from [[unigramCrossEntropy]]: per bigram position,
    * `P(w₂|w₁) = λ·c(w₁w₂)/c(w₁·) + (1−λ)·c(w₂)/N` (MLE bigram with
    * unigram interpolation — λ < 1 keeps unseen-in-context tokens
    * finite, the standard Jelinek-Mercer smoothing). Docs scoring far
    * above the corpus-typical rate are gibberish; far below are
    * boilerplate loops.
    *
    * Plan shape: one bigram explode + two term-keyed aggregates
    * (bigram counts, left-context counts — both map-side combinable)
    * + the unigram pass, then term-keyed joins back. Everything
    * shuffles on term keys — linear at any corpus size, no driver
    * state. Per-position surprisals round to 9 dp and sum as DECIMAL
    * (associative ⇒ exact under any partitioning, replayable in SQL). */
  def bigramCrossEntropy(docs: DataFrame, idCol: String, textCol: String,
                         lambda: Double = 0.9): DataFrame = {
    // DICTIONARY-ENCODED shuffle keys: the surprisal is a pure
    // function of the counts (c12, c1, cu, N), so any key encoding
    // that is injective on the observed vocab yields bit-identical
    // output to string keys. Both corpus-sized exchanges (the
    // distinct-bigram aggregate and the position-stream score join)
    // therefore carry 8-byte xxhash64 tokens — strings die in the
    // map-side projection right after the explode, and the SMJ sorts
    // compare longs, not UTF-8 bytes. The r10 string-keyed form spent
    // most of the sf1 soak's 10.4 s sorting/shipping string pairs.
    //
    // Collision budget: a 64-bit collision between two DISTINCT
    // observed tokens would merge their counts (bigram pairs hash as
    // TWO longs, so only token-level collisions matter). Expected
    // collisions ≈ V²/2^65 — ~5·10^-9 at a 1M-token vocab, ~0.5 at
    // the ~4·10^9 vocab a 100 TB web corpus might reach, and a
    // collision perturbs only the two merged tokens' surprisals. The
    // string-keyed twin stays as [[bigramCrossEntropyStringKeyed]];
    // TrainingDataSpec pins hashed ≡ string on real corpus data.
    import org.apache.spark.sql.types.DecimalType
    // NO corpus-sized pinning here: tokenize is a codegen'd regex
    // split, so re-deriving the token stream per consumer is cheaper
    // than materializing 50k token arrays through a checkpoint (an
    // r10 attempt measured the pinned+pre-grouped variant 2.7× SLOWER
    // at the sf1 soak — recompute-vs-materialize goes to recompute
    // for cheap pure maps). The derivation wins below are free.
    val base = docs.select(col(idCol),
      TextAnalysis.tokens(lower(col(textCol))).as("toks"))
    // bigram generation is a fused codegen kernel, NOT the
    // transform/sequence/element_at HOF chain (CodegenFallback —
    // interpreted with per-element boxing, and this stream derives
    // twice); each token hashes once inside the kernel
    val bigrams = base
      .select(col(idCol),
        explode(graft.functions.BigramHash.pairs(col("toks"))).as("bg"))
      .select(col(idCol), col("bg.h1").as("h1"), col("bg.h2").as("h2"))
    val cBigram = bigrams.groupBy("h1", "h2").agg(count(lit(1)).as("c12"))
    // c1 is the w2-marginal of c12 — aggregate the small distinct-
    // bigram table instead of shuffling the position stream a second
    // time (saves one corpus-sized shuffle)
    val cContext = cBigram.groupBy("h1").agg(sum(col("c12")).as("c1"))
    // (An r11 A/B DERIVED cu from cContext + a last-token term —
    // cu(w) = c1(w) + #docs ending in w — to delete this third corpus
    // aggregate; it measured level-to-worse: the derivation chain
    // recomputes cContext per consumer and the vocab outer-join eats
    // the explode savings. The direct kernel aggregate stays.)
    val cUni = base.select(explode(
        graft.functions.BigramHash.tokenHashes(col("toks"))).as("h2"))
      .groupBy("h2").agg(count(lit(1)).as("cu"))
    // total tokens = Σ cu — a one-row aggregate of the vocab table
    // instead of a second unigram corpus pass
    val total = cUni.agg(sum(col("cu")).as("n_total"))
    val prob =
      lit(lambda) * col("c12").cast("double") / col("c1") +
        lit(1.0 - lambda) * col("cu").cast("double") / col("n_total")
    val surprisal = round(-log2(prob), 9).cast(DecimalType(18, 9))
    // score each DISTINCT bigram once, then hit the position stream
    // with ONE join: surprisal is a pure function of the (w1, w2)
    // counts, and the distinct-bigram table is far smaller than the
    // position stream — the r9 first cut shuffled every position
    // through THREE sequential string-keyed joins (c12, c1, cu),
    // tripling the corpus-stream shuffle volume for identical output
    val scored = cBigram
      .join(cContext, Seq("h1"))
      .join(cUni, Seq("h2"))
      .crossJoin(broadcast(total))
      .select(col("h1"), col("h2"), surprisal.as("surp"))
    bigrams
      .join(scored, Seq("h1", "h2"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("surp")).as("bits"))
      .select(col(idCol), col("n_bigrams"),
        round(col("bits").cast("double") / col("n_bigrams"), 6)
          .as("bits_per_bigram"))
  }

  /** String-keyed twin of [[bigramCrossEntropy]] — the definitional
    * form (every shuffle keyed by the literal tokens). Kept ONLY as
    * the equality witness for the hashed production path; identical
    * arithmetic term-for-term. */
  private[graft] def bigramCrossEntropyStringKeyed(
      docs: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.9): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val base = docs.select(col(idCol),
      TextAnalysis.tokens(lower(col(textCol))).as("toks"))
    val bigrams = base
      .select(col(idCol), explode(when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - 1), i =>
          struct(element_at(col("toks"), i).as("w1"),
            element_at(col("toks"), i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
        .as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val cBigram = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val cContext = cBigram.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val cUni = base.select(explode(col("toks")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cu"))
    val total = cUni.agg(sum(col("cu")).as("n_total"))
    val prob =
      lit(lambda) * col("c12").cast("double") / col("c1") +
        lit(1.0 - lambda) * col("cu").cast("double") / col("n_total")
    val surprisal = round(-log2(prob), 9).cast(DecimalType(18, 9))
    val scored = cBigram
      .join(cContext, Seq("w1"))
      .join(cUni.withColumnRenamed("term", "w2"), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), surprisal.as("surp"))
    bigrams
      .join(scored, Seq("w1", "w2"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("surp")).as("bits"))
      .select(col(idCol), col("n_bigrams"),
        round(col("bits").cast("double") / col("n_bigrams"), 6)
          .as("bits_per_bigram"))
  }

  /** Gopher-style rule-stack quality gate (Rae et al. 2021 §A1.1,
    * adapted to the harness corpus): per document, the five classic
    * accept/reject rules —
    *   1. token count within [minTokens, maxTokens];
    *   2. mean token length within [3, 10] characters;
    *   3. ≥ 80% of tokens contain an alphabetic character;
    *   4. at least 2 distinct stopwords present (the "real prose"
    *      test);
    *   5. distinct/total token ratio ≥ 0.3 (repetition cap).
    * Every threshold comparison is INTEGER arithmetic (`3·n ≤ Σlen ≤
    * 10·n`, `5·alpha ≥ 4·n`, `10·distinct ≥ 3·n`) so the boundaries
    * are exact in both engines — no rounded-ratio boundary risk. Pure
    * per-row map (array ops in codegen), zero shuffles. */
  def gopherGate(docs: DataFrame, idCol: String, textCol: String,
                 minTokens: Int = 50, maxTokens: Int = 100000): DataFrame = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    val stopsLit = array(TextAnalysis.stopwords.map(lit): _*)
    docs
      .withColumn("_toks", toks)
      .withColumn("n_tokens", size(col("_toks")).cast("long"))
      .withColumn("sum_len",
        aggregate(transform(col("_toks"), t => length(t).cast("long")),
          lit(0L), (a, x) => a + x))
      .withColumn("n_alpha_tok",
        size(filter(col("_toks"), t => t.rlike("[a-z]"))).cast("long"))
      .withColumn("n_distinct_tok",
        size(array_distinct(col("_toks"))).cast("long"))
      // array_intersect already returns distinct elements — no second
      // array_distinct pass needed
      .withColumn("n_stops",
        size(array_intersect(col("_toks"), stopsLit)).cast("long"))
      .withColumn("word_count_ok",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("mean_len_ok",
        lit(3L) * col("n_tokens") <= col("sum_len") &&
          col("sum_len") <= lit(10L) * col("n_tokens"))
      .withColumn("alpha_ok", lit(5L) * col("n_alpha_tok") >= lit(4L) * col("n_tokens"))
      .withColumn("stopword_ok", col("n_stops") >= 2L)
      .withColumn("repetition_ok",
        lit(10L) * col("n_distinct_tok") >= lit(3L) * col("n_tokens"))
      .withColumn("passed",
        col("word_count_ok") && col("mean_len_ok") && col("alpha_ok") &&
          col("stopword_ok") && col("repetition_ok"))
      .drop("_toks")
  }

  // ---- distribution drift (PSI) -----------------------------------------

  /** Population stability index between a reference and a current
    * slice over a categorical bin — the training-data drift monitor
    * (did this week's crawl change the source/language/quality mix?).
    * Per bin: `(p_cur − p_ref) · ln(p_cur / p_ref)` with add-one
    * smoothing over the observed bins so a bin empty on either side
    * stays finite (the standard PSI ε, made deterministic). Each term
    * is ≥ 0; Σ terms is the PSI (< 0.1 stable, > 0.25 drifted by the
    * usual reading). One groupBy + a one-row broadcast — any scale. */
  def psiCategorical(df: DataFrame, binCol: String,
                     isReference: Column): DataFrame = {
    val counts = df.groupBy(col(binCol).as("bin"))
      .agg(sum(when(isReference, 1L).otherwise(0L)).as("n_ref"),
        sum(when(isReference, 0L).otherwise(1L)).as("n_cur"))
    val totals = counts.agg(sum(col("n_ref")).as("t_ref"),
      sum(col("n_cur")).as("t_cur"), count(lit(1)).as("n_bins"))
    val pRef = (col("n_ref") + 1).cast("double") / (col("t_ref") + col("n_bins"))
    val pCur = (col("n_cur") + 1).cast("double") / (col("t_cur") + col("n_bins"))
    counts.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(pRef, 6).as("p_ref"), round(pCur, 6).as("p_cur"),
        round((pCur - pRef) * log(pCur / pRef), 6).as("psi_term"))
  }

  // ---- deterministic mixture sampling -----------------------------------

  /** Domain-mixture downsampling with deterministic id arithmetic in
    * place of RNG: keep a row iff `((id mod 1000003) · PRIME) mod
    * 1000 < fraction · 1000`. Reproducible across engines and runs,
    * stable under repartitioning (a fraction-based `sample` is
    * neither), and exactly expressible in the oracle. The inner mod
    * bounds the product at ~2.6·10^15, so 64-bit arithmetic never
    * overflows under ANSI mode however large the id space grows. At
    * 100 TB this is a pure map-side filter — no shuffle, no state. */
  val mixPrime = 2654435761L // Knuth multiplicative-hash constant

  /** Uses `pmod` (always-nonnegative) so the rule is total over ANY
    * id space, negative ids included; a SQL oracle must mirror it with
    * a non-negative modulus — `(((id % m) + m) % m)` — since plain `%`
    * follows the dividend's sign and would pick different rows for
    * negative ids. */
  def mixtureKeep(id: Column, fraction: Column): Column =
    pmod(pmod(id, lit(1000003L)) * mixPrime, lit(1000L)) < fraction * 1000.0

  /** Apply per-group target fractions (groupCol value → fraction);
    * groups absent from the map keep everything. */
  def mixtureSample(docs: DataFrame, idCol: String, groupCol: String,
                    fractions: Map[String, Double]): DataFrame = {
    val frac = fractions.foldLeft(lit(1.0)) { case (c, (g, f)) =>
      when(col(groupCol) === g, lit(f)).otherwise(c)
    }
    docs.filter(mixtureKeep(col(idCol), frac))
  }

  /** TEMPERATURE mixture sampling — the multilingual/multi-source
    * rebalancing step (mT5 §3.1, CCNet): instead of fixed per-source
    * fractions, each source's target share is DERIVED from its size,
    * flattened toward uniform — target count t_s ∝ √n_s (temperature
    * α = 0.5), scaled to an overall budget of `targetNum/targetDen`
    * of the corpus. Big sources downsample hard, small sources keep
    * ~everything; the classic fix for web-scale source skew.
    *
    * Every derived quantity is INTEGER arithmetic so the SQL oracle
    * replays the whole derivation bit-for-bit: √n_s floor-quantizes
    * to micros immediately (sqrt is correctly rounded in both
    * engines; the double product feeding the floor is exact below
    * 2⁵³, i.e. to n_s ≈ 8·10¹³ rows per source), the target product
    * runs in DECIMAL(38,0) / HUGEINT (≈ 5·10⁵·n^1.5 — BIGINT alone
    * overflows once a dominant source passes ~7·10⁸ rows), keep
    * permilles are integer div, and the row-level keep is the
    * [[mixtureKeep]] id-hash rule at permille/1000. One tiny aggregate + a broadcast join + a
    * pure map filter — no corpus shuffle at any scale. Returns
    * (kept docs, per-source plan) — the plan is the audit artifact
    * (n_s, sq_micros, target, permille). */
  def temperatureSample(docs: DataFrame, idCol: String, groupCol: String,
                        targetNum: Long = 1L, targetDen: Long = 2L)
      : (DataFrame, DataFrame) = {
    require(targetNum >= 0 && targetDen > 0)
    val counts = docs.groupBy(groupCol).agg(count(lit(1)).as("n_s"))
    val sq = counts.withColumn("sq_micros",
      floor(sqrt(col("n_s").cast("double")) * lit(1000000.0) + lit(0.5))
        .cast("long"))
    val tot = sq.agg(sum(col("n_s")).as("n_total"),
      sum(col("sq_micros")).as("sum_sq"))
    // the (n_total/den)·num·sq_micros product overflows BIGINT once a
    // dominant source passes ~7·10⁸ rows (sq_micros ≈ 10⁶·√n_s) —
    // exactly the scale this operator exists for. Route the product
    // through DECIMAL(38,0): exact integer arithmetic to 10³⁸
    // (≈ 5·10⁵·n^1.5 stays under that beyond 10¹² docs), identical
    // values wherever BIGINT didn't overflow, and `div` on decimals
    // returns BIGINT. The oracle replays the same widening in
    // HUGEINT.
    val plan = sq.crossJoin(broadcast(tot))
      .withColumn("t_target", expr(
        s"(cast(n_total div $targetDen as decimal(38,0)) * $targetNum" +
          ") * sq_micros div sum_sq"))
      .withColumn("permille",
        least(lit(1000L),
          expr("1000 * cast(t_target as decimal(38,0)) div n_s")))
      .select(col(groupCol), col("n_s"), col("sq_micros"),
        col("t_target"), col("permille"))
    val kept = docs.join(broadcast(plan.select(col(groupCol),
        col("permille"))), Seq(groupCol))
      .filter(mixtureKeep(col(idCol), col("permille") / lit(1000.0)))
      .drop("permille")
    (kept, plan)
  }

  // ---- duplicated-span detection ------------------------------------------

  /** Exact repeated-span detection — the primitive behind
    * suffix-array training-data dedup ("Deduplicating Training Data
    * Makes Language Models Better", Lee et al. 2022), re-expressed
    * relationally: every k-token window that occurs at least
    * `minOccurrences` times corpus-wide is a duplicated span, and a
    * document's `dup_fraction` is the share of its tokens covered by
    * at least one duplicated span. Pipeline:
    *   1. k-gram windows per doc (`transform` over the token array —
    *      zero shuffle, inside codegen);
    *   2. one groupBy on the span key finds global repeats (the
    *      distributed stand-in for suffix-array LCP scans);
    *   3. flagged [start, start+k-1] intervals UNION per doc via the
    *      gaps-and-islands merge — a per-doc partitioned window,
    *      never a global sort, so overlapping spans never
    *      double-count a token.
    *
    * 100 TB notes: the span key here is the literal k-gram string so
    * the SQL oracle can replay it exactly; a production run hashes it
    * (`xxhash64(span)`) to bound shuffle bytes — same plan shape.
    * `maxDf` is the same hot-key guard as [[contamination]]: a
    * boilerplate span occurring in millions of docs would fan the
    * semi-join out by its frequency while carrying no dedup signal;
    * capped spans are simply not flagged (under-counting, never
    * over). */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 8, minOccurrences: Int = 2,
                      maxDf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol),
      TextAnalysis.tokens(lower(col(textCol))).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
    val spans = base
      .select(col(idCol), posexplode(when(col("n_tokens") >= k,
        transform(sequence(lit(1), col("n_tokens") - (k - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(k)))))
        .otherwise(array().cast("array<string>"))))
      .select(col(idCol), col("pos").as("start"), col("col").as("span"))
    val counts = spans.groupBy("span").agg(count(lit(1)).as("occ"))
    val dup = counts.filter(col("occ") >= minOccurrences &&
      maxDf.map(cap => col("occ") <= cap).getOrElse(lit(true)))
    val flagged = spans.join(dup.select("span"), Seq("span"), "left_semi")
      .select(col(idCol), col("start"), (col("start") + (k - 1)).as("end"))
    val w = Window.partitionBy(idCol).orderBy("start")
    val coverage = flagged
      .withColumn("max_end_prev",
        max(col("end")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni", when(col("max_end_prev").isNull ||
        col("start") > col("max_end_prev"), 1).otherwise(0))
      .withColumn("island",
        sum(col("ni")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("island"))
      .agg(min("start").as("i_start"), max("end").as("i_end"))
      .groupBy(idCol)
      .agg(sum(col("i_end") - col("i_start") + 1).as("dup_tokens"),
        count(lit(1)).as("n_islands"))
    base.select(col(idCol), col("n_tokens"))
      .join(coverage, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("n_islands"), lit(0L)).as("n_islands"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          nullif(col("n_tokens"), lit(0)), 6).as("dup_fraction"))
  }

  // ---- chunking (retrieval / context-window prep) -------------------------

  /** Split each document into fixed-size token chunks with overlap —
    * the retrieval-corpus (RAG) and context-window prep step: chunk
    * `i` covers tokens `[i·stride, i·stride + chunkSize)`, so
    * consecutive chunks overlap by `chunkSize − stride` tokens and
    * the final chunk may be short. Pure per-row array arithmetic
    * (`sequence` + `slice` inside codegen) followed by one
    * `posexplode` — zero shuffles, so at 100 TB this is a map-only
    * pass whose output is `≈ chunkSize/stride ×` the input tokens. */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                chunkSize: Int, stride: Int): DataFrame = {
    require(stride >= 1 && chunkSize >= stride,
      s"need 1 <= stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    val base = docs.select(col(idCol),
      TextAnalysis.tokens(lower(col(textCol))).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
    base
      .select(col(idCol), col("toks"), col("n_tokens"),
        posexplode(when(col("n_tokens") >= 1,
          sequence(lit(0), col("n_tokens") - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))))
      .select(col(idCol), col("pos").as("chunk_id"),
        col("col").as("start_tok"),
        least(lit(chunkSize), col("n_tokens") - col("col")).as("n_toks"),
        concat_ws(" ", slice(col("toks"), col("col") + 1, lit(chunkSize)))
          .as("chunk_text"))
  }

  // ---- importance weighting (DSIR-style) ----------------------------------

  /** Data-selection importance weights ("Data Selection for Language
    * Models via Importance Resampling", Xie et al. 2023), with exact
    * unigram models in place of hashed n-gram features so the whole
    * computation stays relational and oracle-replayable: each doc is
    * scored by the mean per-token log-likelihood ratio (bits) between
    * an add-one-smoothed unigram model of the TARGET slice
    * (`isTarget` rows) and one of the full corpus. Docs that look
    * more like the target than the corpus score positive; `keep`
    * selects them (the resampling step then applies
    * [[mixtureKeep]]-style arithmetic to the kept set).
    *
    * One explode + one term-keyed groupBy computing both models in a
    * single pass (map-side combinable), broadcast totals, one
    * term-keyed join back — the same plan family as
    * [[unigramCrossEntropy]], linear at any corpus size. Per-term
    * ratios are rounded to 9 dp and summed as DECIMAL — associative,
    * so exact under any partitioning. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val terms = docs.select(col(idCol), isTarget.as("is_target"),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
    val tf = terms.groupBy("term").agg(
      count(lit(1)).as("c_cnt"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("t_cnt"))
    val totals = tf.agg(
      sum(col("c_cnt")).as("c_total"),
      sum(col("t_cnt")).as("t_total"),
      count(lit(1)).as("vocab"))
    val bits = round(log2(
      ((col("t_cnt") + 1).cast("double") / (col("t_total") + col("vocab"))) /
        ((col("c_cnt") + 1).cast("double") / (col("c_total") + col("vocab")))),
      9).cast(DecimalType(18, 9))
    terms.join(tf, "term").crossJoin(broadcast(totals))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum(bits).as("bits"))
      .select(col(idCol), col("n_tokens"),
        round(col("bits").cast("double") / col("n_tokens"), 6)
          .as("logratio_bits_per_token"))
      .withColumn("keep", col("logratio_bits_per_token") > 0)
  }

  // ---- contamination screening ------------------------------------------

  /** Benchmark-contamination screen: corpus docs sharing at least
    * `minShared` distinct word k-shingles with ANY benchmark doc.
    * Both sides explode to (shingle, id) and meet in one equi-join on
    * the shingle — an inverted-index probe, not a pairwise scan; the
    * benchmark side is small (broadcast). Returns one row per
    * contaminated corpus doc with the strongest benchmark match.
    *
    * `maxDf` is the skew guard for corpus scale: a shingle occurring
    * in more than `maxDf` corpus docs (a boilerplate phrase) would
    * fan the probe join out by its document frequency — at 100 TB a
    * single hot trigram can emit billions of join rows while carrying
    * no contamination signal. Capped shingles are dropped from BOTH
    * sides (the screen loses only matches made exclusively of
    * boilerplate). None = exact semantics, what the oracle checks. */
  def contamination(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String, shingleK: Int = 3,
                    minShared: Int = 2, maxDf: Option[Long] = None): DataFrame = {
    def shingled(df: DataFrame, as: String) =
      df.select(col(idCol).as(s"${as}_id"),
        explode(graft.functions.WordShingles(lower(col(textCol)), shingleK))
          .as("shingle"))
        .distinct()
    val corpusSh = maxDf match {
      case None => shingled(corpus, "doc")
      case Some(cap) =>
        val sh = shingled(corpus, "doc")
        val hot = sh.groupBy("shingle")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > cap)
          .select("shingle")
        // left_anti keeps the inverted index bounded per key
        sh.join(broadcast(hot), Seq("shingle"), "left_anti")
    }
    val benchSh = maxDf match {
      case None => shingled(benchmark, "bench")
      case Some(_) =>
        // same cap on the broadcast side, by corpus df
        shingled(benchmark, "bench")
          .join(corpusSh.select("shingle").distinct(), Seq("shingle"),
            "left_semi")
    }
    val hits = corpusSh
      .join(broadcast(benchSh), "shingle")
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("n_shared").desc, col("bench_id").asc)
    hits.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("bench_id").as("top_bench_id"),
        col("n_shared"))
  }

  // ---- deterministic corpus shuffle -------------------------------------

  /** Write-time corpus shuffle: every training run randomizes document
    * order, and at 100 TB that must not be a single global sort of
    * full rows. Instead the classic two-level layout: a deterministic
    * hash assigns each doc a shard (`h mod nShards`) and a position
    * WITHIN its shard (rank of `(h, id)` — the id tiebreak makes the
    * order total even where ids collide mod the hash modulus, which
    * happens above ~1M docs). Reading shards 0..n−1 in shard order,
    * each in position order, replays one fixed pseudorandom
    * permutation of the corpus. The hash is the [[mixtureKeep]] id
    * arithmetic, so both the shard split and the within-shard order
    * are exactly replayable by a SQL oracle and stable under
    * repartitioning. Each shard ranks in one task, so `nShards` must
    * scale with the corpus — shards ARE the output files, and real
    * tokenizer-shuffle jobs run thousands of them (~shard = a few GB);
    * the per-shard window is then the same bounded-partition
    * discipline as [[packSequences]]. */
  def shuffleShards(docs: DataFrame, idCol: String,
                    nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    val h = pmod(pmod(col(idCol), lit(1000003L)) * mixPrime, lit(1000003L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("h"), col(idCol))
    docs.select(col(idCol), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .select(col(idCol), col("shard"), col("pos"))
  }

  // ---- weighted sampling (quality-weighted selection) ---------------------

  /** Weighted sampling without replacement, per group — the
    * quality-weighted data-selection step (keep k docs per source,
    * preferring high-quality ones, reproducibly): the classic
    * Efraimidis–Spirakis scheme (key = u^(1/w), take the top-k keys)
    * with the RNG replaced by the [[mixtureKeep]] id-hash uniform
    * `u = (h+1)/(M+1) ∈ (0,1)`, so the whole sample is deterministic,
    * repartition-stable, and exactly replayable in SQL. Selection
    * probability tracks the weight; zero/negative weights are
    * excluded outright (their E-S key is −∞). The per-group rank
    * window is partitioned — no global sort. The key is ranked in the
    * LOG domain, ln(u)/w (monotone in u^(1/w), so the selected set is
    * the E-S set): u^(1/w) itself plateaus at 1.0 for large weights,
    * where 9-dp rounding ties everything and the id tiebreak — not
    * the weight — would decide the cut; ln(u)/w spreads those keys.
    * Rounded to 9 dp with an id tiebreak so the cut is stable
    * cross-engine (ln is the safer op than pow ULP-wise too). */
  def weightedSample(docs: DataFrame, idCol: String, weightCol: String,
                     groupCol: String, k: Int): DataFrame = {
    val m = 1000003L
    val h = pmod(pmod(col(idCol), lit(m)) * mixPrime, lit(m))
    val u = (h + 1).cast("double") / (m + 1).toDouble
    val key = round(log(u) / col(weightCol).cast("double"), 9)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("es_key").desc, col(idCol).asc)
    docs.filter(col(weightCol).cast("double") > 0.0)
      .withColumn("es_key", key)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(groupCol), col("rk").cast("int").as("rk"), col(idCol),
        col(weightCol).cast("double").as("weight"), col("es_key"))
  }

  // ---- vocabulary coverage (OOV rate) -------------------------------------

  /** Per-document out-of-vocabulary rate against a top-`vocabSize`
    * frequency vocabulary built from the corpus itself — the tokenizer
    * coverage report (which docs a fixed vocab serves badly). The
    * vocabulary cut is deterministic: rank by (count desc, term asc),
    * keep ranks ≤ vocabSize. One explode + one term aggregate + one
    * term-keyed semi-join back; the vocab is broadcast-sized by
    * construction. */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              vocabSize: Int): DataFrame = {
    val terms = docs.select(col(idCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
    // top-k cut as TakeOrdered (orderBy+limit), never a global ranking
    // window — per-partition heaps, no single-task sort of the vocab
    val vocab = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(vocabSize)
      .select("term")
    terms
      .join(broadcast(vocab.withColumn("in_vocab", lit(1))),
        Seq("term"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col(idCol), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6)
          .as("oov_rate"))
  }

  // ---- sequence packing -------------------------------------------------

  /** Pack documents into fixed-length training sequences by
    * concatenate-then-chunk (the standard LM pretraining layout): an
    * in-shard running token total assigns each doc a starting
    * sequence `floor(prior_tokens / seqLen)`. The cumsum window is
    * PARTITIONED (per `shardCol` — shards pack independently, as
    * real tokenizer jobs do), so no global single-task sort exists at
    * any scale. Returns per-sequence occupancy: docs whose text
    * STARTS in the sequence, token fill, and the fill ratio
    * (sequences except each shard's last should be ≥ 1.0 − fit
    * slack). */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    shardCol: String, seqLen: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy(col(idCol))
    val packed = docs
      .select(col(shardCol), col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("prior",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("seq_id", floor(col("prior") / seqLen))
    packed.groupBy(col(shardCol).as("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))
      .withColumn("starts_at_token", col("seq_id") * seqLen)
  }

  // ---- per-source caps (domain balancing) ---------------------------------

  /** Per-group document caps — the domain-balancing step of a corpus
    * build (C4/RefinedWeb cap over-represented hosts so one boilerplate
    * domain can't dominate the mixture): at most `cap` docs survive per
    * `groupCol` value, chosen by the deterministic [[mixtureKeep]]
    * id-hash priority instead of RNG, so the SELECTION (not just its
    * size) is reproducible, repartition-stable, and SQL-replayable.
    *
    * 100 TB shape: ONE rank window, and Catalyst's rank-limit pushdown
    * (SPARK-37099 `WindowGroupLimit`) turns the `row_number ≤ cap`
    * filter into a MAP-SIDE partial top-`cap` per group before the
    * exchange — each input partition forwards at most `cap` rows per
    * group, so a billion-row hot domain never materializes through
    * the shuffle. A hand-rolled two-phase (bucket-local top-k, then
    * global) re-implements exactly this with a second exchange on
    * top — measured plan: the built-in is one Exchange, the manual
    * form two. PlanSpec pins the partial `WindowGroupLimit` so a
    * refactor that breaks pushdown eligibility (e.g. `rank` over a
    * non-prefix filter) fails loudly. */
  def sourceCaps(docs: DataFrame, idCol: String, groupCol: String,
                 cap: Int): DataFrame = {
    require(cap >= 1, s"cap=$cap must be >= 1")
    val m = 1000003L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("pri"), col(idCol))
    docs.select(col(groupCol), col(idCol))
      .withColumn("pri", pmod(pmod(col(idCol), lit(m)) * mixPrime, lit(m)))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= cap)
      .select(col(groupCol), col(idCol), col("rk"), col("pri"))
  }

  // ---- group-disjoint folds (leakage-safe splits) --------------------------

  /** Group-disjoint k-fold assignment (sklearn's GroupKFold semantics,
    * deterministically): the fold is the [[mixtureKeep]] id-hash of the
    * GROUP key, so every row of a group lands in the same fold — the
    * leakage-safe split for grouped data (all events of a user, all
    * chunks of a doc — a random row split would leak a group across
    * train/test). Pure map-side arithmetic: no shuffle, no state, and
    * a row arriving tomorrow for a known group joins its fold forever
    * (the property an RNG split can't give). */
  def groupFolds(df: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k=$k must be >= 2")
    df.withColumn("fold",
      pmod(pmod(col(groupCol).cast("long"), lit(1000003L)) * mixPrime,
        lit(k.toLong)).cast("int"))
  }
}
