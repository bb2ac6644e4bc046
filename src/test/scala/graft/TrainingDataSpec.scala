package graft

import org.apache.spark.sql.functions._
import graft.scaleops.TrainingData

class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  test("pii: each class detected and redacted; order protects card digits") {
    val df = Seq(
      (1L, "mail me at a.b-c@mail.example.org today"),
      (2L, "call +1 555-123-4567 or 555-987-6543"),
      (3L, "server 10.0.255.3 responded"),
      (4L, "card 4111 1111 1111 1111 on file"),
      (5L, "nothing sensitive here")).toDF("id", "text")
    val counted = df.select(Seq(col("id"),
      TrainingData.piiRedact(col("text")).as("red")) ++
      TrainingData.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(counted(1L).getAs[String]("red").contains("<EMAIL>"))
    assert(counted(2L).getAs[Int]("n_phone") == 2)
    assert(counted(3L).getAs[String]("red") == "server <IP> responded")
    // the 16-digit run must become CARD, not a partial PHONE match
    assert(counted(4L).getAs[String]("red") == "card <CARD> on file")
    assert(counted(4L).getAs[Int]("n_card") == 1)
    assert(counted(5L).getAs[String]("red") == "nothing sensitive here")
    // residual scan of redacted text finds nothing
    val resid = df.select(TrainingData.piiCounts(
      TrainingData.piiRedact(col("text"))).map(_._2).reduce(_ + _).as("r"))
      .agg(sum("r")).head().getLong(0)
    assert(resid == 0L)
  }

  test("piiRedactStaged equals the single-Column redact on every class mix") {
    // the staged form exists purely for evaluation-count (the nested
    // Column chain re-runs inner classes up to 3^k times); its OUTPUT
    // must be byte-identical — including multi-class docs where class
    // order matters (card before phone) and guard-skipped docs
    val df = Seq(
      (1L, "a.b@x.org and 10.0.0.1 and 4111 1111 1111 1111 and 555-123-4567"),
      (2L, "digits 1234 but no pii beyond 999.1.2.3 wait that redacts: 250.1.2.3"),
      (3L, "no sensitive content at all"),
      (4L, "")).toDF("doc_id", "text")
    val both = TrainingData.piiRedactStaged(df, "text", "red_staged")
      .withColumn("red_col", TrainingData.piiRedact(col("text")))
    assert(both.filter(col("red_staged") =!= col("red_col")).isEmpty)
    // and the staged output still carries zero residual
    val resid = both.select(TrainingData.piiResidualCount(col("red_staged"))
      .as("r")).agg(sum("r")).head().getLong(0)
    assert(resid == 0L)
  }

  test("repetition metrics: clean vs degenerate documents separate") {
    val df = Seq(
      // 24 distinct tokens: top bigram covers 2/24 < 0.2 (the gate is
      // meant for documents, not fragments — at n < 10 even unique
      // text has top-bigram fraction 2/n > 0.2)
      (1L, ('a' to 'x').map(c => s"$c$c").mkString(" ")),
      (2L, "spam spam spam spam spam spam spam spam"),
      (3L, "buy now buy now buy now buy now")).toDF("doc_id", "text")
    val m = TrainingData.repetitionMetrics(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Boolean]("passed"))
    assert(m(2L).getAs[Double]("dup_token_fraction") > 0.8)
    assert(!m(2L).getAs[Boolean]("passed"))
    // "buy now" covers nearly all tokens → top-bigram gate trips even
    // though there are two distinct tokens
    assert(m(3L).getAs[Double]("top_bigram_fraction") > 0.9)
    assert(!m(3L).getAs[Boolean]("passed"))
  }

  test("mixture sample: deterministic, repartition-stable, tracks fractions") {
    val docs = (0L until 4000L).map(i => (i, s"g${i % 4}")).toDF("id", "g")
    val frac = Map("g0" -> 0.25, "g1" -> 0.5, "g2" -> 1.0)
    val once = TrainingData.mixtureSample(docs, "id", "g", frac)
      .select("id").as[Long].collect().toSet
    val again = TrainingData.mixtureSample(docs.repartition(7), "id", "g", frac)
      .select("id").as[Long].collect().toSet
    assert(once == again) // stable under partitioning, unlike sample()
    val byGroup = TrainingData.mixtureSample(docs, "id", "g", frac)
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byGroup("g0") - 250.0) < 60, s"g0=${byGroup("g0")}")
    assert(math.abs(byGroup("g1") - 500.0) < 60, s"g1=${byGroup("g1")}")
    assert(byGroup("g2") == 1000L)      // fraction 1.0 keeps all
    assert(byGroup("g3") == 1000L)      // unlisted group keeps all
  }

  test("contamination: verbatim overlap flagged, disjoint text clean") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated words appear here instead now")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "quick brown fox jumps high")).toDF("doc_id", "text")
    val hits = TrainingData.contamination(corpus, bench, "doc_id", "text",
      shingleK = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.toSeq == Seq((1L, 100L, 2L))) // "quick brown fox", "brown fox jumps"
  }

  test("unigram cross-entropy: hand-computed bits; rare tokens score higher") {
    // corpus: 8 tokens total — "a"×4 (p=1/2, 1 bit), "b"×2 (p=1/4,
    // 2 bits), "c","d" ×1 (p=1/8, 3 bits)
    val df = Seq(
      (1L, "a a a a"),          // 4×1 bit → 1.0 bits/token
      (2L, "b b c d")).toDF("doc_id", "text") // (2+2+3+3)/4 = 2.5
    val m = TrainingData.unigramCrossEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m(1L) == (4L, 1.0))
    assert(m(2L) == (4L, 2.5))
  }

  test("contamination maxDf guard: boilerplate shingles dropped, real overlap kept") {
    // "terms of service apply" appears in EVERY corpus doc (hot
    // shingle); doc 1 also shares genuine content with the benchmark
    val corpus = (1L to 20L).map { i =>
      val unique = if (i == 1L) "quick brown fox jumps over dogs"
        else s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"
      (i, s"$unique terms of service apply")
    }.toDF("doc_id", "text")
    val bench = Seq(
      (100L, "quick brown fox jumps high terms of service apply"))
      .toDF("doc_id", "text")
    // uncapped: every doc matches via the boilerplate tail
    val uncapped = TrainingData.contamination(corpus, bench, "doc_id", "text",
      shingleK = 3, minShared = 2).count()
    assert(uncapped == 20L)
    // capped at df 5: boilerplate shingles vanish, only doc 1's real
    // overlap ("quick brown fox", "brown fox jumps") survives
    val capped = TrainingData.contamination(corpus, bench, "doc_id", "text",
      shingleK = 3, minShared = 2, maxDf = Some(5L))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(capped.toSeq == Seq((1L, 2L)), s"got ${capped.toSeq}")
  }

  test("packing: per-shard sequences fill before opening the next") {
    val docs = (0L until 60L).map(i => (i, s"s${i % 2}",
      Seq.fill(10)("tok").mkString(" "))).toDF("doc_id", "shard0", "text")
    val packed = TrainingData.packSequences(docs, "doc_id", "text",
      shardCol = "shard0", seqLen = 64)
      .orderBy("shard", "seq_id").collect()
    // 30 docs × 10 tokens per shard = 300 tokens → sequences 0..4
    val byShard = packed.groupBy(_.getString(0))
    byShard.foreach { case (_, rows) =>
      val seqIds = rows.map(_.getLong(1)).toSeq
      assert(seqIds == (0L to 4L), s"seq ids $seqIds")
      // every sequence starts at its exact token boundary
      rows.foreach { r => assert(r.getLong(4) == r.getLong(1) * 64) }
      // full sequences carry >= floor(64/10) docs
      assert(rows.init.forall(_.getLong(2) >= 6))
    }
    assert(packed.map(_.getLong(2)).sum == 60L) // every doc lands once
  }

  test("duplicated spans: planted repeat found, overlaps union, short docs zero") {
    import spark.implicits._
    // w1..w10 unique filler; docs 1 and 2 share the 4-token span
    // "a b c d"; doc 3 repeats it internally TWICE with overlap
    // offset 2 ("a b c d a b c d" → spans at 0 and 4 plus the
    // crossing ones only if they also repeat — they don't);
    // doc 4 is shorter than k.
    val docs = Seq(
      (1L, "w1 w2 a b c d w3 w4"),
      (2L, "v1 a b c d v2 v3 v4"),
      (3L, "a b c d a b c d"),
      (4L, "u1 u2 u3")).toDF("doc_id", "text")
    val got = TrainingData.duplicatedSpans(docs, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toMap

    // doc 1: span "a b c d" starts at token 2 → covers [2,5] = 4 tokens
    assert(got(1L) == ((8, 4L, 1L, 0.5)))
    // doc 2: starts at token 1 → [1,4] = 4 tokens of 8
    assert(got(2L) == ((8, 4L, 1L, 0.5)))
    // doc 3: "a b c d" at 0 and 4, plus "b c d a"/"c d a b"/"d a b c"
    // (each occurs only once → not duplicated). [0,3] ∪ [4,7] = all 8
    // tokens, two islands that tile the doc without double-counting.
    assert(got(3L)._2 == 8L && got(3L)._4 == 1.0)
    // doc 4: shorter than k → zero coverage, no islands
    assert(got(4L) == ((3, 0L, 0L, 0.0)))
  }

  test("chunking: overlap arithmetic, short tail, sub-chunk doc") {
    import spark.implicits._
    // doc 1: 10 tokens, chunkSize 4, stride 3 → starts 0,3,6,9 with
    // lengths 4,4,4,1; doc 2: 3 tokens → one short chunk
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      (2L, "a b c")).toDF("doc_id", "text")
    val got = TrainingData.chunkDocs(docs, "doc_id", "text",
      chunkSize = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(got.size == 5)
    assert(got((1L, 0)) == ((0, 4, "t0 t1 t2 t3")))
    assert(got((1L, 1)) == ((3, 4, "t3 t4 t5 t6"))) // one-token overlap
    assert(got((1L, 2)) == ((6, 4, "t6 t7 t8 t9")))
    assert(got((1L, 3)) == ((9, 1, "t9"))) // short tail
    assert(got((2L, 0)) == ((0, 3, "a b c")))
  }

  test("importance weights: target-like docs score positive, corpus-typical negative") {
    import spark.implicits._
    // target slice speaks "ml data model"; the rest speaks "spam junk ad"
    val docs = Seq(
      (1L, "ml data model ml data", true),
      (2L, "ml model data model ml", true),
      (3L, "spam junk ad spam junk", false),
      (4L, "ad spam junk ad ad", false),
      (5L, "ml data spam junk", false)). // mixed, not in target
      toDF("doc_id", "text", "tgt")
    val got = TrainingData.importanceWeights(docs, "doc_id", "text",
      col("tgt"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toMap
    assert(got.size == 5)
    assert(got(1L)._1 == 5 && got(5L)._1 == 4) // token counts carried
    // pure-target docs look more like the target model → positive bits
    assert(got(1L)._2 > 0 && got(1L)._3)
    assert(got(2L)._2 > 0 && got(2L)._3)
    // pure-corpus-tail docs score negative and are not kept
    assert(got(3L)._2 < 0 && !got(3L)._3)
    assert(got(4L)._2 < 0 && !got(4L)._3)
    // the mixed doc sits between the pure docs
    assert(got(5L)._2 > got(3L)._2 && got(5L)._2 < got(1L)._2)
  }

  test("duplicated spans: maxDf guard drops boilerplate spans") {
    import spark.implicits._
    // the same span in 5 docs; cap at 3 occurrences → not flagged
    val docs = (1L to 5L).map(i => (i, "x y z w junk" + i))
      .toDF("doc_id", "text")
    val capped = TrainingData.duplicatedSpans(docs, "doc_id", "text",
      k = 4, maxDf = Some(3L))
    assert(capped.filter(col("dup_tokens") > 0).count() == 0)
    val uncapped = TrainingData.duplicatedSpans(docs, "doc_id", "text", k = 4)
    assert(uncapped.filter(col("dup_tokens") > 0).count() == 5)
  }

  test("bigram cross-entropy: symmetric docs score identically") {
    import spark.implicits._
    // d1/d2 differ only in the final (frequency-1) token, so their
    // interpolated bigram surprisals are identical term-for-term
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val got = TrainingData.bigramCrossEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got(1L)._1 == 2 && got(2L)._1 == 2)
    assert(got(1L)._2 == got(2L)._2)
    assert(got(1L)._2 > 0)
    // the shared (a,b) bigram is high-probability: P = 0.9·2/2 + ε —
    // its surprisal must be below 1 bit averaged with the rare second
    assert(got(1L)._2 < 2.0)
  }

  test("BigramHash kernels match Spark's xxhash64 arithmetic exactly " +
    "(pairs and token hashes, unicode included; n<2 folds to empty)") {
    import graft.functions.BigramHash
    val df = Seq(
      (1L, Seq("the", "quick", "brown", "fox")),
      (2L, Seq("héllo", "wörld", "héllo")),
      (3L, Seq("single")),
      (4L, Seq.empty[String])).toDF("id", "toks")
    // pairs kernel vs per-element xxhash64 over the same positions
    val kernelPairs = df.select(col("id"),
      explode(BigramHash.pairs(col("toks"))).as("bg"))
      .select(col("id"), col("bg.h1"), col("bg.h2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hofPairs = df.filter(size(col("toks")) >= 2)
      .select(col("id"), col("toks"), posexplode(expr(
        "slice(toks, 1, size(toks) - 1)")))
      .select(col("id"), xxhash64(col("col")).as("h1"),
        xxhash64(expr("toks[pos + 1]")).as("h2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(kernelPairs == hofPairs && kernelPairs.nonEmpty)
    // docs with <2 tokens emit zero pair rows
    assert(!kernelPairs.exists(p => p._1 == 3L || p._1 == 4L))
    // token-hash kernel vs scalar xxhash64
    val kernelToks = df.select(col("id"), explode(
      BigramHash.tokenHashes(col("toks"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val scalarToks = df.select(col("id"), explode(col("toks")).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kernelToks == scalarToks && kernelToks.nonEmpty)
  }

  test("bigram cross-entropy: hashed shuffle keys are bit-identical " +
    "to the string-keyed definitional form on real corpus text") {
    // the production path dictionary-encodes both corpus exchanges
    // with xxhash64; output equality holds whenever the hash is
    // injective on the observed vocab — witnessed here on the real
    // sf0.001 documents table (natural-text vocab, not toy tokens)
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val hashed = TrainingData.bigramCrossEntropy(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val stringKeyed = TrainingData
      .bigramCrossEntropyStringKeyed(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(hashed.nonEmpty && hashed.sameElements(stringKeyed))
    // and the injectivity premise itself: distinct hashes == distinct
    // tokens on this corpus
    val toks = docs.select(explode(
      graft.scaleops.TextAnalysis.tokens(lower(col("text")))).as("t"))
    val counts = toks
      .agg(countDistinct(col("t")), countDistinct(xxhash64(col("t"))))
      .collect().head
    assert(counts.getLong(0) == counts.getLong(1))
  }

  test("temperature sampling: sqrt-flattened shares — big sources " +
    "downsample hard, small keep ~everything; budget respected; " +
    "repartition-stable") {
    import spark.implicits._
    // 9000-row web source vs 100-row rare source (90:1 skew)
    val docs = ((0L until 9000L).map(i => (i, "web")) ++
      (10000L until 10100L).map(i => (i, "rare")))
      .toDF("doc_id", "source")
    val (kept, plan) = TrainingData.temperatureSample(
      docs, "doc_id", "source")
    val p = plan.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getLong(4)))
      .toMap
    // sqrt flattening: targets ∝ sqrt(n) → web target / rare target
    // ≈ sqrt(90) ≈ 9.5, NOT 90
    val (webN, webT, webP) = p("web")
    val (rareN, rareT, rareP) = p("rare")
    assert(webN == 9000L && rareN == 100L)
    assert(webT.toDouble / rareT > 8 && webT.toDouble / rareT < 11)
    // budget: Σ targets ≈ half the corpus (integer-div slack only)
    assert(webT + rareT <= 4550 && webT + rareT >= 4500)
    // rare keeps everything (permille capped at 1000), web ~47%
    assert(rareP == 1000L)
    assert(webP > 400 && webP < 550)
    // kept counts track the permilles under the id-hash rule
    val counts = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("rare") == 100L)
    assert(math.abs(counts("web") - 9000.0 * webP / 1000) < 300)
    // deterministic: repartitioned input keeps the SAME ids
    val ids1 = kept.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = TrainingData.temperatureSample(
      docs.repartition(7), "doc_id", "source")._1
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
  }

  test("shuffle shards: a dense, repartition-stable permutation") {
    import spark.implicits._
    val docs = (0L until 100L).toDF("doc_id")
    val got = TrainingData.shuffleShards(docs, "doc_id", nShards = 4)
    // every doc exactly once
    assert(got.count() == 100 && got.select("doc_id").distinct().count() == 100)
    // positions dense from 0 within each shard
    got.groupBy("shard")
      .agg(min("pos").as("mn"), max("pos").as("mx"), count(lit(1)).as("c"))
      .collect().foreach { r =>
        assert(r.getLong(1) == 0L && r.getLong(2) == r.getLong(3) - 1)
      }
    // identical assignment regardless of input partitioning
    val re = TrainingData.shuffleShards(docs.repartition(7), "doc_id", 4)
    assert(got.except(re).count() == 0 && re.except(got).count() == 0)
    // and the order is not the identity (it IS a shuffle)
    val inOrder = got.filter(col("shard") === 0).orderBy("pos")
      .select("doc_id").collect().map(_.getLong(0))
    assert(!inOrder.sameElements(inOrder.sorted))
  }

  test("OOV rate: tokens outside the top-k vocab are counted") {
    import spark.implicits._
    // "a" ×3, "b" ×2, "c" ×1 → vocab size 2 = {a, b}; c is OOV
    val docs = Seq((1L, "a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TrainingData.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got(1L) == ((3L, 0L, 0.0)))
    assert(got(2L) == ((3L, 1L, 0.333333)))
  }

  test("weighted sample: weight drives selection, zero weight excludes") {
    import spark.implicits._
    // 50 light docs (w=1) vs 10 heavy (w=1000) in one group: E-S keys
    // u^(1/1000) ≈ 1 dominate u^1, so the top-5 should be all-heavy
    val docs = ((0L until 50L).map(i => (i, 1.0, "g")) ++
      (100L until 110L).map(i => (i, 1000.0, "g")) ++
      Seq((200L, 0.0, "g"), (201L, -3.0, "g"))) // never selectable
      .toDF("doc_id", "w", "grp")
    val got = TrainingData.weightedSample(docs, "doc_id", "w", "grp", k = 5)
    val ids = got.collect().map(r => r.getLong(2)).toSet
    assert(ids.size == 5 && ids.forall(id => id >= 100L && id < 110L),
      s"heavy docs must win the sample, got $ids")
    // ranks dense 1..5; repartition-stable
    assert(got.collect().map(_.getInt(1)).sorted.sameElements(1 to 5))
    val re = TrainingData.weightedSample(docs.repartition(7), "doc_id",
      "w", "grp", k = 5)
    assert(got.except(re).count() == 0 && re.except(got).count() == 0)
  }

  test("gopher gate: each rule rejects its own pathology") {
    import spark.implicits._
    val good = "the cat sat of the mat and spoke to a dog in a hat " +
      "quite happily today again" // 18 tokens, prose-like
    val docs = Seq(
      (1L, good),
      (2L, "word"),                                   // too short
      (3L, ("x " * 20).trim),                         // repetitive + no stops
      (4L, Seq.fill(12)("1234 5678").mkString(" ")),  // no alpha tokens
      (5L, good + " " + Seq.fill(12)("pneumonoultramicroscopics").mkString(" ")))
      .toDF("doc_id", "text")                         // mean len > 10
    val got = TrainingData.gopherGate(docs, "doc_id", "text", minTokens = 10)
      .select("doc_id", "word_count_ok", "mean_len_ok", "alpha_ok",
        "stopword_ok", "repetition_ok", "passed")
      .collect().map(r => r.getLong(0) ->
        (1 to 6).map(r.getBoolean)).toMap
    assert(got(1L) == Seq(true, true, true, true, true, true))
    assert(!got(2L)(0) && !got(2L)(5))       // word count fails
    assert(!got(3L)(4) && !got(3L)(3))       // repetition + stopwords fail
    assert(!got(4L)(2))                      // alpha fraction fails
    assert(!got(5L)(1))                      // mean token length fails
  }

  test("PSI: mirrored drift produces the hand-computed term") {
    import spark.implicits._
    // ref: 3×x 1×y; cur: 1×x 3×y. Smoothed p = (n+1)/(4+2) each side;
    // term = (2/6 − 4/6)·ln((2/6)/(4/6)) = (1/3)·ln 2 = 0.231049
    val rows = Seq.fill(3)(("x", true)) ++ Seq(("y", true)) ++
      Seq(("x", false)) ++ Seq.fill(3)(("y", false))
    val df = rows.toDF("bin", "is_ref")
    val got = TrainingData.psiCategorical(df, "bin", col("is_ref"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
    assert(got("x") == ((3L, 1L, 0.231049)))
    assert(got("y") == ((1L, 3L, 0.231049)))
    // identical distributions → zero PSI on every bin
    val same = Seq(("x", true), ("x", false), ("y", true), ("y", false))
      .toDF("bin", "is_ref")
    TrainingData.psiCategorical(same, "bin", col("is_ref"))
      .collect().foreach(r => assert(r.getDouble(5) == 0.0))
  }

  test("source caps: kept set equals the brute hash ranking") {
    import spark.implicits._
    // 30 docs in g1 (cap binds), 3 in g2 (cap doesn't)
    val docs = ((0L until 30L).map(i => (i, "g1")) ++
      (100L until 103L).map(i => (i, "g2"))).toDF("doc_id", "source")
    val got = TrainingData.sourceCaps(docs, "doc_id", "source", cap = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // brute expectation: same hash, full sort per group in Scala
    def pri(id: Long): Long =
      (Math.floorMod(id, 1000003L) * TrainingData.mixPrime) % 1000003L
    val expected =
      ((0L until 30L).sortBy(id => (pri(id), id)).take(5).zipWithIndex
        .map { case (id, i) => ("g1", id, i + 1) } ++
       (100L until 103L).sortBy(id => (pri(id), id)).zipWithIndex
        .map { case (id, i) => ("g2", id, i + 1) }).toSet
    assert(got == expected)
    // repartition-stable: the kept SET is a pure function of ids
    val re = TrainingData.sourceCaps(docs.repartition(7), "doc_id",
      "source", cap = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(re == expected)
  }

  test("group folds: every group lands in exactly one fold") {
    import spark.implicits._
    val rows = (0L until 200L).map(i => (i % 37L, i)).toDF("grp", "x")
    val folds = TrainingData.groupFolds(rows, "grp", k = 5)
    val perGroup = folds.groupBy("grp")
      .agg(countDistinct("fold").as("nf")).collect()
    assert(perGroup.forall(_.getLong(1) == 1L))
    val fs = folds.select("fold").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(fs.subsetOf((0 until 5).toSet) && fs.size > 1)
  }
}
