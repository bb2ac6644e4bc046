package graft.scaleops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextAnalysis.tokens

/** Ranked retrieval and corpus-statistics operators over the
  * `documents` table — the query-side counterpart of the curation
  * surface (TF-IDF, contamination, quality live in
  * [[TextAnalysis]]/[[TrainingData]]).
  *
  * Everything is relational: two aggregates (per-doc-term tf,
  * per-term df) plus a broadcast of the tiny per-term statistics —
  * no fitted vocabulary, no driver-side scoring loop. At 100 TB the
  * only shuffles are the two keyed aggregations; the term-statistics
  * join is a broadcast by construction (|query| terms, |vocab|
  * rows).
  */
object Retrieval {

  /** Okapi BM25 ranking of documents against a bag-of-words query
    * (Robertson–Sparck Jones; the k1/b formulation used by Lucene).
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
    * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
    *
    * Constants and the avgdl scalar are integer-ratio doubles, so the
    * oracle reproduces them bit-for-bit; the per-doc term sum is
    * rounded to 6 dp before the (score desc, id asc) top-k cut, which
    * runs as TakeOrdered (orderBy+limit), never a global sort.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 10): DataFrame = {
    val toks = docs.select(col(idCol),
      tokens(lower(col(textCol))).as("toks"))
      .withColumn("dl", size(col("toks")))
    // Two driver scalars (row count + total token count) — O(1) size.
    val (n, sumDl) = {
      val r = toks.agg(count(lit(1)), sum(col("dl"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val avgdl = sumDl.toDouble / n // integer ratio: bit-identical in SQL
    val terms = toks.select(col(idCol), col("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tf = terms.groupBy(idCol, "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = terms.select(col(idCol), col("term")).distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "term")
      .withColumn("idf",
        log(lit(1.0) + (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))))
    scored.groupBy(idCol)
      .agg(round(sum(col("w")), 6).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(topK)
  }

  /** The SQL twin of [[bm25]] for the DuckDB oracle: identical
    * arithmetic, constants interpolated via Scala double toString
    * (shortest round-trip repr, so both engines parse the same bits).
    */
  def bm25OracleSql(table: String, idCol: String, textCol: String,
                    queryTerms: Seq[String], k1: Double = 1.2,
                    b: Double = 0.75, topK: Int = 10): String = {
    val termList = queryTerms.map(TextAnalysis.sqlLit).mkString(", ")
    s"""WITH toks AS (
       |  SELECT $idCol, string_split_regex(trim(lower($textCol)), '\\s+') AS toks
       |  FROM $table),
       |dls AS (SELECT $idCol, len(toks) AS dl, toks FROM toks),
       |stats AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dls),
       |terms AS (
       |  SELECT $idCol, dl, unnest(toks) AS term FROM dls),
       |qt AS (SELECT $idCol, dl, term FROM terms WHERE term IN ($termList)),
       |tf AS (SELECT $idCol, dl, term, COUNT(*) AS tf FROM qt GROUP BY 1, 2, 3),
       |dfreq AS (SELECT term, COUNT(DISTINCT $idCol) AS df FROM qt GROUP BY 1),
       |w AS (
       |  SELECT $idCol,
       |    LN(CAST(1.0 AS DOUBLE) + (CAST(n AS DOUBLE) - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
       |      * (tf * CAST(${k1 + 1.0} AS DOUBLE))
       |      / (tf + CAST($k1 AS DOUBLE) * (CAST(${1.0 - b} AS DOUBLE) + CAST($b AS DOUBLE) * dl / avgdl)) AS w
       |  FROM tf JOIN dfreq USING (term), stats)
       |SELECT $idCol, ROUND(SUM(w), 6) AS score, COUNT(*) AS n_terms
       |FROM w GROUP BY 1
       |ORDER BY score DESC, $idCol ASC LIMIT $topK""".stripMargin
  }

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases =
    * maximal stopword-free token runs; word score = degree/frequency
    * where degree sums the lengths of every phrase containing the
    * word; phrase score = sum of member-word scores (with
    * multiplicity). The phrase segmentation is the gap-islands
    * pattern — a running stopword count keys each island — so the
    * whole operator is two windowed passes plus keyed aggregates: no
    * per-document loop, no UDF.
    *
    * Word statistics are corpus-global (one small `(vocab)` frame,
    * broadcast back onto the token stream); `docFilter` trims the
    * OUTPUT only, after statistics.
    */
  def rakeKeywords(docs: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String], topK: Int = 3,
                   docFilter: Column = lit(true)): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(tokens(lower(col(textCol)))).as(Seq("pos", "term")))
      .withColumn("is_stop", col("term").isin(stopwords: _*))
    val wIsl = Window.partitionBy("doc_id").orderBy("pos")
    val isl = toks
      .withColumn("island",
        sum(when(col("is_stop"), 1L).otherwise(0L)).over(wIsl))
      .filter(!col("is_stop"))
      .select("doc_id", "island", "pos", "term")
    val phrases = isl.groupBy("doc_id", "island").agg(
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("term")))),
          x => x.getField("term")), " ").as("phrase"),
      count(lit(1)).as("phrase_len"))
    val wordStats = isl
      .join(phrases.select("doc_id", "island", "phrase_len"),
        Seq("doc_id", "island"))
      .groupBy("term").agg(count(lit(1)).as("freq"),
        sum(col("phrase_len")).as("degree"))
    val phraseScore = isl.join(broadcast(wordStats), "term")
      .withColumn("wscore", col("degree").cast("double") / col("freq"))
      .groupBy("doc_id", "island")
      .agg(round(sum(col("wscore")), 6).as("score"))
    val ranked = phrases.join(phraseScore, Seq("doc_id", "island"))
      .select("doc_id", "phrase", "phrase_len", "score")
      .distinct() // identical phrase in one doc scores identically
    val rw = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("phrase").asc)
    // filter the RAW row_number (a cast in between breaks Catalyst's
    // WindowGroupLimit rank-limit pushdown — pinned in PlanSpec)
    ranked
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= topK)
      .filter(docFilter)
      .select(col("doc_id").as("doc_id"), col("rank").cast("int").as("rank"),
        col("phrase"), col("phrase_len"), col("score"))
  }

  def rakeOracleSql(table: String, idCol: String, textCol: String,
                    stopwords: Seq[String], topK: Int,
                    docFilterSql: String): String = {
    val stopList = stopwords.map(TextAnalysis.sqlLit).mkString(", ")
    s"""WITH toks AS (
       |  SELECT $idCol AS doc_id,
       |    unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS term,
       |    generate_subscripts(string_split_regex(trim(lower($textCol)), '\\s+'), 1) AS pos
       |  FROM $table),
       |flagged AS (
       |  SELECT doc_id, pos, term, term IN ($stopList) AS is_stop FROM toks),
       |isl AS (
       |  SELECT doc_id, pos, term,
       |    SUM(CASE WHEN is_stop THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
       |  FROM flagged QUALIFY NOT is_stop),
       |phrases AS (
       |  SELECT doc_id, island, STRING_AGG(term, ' ' ORDER BY pos) AS phrase,
       |    COUNT(*) AS phrase_len
       |  FROM isl GROUP BY 1, 2),
       |wordstats AS (
       |  SELECT term, COUNT(*) AS freq, CAST(SUM(phrase_len) AS BIGINT) AS degree
       |  FROM isl JOIN phrases USING (doc_id, island) GROUP BY 1),
       |pscore AS (
       |  SELECT doc_id, island,
       |    ROUND(SUM(CAST(degree AS DOUBLE) / freq), 6) AS score
       |  FROM isl JOIN wordstats USING (term) GROUP BY 1, 2),
       |ranked AS (
       |  SELECT DISTINCT doc_id, phrase, phrase_len, score
       |  FROM phrases JOIN pscore USING (doc_id, island)),
       |cut AS (
       |  SELECT doc_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY score DESC, phrase ASC) AS INT) AS rank,
       |    phrase, phrase_len, score
       |  FROM ranked)
       |SELECT doc_id, rank, phrase, phrase_len, score FROM cut
       |WHERE rank <= $topK AND ($docFilterSql)""".stripMargin
  }

  /** Per-source corpus drift: unigram-distribution KL divergence of
    * each source against the whole corpus, plus Shannon entropy and
    * type/token counts. All probabilities are integer ratios
    * (count/total) so both engines derive identical doubles; the term
    * sums are rounded to 6 dp.
    *
    * At scale this is two keyed aggregations over the token stream —
    * the per-(source, term) frame is the only shuffle whose size
    * matters, and it is |sources|·|vocab|, not corpus-sized.
    */
  def sourceDivergence(docs: DataFrame, sourceCol: String,
                       textCol: String): DataFrame = {
    val toks = docs.select(col(sourceCol).as("source"),
      explode(tokens(lower(col(textCol)))).as("term"))
    // pinned: feeds the three derived aggregates AND the final join —
    // without it the corpus-sized tokenize replays per consumer
    val bySrc = toks.groupBy("source", "term").agg(count(lit(1)).as("c_sw"))
      .localCheckpoint(false)
    val glob = bySrc.groupBy("term").agg(sum(col("c_sw")).as("c_w"))
    val srcTot = bySrc.groupBy("source")
      .agg(sum(col("c_sw")).as("tot_s"), count(lit(1)).as("n_types"))
    // total tokens from the |sources|-row frame — never a second
    // corpus pass (same integer as a direct count of the token stream)
    val globTot = srcTot.agg(sum(col("tot_s"))).head().getLong(0).toDouble
    bySrc.join(broadcast(glob), "term")
      .join(broadcast(srcTot), "source")
      .withColumn("p", col("c_sw").cast("double") / col("tot_s"))
      .withColumn("q", col("c_w").cast("double") / lit(globTot))
      .groupBy("source")
      .agg(first(col("tot_s")).as("n_tokens"),
        first(col("n_types")).as("n_types"),
        round(sum(col("p") * log(col("p") / col("q"))), 6).as("kl"),
        round(-sum(col("p") * log(col("p"))), 6).as("entropy"))
  }

  def sourceDivergenceOracleSql(table: String, sourceCol: String,
                                textCol: String): String =
    s"""WITH toks AS (
       |  SELECT $sourceCol AS source,
       |    unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS term
       |  FROM $table),
       |bysrc AS (SELECT source, term, COUNT(*) AS c_sw FROM toks GROUP BY 1, 2),
       |gw AS (SELECT term, CAST(SUM(c_sw) AS BIGINT) AS c_w FROM bysrc GROUP BY 1),
       |gtot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS g FROM toks),
       |stot AS (
       |  SELECT source, CAST(SUM(c_sw) AS BIGINT) AS tot_s, COUNT(*) AS n_types
       |  FROM bysrc GROUP BY 1)
       |SELECT source, MIN(tot_s) AS n_tokens, MIN(n_types) AS n_types,
       |  ROUND(SUM((CAST(c_sw AS DOUBLE) / tot_s)
       |    * LN((CAST(c_sw AS DOUBLE) / tot_s) / (CAST(c_w AS DOUBLE) / g))), 6) AS kl,
       |  ROUND(-SUM((CAST(c_sw AS DOUBLE) / tot_s)
       |    * LN(CAST(c_sw AS DOUBLE) / tot_s)), 6) AS entropy
       |FROM bysrc JOIN gw USING (term) JOIN stot USING (source), gtot
       |GROUP BY source""".stripMargin
}
