package graft.scaleops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import TextAnalysis.tokens

/** BPE tokenizer training (Sennrich et al. 2016) — the missing
  * *training* half of the tokenizer surface (`bpeishTokens` is a
  * fixed segmenter). Learns `nMerges` merge rules by repeatedly
  * taking the most frequent adjacent symbol pair.
  *
  * Scale shape: the ONLY corpus-sized operation is the initial word
  * count (one groupBy over the token stream). Training then runs on
  * the distinct-word vocabulary — pair counting is a vocab-sized
  * aggregate per round, the argmax is orderBy+limit (TakeOrdered,
  * one row to the driver), and applying a merge is a map over vocab
  * segmentations. At 100 TB the vocab is millions of rows where the
  * corpus is billions; per-round cost never touches the corpus.
  *
  * Determinism: pair ties break (count desc, left asc, right asc);
  * merge application is plain (non-regex) string replace on the
  * space-joined symbol string — leftmost non-overlapping scan,
  * identical semantics in the JVM and DuckDB, so the oracle replays
  * the full trajectory. (No end-of-word marker — segmentations are
  * per word already; documented deviation from the paper's `</w>`.)
  */
object BpeTrain {

  /** Corpus word counts — the one corpus-sized pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(lower(col(textCol)))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  private def initSeg(wc: DataFrame): DataFrame =
    wc.withColumn("seg",
      array_join(regexp_extract_all(col("word"), lit("."), lit(0)), " "))

  /** Adjacent-pair counts of the current segmentation, weighted by
    * word frequency. */
  private def pairCounts(vocab: DataFrame): DataFrame = {
    val syms = split(col("seg"), " ")
    vocab
      .withColumn("syms", syms)
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(
        transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("left"),
            element_at(col("syms"), i + 2).as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("cnt")).as("pair_count"))
  }

  /** Learn `nMerges` rules; returns (merges, finalVocab).
    * merges: (rank, left, right, pair_count); finalVocab:
    * (word, cnt, seg). */
  def train(docs: DataFrame, textCol: String,
            nMerges: Int): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    // The corpus aggregate is reused every round — pin it.
    val wc = wordCounts(docs, textCol).localCheckpoint(false)
    var vocab = initSeg(wc)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("pair_count").desc, col("left").asc, col("right").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rt, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        r += 1
        merges += ((r, l, rt, c))
        vocab = vocab.withColumn("seg",
          trim(call_function("replace",
            concat(lit(" "), col("seg"), lit(" ")),
            lit(s" $l $rt "), lit(s" $l$rt "))))
        // k replaces chain in one plan; re-pin every few rounds so
        // deep merge schedules don't replay the whole chain per count
        if (r % 8 == 0) vocab = vocab.localCheckpoint(false)
      }
    }
    val mergeDf = merges.result()
      .toDF("rank", "merge_left", "merge_right", "pair_count")
      .withColumn("rank", col("rank").cast("int"))
    (mergeDf, vocab)
  }

  /** Apply a trained segmentation as a tokenizer: the corpus token
    * stream joins the (word → seg) vocabulary — broadcast-sized by
    * construction — and per-doc token statistics come from one keyed
    * aggregate. Words absent from the vocabulary fall back to fully
    * character-split (the untrained segmentation), so application is
    * total. Map + broadcast-join + one aggregate at any scale. */
  def applyBpe(docs: DataFrame, idCol: String, textCol: String,
               vocab: DataFrame): DataFrame = {
    val words = docs.select(col(idCol),
      explode(tokens(lower(col(textCol)))).as("word"))
      .filter(length(col("word")) > 0)
    words
      .join(broadcast(vocab.select(col("word"), col("seg"))), Seq("word"), "left")
      .withColumn("seg", coalesce(col("seg"),
        array_join(regexp_extract_all(col("word"), lit("."), lit(0)), " ")))
      .groupBy(idCol).agg(
        count(lit(1)).as("n_words"),
        sum(size(split(col("seg"), " "))).as("n_bpe_tokens"),
        sum(length(col("word"))).as("n_chars"))
  }

  /** SQL twin: every round unrolled as chained CTEs — pair counts,
    * argmax with the same tiebreak, and the same padded plain-string
    * replace. */
  def oracleSql(table: String, textCol: String, nMerges: Int,
                finalSelect: String): String = {
    val rounds = (1 to nMerges).map { r =>
      val prev = s"v${r - 1}"
      s"""p$r AS (
         |  SELECT s.syms[i] AS lft, s.syms[i + 1] AS rgt, CAST(SUM(s.cnt) AS BIGINT) AS c
         |  FROM (SELECT cnt, string_split(seg, ' ') AS syms FROM $prev) s,
         |    UNNEST(range(1, len(s.syms))) AS t(i)
         |  GROUP BY 1, 2),
         |m$r AS (SELECT lft, rgt, c FROM p$r ORDER BY c DESC, lft ASC, rgt ASC LIMIT 1),
         |v$r AS (
         |  SELECT word, cnt,
         |    trim(replace(' ' || seg || ' ', ' ' || lft || ' ' || rgt || ' ', ' ' || lft || rgt || ' ')) AS seg
         |  FROM $prev, m$r)""".stripMargin
    }.mkString(",\n")
    val mergeRows = (1 to nMerges)
      .map(r => s"SELECT $r AS rank, lft, rgt, c FROM m$r")
      .mkString(" UNION ALL ")
    s"""WITH wc AS (
       |  SELECT word, COUNT(*) AS cnt FROM (
       |    SELECT unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS word
       |    FROM $table)
       |  WHERE len(word) > 0 GROUP BY 1),
       |v0 AS (
       |  SELECT word, cnt,
       |    array_to_string(regexp_extract_all(word, '.'), ' ') AS seg
       |  FROM wc),
       |$rounds,
       |merges AS ($mergeRows)
       |$finalSelect""".stripMargin
  }
}
