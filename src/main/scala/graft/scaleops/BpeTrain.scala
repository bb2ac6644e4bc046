package graft.scaleops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * merge application is a greedy left-to-right fold over the symbol
  * array (a padded string replace CANNOT express it: consecutive
  * occurrences share their separator space, so `replace` skips every
  * second one — 'a b a b' must become 'ab ab', not 'ab a b'). The
  * oracle replays the same greedy pairing by repeated FIRST-occurrence
  * regexp_replace in a recursive CTE — sequential leftmost merging
  * provably yields the identical non-overlapping pairing. (No
  * end-of-word marker — segmentations are per word already;
  * documented deviation from the paper's `</w>`.)
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

  /** Apply one merge rule to a space-joined segmentation: greedy
    * left-to-right fold over the symbol array — state is (built
    * prefix, pending symbol); a pending `l` followed by `r` emits the
    * merged symbol and clears the pending slot, so consecutive
    * occurrences pair disjointly from the left ('a a a a' → 'aa aa',
    * 'a a a' → 'aa a'), the Sennrich semantics a shared-separator
    * string replace gets wrong. */
  private[scaleops] def applyMerge(seg: Column, l: String, r: String): Column = {
    val z = struct(array().cast("array<string>").as("arr"),
      lit(null).cast("string").as("prev"))
    aggregate(
      split(seg, " "),
      z,
      (st, x) => {
        val arr = st.getField("arr")
        val prev = st.getField("prev")
        when(prev === lit(l) && x === lit(r),
          struct(concat(arr, array(lit(l + r))).as("arr"),
            lit(null).cast("string").as("prev")))
          .otherwise(struct(
            when(prev.isNull, arr).otherwise(concat(arr, array(prev))).as("arr"),
            x.as("prev")))
      },
      st => array_join(
        when(st.getField("prev").isNull, st.getField("arr"))
          .otherwise(concat(st.getField("arr"), array(st.getField("prev")))),
        " "))
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
        vocab = vocab.withColumn("seg", applyMerge(col("seg"), l, rt))
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
    * argmax with the same tiebreak, then merge application as a
    * recursive CTE that rewrites the FIRST padded occurrence per step
    * (a LITERAL position()+substr splice — never a regex, so a learned
    * symbol containing a regex metacharacter can't corrupt the
    * rewrite or desynchronize from the position() guard) until none
    * remain: sequential
    * leftmost merging yields exactly the greedy disjoint pairing of
    * the engine's fold (a single global `replace` would skip
    * consecutive occurrences — they share a separator space). A round
    * whose argmax is empty (merges exhausted) passes the vocabulary
    * through unchanged, mirroring the engine's early stop. */
  def oracleSql(table: String, textCol: String, nMerges: Int,
                finalSelect: String): String = {
    val rounds = (1 to nMerges).map { r =>
      val prev = s"v${r - 1}"
      s"""p$r AS MATERIALIZED (
         |  SELECT s.syms[i] AS lft, s.syms[i + 1] AS rgt, CAST(SUM(s.cnt) AS BIGINT) AS c
         |  FROM (SELECT cnt, string_split(seg, ' ') AS syms FROM $prev) s,
         |    UNNEST(range(1, len(s.syms))) AS t(i)
         |  GROUP BY 1, 2),
         |m$r AS MATERIALIZED (SELECT lft, rgt, c FROM p$r ORDER BY c DESC, lft ASC, rgt ASC LIMIT 1),
         |f$r(word, cnt, seg) AS (
         |  SELECT word, cnt, ' ' || seg || ' ' FROM $prev, m$r
         |  UNION ALL
         |  SELECT word, cnt,
         |    substr(seg, 1, position((' ' || lft || ' ' || rgt || ' ') IN seg) - 1) ||
         |      ' ' || lft || rgt || ' ' ||
         |      substr(seg, position((' ' || lft || ' ' || rgt || ' ') IN seg)
         |             + length(' ' || lft || ' ' || rgt || ' '))
         |  FROM f$r, m$r
         |  WHERE position((' ' || lft || ' ' || rgt || ' ') IN seg) > 0),
         |v$r AS MATERIALIZED (
         |  SELECT word, cnt, trim(seg) AS seg FROM f$r, m$r
         |  WHERE position((' ' || lft || ' ' || rgt || ' ') IN seg) = 0
         |  UNION ALL
         |  SELECT word, cnt, seg FROM $prev
         |  WHERE NOT EXISTS (SELECT 1 FROM m$r))""".stripMargin
    }.mkString(",\n")
    val mergeRows = (1 to nMerges)
      .map(r => s"SELECT $r AS rank, lft, rgt, c FROM m$r")
      .mkString(" UNION ALL ")
    s"""WITH RECURSIVE wc AS (
       |  SELECT word, COUNT(*) AS cnt FROM (
       |    SELECT unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS word
       |    FROM $table)
       |  WHERE len(word) > 0 GROUP BY 1),
       |v0 AS MATERIALIZED (
       |  SELECT word, cnt,
       |    array_to_string(regexp_extract_all(word, '.'), ' ') AS seg
       |  FROM wc),
       |$rounds,
       |merges AS ($mergeRows)
       |$finalSelect""".stripMargin
  }
}
