package graft

import graft.scaleops.BpeTrain

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("bpe: hand-traced merge trajectory on low/low/lower, " +
    "ties break (count desc, left asc), early exhaustion") {
    val docs = Seq((0L, "low low lower")).toDF("doc_id", "text")
    val (merges, vocab) = BpeTrain.train(docs, "text", nMerges = 6)
    val m = merges.orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // (l,o)=3 ties (o,w)=3 -> left asc picks (l,o); then (lo,w)=3;
    // then (low,e)=1 ties (e,r)=1 -> (e,r); then (low,er)=1; then dry.
    assert(m.toSeq == Seq(
      (1, "l", "o", 3L), (2, "lo", "w", 3L),
      (3, "e", "r", 1L), (4, "low", "er", 1L)))
    val segs = vocab.collect().map(r =>
      r.getAs[String]("word") -> r.getAs[String]("seg")).toMap
    assert(segs == Map("low" -> "low", "lower" -> "lower"))
  }

  test("bpe: merge application is leftmost non-overlapping — " +
    "'aaa' segments to 'aa a', not 'a aa'") {
    val docs = Seq((0L, "aaa aaa")).toDF("doc_id", "text")
    val (merges, vocab) = BpeTrain.train(docs, "text", nMerges = 1)
    val m = merges.collect()
    assert(m.length == 1 &&
      m(0).getString(1) == "a" && m(0).getString(2) == "a" &&
      m(0).getLong(3) == 4L) // (a,a) twice per word, twice in corpus
    assert(vocab.collect().head.getAs[String]("seg") == "aa a")
  }

  test("bpe: CONSECUTIVE occurrences all merge — 'abab' -> 'ab ab' " +
    "and 'aaaa' -> 'aa aa' (a shared-separator string replace " +
    "would skip every second one)") {
    val d1 = Seq((0L, "abab")).toDF("doc_id", "text")
    val (_, v1) = BpeTrain.train(d1, "text", nMerges = 1)
    assert(v1.collect().head.getAs[String]("seg") == "ab ab")
    val d2 = Seq((0L, "aaaa")).toDF("doc_id", "text")
    val (m2, v2) = BpeTrain.train(d2, "text", nMerges = 1)
    assert(m2.collect().head.getLong(3) == 3L) // (a,a) pairs pre-merge
    assert(v2.collect().head.getAs[String]("seg") == "aa aa")
    // six-long run pairs strictly left to right
    val d3 = Seq((0L, "aaaaaa")).toDF("doc_id", "text")
    assert(BpeTrain.train(d3, "text", nMerges = 1)
      ._2.collect().head.getAs[String]("seg") == "aa aa aa")
  }

  test("bpe apply: trained words use their segmentation, unseen " +
    "words fall back to character split") {
    val train = Seq((0L, "low low lower")).toDF("doc_id", "text")
    val (_, vocab) = BpeTrain.train(train, "text", nMerges = 6)
    val apply = Seq((7L, "low lower cat")).toDF("doc_id", "text")
    val got = BpeTrain.applyBpe(apply, "doc_id", "text", vocab).collect().head
    // low -> "low" (1), lower -> "lower" (1), cat unseen -> "c a t" (3)
    assert(got.getAs[Long]("n_words") == 3L)
    assert(got.getAs[Long]("n_bpe_tokens") == 5L)
    assert(got.getAs[Long]("n_chars") == (3 + 5 + 3).toLong)
  }

  test("bpe: word counts weight pairs — frequent word dominates " +
    "the first merge") {
    val docs = Seq((0L, "ab ab ab cd")).toDF("doc_id", "text")
    val (merges, _) = BpeTrain.train(docs, "text", nMerges = 1)
    val m = merges.collect().head
    assert(m.getString(1) == "a" && m.getString(2) == "b" && m.getLong(3) == 3L)
  }
}
