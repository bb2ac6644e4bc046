package graft

import org.apache.spark.sql.functions._
import graft.scaleops.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token count and bpe-ish segmentation") {
    val df = Seq("hello world  x", "don't stop3 now!").toDF("text")
    val counts = df.select(TextAnalysis.tokenCount(col("text"))).collect()
      .map(_.getInt(0))
    assert(counts.toSeq == Seq(3, 3))
    val bpe = df.select(TextAnalysis.bpeishTokens(col("text")).as("t"))
      .collect().map(_.getSeq[String](0))
    assert(bpe(1) == Seq("don", "'", "t", "stop", "3", "now", "!"))
  }

  test("fingerprint is invariant to token order and duplication") {
    val df = Seq("b a c", "c b a a", "a b x").toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("rolling hash is order-sensitive (unlike fingerprint)") {
    val df = Seq("a b c", "c b a").toDF("text")
      .select(TextAnalysis.rollingHash(col("text")).as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(0) != hs(1))
  }

  test("langid picks the language with most marker hits; en on ties") {
    val df = Seq(
      "der hund und die katze",   // de markers
      "le chat et les oiseaux",   // fr markers
      "nothing matching here")    // all-zero → en (first declared)
      .toDF("text")
    val got = df.select(TextAnalysis.langId(col("text"))).collect()
      .map(_.getString(0))
    assert(got.toSeq == Seq("de", "fr", "en"))
  }

  test("quality score is bounded in [0,1]") {
    val df = Seq("the of a and to in the of", "x", "").toDF("text")
    val scores = df.select(TextAnalysis.qualityScore(col("text"))).collect()
      .map(r => if (r.isNullAt(0)) 0.0 else r.getDouble(0))
    scores.foreach(s => assert(s >= 0.0 && s <= 1.0))
  }
}
