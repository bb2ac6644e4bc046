package graft

import org.apache.spark.sql.functions._
import graft.scaleops.Retrieval
import graft.stats.EvalMetrics
import graft.ts.RollingFeatures

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs() = Seq(
    (0L, "spark join hash spark", "s0"),
    (1L, "join the table", "s0"),
    (2L, "hash hash hash hash", "s1"),
    (3L, "nothing relevant here", "s1"))
    .toDF("doc_id", "text", "source")

  test("bm25: tf saturation — doc with 4x'hash' beats doc with 1x, " +
    "but less than 4x; rarer term outscores common one") {
    val got = Retrieval.bm25(docs(), "doc_id", "text",
      Seq("spark", "join", "hash"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 3 matches nothing -> absent
    assert(!got.contains(3L))
    assert(got.keySet == Set(0L, 1L, 2L))
    // doc 0 matches spark(x2)+join+hash, must rank first
    assert(got(0L) > got(2L) && got(0L) > got(1L))
    // 4 occurrences of 'hash' must NOT score 4x one occurrence (doc 0
    // has hash x1 at same dl=4): saturation bound tf*(k1+1)/(tf+k1...)
    val hashOnly = Retrieval.bm25(docs(), "doc_id", "text",
      Seq("hash"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hashOnly(2L) > hashOnly(0L))
    assert(hashOnly(2L) < 4.0 * hashOnly(0L))
  }

  test("rake: stopword splits phrases; degree/freq scoring on a " +
    "hand-checked fixture") {
    val d = Seq((0L, "red fox the red fox jumps")).toDF("doc_id", "text")
    val got = Retrieval.rakeKeywords(d, "doc_id", "text", Seq("the"), topK = 5)
      .orderBy("rank").collect()
    // Phrases: "red fox" (len 2) and "red fox jumps" (len 3).
    // freq: red=2, fox=2, jumps=1; degree: red=2+3=5, fox=5, jumps=3.
    // scores: red=fox=2.5, jumps=3.
    // "red fox jumps" = 2.5+2.5+3 = 8.0; "red fox" = 5.0.
    assert(got.length == 2)
    assert(got(0).getAs[String]("phrase") == "red fox jumps")
    assert(got(0).getAs[Double]("score") == 8.0)
    assert(got(1).getAs[String]("phrase") == "red fox")
    assert(got(1).getAs[Double]("score") == 5.0)
  }

  test("sourceDivergence: identical-to-corpus source has KL 0; " +
    "skewed source has KL > 0") {
    val d = Seq(
      (0L, "a b", "uniform"), (1L, "a b", "uniform"),
      (2L, "a b", "skewed"), (3L, "a a", "skewed"))
      .toDF("doc_id", "text", "source")
    val got = Retrieval.sourceDivergence(d, "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // corpus: a=5/8, b=3/8. uniform: a=1/2,b=1/2; skewed: a=3/4,b=1/4.
    val (tokU, typU, klU, hU) = got("uniform")
    val (tokS, typS, klS, _) = got("skewed")
    assert(tokU == 4 && typU == 2 && tokS == 4 && typS == 2)
    assert(klU > 0 && klS > 0)
    def kl(p: Seq[(Double, Double)]) =
      BigDecimal(p.map { case (pi, qi) => pi * math.log(pi / qi) }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(klU == kl(Seq((0.5, 5.0 / 8), (0.5, 3.0 / 8))))
    assert(klS == kl(Seq((0.75, 5.0 / 8), (0.25, 3.0 / 8))))
    assert(hU == BigDecimal(-(0.5 * math.log(0.5) * 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("rocAuc: perfect separation = 1, reversed = 0, ties = 0.5, " +
    "and a hand-checked mixed case") {
    def auc(rows: Seq[(Double, Int)]): Double =
      EvalMetrics.rocAuc(rows.toDF("s", "y"), col("s"), col("y"))
        .head().getDouble(2)
    assert(auc(Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))) == 1.0)
    assert(auc(Seq((0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1))) == 0.0)
    assert(auc(Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0))) == 0.5)
    // scores: pos at .9,.4 / neg at .6,.2 -> concordant pairs:
    // (.9 vs .6),(.9 vs .2),(.4 vs .2)=3 of 4 -> 0.75
    assert(auc(Seq((0.9, 1), (0.6, 0), (0.4, 1), (0.2, 0))) == 0.75)
  }

  test("rocAuc guards: high-cardinality scores fail fast with the " +
    "quantize-first diagnosis; single-class input returns NULL auc") {
    // continuous-score misuse: 5k distinct values over a 100-cap.
    // The guard is in-plan (raise_error in the final aggregate, r9:
    // the eager sketch pre-pass doubled the query), so it surfaces
    // as a Spark runtime failure whose cause chain carries the
    // quantize-first diagnosis.
    val wide = (0 until 5000).map(i => (i / 5000.0, i % 2)).toDF("s", "y")
    val e = intercept[Exception] {
      EvalMetrics.rocAuc(wide, col("s"), col("y"),
        maxDistinctScores = 100L).head()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    assert(chain(e).contains("Quantize"))
    // positive control: the same frame passes under a raised cap
    assert(EvalMetrics.rocAuc(wide, col("s"), col("y"),
      maxDistinctScores = 10000L).head().getDouble(2) > 0.0)
    // single-class: counts present, auc explicitly NULL
    val oneClass = Seq((0.9, 1), (0.4, 1)).toDF("s", "y")
    val row = EvalMetrics.rocAuc(oneClass, col("s"), col("y")).head()
    assert(row.getLong(0) == 2L && row.getLong(1) == 0L)
    assert(row.isNullAt(2))
  }

  test("cusum: constant series never alarms; a level shift drives " +
    "the positive side across the threshold, reset stays at zero") {
    val d = (0 until 10).map(i =>
      (1L, i.toLong, i.toLong * 1000, if (i < 5) 10.0 else 30.0))
      .toDF("g", "id", "ts", "x")
    val got = RollingFeatures.cusum(d, "g", Seq(col("ts")), "x",
      slack = 2.0, threshold = 15.0, idCol = "id")
      .orderBy("id").collect()
    // mu = 20; first 5 rows dev=-10: pos stays 0, neg climbs 8,16,24...
    assert(got(0).getAs[Double]("cusum_pos") == 0.0)
    assert(got(1).getAs[Double]("cusum_neg") == 16.0)
    assert(got(2).getAs[Boolean]("alarm")) // neg side = 24 > 15
    // after the shift dev=+10: neg drains by 12/step, pos climbs 8/step
    assert(got(9).getAs[Double]("cusum_pos") == 40.0)
    assert(got(9).getAs[Double]("cusum_neg") == 0.0)
  }
}
