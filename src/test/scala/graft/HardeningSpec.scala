package graft

import org.apache.spark.sql.functions._
import graft.functions.KllSketch
import graft.queries.StreamingQueries
import graft.scaleops.{Similarity, TrainingData}

/** Pins the r5 hardening fixes (ADVICE r4 + VERDICT r4 #6): KLL
  * sketch input validation, PII pattern boundaries, SQ8 zero-norm
  * guard, mixture-sampling sign totality, and the state-partition
  * derivation rule. */
class HardeningSpec extends SparkSpec {
  import spark.implicits._

  // ---- KLL sketch deserialization ----------------------------------------

  test("kll deserialize round-trips and validates header") {
    val st = new KllSketch.State()
    (1 to 1000).foreach(i => st.update(i.toDouble, 64, 42L))
    val bytes = st.serialize(64)
    val back = KllSketch.deserialize(bytes, expectK = 64)
    assert(back.n == 1000L)
    assert(math.abs(back.quantile(0.5) - 500.0) <= 50.0)
  }

  test("kll deserialize rejects garbage, truncation, and k mismatch") {
    val garbage = Array.fill[Byte](64)(0x5A)
    val eGarbage = intercept[IllegalArgumentException] {
      KllSketch.deserialize(garbage)
    }
    assert(eGarbage.getMessage.contains("kll sketch"))

    intercept[IllegalArgumentException] { KllSketch.deserialize(Array[Byte](1, 2, 3)) }
    intercept[IllegalArgumentException] { KllSketch.deserialize(null) }

    val st = new KllSketch.State()
    (1 to 100).foreach(i => st.update(i.toDouble, 16, 42L))
    val k16 = st.serialize(16)
    // truncated body: valid header, missing level payload
    intercept[IllegalArgumentException] {
      KllSketch.deserialize(k16.take(k16.length - 9))
    }
    val eK = intercept[IllegalArgumentException] {
      KllSketch.deserialize(k16, expectK = 256)
    }
    assert(eK.getMessage.contains("different k"))
    // no expectation → any valid k accepted (the read-only scalar path)
    assert(KllSketch.deserialize(k16).n == 100L)
  }

  test("kll_quantile on hostile BINARY fails with the clear message") {
    val e = intercept[Exception] {
      Seq(Array.fill[Byte](32)(7)).toDF("sk")
        .select(KllSketch.quantileOf(col("sk"), 0.5)).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("kll sketch")), chain(e).mkString(" | "))
  }

  // ---- PII pattern boundaries --------------------------------------------

  test("pii patterns respect word boundaries and octet ranges") {
    val cases = Seq(
      // (input, expected after redaction)
      ("ping 192.168.1.77 now", "ping <IP> now"),
      ("version v1.2.3.4 released", "version v1.2.3.4 released"),
      ("at 999.1.2.3 mark", "at 999.1.2.3 mark"),
      ("edge 255.255.255.255 ok", "edge <IP> ok"),
      ("call 555-123-4567 now", "call <PHONE> now"),
      ("id 555-123-4567x is not a phone", "id 555-123-4567x is not a phone"),
      ("card 4111 1111 1111 1111.", "card <CARD>."),
      ("sn x4111 1111 1111 1111", "sn x4111 1111 1111 1111"),
      ("mail a.b+c@example.org end", "mail <EMAIL> end"))
    val got = cases.map(_._1).toDF("text")
      .select(TrainingData.piiRedact(col("text")).as("r"))
      .as[String].collect()
    cases.zip(got).foreach { case ((in, want), r) =>
      assert(r == want, s"input: $in")
    }
  }

  // ---- SQ8 zero-norm guard -----------------------------------------------

  test("knnSq8 never surfaces zero-norm vectors or NaN scores") {
    val dim = 8
    val rows = (1 to 20).map { i =>
      val v = Array.tabulate(dim)(j => ((i * 31 + j * 7) % 13 - 6).toFloat / 6f)
      (i.toLong, v)
    } :+ (99L, Array.fill(dim)(0f)) // degenerate row
    val emb = rows.toDF("id", "emb")
    val res = Similarity.knnSq8(emb, "id", "emb",
      emb.filter(col("id") <= 3), k = 5).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      assert(r.getLong(r.fieldIndex("neighbor_id")) != 99L,
        "zero vector seized a candidate slot")
      assert(!r.getDouble(r.fieldIndex("cos")).isNaN, "NaN cosine surfaced")
    }
  }

  // ---- mixture sampling totality ------------------------------------------

  test("mixtureKeep matches non-negative-modulus arithmetic for any id sign") {
    val ids = Seq(-2000007L, -1000003L, -42L, -1L, 0L, 1L, 999L, 1000003L)
    val got = ids.toDF("id")
      .select(col("id"), TrainingData.mixtureKeep(col("id"), lit(0.5)).as("keep"))
      .as[(Long, Boolean)].collect().toMap
    ids.foreach { id =>
      val m = 1000003L
      val inner = ((id % m) + m) % m
      val expect = ((inner * TrainingData.mixPrime) % 1000L + 1000L) % 1000L < 500L
      assert(got(id) == expect, s"id=$id")
    }
  }

  // ---- state-partition derivation -----------------------------------------

  test("statePartitionsFor scales with keys and clamps to session parallelism") {
    // SparkSpec session runs spark.sql.shuffle.partitions = 4
    assert(StreamingQueries.statePartitionsFor(spark, 0L) == 1)
    assert(StreamingQueries.statePartitionsFor(spark, 150L) == 1)
    assert(StreamingQueries.statePartitionsFor(spark, 20001L) == 2)
    assert(StreamingQueries.statePartitionsFor(spark, 60000L) == 3)
    assert(StreamingQueries.statePartitionsFor(spark, 10000000L) == 4,
      "must clamp to the session's shuffle parallelism")
    val seq = Seq(1L, 100L, 30000L, 50000L, 70000L, 1000000L)
      .map(StreamingQueries.statePartitionsFor(spark, _))
    assert(seq == seq.sorted, "derivation must be monotonic in keys")
  }

  test("winsorize: ~5% clipped per tail, mean stays inside the band") {
    val rows = graft.queries.Events.winsorize(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // exact-percentile clipping leaves at most ~5% per tail (ties
      // and interpolation can only shrink the strict-inequality count)
      assert(lo <= n * 0.06 && hi <= n * 0.06, s"overclipped: $r")
      assert(lo >= n * 0.03 && hi >= n * 0.03, s"underclipped: $r")
      assert(!r.isNullAt(4) && !r.getDouble(4).isNaN)
    }
  }
}
