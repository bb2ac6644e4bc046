package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Salting}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("as-of backward: latest right at-or-before each left ts, per key") {
    val left = Seq((1, 10L, "a"), (1, 20L, "b"), (1, 5L, "c"), (2, 10L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1, 10L, 100.0), (1, 15L, 200.0), (2, 99L, 300.0))
      .toDF("k", "ts", "rv")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("rv"))
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got("a") == Some(100.0)) // exact-ts match is inclusive
    assert(got("b") == Some(200.0)) // latest of the two priors
    assert(got("c") == None)        // nothing at or before ts=5
    assert(got("d") == None)        // right exists but only later (99 > 10)
  }

  test("as-of tolerance nulls out stale matches") {
    val left = Seq((1, 100L, "x"), (1, 200L, "y")).toDF("k", "ts", "tag")
    val right = Seq((1, 95L, 1.0)).toDF("k", "ts", "rv")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("rv"),
      tolerance = Some(10L))
      .collect().map(r => r.getString(2) -> r.isNullAt(3)).toMap
    assert(!got("x")) // 100-95 = 5 ≤ 10 → kept
    assert(got("y"))  // 200-95 = 105 > 10 → nulled
  }

  test("salted aggregation equals plain groupBy exactly") {
    val df = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag").as("k"), col("l_quantity").as("v"))
    val salted = Salting.saltedAgg(df, Seq("k"),
      Seq(Salting.AggSpec("v", "sum"), Salting.AggSpec("v", "count"),
        Salting.AggSpec("v", "max")), saltBuckets = 8)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3))).toMap
    val plain = df.groupBy("k")
      .agg(sum("v"), count("v"), max("v"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3))).toMap
    // l_quantity is integer-valued → double sums are exact → == holds
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val big = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d")).toDF("k", "v")
    val small = Seq((1, 10.0), (2, 20.0)).toDF("k", "w")
    val salted = Salting.saltedJoin(big, small, "k", saltBuckets = 4)
      .select("k", "v", "w").collect().map(_.toSeq).toSet
    val plain = big.join(small, "k")
      .select("k", "v", "w").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 3) // k=3 has no match
  }
}
