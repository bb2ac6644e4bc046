package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TopKByScore

class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  test("topk agg equals the row_number window idiom on random groups, " +
    "independent of partitioning") {
    val rnd = new scala.util.Random(11L)
    val rows = (0 until 5000).map { i =>
      (i % 37L, rnd.nextLong() & 0xFFFFL, rnd.nextInt(1000) / 7.0)
    }
    val df = rows.toDF("g", "id", "s")
      // same (g,id) may repeat with different scores in this fixture;
      // collapse to one score first (the agg's dedup contract assumes
      // equal scores per id)
      .groupBy("g", "id").agg(max("s").as("s"))
      .repartition(13)
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id").asc)
    val viaWindow = df.withColumn("r", row_number().over(w))
      .filter(col("r") <= 8).select("g", "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaAgg = df.groupBy("g")
      .agg(TopKByScore(col("s"), col("id"), 8).as("top"))
      .select(col("g"), explode(col("top")).as("e"))
      .select(col("g"), col("e.id"), col("e.score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaAgg == viaWindow)
    val viaAgg1Part = df.repartition(1).groupBy("g")
      .agg(TopKByScore(col("s"), col("id"), 8).as("top"))
      .select(col("g"), explode(col("top")).as("e"))
      .select(col("g"), col("e.id"), col("e.score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaAgg1Part == viaWindow)
  }

  test("duplicate ids collapse to one slot; output sorted (score desc, id asc)") {
    val df = Seq(
      (1L, 10L, 0.9), (1L, 10L, 0.9), (1L, 11L, 0.9),
      (1L, 12L, 0.5), (1L, 13L, 0.7))
      .toDF("g", "id", "s").repartition(4)
    val got = df.groupBy("g")
      .agg(TopKByScore(col("s"), col("id"), 3).as("top"))
      .select(posexplode(col("top")))
      .collect().map(r => (r.getInt(0), r.getStruct(1).getLong(0)))
    assert(got.toSeq == Seq((0, 10L), (1, 11L), (2, 13L)))
  }

  test("NaN orders above every score (Spark's descending-sort placement)") {
    val df = Seq((1L, 1L, 0.99), (1L, 2L, Double.NaN), (1L, 3L, 0.5))
      .toDF("g", "id", "s")
    val got = df.groupBy("g")
      .agg(TopKByScore(col("s"), col("id"), 2).as("top"))
      .select(explode(col("top.id")))
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(2L, 1L))
  }

  test("contract violation (same id, different scores) resolves to max " +
    "score regardless of arrival/merge order") {
    // feed the raw aggregate WITHOUT the equal-score pre-collapse:
    // replace-if-better must keep 0.9 for id 10 under every
    // partitioning (arrival order varies with partition count)
    val rows = Seq((1L, 10L, 0.2), (1L, 10L, 0.9), (1L, 10L, 0.5),
      (1L, 11L, 0.7), (1L, 12L, 0.1))
    for (parts <- Seq(1, 3, 5)) {
      val got = rows.toDF("g", "id", "s").repartition(parts).groupBy("g")
        .agg(TopKByScore(col("s"), col("id"), 2).as("top"))
        .select(explode(col("top")).as("e"))
        .select(col("e.id"), col("e.score"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == Seq((10L, 0.9), (11L, 0.7)), s"parts=$parts")
    }
  }

  test("k bound enforced") {
    intercept[IllegalArgumentException] {
      TopKByScore(lit(1.0), lit(1L), 0)
    }
    intercept[IllegalArgumentException] {
      TopKByScore(lit(1.0), lit(1L), 2000)
    }
  }
}
