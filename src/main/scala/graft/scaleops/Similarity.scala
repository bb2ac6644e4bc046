package graft.scaleops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`) —
  * north-star additions (BASELINE.json).
  *
  * Arithmetic discipline: elements are cast to double *before* any
  * multiply and folded in array order (`aggregate` is a sequential
  * left fold), so the result is bit-reproducible and matches an
  * oracle that does the same.
  *
  * Scale path: brute-force top-k is a broadcast of the (small) query
  * set against a streamed scan — linear, no shuffle until the
  * per-query top-k. The LSH variant buckets by random-hyperplane
  * signs so candidate generation is a hash join on the bucket key.
  */
object Similarity {

  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(toDouble(a), lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * neighbors (excluding itself), deterministically tie-broken on
    * (rounded cosine desc, neighbor id asc). */
  def knnBrute(emb: DataFrame, idCol: String, vecCol: String,
               queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val scored = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("nv")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Near-duplicate pairs by embedding cosine ≥ threshold. Brute
    * O(n²) within — intended for bounded partitions; the scale path
    * first buckets with `lshBucket` and runs this per bucket. */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val l = emb.select(col(idCol).as("a"), col(vecCol).as("va"))
    val r = emb.select(col(idCol).as("b"), col(vecCol).as("vb"))
    l.crossJoin(r)
      .filter(col("a") < col("b"))
      .withColumn("cos", round(cosine(col("va"), col("vb")), 6))
      .filter(col("cos") >= threshold)
      .select("a", "b", "cos")
  }

  /** Random-hyperplane LSH bucket id (`numPlanes`-bit signature).
    * Plane components come from a seeded driver-side RNG — cheap,
    * deterministic, broadcast implicitly as literals. */
  def lshBucket(vecCol: Column, dim: Int, numPlanes: Int = 16,
                seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(numPlanes, dim)(rnd.nextGaussian())
    val bits = planes.zipWithIndex.map { case (plane, p) =>
      val proj = aggregate(
        zip_with(toDouble(vecCol),
          array(plane.map(w => lit(w)).toSeq: _*), (x, w) => x * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k via LSH buckets: exact search within each query's
    * bucket. Recall < 1 by construction (log the trade); bucket size
    * distribution bounds the work per query. */
  def knnLsh(emb: DataFrame, idCol: String, vecCol: String,
             queries: DataFrame, k: Int, dim: Int,
             numPlanes: Int = 16): DataFrame = {
    val bucketed = emb.withColumn("bucket", lshBucket(col(vecCol), dim, numPlanes))
    val q = broadcast(queries
      .withColumn("bucket", lshBucket(col(vecCol), dim, numPlanes))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("bucket")))
    val scored = bucketed
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"), col("bucket"))
      .join(q, "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("nv")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }
}
