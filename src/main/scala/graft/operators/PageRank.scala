package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed PageRank over an edge list — the centrality stage of a
  * duplicate/citation graph analysis: once near-dup pairs are edges
  * (the same pair tables [[ConnectedComponents]] consumes), PageRank
  * ranks each document by how central it is to its duplication
  * neighborhood, the standard signal for picking a CANONICAL doc per
  * cluster (most-linked wins) or for weighting crawl frontiers.
  *
  * Fixed-iteration synchronous PageRank, all DataFrame ops:
  * each round is one join of the score table with the (symmetric)
  * edge list on the source id + one aggregate on the destination id —
  * two shuffles keyed by vertex id, no driver-side state, so a
  * 100 TB-scale graph runs the same plan with more partitions. The
  * score table is `localCheckpoint`ed per round to cut the growing
  * lineage (same discipline as [[ConnectedComponents]]).
  *
  * Determinism: floating addition is order-dependent and shuffle
  * fetch order varies run to run, so each neighbor contribution
  * `score/deg` is rounded to 9 dp and summed as DECIMAL(18,9) —
  * exact, associative, identical in any engine — then the damping
  * combine runs in doubles and re-rounds to 9 dp. An SQL oracle can
  * replay every iteration bit-for-bit (the harness does, with the
  * iterations unrolled as chained CTEs).
  *
  * Scope: vertices are the edge-list endpoints (an isolated doc has
  * rank 0 interest in a duplication graph); the symmetric edge list
  * means no dangling vertices, so no dangling-mass redistribution
  * term is needed — every vertex has out-degree ≥ 1 by construction.
  */
object PageRank {

  /** Spark's `round(double, 9)` semantics on the driver: shortest-
    * decimal (Double.toString) representation, HALF_UP at scale 9 —
    * both engines and the small-graph path must share one rounding. */
  private def round9(x: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue

  /** @param edges  two columns (srcCol, dstCol) — undirected, need
    *               not be deduped or symmetric
    * @param damping α, the classic 0.85
    * @param iters  fixed iteration count (synchronous rounds)
    * @param smallGraphEdgeLimit same size-adaptive discipline as
    *               [[ConnectedComponents]]: at or below this many
    *               symmetric edges (2M ≈ 48 MB — an explicit
    *               driver-memory bound) the rounds run as ONE
    *               driver-side loop over the already-materialized
    *               edge list, because each distributed round costs
    *               2-3 scheduler jobs + a codegen pass regardless of
    *               data — which dominates the small pair graphs
    *               candidate pruning usually leaves. The arithmetic
    *               (string-route 9-dp rounding, exact decimal sums,
    *               double combine) is IDENTICAL on both paths; specs
    *               assert they agree.
    * @return (id, pagerank) for every vertex in the edge list;
    *         sums to ~1 over the graph. */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
               damping: Double = 0.85, iters: Int = 5,
               smallGraphEdgeLimit: Long = 2000000L): DataFrame = {
    require(iters >= 0, s"iters=$iters must be >= 0")
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .union(edges.select(col(dstCol).cast("long").as("a"),
        col(srcCol).cast("long").as("b")))
      .distinct()
      .localCheckpoint(eager = true)

    val m = sym.count()
    if (m <= smallGraphEdgeLimit) {
      val spark = edges.sparkSession
      import spark.implicits._
      val es = sym.as[(Long, Long)].collect()
      val deg = new java.util.HashMap[Long, Long]()
      es.foreach { case (a, _) => deg.merge(a, 1L, _ + _) }
      val n = deg.size.toLong
      var score = new java.util.HashMap[Long, java.lang.Double]()
      deg.keySet.forEach(id => score.put(id, round9(1.0 / n)))
      for (_ <- 1 to iters) {
        // per-neighbor terms rounded to 9 dp, summed EXACTLY as
        // decimals (a ≤9-dp double's toString is its exact value)
        val contrib = new java.util.HashMap[Long, java.math.BigDecimal]()
        es.foreach { case (a, b) =>
          val term = new java.math.BigDecimal(java.lang.Double.toString(
            round9(score.get(a) / deg.get(a))))
          contrib.merge(b, term, _.add(_))
        }
        val next = new java.util.HashMap[Long, java.lang.Double]()
        contrib.forEach((id, c) => next.put(id,
          round9((1.0 - damping) / n + damping * c.doubleValue)))
        score = next
      }
      import scala.jdk.CollectionConverters._
      val rows = score.asScala.toSeq.map { case (id, s) => (id, s.doubleValue) }
      return spark.createDataFrame(rows).toDF("id", "pagerank")
    }

    val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
    // degree-annotated edges, built once: each round is then a single
    // vertex-id join + one aggregate — two shuffles, not three
    val out = sym.join(deg, "a").localCheckpoint(eager = true)
    val n = deg.count() // vertex count — one number on the driver

    var scores = deg.select(col("a").as("id"),
      round(lit(1.0) / n, 9).as("score"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iters) {
      val contrib = scores
        .join(out, scores("id") === out("a"))
        .groupBy(out("b").as("id"))
        .agg(sum(round(col("score") / col("deg"), 9)
          .cast(DecimalType(18, 9))).as("contrib"))
      scores = contrib.select(col("id"),
        round(lit(1.0 - damping) / n +
          lit(damping) * col("contrib").cast("double"), 9).as("score"))
        .localCheckpoint(eager = false)
    }
    scores.select(col("id"), col("score").as("pagerank"))
  }
}
