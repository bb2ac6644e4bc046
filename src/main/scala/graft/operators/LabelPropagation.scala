package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan et
  * al. 2007) over an edge list — the community stage of the
  * duplicate-graph family ([[ConnectedComponents]] finds reachable
  * sets, [[PageRank]] ranks within them, LPA splits dense
  * neighborhoods into communities finer than connectivity).
  *
  * Semantics (fully deterministic, no float arithmetic): labels start
  * as vertex ids; each of the FIXED `iters` synchronous rounds
  * relabels every vertex with the MODE of its neighbors' labels,
  * ties broken by the smallest label. A fixed iteration count with
  * synchronous updates is reproducible by construction (async/random
  * orders — the paper's default — are not), so an SQL oracle can
  * unroll the rounds as chained CTEs and pin every round.
  *
  * Distributed shape: each round is one join of the label table with
  * the symmetric edge list + one (vertex, label) count aggregate +
  * one per-vertex arg-max window — all keyed by vertex id, no
  * driver-side state, linear in edges per round. Below
  * `smallGraphEdgeLimit` (the [[ConnectedComponents]] /[[PageRank]]
  * size-adaptive discipline: distributed rounds cost 2-3 scheduler
  * jobs each regardless of data) the same rounds run as one
  * driver-side loop over the materialized edge array; the integer
  * mode/tie-break rule is identical on both paths and OperatorsSpec
  * asserts they agree.
  */
object LabelPropagation {

  /** @param pairs undirected pair table (aCol, bCol); need not be
    *              deduped or symmetric
    * @return (id, label) for every endpoint after `iters` rounds —
    *         vertices sharing a label are one community */
  def propagate(pairs: DataFrame, aCol: String, bCol: String,
                iters: Int = 3,
                smallGraphEdgeLimit: Long = 2000000L): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .unionAll(pairs.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst")))
      .localCheckpoint(eager = false)
    if (edges.count() <= smallGraphEdgeLimit)
      propagateLocal(spark, edges, iters)
    else {
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id"))
      for (_ <- 1 to iters) {
        val counted = edges
          .join(labels.select(col("id").as("dst"), col("label")), "dst")
          .groupBy("src", "label").agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("src")
          .orderBy(col("cnt").desc, col("label").asc)
        labels = counted.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("src").as("id"), col("label"))
          .localCheckpoint(eager = false)
      }
      labels
    }
  }

  /** Driver-side twin of the distributed rounds — same mode/min-tie
    * rule on the collected edge array. */
  private def propagateLocal(spark: SparkSession, edges: DataFrame,
                             iters: Int): DataFrame = {
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySrc = es.groupBy(_._1).map { case (s, arr) => s -> arr.map(_._2) }
    var labels: Map[Long, Long] = bySrc.keys.map(id => id -> id).toMap
    for (_ <- 1 to iters) {
      labels = bySrc.map { case (id, nbrs) =>
        val counts = nbrs.groupBy(labels).map { case (l, a) => l -> a.length }
        // mode, smallest label on ties
        id -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    import spark.implicits._
    labels.toSeq.sortBy(_._1).toDF("id", "label")
  }
}
