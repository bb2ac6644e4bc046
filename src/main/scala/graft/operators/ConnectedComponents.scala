package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the grouping
  * stage of a near-duplicate pipeline: pair edges (from MinHash /
  * SimHash / exact-Jaccard verification) become duplicate CLUSTERS,
  * so "keep one doc per component" is a groupBy away.
  *
  * Algorithm: iterated min-label propagation. Each vertex starts
  * labeled with itself; every round each vertex takes the minimum
  * label among itself and its neighbors; converged when no label
  * changes. Rounds = graph diameter (near-dup graphs are
  * shallow — duplicate clusters are dense, diameters of 2-4), each
  * round one shuffle join on vertex id + one aggregate. All
  * DataFrame ops — AQE handles skewed hub vertices; `localCheckpoint`
  * cuts the growing lineage so round N's plan doesn't replay rounds
  * 1..N-1. (The alternating small-star/large-star optimization of
  * Kiveris et al. drops in here if diameters ever get deep; for
  * dedup clusters the plain propagation converges in fewer rounds
  * than one star-round costs.)
  */
object ConnectedComponents {

  /** @param edges   two columns (srcCol, dstCol) — undirected, need
    *                not be deduped or symmetric
    * @return (id, component) for every vertex that appears in any
    *         edge; component = min vertex id reachable. */
  def components(edges: DataFrame, srcCol: String, dstCol: String,
                 maxIter: Int = 50): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .union(edges.select(col(dstCol).cast("long").as("a"),
        col(srcCol).cast("long").as("b")))
      .distinct()
      .localCheckpoint(eager = true)

    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(eager = true)
    if (labels.isEmpty) return labels // no edges → no vertices, no rounds

    // Convergence probe: labels only ever DECREASE (least of self and
    // neighbor minima), so Σ labels strictly decreases iff any label
    // changed — one cheap aggregate per round instead of a join-based
    // diff. Decimal sum: no overflow however large the id space.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0)

    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // Each vertex adopts min(own label, neighbors' labels).
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "b"), "b")
        .groupBy(col("a").as("id"))
        .agg(min(col("comp")).as("ncomp"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        .localCheckpoint(eager = true)
      val curSum = labelSum(next)
      // Release the superseded round's checkpoint blocks now — at
      // O(rounds) retained copies of the vertex set, a deep graph
      // would otherwise pin memory/spill disk until driver GC.
      labels.unpersist(blocking = false)
      labels = next
      converged = curSum.compareTo(prevSum) == 0
      prevSum = curSum
      iter += 1
    }
    sym.unpersist(blocking = false)
    require(converged, s"connected components did not converge in $maxIter rounds")
    labels
  }
}
