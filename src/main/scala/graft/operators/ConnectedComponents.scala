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
                 maxIter: Int = 50,
                 smallGraphEdgeLimit: Long = 2000000L): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .union(edges.select(col(dstCol).cast("long").as("a"),
        col(srcCol).cast("long").as("b")))
      .distinct()
      .localCheckpoint(eager = true)

    // Size-adaptive hybrid: at or below `smallGraphEdgeLimit`
    // (2M edges ≈ 32 MB — an EXPLICIT driver-memory bound, the same
    // discipline as a broadcast-join size threshold) the components
    // come from ONE driver-side union-find over the already
    // materialized edge list. Each distributed propagation round
    // costs 2-3 scheduler jobs plus a fresh codegen pass — ~1 s of
    // fixed overhead per round regardless of data — which DOMINATES
    // small graphs, and small is the usual shape: candidate pruning
    // leaves a pair graph orders of magnitude smaller than the
    // corpus. Above the limit, the label-propagation loop below runs
    // unchanged, so 100 TB-scale graphs never touch the driver.
    val m = sym.count()
    if (m > 0 && m <= smallGraphEdgeLimit) {
      val spark = edges.sparkSession
      import spark.implicits._
      // path-compressed union-find attaching the larger root under
      // the smaller, so every set's root IS its minimum member —
      // exactly the distributed loop's fixpoint. `<=` keeps
      // self-loop-only vertices in the vertex set.
      val half = sym.filter(col("a") <= col("b")).as[(Long, Long)].collect()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
        var c = x
        while (parent.getOrDefault(c, c) != c) {
          val nxt = parent.getOrDefault(c, c); parent.put(c, r); c = nxt
        }
        r
      }
      half.foreach { case (a, b) =>
        parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
        val ra = find(a); val rb = find(b)
        if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      parent.keySet().forEach { v => val vv: Long = v; out += ((vv, find(vv))) }
      sym.unpersist(blocking = false)
      // one partition: kilobytes of labels must not fan downstream
      // joins into 32-task stages
      return out.toSeq.toDF("id", "comp").coalesce(1)
        .localCheckpoint(eager = true)
    }

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
