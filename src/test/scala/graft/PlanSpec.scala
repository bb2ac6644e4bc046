package graft

import graft.queries.{Registry, StatsQueries}

/** Plan-shape regression guards: the scale properties (broadcast
  * joins, column pruning, single-shuffle windows) asserted on the
  * physical plans, so a refactor can't silently trade them away. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf).queryExecution.executedPlan.toString

  test("q5: all three dimension joins broadcast; fact side never shuffles") {
    val p = plan("q5_regional_revenue")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) == 3)
    assert(!p.contains("SortMergeJoin"))
    // only the final aggregate exchanges — and it carries aggregated
    // rows, not the fact table
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 1)
  }

  test("d1 histogram: scan reads exactly the binned column") {
    val p = plan("d1_hist_quantity")
    assert(p.contains("ReadSchema: struct<l_quantity:double>"))
  }

  test("q1: aggregation is partially applied map-side (partial_sum)") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("partial_sum"))
  }

  test("w2 windows: one exchange, reused by window and both aggregates") {
    val p = StatsQueries.windowStats(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1)
  }

  test("scatter sample: filter is pushed into the parquet scan") {
    val p = plan("d2_scatter_sample")
    assert(p.contains("PushedFilters:") && p.contains("l_orderkey"))
  }
}
