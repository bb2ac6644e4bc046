package graft

import graft.queries.RelationalExt

/** Invariant checks for the extended classic-query surface
  * (RelationalExt) — the DuckDB hash oracle is the exactness gate;
  * these pin the semantic invariants that survive any SF. */
class RelationalExtSpec extends SparkSpec {

  test("q7: nation pairs are distinct and years stay in the ship band") {
    val rows = RelationalExt.q7VolumeShipping(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) != r.getString(1))
      assert(r.getInt(2) == 1995 || r.getInt(2) == 1996)
    }
  }

  test("q8: market share is a proper fraction of a positive total") {
    val rows = RelationalExt.q8MarketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getDouble(1)
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getDouble(2) > 0.0)
    }
  }

  test("q13: the count histogram partitions every customer exactly once") {
    val nCust = sources.Tables.load(spark, sf, "customer").count()
    val rows = RelationalExt.q13OrderDistribution(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == nCust)
  }

  test("q15: every returned supplier carries the one max revenue") {
    val rows = RelationalExt.q15TopSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getDouble(2)).distinct.length == 1)
  }

  test("q17: small-quantity revenue is a single finite row") {
    val rows = RelationalExt.q17SmallQuantity(spark, sf).collect()
    assert(rows.length == 1)
    assert(!rows.head.isNullAt(1))
  }

  test("q21: waiting-supplier counts arrive ranked") {
    val counts = RelationalExt.q21WaitingSuppliers(spark, sf)
      .collect().map(_.getLong(1))
    assert(counts.nonEmpty)
    assert(counts.sameElements(counts.sortBy(-_)))
  }

  test("q10/q12/q22 produce stable shapes") {
    assert(RelationalExt.q10ReturnedItems(spark, sf).columns.toSeq ==
      Seq("c_custkey", "c_name", "c_acctbal", "n_name", "revenue", "n_items"))
    val q12 = RelationalExt.q12LatePriority(spark, sf).collect()
    assert(q12.nonEmpty)
    // q22's cohort can legitimately be empty at the smallest SF; the
    // schema is the invariant here, the sf0.01 oracle pins the rows.
    assert(RelationalExt.q22IdleCustomers(spark, sf).columns.toSeq ==
      Seq("c_nationkey", "numcust", "totacctbal"))
  }
}
