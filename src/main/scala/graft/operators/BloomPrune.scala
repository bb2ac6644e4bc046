package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning — the scan-side semi-join reduction for
  * the case where the probe side is enormous (the 100 TB fact table)
  * and the build side is selective but too large to broadcast as an
  * exact set.
  *
  * Shape: build a bloom filter over the build side's join keys (one
  * pass, mergeable per-partition sketches via Spark's internal
  * `BloomFilterAggregate`), embed the ~MB-scale bitset as a plan
  * literal every probe task sees, and drop probe rows whose key
  * cannot be in the build side BEFORE the shuffle. False positives
  * (rate `fpp`) pass the filter and are eliminated by the exact join
  * that follows — the final result is exact; the bloom stage only
  * shrinks the shuffled volume by ~selectivity.
  *
  * Both sides hash through `xxhash64(key)` and the probe is Spark's
  * codegen `BloomFilterMightContain` expression — the same
  * build/probe pair AQE's runtime row-level filtering injects, here
  * as an explicit operator so the pruning applies regardless of plan
  * shape and with a caller-chosen fpp/size trade-off. (A round-8 cut
  * probed through a Scala `udf`, the textbook UDF-where-a-built-in-
  * exists case: it broke whole-stage codegen in the hot probe
  * filter. The xxhash64 indirection also makes every atomic key type
  * — dates, decimals, strings — consistently hashable on both sides;
  * the old raw-value sketch path had to reject non-integral,
  * non-string keys at plan time.)
  */
object BloomPrune {

  /** One-pass mergeable bloom sketch over `xxhash64(buildKey)`,
    * serialized — `numBits` sized from (expectedItems, fpp) by the
    * standard optimal-bits formula. Returns null iff the build side
    * is empty (the caller's join is empty anyway; the probe filter
    * treats a null sketch as match-nothing). */
  def sketch(build: DataFrame, buildKey: String, expectedItems: Long,
             fpp: Double): Array[Byte] = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"bloom sketch needs expectedItems > 0 and fpp in (0,1); " +
        s"got ($expectedItems, $fpp)")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    // BloomFilterAggregate SILENTLY clamps both parameters to the
    // session's runtime-bloom caps (defaults 4M items / 67.1M bits) —
    // an oversized request would degrade to a far higher fpp than
    // asked with no error (pruning quietly stops working). Fail
    // loudly instead: the caller either shrinks the request or
    // raises the confs deliberately.
    val conf = build.sparkSession.conf
    val maxItems = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloom sketch request (items=$expectedItems, bits=$numBits) exceeds " +
        s"session caps (maxNumItems=$maxItems, maxNumBits=$maxBits); " +
        s"BloomFilterAggregate would silently clamp and degrade fpp — " +
        s"raise spark.sql.optimizer.runtime.bloomFilter.maxNumItems/" +
        s"maxNumBits or request a smaller sketch")
    val agg = new BloomFilterAggregate(
      GraftBridge.expression(xxhash64(col(buildKey))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    build.select(GraftBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Exact inner join with bloom-pruned probe side. */
  def join(probe: DataFrame, build: DataFrame, probeKey: String,
           buildKey: String, expectedItems: Long,
           fpp: Double = 0.01): DataFrame = {
    val bytes = sketch(build, buildKey, expectedItems, fpp)
    val pruned = filterMightContain(probe, col(probeKey), bytes)
    pruned.join(build, col(probeKey) === col(buildKey))
  }

  /** The pruning filter alone (for semi-join aggregations where the
    * join itself is not needed downstream). `sketchBytes` must come
    * from [[sketch]] — the filter probes `xxhash64(key)`, so a
    * sketch built over raw values (e.g. `stat.bloomFilter`) would
    * silently drop true matches. Null keys are dropped explicitly
    * (xxhash64 hashes NULL to the seed, which could spuriously
    * match); inner-join semantics never keep them anyway. */
  def filterMightContain(df: DataFrame, key: Column,
                         sketchBytes: Array[Byte]): DataFrame =
    df.filter(key.isNotNull && GraftBridge.column(
      BloomFilterMightContain(
        Literal(sketchBytes, BinaryType),
        GraftBridge.expression(xxhash64(key)))))
}
