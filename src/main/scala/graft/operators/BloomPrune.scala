package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning — the scan-side semi-join reduction for
  * the case where the probe side is enormous (the 100 TB fact table)
  * and the build side is selective but too large to broadcast as an
  * exact set.
  *
  * Shape: build a bloom filter over the build side's join keys (one
  * pass, mergeable sketches — `DataFrameStatFunctions.bloomFilter`
  * aggregates per-partition filters), broadcast the ~MB-scale bitset
  * to every probe task, and drop probe rows whose key cannot be in
  * the build side BEFORE the shuffle. False positives (rate `fpp`)
  * pass the filter and are eliminated by the exact join that
  * follows — the final result is exact; the bloom stage only shrinks
  * the shuffled volume by ~selectivity. This is what Spark's own
  * runtime row-level filtering does inside AQE; here it is an
  * explicit operator so the pruning applies regardless of plan shape
  * and with a caller-chosen fpp/size trade-off.
  */
object BloomPrune {

  /** Exact inner join with bloom-pruned probe side. */
  def join(probe: DataFrame, build: DataFrame, probeKey: String,
           buildKey: String, expectedItems: Long,
           fpp: Double = 0.01): DataFrame = {
    val bloom = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    val pruned = filterMightContain(probe, col(probeKey), bloom)
    pruned.join(build, col(probeKey) === col(buildKey))
  }

  /** The pruning filter alone (for semi-join aggregations where the
    * join itself is not needed downstream). Probes with the generic
    * `mightContain`, which dispatches integral types to the long path
    * and strings to the UTF-8 byte path — the SAME dispatch
    * `stat.bloomFilter` used at build time, so string keys are safe
    * (a long-only probe would hash them differently and silently drop
    * true matches). */
  def filterMightContain(df: DataFrame, key: Column,
                         bloom: BloomFilter): DataFrame = {
    // Fail at plan time with the dispatch contract, not at task time:
    // other types (decimal, date, …) pass analysis but would throw an
    // opaque IllegalArgumentException from sketch.BloomFilter inside
    // executor tasks.
    import org.apache.spark.sql.types._
    val dt = df.select(key).schema.head.dataType
    val supported = dt match {
      case ByteType | ShortType | IntegerType | LongType |
           StringType | BinaryType => true
      case _ => false
    }
    require(supported,
      s"bloom probe key has type ${dt.simpleString}; BloomFilter " +
        "supports integral (long path), string (UTF-8 path) and binary " +
        "keys — cast the key to one of these on BOTH build and probe sides")
    val bloomB = df.sparkSession.sparkContext.broadcast(bloom)
    val mightContain =
      udf((k: Any) => k != null && bloomB.value.mightContain(k))
    df.filter(mightContain(key))
  }
}
