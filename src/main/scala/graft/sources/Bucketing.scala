package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table management — the shuffle-elision tool for joins
  * and aggregations that repeat on one key (reference workloads
  * re-join uploads on their key column every analysis pass;
  * `data_analysis.py` recomputes per-key groupings per request).
  *
  * Writing a table bucketed by its join/grouping key pays ONE
  * shuffle at write time; every later equi-join between two tables
  * bucketed on the same key with the same bucket count — and every
  * groupBy on that key — then runs with NO Exchange: at 100 TB this
  * turns the nightly fact-to-fact join from the cluster's biggest
  * shuffle into a per-bucket local merge. `sortBy` additionally
  * pre-orders within buckets so sort-merge joins skip their sort.
  *
  * Bucket-count rule at scale: size buckets to the target partition
  * budget (e.g. 100 TB / 256 MB ≈ 400k is too many files per write —
  * pick buckets ≈ total-size / (executors × few × 256 MB) and let
  * each bucket hold several row groups; bucket pruning on point
  * predicates works at any count). BucketingSpec pins the
  * no-Exchange plan shape.
  */
object Bucketing {

  /** Persist `df` as a parquet table bucketed (and in-bucket sorted)
    * by `key` — the one-time shuffle that later joins amortize. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the
    * catalog; a plain `spark.read.parquet` on the files would lose
    * it and reintroduce the shuffle). */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
