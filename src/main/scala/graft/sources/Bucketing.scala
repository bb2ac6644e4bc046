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
    * by `key` — the one-time shuffle that later joins amortize.
    *
    * The pre-write `repartition(buckets, key)` uses the same hash as
    * the bucketing spec, so every bucket's rows land in exactly ONE
    * task → ONE file per bucket. That single-file property is what
    * lets readers TRUST the sortBy order (Spark only elides the
    * sort-merge-join sorts when files-per-bucket = 1 — order across
    * several files per bucket is not a total order); it also caps the
    * file count at `buckets` instead of tasks×buckets. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write
      .mode(mode)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the
    * catalog; a plain `spark.read.parquet` on the files would lose
    * it and reintroduce the shuffle). Shuffle elision works out of
    * the box; SORT elision additionally needs
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (off
    * by default since Spark 3.0 because reporting the order forces
    * the one-file-per-bucket read path — which [[writeBucketed]]
    * guarantees). BucketingSpec pins both, with a positive control
    * proving the assertions can fail. */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
