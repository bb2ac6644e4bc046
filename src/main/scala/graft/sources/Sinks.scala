package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink surface (S7-as-tables + the layouts a 100 TB deployment
  * needs): plain, date/key-partitioned, and bucketed writers.
  *
  * Layout policy at scale:
  *  - **Partition by** low-cardinality query-filter columns (date,
  *    region): partition pruning turns full scans into directory
  *    listings.
  *  - **Bucket by** high-cardinality join keys (orderkey, user_id):
  *    bucketed tables co-locate both join sides — the shuffle
  *    disappears from every subsequent join on the key.
  *  - Control file count explicitly (`repartition` before write):
  *    small-file storms are the #1 operational failure of naive
  *    partitioned writes.
  */
object Sinks {

  def writeParquet(df: DataFrame, path: String,
                   mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  /** Hive-style partitioned layout: `path/col=value/part-*.parquet`.
    * `filesPerPartition` bounds output files via a pre-shuffle on the
    * partition columns. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(mode)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed managed table (bucket pruning + shuffle-free joins on
    * the bucket key for any two tables bucketed the same way). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def writeCsv(df: DataFrame, path: String,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** ORC: the other columnar interchange format Spark ships natively
    * (vectorized reader, predicate pushdown, column pruning — same
    * scan discipline as parquet). */
  def writeOrc(df: DataFrame, path: String,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** JSON-lines: the interchange format for event feeds; schema is
    * carried by the reader (`spark.read.schema(...).json`) at scale —
    * inference is a full extra pass. */
  def writeJson(df: DataFrame, path: String,
                mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)
}
