package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Shared table-loading plumbing for the ScaleQueries trait family
  * (split from the 2.3k-line ScaleQueries.scala in r10 — pure
  * mechanical move, zero behavior change). */
private[queries] trait ScaleBase {
  protected def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  /** Width-before-weight load for per-row-HEAVY ops (shingling,
    * n-gram scoring, tokenize-everything maps) over a bytes-small
    * table: one parquet file is ONE scan partition at any
    * maxPartitionBytes (a row group is unsplittable), so without an
    * explicit repartition the heavy map runs on a single core of 32.
    * The shuffle costs megabytes; the map is the dominant term
    * (measured on text_pii_redact at the sf1 soak: 8.7 → 2.3 s).
    * Only for heavy maps — plain column scans and filters stay on
    * [[t]] (an unconditional shuffle would tax every cheap query). */
  protected def tw(s: SparkSession, d: String, n: String,
                 key: String): DataFrame =
    // explicit count via Sessions.widen (r15): repartition(col) is
    // AQE-coalescible, and at bench SFs the ~1 MB shuffle coalesced
    // back to ONE partition — exactly the single-core heavy map this
    // helper exists to prevent
    graft.Sessions.widen(t(s, d, n), col(key))
}
