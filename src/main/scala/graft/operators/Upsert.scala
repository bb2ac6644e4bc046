package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO semantics as a pure batch operator — the snapshot
  * maintenance op every warehouse pipeline runs: apply a changeset of
  * upserts and deletes to a keyed snapshot, producing the next
  * snapshot.
  *
  * Shape: one full-outer join on the key (a single co-partitioned
  * shuffle of both sides — at scale, bucketing both tables on the key
  * makes it shuffle-free), then per-row resolution:
  *   - matched + delete flag        → drop
  *   - matched + no delete          → changeset row wins (update)
  *   - changeset only (not matched) → insert (unless delete of absent)
  *   - snapshot only                → keep
  *
  * No Delta/Iceberg table format is required — the operator is the
  * engine-level core those formats wrap with log/manifest plumbing.
  */
object Upsert {

  /** @param snapshot  current state, unique per `key`
    * @param changes   changeset, unique per `key`; same value columns
    *                  as snapshot plus a boolean `deleteCol`
    * @return next snapshot, one row per surviving key. */
  def merge(snapshot: DataFrame, changes: DataFrame, key: String,
            deleteCol: String): DataFrame = {
    val valueCols = snapshot.columns.filterNot(_ == key).toSeq
    val snap = snapshot.select(col(key).as("_k") +:
      valueCols.map(c => col(c).as(s"_s_$c")): _*)
    val chg = changes.select(col(key).as("_ck") +:
      col(deleteCol).as("_del") +:
      valueCols.map(c => col(c).as(s"_c_$c")): _*)
    snap.join(chg, col("_k") === col("_ck"), "full_outer")
      // delete: matched row flagged for removal (delete of an absent
      // key is a no-op — the full-outer row is dropped the same way)
      .filter(!coalesce(col("_del"), lit(false)))
      .select(
        coalesce(col("_k"), col("_ck")).as(key) +:
          valueCols.map(c =>
            when(col("_ck").isNotNull, col(s"_c_$c"))
              .otherwise(col(s"_s_$c")).as(c)): _*)
  }
}
