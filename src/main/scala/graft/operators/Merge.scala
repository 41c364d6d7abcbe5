package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch upsert (SURVEY.md §3.1 S4): the Spark-native form of the
  * reference's `INSERT … ON CONFLICT (code) DO UPDATE` (`src/tropology/
  * db.clj`, public repo).
  *
  * Parquet has no in-place update, so the merge is expressed as
  * `old FULL OUTER JOIN new ON key` with per-column `coalesce(new, old)` —
  * new rows insert, matching rows take the new values, unmatched old rows
  * persist. The result is written back with a snapshot-overwrite (write new
  * directory, swap) — the deterministic overwrite protocol from SURVEY.md §5.
  *
  * Scale: one shuffle on the key for the join (or zero if both sides are
  * bucketed by the key); idempotent — merging the same snapshot twice
  * equals merging it once (property-tested in MergeSpec).
  */
object Merge {

  /** Upsert `updates` into `base`; both must share a schema; `key` must be
    * unique AND non-null per side.
    *
    * Row-replacement semantics: whether an update matched is decided by the
    * presence of the update's KEY, not per-column `coalesce` — so an update
    * row can legitimately set a column to NULL (per-column coalesce would
    * silently keep the stale value).
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"upsert: schema mismatch ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val o = base.alias("o")
    val n = updates.alias("n")
    val merged = o.join(n, col(s"o.$key") === col(s"n.$key"), "full_outer")
    val matched = col(s"n.$key").isNotNull
    merged.select(base.columns.map(c =>
      when(matched, col(s"n.$c")).otherwise(col(s"o.$c")).as(c)).toSeq: _*)
  }
}
