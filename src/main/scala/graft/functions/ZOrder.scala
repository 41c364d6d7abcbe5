package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys for multi-dimensional data clustering.
  *
  * At 100 TB, a table sorted by ONE column prunes row groups / files only
  * for predicates on that column: a `(user, time)` box over a time-sorted
  * events table still reads every file for the user dimension. Sorting by
  * the INTERLEAVED bits of both dimensions' ranks clusters rows so that
  * every file covers a small rectangle of the (user, time) plane — parquet
  * min/max stats then skip files/row groups for predicates on EITHER or
  * BOTH columns. This is the layout trick behind Delta/Iceberg Z-ORDER
  * compaction, expressed here as plain codegen'd Column arithmetic (shifts
  * and masks — no UDF) feeding `repartitionByRange + sortWithinPartitions`.
  *
  * The keys are layout-only: no query RESULT may depend on them (results
  * must be layout-invariant), so cross-engine oracle parity is never
  * affected by this module.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions of a 32-bit
    * lane (classic mask-and-shift bit dilation, 4 rounds).
    */
  def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit ranks: bits of `a` on even positions,
    * bits of `b` on odd.
    */
  def interleave2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Order-preserving 16-bit rank of `v` over the closed domain `[lo, hi]`:
    * `(v − lo) · 65535 / (hi − lo)`. Domains NARROWER than 16 bits are
    * stretched to the full width — interleaving must weight both
    * dimensions' bits equally, or the wider domain dominates the curve and
    * the layout degenerates to a single-column sort (a 15-user × 30-day
    * events table must still cluster 2-d). The domain comes from table
    * stats at layout-build time — one tiny agg, the normal cost of a
    * clustering compaction pass. The scale factor runs in doubles
    * (bin-boundary rounding of ±1 rank is irrelevant to a layout);
    * out-of-domain values — e.g. a layout rebuilt from stale stats —
    * clamp to the rank edges rather than corrupting the key.
    */
  def rank16(v: Column, lo: Column, hi: Column): Column = {
    val scaled = floor((v - lo).cast("double") *
      (lit(65536.0) / (hi - lo + lit(1L)).cast("double"))).cast("long")
    when(hi > lo, greatest(least(scaled, lit(65535L)), lit(0L))).otherwise(lit(0L))
  }
}
