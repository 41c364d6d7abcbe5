package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation for skewed keys (SURVEY.md §5: the
  * celebrity-trope/hub-node problem).
  *
  * A plain `groupBy(key)` sends ALL rows of a hot key to one reduce task.
  * Salting splits each key into `buckets` sub-groups aggregated in
  * parallel (phase 1), then combines the per-salt partials (phase 2). The
  * hot key's work spreads over `buckets` tasks; total shuffle volume grows
  * only by the (tiny) partial-row count.
  *
  * AQE's skew handling covers JOINS; aggregation skew still needs this
  * when a single group's partial state is too large or partial aggregation
  * is ineffective (e.g. high-cardinality distincts under a hot key).
  *
  * The salt is `pmod(hash(all columns), buckets)` — deterministic per row
  * content, no RNG, so results are reproducible.
  */
object Salting {

  /** Salted count + sum per key: equivalent to
    * `df.groupBy(keys).agg(count(*), sum(valueCol))` with hot keys spread
    * over `buckets` parallel partials.
    *
    * The default salt hashes the full row content, which spreads a hot key
    * whose rows DIFFER in some column. If the hot key's rows are
    * byte-identical duplicates, content hashing degenerates to one bucket —
    * pass `discriminator` (any deterministic per-row column: a source file
    * offset, an upstream event id, `input_file_name()`) to spread those.
    * An RNG salt is NOT an option here: the engine bans
    * partition-order-sensitive expressions (see GraftExtensions).
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: Column,
      buckets: Int, discriminator: Option[Column] = None): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salt = pmod(
      hash((df.columns.map(col) ++ discriminator.toSeq).toSeq: _*), lit(buckets))
    df.withColumn("__salt", salt)
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))
  }
}
