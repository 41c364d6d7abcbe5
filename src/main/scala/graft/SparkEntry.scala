package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory is assembled from per-area [[graft.queries.QueryPack]]s;
  * ids map to SURVEY.md §3 inventory rows.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    Relational,
    WindowsAndEvents,
    ScalarFuncs,
    TextDedup,
    Embeddings,
    Graph,
    Etl,
    Media
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue-per-nation through the full star schema (scan → broadcast joins
    * → hash agg → sort), the engine's spine.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("j2_multiway_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap

  /** Post-materialization guards (see [[graft.queries.QueryPack.resultChecks]]);
    * Verify applies each to the written result so oracle-margin violations
    * fail the dump loudly without any eager action inside query builders.
    */
  def resultChecks: Map[String, DataFrame => Unit] =
    packs.flatMap(_.resultChecks).toMap

  /** Guards that recompute an exact reference from the sf dir (see
    * [[graft.queries.QueryPack.resultChecksSf]]).
    */
  def resultChecksSf: Map[String, (SparkSession, String, DataFrame) => Unit] =
    packs.flatMap(_.resultChecksSf).toMap
}
