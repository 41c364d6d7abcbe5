package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of oracle-checked queries.
  *
  * `queries` maps an inventory id (SURVEY.md §3 row) to a function building
  * the DataFrame over the tables in a scale-factor directory. `oracle` maps
  * the same id to ANSI SQL that DuckDB runs over the same parquet tables;
  * ids absent from `oracle` get a weaker rows-only check from the driver.
  *
  * Contract for oracle-compared queries:
  *   - identical column NAMES on both sides (driver sorts columns by name);
  *   - a total ORDER BY (unique key last) on both sides;
  *   - no raw double SUM/AVG — use [[graft.sql.Stable]] so Spark's parallel
  *     partial aggregation and DuckDB's sequential aggregation agree bitwise;
  *   - nothing nondeterministic (no unseeded rand, no
  *     monotonically_increasing_id).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]

  /** Post-materialization assertions keyed by query id, applied by Verify
    * to the RESULT rows after they are written (and by the specs). This is
    * where oracle-margin guards live (e.g. t13's "clusters must fit the
    * oracle's 16 unrolled propagation rounds") so the guard still fails
    * loudly on data where the margin is violated, while the query builders
    * themselves stay fully lazy — no head()/collect() in any `queries`
    * closure. The function receives the materialized result read back from
    * parquet and throws on violation.
    */
  def resultChecks: Map[String, DataFrame => Unit] = Map.empty

  /** Like [[resultChecks]] but the guard also receives (session, sfDir) so
    * it can recompute a CHEAP exact reference from the source tables —
    * the pattern for rows-only SKETCH queries, whose engine-specific
    * bytes can't cross the DuckDB gate: the guard re-derives the exact
    * quantity the sketch estimates (distinct count, rank of the returned
    * quantile, exact centroid) and requires the dump within the sketch's
    * documented error. Verify applies these after [[resultChecks]] and
    * retracts the dump on violation.
    */
  def resultChecksSf: Map[String, (SparkSession, String, DataFrame) => Unit] =
    Map.empty

  /** Per-(application, sfDir, shuffle-conf) scratch directory under
    * java.io.tmpdir for round-trip queries that write real files (s7 CSV,
    * st7 sink): application-scoped so concurrent processes never race on
    * the same path, and registered for recursive delete on JVM exit so
    * repeated runs don't litter tmpdir. The shuffle-partition conf is part
    * of the key for the same reason as ArtifactStore's: the streaming
    * round-trips checkpoint here, and DeterminismSpec's 3-vs-16 partition
    * runs must REPLAY the stream under each conf — a shared checkpoint
    * would make the second run a no-op read of the first run's snapshot
    * and the invariance test vacuous.
    */
  protected def scratchDir(s: SparkSession, d: String, tag: String): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_" +
      s"${s.sparkContext.applicationId}_${d.hashCode.toHexString}_" +
      s.conf.get("spark.sql.shuffle.partitions")
    graft.sources.ArtifactStore.registerExitCleanup(dir)
    dir
  }
}
