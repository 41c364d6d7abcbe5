package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the settings this engine assumes.
  *
  * Designed for a real cluster (1000 executors, 100 TB inputs) but tested on
  * `local[32]`. Key choices:
  *   - AQE on (runtime re-plan: skew-join splitting, shuffle coalescing,
  *     broadcast demotion/promotion) — essential at scale where static stats lie.
  *   - shuffle.partitions small locally; on a cluster this is overridden by
  *     AQE's coalescing from `spark.sql.adaptive.coalescePartitions.*`.
  *   - session timezone pinned to UTC so timestamp semantics are deterministic
  *     and match the DuckDB oracle.
  */
object GraftSession {
  def local(cores: String, appName: String): SparkSession =
    local(cores.toInt, appName)

  /** Per-JVM warehouse for ArtifactStore's bucketed tables: a temp dir, so
    * repeated Verify/Bench runs never read a stale `spark-warehouse` from a
    * previous process's cwd. Static conf — must be set at session build.
    */
  private lazy val warehouseDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_warehouse_").toString
    // Same exit-time cleanup as ArtifactStore's snapshot dirs: without it
    // every Bench/Verify JVM would leave its bucketed edge tables behind
    // and repeated runs would accumulate until tmp fills.
    graft.sources.ArtifactStore.registerExitCleanup(dir)
    dir
  }

  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", warehouseDir)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Shuffles START wide and AQE coalesces SMALL ones back down — the
      // standard shape for data whose scale the static conf can't know.
      // Measured (audits/g13_partition_probe.md): at 25× sf0.1 the
      // HyperBall sketch aggregate packs 25× more ~1KB HLL sketches per
      // reducer; 256 initial partitions cut its warm time 83.7 → 58.6 s
      // (cold 198.7 → 85.1 s) while sf0.1 is unchanged (3.83 → 3.62 s,
      // AQE coalesces the small shuffle right back). On a 1000-executor
      // cluster this would be set ≫ cores; 8× local cores mirrors that.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cores * 8).toString)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Scan-parallelism FLOOR (guide §6.1), derived from the session's
      // core count — never a constant: the fixture parquet files are
      // hundreds of KB, so without a floor a text/media query's scan is 1-2
      // splits and its CPU-dense per-row work (tokenize/shingle/md5/decode)
      // runs on 1-2 of local[32]'s cores (JobProfile on t21: the three
      // dominant jobs had 2 tasks each). At 100 TB a scan has thousands of
      // splits and the floor never binds; this only stops a SMALL input
      // from idling a large cluster.
      .config("spark.sql.files.minPartitionNum", (cores * 2).toString)
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("GRAFT_ABJT", (64L * 1024 * 1024).toString))
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
