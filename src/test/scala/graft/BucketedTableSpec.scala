package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proof of SCALE.md's central graph-layer claim: writing the edge table
  * bucketed by `src` makes per-src aggregation and src-keyed joins
  * SHUFFLE-FREE — the scan itself reports `HashPartitioning(src, n)`, so
  * Catalyst plans no Exchange before the aggregate or the join. At 100 TB
  * this is the difference between re-shuffling the full edge set on every
  * graph workload and paying the shuffle exactly once at write time.
  *
  * The tables are written into the test warehouse with
  * `bucketBy(8, "src").sortBy("src")` from the same sf0.001 lineitem edge
  * derivation the graph queries use, and every plan assertion is paired
  * with a correctness cross-check against the equivalent non-bucketed
  * computation, so a silently-wrong bucketed read can't pass.
  */
class BucketedTableSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private val Buckets = 8

  /** Write the bucketed edge table + a co-bucketed per-src attribute table
    * once per JVM (idempotent across suites sharing the warehouse).
    */
  private def ensureTables(): Unit = synchronized {
    if (!spark.catalog.tableExists("links_by_src")) {
      val edges = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
        .distinct()
      edges.write.mode("overwrite")
        .bucketBy(Buckets, "src").sortBy("src")
        .saveAsTable("links_by_src")
      edges.groupBy("src").agg(countDistinct(col("dst")).as("n_parts"))
        .write.mode("overwrite")
        .bucketBy(Buckets, "src").sortBy("src")
        .saveAsTable("attrs_by_src")
    }
  }

  private def fmt(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  /** Run `body` with broadcast joins disabled so a tiny test table can't
    * sidestep the exchange question by broadcasting.
    */
  private def withoutBroadcast[A](body: => A): A = {
    val key  = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, prev)
  }

  test("degree aggregation over the src-bucketed edge table plans no Exchange") {
    ensureTables()
    val agg = spark.table("links_by_src")
      .groupBy("src").agg(count(lit(1)).as("deg"))
    val p = fmt(agg)
    assert(!p.contains("Exchange"),
      "bucketed scan must satisfy the aggregate's distribution:\n" + p.take(3000))
    assert(p.contains("Bucketed: true"), p.take(3000))

    // Correctness: identical to the non-bucketed aggregation.
    val plain = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("src"), col("l_partkey").as("dst")).distinct()
      .groupBy("src").agg(count(lit(1)).as("deg"))
    assert(agg.exceptAll(plain).isEmpty && plain.exceptAll(agg).isEmpty)
  }

  test("src-keyed join of two co-bucketed tables plans no Exchange") {
    ensureTables()
    withoutBroadcast {
      val j = spark.table("links_by_src")
        .join(spark.table("attrs_by_src"), "src")
      val p = fmt(j)
      assert(p.contains("SortMergeJoin"), p.take(3000))
      assert(!p.contains("Exchange"),
        "co-bucketed SMJ must read both sides in place:\n" + p.take(3000))

      // Correctness: same rows as the non-bucketed join.
      val edges = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("src"), col("l_partkey").as("dst")).distinct()
      val plain = edges.join(
        edges.groupBy("src").agg(countDistinct(col("dst")).as("n_parts")), "src")
      assert(j.exceptAll(plain).isEmpty && plain.exceptAll(j).isEmpty)
    }
  }

  test("dst-bucketed copy serves reverse scans (in-degree agg) with no Exchange") {
    // SCALE.md's other half: the reference kept a reverse B-tree index;
    // here a dst-bucketed COPY of the edge table plays that role.
    if (!spark.catalog.tableExists("links_by_dst")) {
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
        .distinct()
        .write.mode("overwrite")
        .bucketBy(Buckets, "dst").sortBy("dst")
        .saveAsTable("links_by_dst")
    }
    val agg = spark.table("links_by_dst")
      .groupBy("dst").agg(count(lit(1)).as("in_deg"))
    val p = fmt(agg)
    assert(!p.contains("Exchange"), p.take(3000))
    assert(p.contains("Bucketed: true"), p.take(3000))
    val plain = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("src"), col("l_partkey").as("dst")).distinct()
      .groupBy("dst").agg(count(lit(1)).as("in_deg"))
    assert(agg.exceptAll(plain).isEmpty && plain.exceptAll(agg).isEmpty)
  }

  test("non-bucketed baseline DOES exchange (the claim is about bucketing)") {
    // Guard against the assertions above passing vacuously (e.g. if a
    // future config made every small plan exchange-free).
    withoutBroadcast {
      val edges = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("src"), col("l_partkey").as("dst")).distinct()
      val p = fmt(edges.groupBy("src").agg(count(lit(1)).as("deg")))
      assert(p.contains("Exchange"), p.take(3000))
    }
  }
}
