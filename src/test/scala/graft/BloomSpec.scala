package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bloom-filter pre-join functions registered by
  * [[graft.plans.GraftExtensions]] (`graft_bloom_agg` /
  * `graft_might_contain`): the sketch admits every true member (no false
  * negatives — the property that makes bloom pruning RESULT-SAFE in front
  * of an exact join), actually prunes non-members, and the composed
  * prefilter+exact-join plan is row-identical to the direct join while
  * carrying the membership probe in the plan.
  */
class BloomSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("graft_might_contain has no false negatives over the sketched set") {
    val members = spark.range(0, 5000).select((col("id") * 7919L).as("v"))
    val bloom = members.agg(
      call_function("graft_bloom_agg", col("v"), lit(10000L)).as("bf"))
    val misses = members
      .filter(!call_function("graft_might_contain", bloom.scalar(), col("v")))
      .count()
    assert(misses == 0L, "bloom filter dropped a true member")
  }

  test("bloom prefilter prunes non-members but never changes the exact-join result") {
    val corpus = spark.range(0, 20000).select(col("id").as("h"))
    val bench = spark.range(0, 20000).filter(col("id") % 500 === 0)
      .select(col("id").as("bh"))
    val bloom = bench.agg(
      call_function("graft_bloom_agg", col("bh"), lit(1000L)).as("bf"))
    val pre = corpus.filter(
      call_function("graft_might_contain", bloom.scalar(), col("h")))
    val nPre = pre.count()
    // With 40 members in a 1000-item-sized sketch over 20k probes the
    // pass-through must be a small fraction of the corpus (false-positive
    // rate bounds it near |members| + fp·|corpus| << |corpus|).
    assert(nPre < 2000L, s"bloom pruned nothing: $nPre of 20000 passed")
    val direct = corpus.join(bench, col("h") === col("bh"), "left_semi")
    val viaBloom = pre.join(bench, col("h") === col("bh"), "left_semi")
    assert(viaBloom.collect().map(_.getLong(0)).sorted.toSeq ==
      direct.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("t31 composed plan equals t11 exactly and carries the membership probe") {
    val t11 = queries.TextDedup.queries("t11_contamination")(spark, sf)
    val t31 = queries.TextDedup.queries("t31_bloom_contamination")(spark, sf)
    val plan = t31.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "bloom membership probe missing from the physical plan")
    assert(t31.collect().map(_.toString).toSeq ==
      t11.collect().map(_.toString).toSeq,
      "bloom-prefiltered contamination diverged from the exact plan")
  }
}
