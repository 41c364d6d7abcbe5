package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guard: the scale-critical plan shapes from
  * SCALE.md must keep planning the way they're documented — a silent
  * regression (lost pushdown, un-broadcast dim, full sort instead of
  * top-k) fails here even while results stay correct.
  */
class PlanShapeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(FormattedMode)

  test("runtime bloom filter prunes the fact side of a shuffled join with a selective build side") {
    import org.apache.spark.sql.functions._
    // At warehouse scale a selective dim filter should cut the fact
    // shuffle BEFORE the join via Spark's runtime bloom filter
    // (InjectRuntimeFilter). Local fixture sizes sit below the production
    // thresholds, so lower them — the PLAN SHAPE is what must hold.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val j = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_totalprice"))
      val p = j.queryExecution.explainString(FormattedMode)
      assert(p.contains("bloom_filter") || p.contains("BloomFilter") ||
        p.contains("might_contain"),
        "selective shuffled join must inject a runtime bloom filter: " + p.take(3000))
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("star join broadcasts every dimension side") {
    val p = plan("j2_multiway_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(2000))
    assert(!p.contains("SortMergeJoin"), "no dim should fall back to SMJ at this size")
  }

  test("fact scans push predicates and prune columns") {
    val p = plan("p4_predicates_revenue")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate"),
      "scan must read only the four referenced columns")
  }

  test("global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = plan("o1_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(1000))
  }

  test("top-k-per-group plans WindowGroupLimit") {
    val p = plan("w4_topk_per_group")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("similarity probes broadcast; corpus side never exchanges for the join") {
    val p = plan("v1_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
  }

  test("semi/anti joins plan as joins, not subquery re-evaluation") {
    assert(plan("j4_semi_join").contains("LeftSemi"))
    assert(plan("j4_anti_join").contains("LeftAnti"))
  }

  test("minhash signature stage hash-aggregates (no SortAggregate anywhere in t4)") {
    // min over LONG md5-slices has a mutable agg buffer; the string form
    // used to force SortAggregate (two extra sorts per signature stage).
    val p = plan("t4_minhash_neardup")
    assert(!p.contains("SortAggregate"), p.take(3000))
    assert(p.contains("HashAggregate"))
  }

  test("v11 SQ8: codebook broadcasts, corpus never sort-merge joins, fused quantize projects once") {
    val p = plan("v11_sq8_rescore")
    // The O(dims) codebook and the probe set are the ONLY broadcast sides;
    // the corpus side must never plan a SortMergeJoin (a corpus shuffle
    // keyed for a join would mean the codes table is being moved to the
    // probes instead of the other way around).
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    // The encode∘decode stays ONE fused lambda: a resurrected named `code`
    // column inlined under a second HOF re-introduces the O(dims²)
    // interpreted blowup this query's comment documents. The fused form
    // mentions `TINYINT` exactly twice per lambda (shift-in cast + the
    // `-128` literal's branch) in a single Project — if `code` reappears
    // as its own projected column the count jumps.
    assert(!p.contains("AS code#") && !p.contains("code: array<tinyint>"),
      "stored-code column must stay fused into the decode lambda:\n" + p.take(3000))
  }

  test("t24 simhash signature hash-aggregates with no HOF fold in the plan") {
    // The signature used to be a per-row aggregate()/zip_with() fold —
    // outside whole-stage codegen, 24× slower. It must stay an exploded
    // 48-sum HashAggregate: no SortAggregate, no array-fold lambda
    // (`lambdafunction`) anywhere between scan and banding.
    val p = plan("t24_simhash_band")
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("SortAggregate"), p.take(3000))
    assert(!p.contains("zip_with") && !p.contains("aggregate(lambdafunction"),
      "signature must not be a HOF fold:\n" + p.take(3000))
  }

  test("t25 repetition metrics hash-aggregate; no windows over the token stream") {
    val p = plan("t25_repetition_filter")
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("SortAggregate"), p.take(3000))
    // The only Window allowed would be none at all — mode-of-group goes
    // through count→max aggregation, not a ranking window per token.
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window"),
      "no window over exploded tokens:\n" + p.take(3000))
  }

  test("t26 temperature sampler: per-language rates broadcast, corpus never shuffles") {
    val p = plan("t26_temperature_sample")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    // One global sort for the ORDER BY is fine; a SortMergeJoin or a
    // corpus-sized HashAggregate exchange keyed by doc would not be.
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }
}
