package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PackedHll

/** Packed-HLL primitives (PackedHll.scala): the lane-max kernel, the
  * estimator's accuracy across regimes, and — the round-13 point of the
  * rewrite — the PLAN-SHAPE pin that the ball-union aggregate plans as a
  * true HashAggregate (declarative, fixed-width primitive buffer), never
  * the ObjectHashAggregate whose 128-key sort fallback was the measured
  * 125×-scale killer of the hll_union_agg formulation (SCALE.md).
  */
class PackedHllSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("laneMax takes the per-byte-lane unsigned max") {
    // Lane 0: 0x01 vs 0x02; lane 1: 0xFF vs 0x00 (unsigned — 0xFF wins);
    // lane 7: 0x30 vs 0x40.
    val a = 0x300000000000FF01L
    val b = 0x400000000000_0002L
    val r = PackedHll.laneMax(a, b)
    assert((r & 0xFFL) === 0x02L)
    assert(((r >>> 8) & 0xFFL) === 0xFFL)
    assert(((r >>> 56) & 0xFFL) === 0x40L)
    // Commutative, idempotent, zero-identity.
    assert(PackedHll.laneMax(b, a) === r)
    assert(PackedHll.laneMax(r, r) === r)
    assert(PackedHll.laneMax(a, 0L) === a)
  }

  test("estimate is near-exact in the linear-counting regime and within the HLL bound beyond it") {
    // Build sketches by driving the REAL init + union path: n distinct ids
    // through the same xxhash64/bucket/rho derivation hyperBallCensus uses,
    // globally lane-max-aggregated into one sketch.
    def estimateOf(n: Int): Double = {
      val lanes = (0 until 32).map(j => s"l$j")
      val laneInit = lanes.zipWithIndex.map { case (c, j) =>
        s"IF(shiftright(bucket, 3) = $j, " +
          s"shiftleft(CAST(rho AS BIGINT), (bucket & 7) * 8), CAST(0 AS BIGINT)) AS $c"
      }
      val aggs = lanes.map(c => expr(s"graft_lanemax_agg($c)").as(c))
      (1 to n).toDF("id")
        .selectExpr("CAST(xxhash64(id) & 255L AS INT) AS bucket",
          "shiftrightunsigned(xxhash64(id), 8) AS w")
        .selectExpr("bucket",
          "CASE WHEN w = 0 THEN 57 ELSE bit_count((w & -w) - 1) + 1 END AS rho")
        .selectExpr(laneInit: _*)
        .agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"graft_hll_estimate(array(${lanes.mkString(", ")})) AS est")
        .as[Double].head()
    }
    // Linear counting (n ≪ m = 256): near-exact (one bucket collision
    // among 20 ids — expected count ~0.7 — moves the estimate by ~1.3).
    assert(math.abs(estimateOf(20) - 20) <= 2.0)
    assert(math.abs(estimateOf(100) - 100) <= 5.0)
    // Raw-HLL regime: standard error 1.04/√256 ≈ 6.5%; pin at 3σ.
    assert(math.abs(estimateOf(10000) - 10000) <= 10000 * 0.195)
  }

  test("estimate applies the tabulated small-m alpha constants (Flajolet §4), not the asymptotic formula") {
    // The asymptotic alpha = 0.7213/(1+1.079/m) is derived for m >= 128;
    // below that the paper tabulates 0.673 / 0.697 / 0.709 for m =
    // 16/32/64. Pin the estimator's exact raw-regime output on handmade
    // registers (all registers = 4 → hsum = m·2⁻⁴, zeros = 0 → raw path):
    // a regression to the asymptotic formula at m = 16 would read 0.6767
    // and shift the estimate by ~0.6%.
    val lane = 0x0404040404040404L // 8 registers of 4, one per byte lane
    def estAt(nLanes: Int): Double =
      spark.range(1)
        .selectExpr(s"graft_hll_estimate(array(${Seq.fill(nLanes)(s"CAST($lane AS BIGINT)").mkString(", ")})) AS est")
        .as[Double].head()
    def rawWith(m: Int, alpha: Double): Double = alpha * m * m / (m / 16.0)
    assert(math.abs(estAt(2) - rawWith(16, 0.673)) < 1e-6)
    assert(math.abs(estAt(4) - rawWith(32, 0.697)) < 1e-6)
    assert(math.abs(estAt(8) - rawWith(64, 0.709)) < 1e-6)
    // m >= 128 keeps the asymptotic constant.
    assert(math.abs(estAt(16) - rawWith(128, 0.7213 / (1.0 + 1.079 / 128))) < 1e-6)
  }

  test("ball-union aggregate plans as HashAggregate, never ObjectHashAggregate") {
    // The exact shape of hyperBallCensus's per-round union: long lanes
    // grouped by node id under graft_lanemax_agg. A fixed-width primitive
    // buffer must hash-aggregate with a map-side partial; any
    // ObjectHashAggregate (sort-fallback at 128 keys) or SortAggregate
    // here is a regression to the round-12 scale killer.
    val aggs = (0 until 32).map(j => expr(s"graft_lanemax_agg(l$j)").as(s"l$j"))
    val df = (1 to 1000).map(i => (i % 97).toLong)
      .toDF("id")
      .selectExpr(("id" +: (0 until 32).map(j => s"xxhash64(id, $j) AS l$j")): _*)
      .groupBy("id")
      .agg(aggs.head, aggs.tail: _*)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected HashAggregate in:\n$plan")
    assert(!plan.contains("ObjectHashAggregate"), s"ObjectHashAggregate leaked into:\n$plan")
    assert(!plan.contains("SortAggregate"), s"SortAggregate leaked into:\n$plan")
    // And the union itself is correct: aggregating a sketch with itself is
    // a no-op (idempotent lane max).
    val once = df.selectExpr("id", "l0")
    val twice = df.union(df).groupBy("id")
      .agg(expr("graft_lanemax_agg(l0)").as("l0"), aggs.tail: _*)
      .selectExpr("id", "l0")
    assert(once.except(twice).count() === 0 && twice.except(once).count() === 0)
  }

  test("diameter-loop aggregate (lane-max + standing-row byte-sum max) still plans as HashAggregate") {
    // hyperBallDiameter's per-round union carries the changed-flag
    // bookkeeping IN the same aggregate: the lane-max per lane plus ONE
    // declarative MAX over the standing row's register byte-sum (round 15:
    // replaces the former 32 max(IF(is_ball...)) lane columns — the
    // aggregation buffer drops 65 → 34 slots, see OPTIMIZATION_r15.md).
    // Both are declarative with primitive buffers — mixing them must not
    // knock the plan off HashAggregate.
    val lanes = (0 until 32).map(j => s"l$j")
    val aggs = lanes.map(c => expr(s"graft_lanemax_agg($c)").as(c)) :+
      expr("max(bs)").as("o_bs")
    val df = (1 to 1000).map(i => (i % 97).toLong)
      .toDF("id")
      .selectExpr(("id" +: (0 until 32).map(j => s"xxhash64(id, $j) AS l$j")): _*)
      .selectExpr("*",
        s"IF(id % 2 = 0, graft_lane_bytesum(array(${lanes.mkString(", ")})), " +
          "CAST(NULL AS BIGINT)) AS bs")
      .groupBy("id")
      .agg(aggs.head, aggs.tail: _*)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected HashAggregate in:\n$plan")
    assert(!plan.contains("ObjectHashAggregate"), s"ObjectHashAggregate leaked into:\n$plan")
    assert(!plan.contains("SortAggregate"), s"SortAggregate leaked into:\n$plan")
  }

  test("byteSum is an exact change fingerprint under lane-max union") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def arr(xs: Long*): ArrayData = ArrayData.toArrayData(xs.toArray)
    // Plain sum of byte registers.
    assert(PackedHll.byteSum(arr(0L)) === 0L)
    assert(PackedHll.byteSum(arr(0x0102030405060708L)) === 36L)
    assert(PackedHll.byteSum(arr(-1L)) === 8 * 255L) // unsigned bytes
    assert(PackedHll.byteSum(arr(0x0101010101010101L, 0x0200000000000000L)) === 10L)
    // The fingerprint property hyperBallDiameter's chg flag relies on:
    // registers are monotone non-decreasing under laneMax, so for any
    // sketches S, T: byteSum(laneMax(S,T)) == byteSum(S) ⟺ laneMax(S,T)
    // == S — equality of the 8-byte sum certifies equality of all 2^lgK
    // registers EXACTLY (no hash collision possible). Property-check on
    // random lanes.
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val s = rnd.nextLong()
      val t = rnd.nextLong()
      val u = PackedHll.laneMax(s, t)
      val same = PackedHll.byteSum(arr(u)) == PackedHll.byteSum(arr(s))
      assert(same === (u == s),
        f"byteSum fingerprint disagreed for s=$s%016x t=$t%016x u=$u%016x")
    }
    // SQL surface matches the static.
    val viaSql = spark.range(1)
      .selectExpr("graft_lane_bytesum(array(CAST(72623859790382856 AS BIGINT))) AS s")
      .as[Long].head()
    assert(viaSql === 36L)
  }
}
