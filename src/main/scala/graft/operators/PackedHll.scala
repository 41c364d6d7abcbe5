package graft.operators

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BinaryExpression, Coalesce, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fixed-width packed HyperLogLog primitives for the HyperBall census
  * ([[LinkGraph.hyperBallCensus]]).
  *
  * WHY NOT `hll_sketch_agg`/`hll_union_agg`: those are
  * TypedImperativeAggregates over variable-width Datasketches byte blobs,
  * so every per-round ball union plans as ObjectHashAggregate — whose
  * 128-distinct-key fallback SORTS the full |E|-row contribution input
  * each round (the measured 125×-scale killer in SCALE.md). Packing the
  * 2^lgK 6-bit-max registers into (2^lgK)/8 LONG columns — one byte lane
  * per register — makes the union a column-wise lane-max, which is a
  * DECLARATIVE aggregate over a fixed-width all-primitive buffer: Spark
  * plans it as a true HashAggregate with map-side partial aggregation and
  * whole-stage codegen, and never falls back to sorting. Same playbook as
  * the packed-long argmax that fixed v14's IVF build (IvfIndex.scala).
  *
  * Sketch definition (self-contained, standard HLL per Flajolet et al.,
  * "HyperLogLog: the analysis of a near-optimal cardinality estimation
  * algorithm", AofA 2007):
  *   - h = xxhash64(id); bucket = h & (m-1) with m = 2^lgK;
  *     w = h >>> lgK (64-lgK uniform bits).
  *   - register rho = (number of trailing zero bits of w) + 1, capped at
  *     64-lgK+1 when w == 0. Trailing zeros are as uniform as leading
  *     ones (P(tz >= k) = 2^-k) and are expressible with BUILTIN codegen
  *     expressions: tz = bit_count((w & -w) - 1) — so the per-node init
  *     needs no custom code at all.
  *   - estimate = alpha_m * m^2 / sum_j 2^-M_j, with the standard
  *     linear-counting small-range correction (est <= 2.5m and empty
  *     registers present → m * ln(m / zeros)). No large-range correction:
  *     with 64-bit hashes the 2^32 collision regime is unreachable.
  *
  * Registers fit a byte lane: rho <= 64-lgK+1 <= 57 < 255 for lgK >= 8,
  * and lane-max never overflows into a neighbor lane.
  */
object PackedHll {

  /** Per-byte-lane unsigned max of two packed longs. Called from codegen. */
  def laneMax(a: Long, b: Long): Long = {
    var r = 0L
    var i = 0
    while (i < 64) {
      val x = (a >>> i) & 0xFFL
      val y = (b >>> i) & 0xFFL
      r |= (if (x >= y) x else y) << i
      i += 8
    }
    r
  }

  /** Sum of all byte registers across packed lanes. Called from codegen.
    * Registers are monotone non-decreasing under lane-max union, so for a
    * sketch S' = laneMax(S, anything): byteSum(S') == byteSum(S) iff
    * S' == S — an EXACT 8-byte change fingerprint for a 2^lgK-register
    * sketch (no hash, no collision risk). Max value 57 * 2^14 fits int,
    * long for safety.
    */
  def byteSum(lanes: ArrayData): Long = {
    val nLanes = lanes.numElements()
    var s = 0L
    var j = 0
    while (j < nLanes) {
      var x = lanes.getLong(j)
      var k = 0
      while (k < 8) {
        s += x & 0xFFL
        x >>>= 8
        k += 1
      }
      j += 1
    }
    s
  }

  /** HLL estimate from packed register lanes (8 registers per long).
    * Called from codegen; `lanes` is the array<long> of packed registers.
    */
  def estimate(lanes: ArrayData): Double = {
    val nLanes = lanes.numElements()
    val m = nLanes * 8
    // Guard the estimator ITSELF, not just the LinkGraph callers' lgK >= 4
    // floor: m = 8 has no published alpha constant (ADVICE r14) — a direct
    // graft_hll_estimate call over one lane would silently get alpha_16.
    require(m >= 16,
      s"graft_hll_estimate: $m registers ($nLanes lanes) is below m = 16, " +
        "the smallest register count with a published HLL alpha constant")
    var hsum = 0.0
    var zeros = 0
    var j = 0
    while (j < nLanes) {
      var x = lanes.getLong(j)
      var k = 0
      while (k < 8) {
        val r = (x & 0xFFL).toInt
        // 2^-r exactly, via the IEEE-754 exponent field (r <= 57 so the
        // biased exponent 1023-r stays normal).
        hsum += java.lang.Double.longBitsToDouble((1023L - r) << 52)
        if (r == 0) zeros += 1
        x >>>= 8
        k += 1
      }
      j += 1
    }
    // Per-m bias-correction constants from Flajolet et al. (AofA 2007,
    // §4): the asymptotic 0.7213/(1+1.079/m) is derived for m >= 128;
    // below that the paper tabulates alpha_16 = 0.673, alpha_32 = 0.697,
    // alpha_64 = 0.709. m = 8 has no published constant, so the callers
    // (LinkGraph) floor lgK at 4.
    val alpha =
      if (m <= 16) 0.673
      else if (m == 32) 0.697
      else if (m == 64) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m / hsum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }
}

/** `graft_lane_max(a, b)` — per-byte-lane unsigned max of two longs.
  * The merge kernel of [[LaneMaxAgg]]; codegen'd (a straight-line 8-lane
  * loop, inlined into whole-stage codegen like [[graft.plans.DotProduct]]).
  */
case class LaneMax(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BIGINT arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lane_max"

  override def nullSafeEval(a: Any, b: Any): Any =
    PackedHll.laneMax(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.operators.PackedHll.laneMax($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LaneMax =
    copy(left = newLeft, right = newRight)
}

/** `graft_lanemax_agg(col)` — column-wise lane-max aggregate over packed
  * register longs. A [[DeclarativeAggregate]] with ONE LongType buffer
  * slot: flat primitive buffer → HashAggregateExec (UnsafeRow hash map,
  * map-side partial aggregation, whole-stage codegen), never
  * ObjectHashAggregate. NULL inputs contribute the identity 0L (an
  * all-empty register lane), so a null ball row can never null the union.
  */
case class LaneMaxAgg(child: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${child.dataType.simpleString}")

  private lazy val lanes =
    AttributeReference("lanes", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(lanes)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L))
  override lazy val updateExpressions: Seq[Expression] =
    Seq(LaneMax(lanes, Coalesce(Seq(child, Literal(0L)))))
  override lazy val mergeExpressions: Seq[Expression] =
    Seq(LaneMax(lanes.left, lanes.right))
  override lazy val evaluateExpression: Expression = lanes

  override def prettyName: String = "graft_lanemax_agg"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LaneMaxAgg =
    copy(child = newChildren.head)
}

/** `graft_lane_bytesum(array<long>)` — sum of all byte registers of a
  * packed sketch (see [[PackedHll.byteSum]]). Because registers only grow
  * under lane-max union, equal byte sums ⟺ identical sketches — the
  * change-detection fingerprint [[LinkGraph.hyperBallDiameter]] aggregates
  * (ONE long through the per-round shuffle instead of a second full set of
  * lane columns). Codegen'd static call.
  */
case class PackedLaneByteSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lane_bytesum"

  override def nullSafeEval(a: Any): Any =
    PackedHll.byteSum(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.PackedHll.byteSum($c)")

  override protected def withNewChildInternal(newChild: Expression): PackedLaneByteSum =
    copy(child = newChild)
}

/** `graft_hll_estimate(array<long>)` — cardinality estimate from packed
  * register lanes (see [[PackedHll.estimate]]). Codegen'd static call; one
  * evaluation per node row per census, off the per-edge hot path.
  */
case class PackedHllEstimate(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got ${t.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_hll_estimate"

  override def nullSafeEval(a: Any): Any =
    PackedHll.estimate(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.PackedHll.estimate($c)")

  override protected def withNewChildInternal(newChild: Expression): PackedHllEstimate =
    copy(child = newChild)
}
