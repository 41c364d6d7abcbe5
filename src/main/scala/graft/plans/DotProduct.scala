package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding dot product — the T5 hot
  * path from SURVEY.md §5 ("custom `Expression` with `doGenCode` only for
  * the hot distance fn").
  *
  * Compared to the higher-order-function formulation
  * (`aggregate(zip_with(a, b, *), 0.0, +)`), this avoids materializing the
  * intermediate product array and the per-element lambda dispatch: codegen
  * emits a tight primitive loop over the two unsafe array buffers, inlined
  * into the surrounding whole-stage-codegen stage. Summation is sequential
  * ascending-index — bit-identical to the HOF left fold (and to DuckDB's
  * list_dot_product), so swapping it into oracle-checked queries is safe.
  *
  * Null handling: a null array yields null (BinaryExpression default), and
  * so does a LENGTH MISMATCH (same observable behavior as the HOF fold,
  * where zip_with's null padding nulls the aggregate); array ELEMENTS are
  * assumed non-null (embedding vectors) — enforced by the input contract,
  * not checked per element in the hot loop.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // AbstractDataType (and with it ImplicitCastInputTypes) is private[sql]
  // in Spark 4, so input typing is enforced manually: both children must
  // already be array<double> (callers widen float arrays explicitly —
  // graft.plans.GraftExtensions registers the function, and
  // VectorFunctions.asDouble does the cast).
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // Length mismatch → NULL, matching the HOF fold (zip_with pads with
    // null, which nulls the aggregate) — a truncated embedding must not
    // produce a plausible-but-wrong prefix sum.
    if (n != y.numElements()) null
    else {
      var sum = 0.0
      var i = 0
      while (i < n) {
        sum += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      sum
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
