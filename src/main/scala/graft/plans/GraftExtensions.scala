package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Multiply, Sqrt}

/** Engine extension point (`spark.sql.extensions=graft.plans.GraftExtensions`):
  * registers the native vector functions into the session's
  * FunctionRegistry so they are callable from SQL and
  * `functions.call_function` alike.
  *
  *   - `graft_dot(a, b)`     — native codegen dot product ([[DotProduct]])
  *   - `graft_cosine(a, b)`  — cosine similarity composed from existing
  *                             Catalyst nodes (Divide/Multiply/Sqrt over
  *                             [[DotProduct]]); no new eval code to trust.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[DotProduct].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two double arrays"),
      (args: Seq[Expression]) => {
        val (a, b) = (args(0), args(1))
        Divide(
          DotProduct(a, b),
          Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))),
          evalMode = org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY)
      }))
  }
}
