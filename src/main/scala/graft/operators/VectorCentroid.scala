package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (SURVEY.md §3.4 A7): per-group centroid of a
  * fixed-dimension embedding column.
  *
  * Buffer layout is a single primitive `Array[Double]` of length `dim + 1`
  * — component sums plus the count in the last slot — so partial aggregation
  * ships one compact unsafe array per group per partition (map-side combine,
  * then one shuffle of dim+1 doubles per group; at 100 TB the shuffle volume
  * is `groups × (dim+1) × 8` bytes regardless of row count).
  *
  * Floating-point note: partial sums combine in partition order, so the last
  * bits of the result can vary across runs; oracle-compared queries use the
  * decimal-exact SQL formulation instead (see
  * [[graft.queries.Embeddings]] v4), and this Aggregator is the fast path
  * for pure-Spark pipelines (validated against the exact path in tests).
  */
class VectorCentroid(dim: Int) extends Aggregator[Seq[Float], Array[Double], Seq[Double]] {

  override def zero: Array[Double] = new Array[Double](dim + 1)

  override def reduce(b: Array[Double], a: Seq[Float]): Array[Double] = {
    if (a != null && a.length == dim) {
      var i = 0
      while (i < dim) { b(i) += a(i); i += 1 }
      b(dim) += 1
    }
    b
  }

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    var i = 0
    while (i <= dim) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Double]): Seq[Double] = {
    val n = b(dim)
    if (n == 0) Seq.empty
    else {
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) { out(i) = b(i) / n; i += 1 }
      out.toSeq
    }
  }

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]]  = ExpressionEncoder[Seq[Double]]()
}
