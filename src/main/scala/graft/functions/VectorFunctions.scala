package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `ArrayType` embedding columns.
  *
  * Built from Catalyst higher-order functions (`zip_with`/`aggregate`), so
  * the arithmetic stays inside whole-stage codegen — no UDF serialization
  * boundary, no Python. At 100 TB the per-row cost is the dominant term in
  * brute-force similarity; HOFs keep it a tight loop over unsafe arrays.
  *
  * All functions expect DoubleType arrays; use [[asDouble]] on float
  * embeddings first. Within one row evaluation order is deterministic
  * (left fold), so results are reproducible and oracle-comparable.
  */
object VectorFunctions {

  /** Cast an array<float> column to array<double> (exact widening). */
  def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Dot product of two equal-length double arrays (sequential left fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Native codegen dot product ([[graft.plans.DotProduct]], registered by
    * GraftExtensions) — bit-identical to [[dot]] (same ascending-index
    * sum), minus the intermediate array + lambda dispatch. Requires a
    * session built with `spark.sql.extensions=graft.plans.GraftExtensions`.
    */
  def dotNative(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Native cosine (composed Catalyst nodes over [[dotNative]]). */
  def cosineNative(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** L2 (Euclidean) distance. */
  def l2(a: Column, b: Column): Column = sqrt(l2sq(a, b))

  /** Sign-pattern LSH bucket over the first `k` dimensions: a string of
    * '1'/'0' per non-negative/negative component. Random-hyperplane LSH with
    * axis-aligned planes — near-identical vectors land in the same bucket,
    * so near-dup search shrinks from O(n²) to a per-bucket join. Recall is
    * below 1.0 by construction (a near-dup pair can straddle a plane on a
    * coordinate near 0); raise recall by OR-ing several bucketings.
    */
  def signBucket(a: Column, k: Int): Column =
    concat((0 until k).map(i => when(element_at(a, i + 1) >= 0.0, "1").otherwise("0")): _*)
}
