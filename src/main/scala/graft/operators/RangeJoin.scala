package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — SURVEY.md §3.3 J6's theta-join sibling: match
  * each left row `(key, t)` to right rows `(key, [start, end])` with
  * `start <= t <= end`.
  *
  * The naive plan is an equi-join on the key with the range as a residual
  * filter — fine until one key has many rows (the per-key cross product).
  * The scale formulation buckets time: each right interval replicates to
  * the `width`-sized buckets it overlaps, the left row joins on
  * `(key, bucket(t))`, and the exact range predicate filters residually.
  * Equi-join machinery (hash/sort-merge, AQE skew splitting) then applies,
  * and the per-key blowup is bounded by `interval_length / width + 1`
  * replicas instead of the full per-key cross product.
  *
  * Choose `width` ≈ the typical interval length: much smaller → replica
  * explosion on the right; much larger → buckets degenerate toward the
  * naive per-key join.
  */
object RangeJoin {

  /** @param left      probe side
    * @param right     interval side
    * @param leftKey   equi key on the left
    * @param rightKey  equi key on the right
    * @param leftTime  left timestamp column name
    * @param start     right interval start column name (inclusive)
    * @param end       right interval end column name (inclusive)
    * @param widthSec  bucket width in seconds
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      start: String,
      end: String,
      widthSec: Long): DataFrame = {

    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"intervalJoin: overlapping column names ${overlap.mkString(", ")}; rename one side first")
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"intervalJoin: column names ${reserved.mkString(", ")} use the reserved __ prefix")

    // cast("timestamp") normalizes TIMESTAMP_NTZ inputs (wall-clock
    // identity under the engine's pinned UTC session timezone).
    def bucketOf(c: Column): Column =
      (unix_micros(c.cast("timestamp")) / lit(widthSec * 1000000L)).cast("long")

    val l = left.withColumn("__lb", bucketOf(col(leftTime)))
    val r = right
      .withColumn("__rb",
        explode(sequence(bucketOf(col(start)), bucketOf(col(end)))))

    l.join(r,
        col(leftKey) === col(rightKey) && col("__lb") === col("__rb") &&
          col(leftTime) >= col(start) && col(leftTime) <= col(end))
      .drop("__lb", "__rb")
  }
}
