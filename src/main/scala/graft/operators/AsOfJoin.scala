package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the most recent
  * right row with the same key and `rightTime <= leftTime` (SURVEY.md §3.3
  * J6 — Spark has no built-in as-of join).
  *
  * Implementation: union the two sides into one keyed, time-ordered stream
  * and carry the latest right payload forward with
  * `last_value(ignoreNulls)` over a per-key window, then keep only left
  * rows. Cost = ONE hash shuffle on the key + a per-key sort — the same
  * motion as a regular sort-merge join, with no range-explosion. This scales
  * to 100 TB: no broadcast of the right side, no O(left × right-per-key)
  * intermediate (which the naive `join + row_number` formulation has when a
  * key's right side is large), and AQE skew-splitting still applies.
  *
  * Right rows are first deduplicated to one per (key, time) — keeping the
  * row with the greatest tiebreak column — so results are deterministic
  * when several right rows share a timestamp.
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param leftKey    join key column name on the left
    * @param rightKey   join key column name on the right
    * @param leftTime   event-time column name on the left
    * @param rightTime  event-time column name on the right
    * @param tiebreak   right column used to break equal-time ties (max wins)
    * @param rightCols  right payload columns to attach
    * @param inner      if true, drop left rows with no as-of match
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      tiebreak: String,
      rightCols: Seq[String],
      inner: Boolean = true): DataFrame = {

    val leftCols = left.columns.toSeq
    // Attached payload columns keep their right-side names, so they must not
    // collide with left columns; __-prefixed names are internal scratch.
    val overlap = rightCols.toSet.intersect(leftCols.toSet)
    require(overlap.isEmpty,
      s"asOf: rightCols ${overlap.mkString(", ")} collide with left column names; rename one side first")
    val reserved = (leftCols ++ rightCols).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"asOf: column names ${reserved.mkString(", ")} use the reserved __ prefix")

    // One right row per (key, time): greatest tiebreak wins.
    val tiePick = Window
      .partitionBy(col(rightKey), col(rightTime))
      .orderBy(col(tiebreak).desc)
    val rightDedup = right
      .withColumn("__rn", row_number().over(tiePick))
      .filter(col("__rn") === 1)
      .drop("__rn")

    val l = left
      .withColumn("__key", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__isLeft", lit(1))
      .select((Seq(col("__key"), col("__t"), col("__isLeft"),
        lit(null).cast("int").as("__m")) ++
        leftCols.map(col) ++
        rightCols.map(c => lit(null).cast(rightDedup.schema(c).dataType).as(s"__r_$c"))): _*)

    val r = rightDedup
      .withColumn("__key", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__isLeft", lit(0))
      .select((Seq(col("__key"), col("__t"), col("__isLeft"), lit(1).as("__m")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c"))): _*)

    // Right rows sort before left rows at equal time, so `rightTime ==
    // leftTime` counts as "already happened" (>= semantics, like DuckDB's
    // ASOF JOIN ... ON l.t >= r.t).
    val w = Window
      .partitionBy(col("__key"))
      .orderBy(col("__t").asc, col("__isLeft").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .select((Seq(col("__isLeft"),
        last(col("__m"), ignoreNulls = true).over(w).as("__matched")) ++
        leftCols.map(col) ++ rightCols.map { c =>
          last(col(s"__r_$c"), ignoreNulls = true).over(w).as(c)
        }): _*)

    val joined = carried.filter(col("__isLeft") === 1)
    val out    = if (inner) joined.filter(col("__matched") === 1) else joined
    out.drop("__isLeft", "__matched")
  }
}
