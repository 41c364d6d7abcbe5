package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCALE.md's residual-skew claim, proven: AQE's skew-join optimization
  * actually splits a hot partition at runtime. A join with one celebrity
  * key (padded payloads so the partition crosses the lowered skew
  * thresholds) must show `isSkew = true` splits in the final adaptive
  * plan — the mechanism the salting operator defers to BELOW its own
  * threshold, and the runtime backstop for skew no static plan predicted.
  */
class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("AQE splits a skewed sort-merge-join partition at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on ONE key with 200-char payloads (~10MB partition) vs
      // 50 rows spread over other keys; the right side is small per key.
      val left = spark.range(50000).select(lit(0L).as("k"),
          concat(lit("x" * 200), col("id").cast("string")).as("payload"))
        .union(spark.range(50).select((col("id") + 1).as("k"),
          lit("small").as("payload")))
      val right = spark.range(60).select(col("id").as("k"), lit(1).as("v"))
      val joined = left.join(right, "k")
      // Execute THIS plan (count() would plan a separate aggregate query,
      // leaving joined's adaptive plan un-executed and unsplit).
      assert(joined.collect().length === 50050)
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }
      assert(adaptive.isDefined, "expected an adaptive plan root")
      val finalPlan = adaptive.get.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        "AQE must mark the hot partition's join as skew-split:\n" +
          finalPlan.take(3000))
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
