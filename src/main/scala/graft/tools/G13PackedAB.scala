package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.LinkGraph

/** AUDIT-ONLY (round 13): within-JVM A/B of the HyperBall census's two
  * sketch-union formulations at lgK = 8 —
  *
  *   A (round 13, shipped): packed byte-lane registers unioned by the
  *     declarative [[graft.operators.LaneMaxAgg]] → HashAggregate with
  *     map-side partial aggregation (PackedHll.scala);
  *   B (round 12, reconstructed here verbatim): `hll_sketch_agg` /
  *     `hll_union_agg` Datasketches blobs → ObjectHashAggregate, whose
  *     128-distinct-key fallback sorts the full |E|-row contribution
  *     input every round (the measured 125×-scale killer, SCALE.md).
  *
  * Usage: runMain graft.tools.G13PackedAB <dir> [label] [arm] [lgK]
  * Prints one line per arm: cold + best-of-2 warm. `arm` ∈ a|b|both
  * (default both). PROTOCOL: run each (scale, arm) as its OWN JVM — the
  * first within-JVM both-arms run showed the second arm inheriting JIT +
  * page-cache warmth from the first (its "cold" beat the first arm's
  * warm at 25×), so same-JVM ordering is not a fair comparison; fresh-JVM
  * cold + best-of-2 warm per arm is.
  */
object G13PackedAB {

  /** The round-12 formulation, byte-for-byte semantics (git d791fde:
    * LinkGraph.hyperBallCensus before the packed rewrite).
    */
  private def censusB(edges: DataFrame, rounds: Int, lgK: Int): DataFrame = {
    val e = edges.repartition(col("dst")).localCheckpoint()
    val gcPerRound = e.count() >= (1L << (34 - lgK))
    var balls = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .groupBy(col("id"))
      .agg(expr(s"hll_sketch_agg(id, $lgK)").as("ball"))
      .localCheckpoint()
    def census(b: DataFrame): Long =
      b.agg(coalesce(round(sum(expr("hll_sketch_estimate(ball)")), 0), lit(0))
        .cast("long")).head().getLong(0)
    val rows = scala.collection.mutable.ArrayBuffer(0 -> census(balls))
    for (h <- 1 to rounds) {
      val contrib = e.join(balls, e("dst") === balls("id"))
        .select(e("src").as("id"), col("ball"))
      balls = contrib.union(balls.select(col("id"), col("ball")))
        .groupBy(col("id"))
        .agg(expr("hll_union_agg(ball)").as("ball"))
        .localCheckpoint()
      rows += h -> census(balls)
      if (gcPerRound) System.gc()
    }
    val s = edges.sparkSession
    import s.implicits._
    rows.toSeq.toDF("h", "est_pairs")
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val label = if (args.length > 1) args(1) else dir
    val arm = if (args.length > 2) args(2).toLowerCase else "both"
    val lgK = if (args.length > 3) args(3).toInt else 8
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-g13-packed-ab")
    def time(run: () => Unit): (Double, Double) = {
      def once(): Double = {
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val warm = math.min(once(), once())
      (cold, warm)
    }
    val edges = () => graft.queries.Graph.symEdgesTable(spark, dir)
    if (arm == "a" || arm == "both") {
      val (ca, wa) = time(() =>
        new LinkGraph(edges()).hyperBallCensus(3, lgK = lgK)
          .write.mode("overwrite").format("noop").save())
      println(f"[g13ab] $label lgK=$lgK A=packed-lanes  cold=$ca%.2f warm=$wa%.2f")
    }
    if (arm == "b" || arm == "both") {
      val (cb, wb) = time(() =>
        censusB(edges().select("src", "dst"), 3, lgK = lgK)
          .write.mode("overwrite").format("noop").save())
      println(f"[g13ab] $label lgK=$lgK B=hll_union_agg cold=$cb%.2f warm=$wb%.2f")
    }
    spark.stop()
  }
}
