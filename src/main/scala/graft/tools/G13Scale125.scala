package graft.tools

import graft.GraftSession
import graft.operators.LinkGraph

/** AUDIT-ONLY (round 12): the g13 HyperBall census at the 125× octave.
  * At the gated lgK = 10 a single round's sketch-union sort carries
  * |E|·2^lgK ≈ 150M × 1 KB ≈ 150 GB of spill — beyond this single box's
  * free disk no matter the heap (on a cluster the same bytes distribute
  * across executors' local disks; the operator's shape is unchanged).
  * The measurable single-box point is lgK = 8 (≈ 37 GB/round, inside the
  * disk budget), which together with the sf0.1 lgK table
  * (`audits/g13b_lgk_knob.md`) pins the documented "cost ∝ 2^lgK" knob
  * with a real 125× wall-clock. Usage:
  *   runMain graft.tools.G13Scale125 [lgK] [dir125] — times sf0.1 then
  * dir125, cold + best-of-2 warm each, and prints one summary line.
  */
object G13Scale125 {
  def main(args: Array[String]): Unit = {
    val lgK = if (args.nonEmpty) args(0).toInt else 8
    val big = if (args.length > 1) args(1) else "/tmp/graft_sf125"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-g13-scale125")
    def time(d: String): (Double, Double) = {
      def once(): Double = {
        val t0 = System.nanoTime()
        new LinkGraph(graft.queries.Graph.symEdgesTable(spark, d))
          .hyperBallCensus(3, lgK)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val warm = math.min(once(), once())
      (cold, warm)
    }
    val (c1, w1) = time("/root/testdata/sf0.1")
    println(f"[g13x125] lgK=$lgK sf0.1 cold=$c1%.2f warm=$w1%.2f")
    val (c2, w2) = time(big)
    println(f"[g13x125] lgK=$lgK 125x cold=$c2%.2f warm=$w2%.2f r125=${w2 / w1}%.2f")
    spark.stop()
  }
}
