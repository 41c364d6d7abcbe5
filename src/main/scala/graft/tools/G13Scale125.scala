package graft.tools

import graft.GraftSession
import graft.operators.LinkGraph

/** AUDIT-ONLY (round 12; re-run round 13 on the packed-lane census): the
  * g13 HyperBall census at the 125× octave. In round 12, at lgK = 10 the
  * hll_union_agg formulation's per-round sketch-union SORT carried
  * |E|·2^lgK ≈ 150 GB of spill — beyond this single box's free disk —
  * which motivated both the lgK = 8 measurement point and, in round 13,
  * the packed-lane HashAggregate rewrite (PackedHll.scala) that removed
  * the sort entirely (the gated query now ships lgK = 8 packed; see
  * `audits/g13_packed_ab.md` for the A/B). Together with the sf0.1 lgK
  * table (`audits/g13b_lgk_knob.md`) this pins the documented
  * "cost ∝ 2^lgK" knob with a real 125× wall-clock. Usage:
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
