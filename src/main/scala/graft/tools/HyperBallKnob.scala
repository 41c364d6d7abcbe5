package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.LinkGraph

/** AUDIT-ONLY (VERDICT r9 stretch ask #7): measure the g13b HyperBall
  * census's documented "lgK is the cost knob" claim — census error vs
  * wall time at lgK ∈ {6, 8, 10, 12} — and write the table a 100×-scale
  * operator would read before picking a register width.
  *
  * Error is measured against the EXACT neighborhood function N(h)
  * (tagged pair-BFS — state is (source, node) pairs, quadratic in reach,
  * which is exactly why it only runs at sf0.01 here and why HyperBall
  * exists). Time is measured at sf0.1 on the same maintained symmetrized
  * edge table g13b reads (warm best-of-2, noop-equivalent action). HLL
  * accuracy is a property of the register count, not the data scale, so
  * the two halves compose into one trade-off table.
  */
object HyperBallKnob {

  private def exactCensus(s: SparkSession, g: LinkGraph, rounds: Int): Map[Int, Long] = {
    val e = g.edges.select(col("src"), col("dst")).localCheckpoint()
    var pairs = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .select(col("id").as("tag"), col("id"))
      .localCheckpoint()
    val out = scala.collection.mutable.Map(0 -> pairs.count())
    for (h <- 1 to rounds) {
      pairs = pairs.join(e, pairs("id") === e("src"))
        .select(pairs("tag"), e("dst").as("id"))
        .union(pairs.select(col("tag"), col("id")))
        .distinct()
        .localCheckpoint()
      out += h -> pairs.count()
    }
    out.toMap
  }

  def main(args: Array[String]): Unit = {
    // Honor SPARK_GRAFT_CPUS like Bench/Verify (ADVICE r10). This tool
    // needs TWO sf dirs, so the established single-dir SPARK_GRAFT_SF_DIR
    // cannot name them directly — its PARENT is used as the base when set
    // (so a host that configured only the documented variable still lands
    // on its own data), with SPARK_GRAFT_DATA_DIR as an explicit override.
    // The values used are recorded in the emitted markdown.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dataBase = sys.env.get("SPARK_GRAFT_DATA_DIR")
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR").map(d =>
        new java.io.File(d).getAbsoluteFile.getParent))
      .getOrElse("/root/testdata")
    val spark = GraftSession.local(cpus, "graft-hyperball-knob")
    val rounds = 3
    val lgKs = Seq(6, 8, 10, 12)

    // Error half: sf0.01, vs the exact pair-BFS census.
    val small = graft.queries.Graph.symEdgesTable(spark, s"$dataBase/sf0.01")
    val gSmall = new LinkGraph(small)
    val exact = exactCensus(spark, gSmall, rounds)
    println(s"[knob] exact N(h) at sf0.01: $exact")
    val errRows = lgKs.map { lgK =>
      val est = gSmall.hyperBallCensus(rounds, lgK)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val errs = (0 to rounds).map(h =>
        h -> (100.0 * math.abs(est(h) - exact(h)) / exact(h)))
      println(f"[knob] lgK=$lgK errors: " +
        errs.map { case (h, e) => f"h=$h $e%.2f%%" }.mkString(" "))
      lgK -> (est, errs.toMap)
    }.toMap

    // Cost half: sf0.1 wall time (warm best-of-2) on g13b's real table.
    val big = graft.queries.Graph.symEdgesTable(spark, s"$dataBase/sf0.1")
    val gBig = new LinkGraph(big)
    val nodesBig = gBig.nodeIds.count()
    val timeRows = lgKs.map { lgK =>
      def once(): Double = {
        val t0 = System.nanoTime()
        gBig.hyperBallCensus(rounds, lgK).write.mode("overwrite")
          .format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup/JIT
      val warm = math.min(once(), once())
      println(f"[knob] lgK=$lgK sf0.1 warm $warm%.2f s")
      lgK -> warm
    }.toMap

    val md = new StringBuilder
    md.append("# g13b HyperBall lgK cost knob — measured (round 13, packed lanes)\n\n")
    md.append("Error vs the EXACT neighborhood function N(h) (tagged pair-BFS,\n")
    md.append("sf0.01 — the quadratic-state census HyperBall replaces); time at\n")
    md.append("sf0.1 on the maintained symmetrized edge table (warm best-of-2,\n")
    md.append(s"3 rounds, ${nodesBig} nodes). Sketch state ∝ nodes × 2^lgK\n")
    md.append("registers packed 8-per-long (PackedHll.scala), and the per-round\n")
    md.append("union shuffle carries it — the documented cost knob, now with\n")
    md.append("numbers. HyperBall itself ships lgK 4–8 at billion-node scale;\n")
    md.append("the gated query g13b ships lgK=8 (Graph.scala — 256 B/node;\n")
    md.append("classic per-node HLL bound ~6.5%, measured far tighter below\n")
    md.append("because linear counting is near-exact for small balls and the\n")
    md.append("census SUM averages independent per-node errors down by another\n")
    md.append("1/√|V|), matching the LinkGraph API default; at 100 TB the table\n")
    md.append("below says what each step of the knob buys and costs.\n\n")
    md.append(s"Environment: cores=$cpus (SPARK_GRAFT_CPUS), data=$dataBase\n")
    md.append("(SPARK_GRAFT_DATA_DIR); defaults 32 / /root/testdata.\n\n")
    md.append("| lgK | max err h=1..3 (sf0.01) | err h=3 | sf0.1 warm (s) |\n")
    md.append("|---|---|---|---|\n")
    lgKs.foreach { lgK =>
      val errs = errRows(lgK)._2
      val maxErr = (1 to rounds).map(errs).max
      md.append(f"| $lgK | $maxErr%.2f%% | ${errs(rounds)}%.2f%% " +
        f"| ${timeRows(lgK)}%.2f |\n")
    }
    md.append(f"\nExact N(h) at sf0.01: ${(0 to rounds).map(h => s"h=$h ${exact(h)}").mkString(", ")}.\n")
    md.append("\nReading: error shrinks ~1/√2^lgK while time/state grow with\n")
    md.append("2^lgK; the spec pin (LinkGraphSpec) stays on the default lgK.\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("audits/g13b_lgk_knob.md"), md.toString)
    println("[knob] wrote audits/g13b_lgk_knob.md")
    spark.stop()
  }
}
