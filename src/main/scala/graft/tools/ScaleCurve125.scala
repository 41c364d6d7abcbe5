package graft.tools

import graft.GraftSession

/** BENCH-ONLY 125× scale-curve probe (round 12): the brief's bar is 100×
  * survivability; the 25× table (`bench_scale_curve_25x.md`) adjudicated
  * its UP bends as overhead amortization and shipped two named fixes
  * (the wide-start AQE shuffle knob for g13's reducer-state spill; the
  * corpus-proportioned IVF index behind v14). This tool adds the THIRD
  * octave — 125 shifted copies of sf0.1, past the 100× bar — for the
  * rows where that adjudication carries real weight: the two named-fix
  * rows, the iterative graph family, and the banded-dedup family.
  * Writes `audits/bench_scale_curve_125x.md`. Not part of the engine.
  *
  * Row selection note: t21_tiered_verify and t24_simhash_band are
  * EXCLUDED on cost grounds, not on doubt — their dup-saturated
  * synthesis grows the true workload (output pairs / verified members)
  * super-linearly BY CONSTRUCTION (t24 emitted 100M pairs at 25×; at
  * 125× that is ~2.5B pairs ≈ an hour of noop writing), and their
  * time÷rows arms are already conclusive at 25× (0.11 / 0.07).
  *
  * Bars, scaled from the 25× table's two arms: warm 125×-ratio ≤ ~150
  * (linear 125 plus the same 1.2× headroom), OR time÷rows ≤ ~2. The
  * bend verdict compares the mean per-quintupling exponent over the
  * first two octaves e_a = log₅(t₂₅/t₀.₁)/2 with the third octave's
  * e_b = log₅(t₁₂₅/t₂₅), same 0.15 grace band as the 25× table.
  */
object ScaleCurve125 {

  private val Queries = Seq(
    "g13_neighborhood_hll", // named fix: wide-start AQE shuffle partitions
    "v14_nn_graph_ivf",     // named fix: corpus-proportioned IVF index
    "g6_pagerank", "g9_sssp", // iterative graph family
    "t11_contamination", "t13_neardup_clusters") // banded-dedup family

  def main(args: Array[String]): Unit = {
    val selected = if (args.nonEmpty) args.toSeq else Queries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus, "graft-scale-curve-125x")
    val dataBase = sys.env.get("SPARK_GRAFT_DATA_DIR")
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR").map(d =>
        new java.io.File(d).getAbsoluteFile.getParent))
      .getOrElse("/root/testdata")
    val base = s"$dataBase/sf0.1"
    require(new java.io.File(base).isDirectory,
      s"ScaleCurve125: resolved sf0.1 base $base does not exist " +
        "(set SPARK_GRAFT_DATA_DIR to the directory holding the sf* dirs)")
    val tmp = System.getProperty("java.io.tmpdir")
    val mid = s"$tmp/graft_sf25"
    val big = s"$tmp/graft_sf125"
    def ensure(dst: String, copies: Int): Unit =
      if (new java.io.File(s"$dst/events.parquet").isDirectory)
        println(s"[scale125] reusing existing ${copies}x dataset at $dst")
      else {
        println(s"[scale125] synthesizing ${copies}x dataset...")
        ScaleCurve.synthesize(spark, base, dst, copies)
      }
    ensure(mid, 25)
    ensure(big, 125)

    final case class Row(q: String, t1: Double, t25: Double, t125: Double,
        n1: Long, n25: Long, n125: Long)
    val rows = selected.flatMap { q =>
      try {
        val (_, t1, n1) = ScaleCurve.time(spark, q, base)
        println(f"[scale125] $q%-24s sf0.1=$t1%7.2fs rows=$n1%d")
        val (_, t25, n25) = ScaleCurve.time(spark, q, mid)
        println(f"[scale125] $q%-24s 25x=$t25%8.2fs rows=$n25%d")
        val (_, t125, n125) = ScaleCurve.time(spark, q, big)
        println(f"[scale125] $q%-24s 125x=$t125%8.2fs rows=$n125%d " +
          f"r125=${t125 / t1}%7.2f")
        Some(Row(q, t1, t25, t125, n1, n25, n125))
      } catch {
        case e: Throwable =>
          println(s"[scale125] $q FAILED on synthesized data: " +
            e.getMessage.linesIterator.next())
          None
      }
    }

    val log5 = math.log(5.0)
    val md = new StringBuilder
    if (args.isEmpty) {
      md.append("# Bench scale curve — 125× synthesized data (round 12)\n\n")
      md.append("The third octave of the 5×/25× curves — 125 shifted copies of sf0.1,\n")
      md.append("PAST the brief's 100× bar — for the rows where the 25× adjudication\n")
      md.append("carries weight: the two round-12 named fixes (g13's wide-start AQE\n")
      md.append("shuffle knob, v14's corpus-proportioned IVF index), the iterative\n")
      md.append("graph family, and the banded-dedup family. t21/t24 are excluded on\n")
      md.append("cost, not doubt: their dup-saturated true workload grows\n")
      md.append("super-linearly by construction (~2.5B output pairs for t24 at 125×)\n")
      md.append("and their time÷rows arms are conclusive at 25× (0.07 / 0.11).\n\n")
      md.append("Times at local[32], warm = best-of-2 after the build+first run at\n")
      md.append("each scale. **Bars**: PASS = warm 125× ratio ≤ ~150 (linear plus the\n")
      md.append("same 1.2× headroom the 5×/25× bars used) OR time÷rows ≤ ~2.\n")
      md.append("**Bend** compares the mean per-quintupling exponent of the first two\n")
      md.append("octaves e_a = log₅(t₂₅/t₀.₁)/2 with the third octave's\n")
      md.append("e_b = log₅(t₁₂₅/t₂₅); `flat` when e_b ≤ e_a + 0.15.\n\n")
      md.append("| query | sf0.1 warm (s) | 25× warm (s) | 125× warm (s) | r25 | r125 ")
      md.append("| rows 0.1→125× | rows × | time÷rows | e_a | e_b | bend | verdict |\n")
      md.append("|---|---|---|---|---|---|---|---|---|---|---|---|---|\n")
    }
    rows.foreach { r =>
      val r25 = r.t25 / r.t1; val r125 = r.t125 / r.t1
      val rowsX = if (r.n1 > 0) r.n125.toDouble / r.n1 else Double.NaN
      val tpr = r125 / rowsX
      val ea = math.log(r25) / log5 / 2.0
      val eb = math.log(r.t125 / r.t25) / log5
      val bend = if (eb <= ea + 0.15) "flat" else "UP"
      val pass = r125 <= 150.0 || tpr <= 2.0
      md.append(f"| ${r.q} | ${r.t1}%.2f | ${r.t25}%.2f | ${r.t125}%.2f " +
        f"| $r25%.2f | $r125%.2f | ${r.n1}%d→${r.n125}%d | $rowsX%.1f " +
        f"| $tpr%.2f | $ea%.2f | $eb%.2f | $bend " +
        s"| ${if (pass) "PASS" else "FAIL"} |\n")
    }
    val path = java.nio.file.Paths.get("audits/bench_scale_curve_125x.md")
    if (args.isEmpty) java.nio.file.Files.writeString(path, md.toString)
    else java.nio.file.Files.writeString(path, md.toString,
      java.nio.file.StandardOpenOption.APPEND, java.nio.file.StandardOpenOption.CREATE)
    println("[scale125] wrote audits/bench_scale_curve_125x.md")
    spark.stop()
  }
}
