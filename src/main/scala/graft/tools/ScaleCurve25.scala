package graft.tools

import graft.GraftSession

/** BENCH-ONLY 25× scale-curve probe (VERDICT r11 ask #1): the 5× curve in
  * `bench_scale_curve.md` is green, but the brief's bar is 100×
  * survivability and a few rows sit near the warm-arm ceiling with flat
  * output. This tool measures the ~10 highest-ratio operators at sf0.1,
  * 5× AND 25× (same synthesis as [[ScaleCurve]], 25 shifted copies), so
  * the curve's local SLOPE between 5× and 25× — not just one ratio — is
  * on the record: a sub-quadratic operator's per-octave scaling exponent
  * must hold or fall as data grows; an exponent that RISES between the
  * 5× and 25× octaves means the cost curve is bending up and names the
  * next fix. Writes `audits/bench_scale_curve_25x.md`. Not part of the
  * engine.
  *
  * Pass bar, scaled from the 5× table's two arms: warm 25×-ratio ≤ ~30
  * (≈ 1.2× linear headroom, same allowance the 5× bar gives), OR
  * time÷rows ≤ ~2 for operators whose TRUE workload (measured output
  * rows) legitimately grows super-linearly on this dup-saturated
  * synthesis. The bend verdict compares per-octave exponents
  * log₅(t₅/t₁) vs log₅(t₂₅/t₅) with a 0.15 grace band for host noise.
  */
object ScaleCurve25 {

  // The rows VERDICT r11 names: near the warm-arm ceiling with flat
  // output (g4, g13_hll, t21) plus the iterative/banded family whose
  // worst cases are super-linear (t24, v3, g9, g6_pagerank, t11, t13,
  // v13).
  private val Queries = Seq(
    "g4_common_neighbors", "g13_neighborhood_hll", "t21_tiered_verify",
    "t24_simhash_band", "v3_nn_graph", "g9_sssp", "g6_pagerank",
    "t11_contamination", "t13_neardup_clusters", "v13_pq_rescore")

  def main(args: Array[String]): Unit = {
    // args select a subset (incremental reruns append to the existing
    // table rather than regenerating all ten rows); no args = full list.
    val selected = if (args.nonEmpty) args.toSeq else Queries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus, "graft-scale-curve-25x")
    // Same sf0.1-base resolution as ScaleCurve/HyperBallKnob (ADVICE r11).
    val dataBase = sys.env.get("SPARK_GRAFT_DATA_DIR")
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR").map(d =>
        new java.io.File(d).getAbsoluteFile.getParent))
      .getOrElse("/root/testdata")
    val base = s"$dataBase/sf0.1"
    require(new java.io.File(base).isDirectory,
      s"ScaleCurve25: resolved sf0.1 base $base does not exist " +
        "(set SPARK_GRAFT_DATA_DIR to the directory holding the sf* dirs)")
    val tmp = System.getProperty("java.io.tmpdir")
    val mid = s"$tmp/graft_sf05"
    val big = s"$tmp/graft_sf25"
    // The synthesized dirs are deterministic functions of (base, copies) —
    // reuse them across incremental invocations instead of re-writing
    // ~400 MB of parquet per run. `events.parquet` is the LAST table
    // synthesize writes, so its presence marks a complete prior run.
    def ensure(dst: String, copies: Int): Unit =
      if (new java.io.File(s"$dst/events.parquet").isDirectory)
        println(s"[scale25] reusing existing ${copies}x dataset at $dst")
      else {
        println(s"[scale25] synthesizing ${copies}x dataset...")
        ScaleCurve.synthesize(spark, base, dst, copies)
      }
    ensure(mid, 5)
    ensure(big, 25)

    final case class Row(q: String, t1: Double, t5: Double, t25: Double,
        n1: Long, n5: Long, n25: Long)
    val rows = selected.flatMap { q =>
      try {
        val (_, t1, n1) = ScaleCurve.time(spark, q, base)
        val (_, t5, n5) = ScaleCurve.time(spark, q, mid)
        val (_, t25, n25) = ScaleCurve.time(spark, q, big)
        println(f"[scale25] $q%-24s sf0.1=$t1%7.2fs 5x=$t5%7.2fs 25x=$t25%8.2fs " +
          f"r5=${t5 / t1}%5.2f r25=${t25 / t1}%6.2f rows $n1%d -> $n5%d -> $n25%d")
        Some(Row(q, t1, t5, t25, n1, n5, n25))
      } catch {
        case e: Throwable =>
          println(s"[scale25] $q FAILED on synthesized data: " +
            e.getMessage.linesIterator.next())
          None
      }
    }

    val log5 = math.log(5.0)
    val md = new StringBuilder
    if (args.isEmpty) {
      md.append("# Bench scale curve — 25× synthesized data (round 12)\n\n")
      md.append("Same synthesis as `bench_scale_curve.md` (shifted-key copies, ")
      md.append("document copies\ncarry a one-token suffix) at 5 AND 25 copies; ")
      md.append("times at local[32], warm =\nbest-of-2 after the build+first run ")
      md.append("at each scale (one-time artifact builds\nexcluded). The ten rows ")
      md.append("are VERDICT r11's pick: the operators nearest the\n5× warm-arm ")
      md.append("ceiling plus the iterative/banded family.\n\n")
      md.append("**Bars.** PASS = warm 25× ratio ≤ ~30 (linear 25× plus the same ")
      md.append("1.2×\nheadroom the 5× bar used) OR time÷rows ≤ ~2 (output-growth ")
      md.append("arm, for\noperators whose measured workload grows super-linearly ")
      md.append("by construction).\n**Bend** compares per-octave scaling exponents ")
      md.append("e₁ = log₅(warm₅/warm₁) and\ne₂ = log₅(warm₂₅/warm₅): `flat` when ")
      md.append("e₂ ≤ e₁ + 0.15 (the curve is not\nbending up between the ")
      md.append("octaves; 0.15 ≈ the ±0.3 s host-noise band at\nthese ")
      md.append("magnitudes), `UP` otherwise.\n\n")
      md.append("| query | sf0.1 warm (s) | 5× warm (s) | 25× warm (s) | r5 | r25 ")
      md.append("| rows 0.1→25× | rows × | time÷rows | e₁ | e₂ | bend | verdict |\n")
      md.append("|---|---|---|---|---|---|---|---|---|---|---|---|---|\n")
    }
    rows.foreach { r =>
      val r5 = r.t5 / r.t1; val r25 = r.t25 / r.t1
      val rowsX = if (r.n1 > 0) r.n25.toDouble / r.n1 else Double.NaN
      val tpr = r25 / rowsX
      val e1 = math.log(r5) / log5
      val e2 = math.log(r.t25 / r.t5) / log5
      val bend = if (e2 <= e1 + 0.15) "flat" else "UP"
      val pass = r25 <= 30.0 || tpr <= 2.0
      md.append(f"| ${r.q} | ${r.t1}%.2f | ${r.t5}%.2f | ${r.t25}%.2f " +
        f"| $r5%.2f | $r25%.2f | ${r.n1}%d→${r.n25}%d | $rowsX%.1f " +
        f"| $tpr%.2f | $e1%.2f | $e2%.2f | $bend " +
        s"| ${if (pass) "PASS" else "FAIL"} |\n")
    }
    val path = java.nio.file.Paths.get("audits/bench_scale_curve_25x.md")
    if (args.isEmpty) java.nio.file.Files.writeString(path, md.toString)
    else java.nio.file.Files.writeString(path, md.toString,
      java.nio.file.StandardOpenOption.APPEND, java.nio.file.StandardOpenOption.CREATE)
    println("[scale25] wrote audits/bench_scale_curve_25x.md")
    spark.stop()
  }
}
