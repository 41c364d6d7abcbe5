package graft.tools

import graft.GraftSession
import graft.operators.LinkGraph
import graft.queries.Graph

/** BENCH-ONLY g16 tail-decay adjudication at 25× (VERDICT r13 ask #5):
  * g16 is the only run-to-convergence operator and the bench's most
  * expensive query; its defense at scale is the systolic delta
  * propagation turning tail rounds from |E|-joins into
  * |changed-frontier|-joins. The `n_changed` column hyperBallDiameter now
  * emits makes that decay a MEASURED number: this tool runs the g16 graph
  * at sf0.1 and on the 25× synthesized dataset (reusing ScaleCurve25's
  * dirs) and writes the per-round (h, est_pairs, n_changed) censuses plus
  * the frontier-decay ratios to `audits/g16_tail_decay.md`. Not part of
  * the engine.
  */
object G16Tail25 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus, "graft-g16-tail")
    val dataBase = sys.env.get("SPARK_GRAFT_DATA_DIR").getOrElse("/root/testdata")
    val base = s"$dataBase/sf0.1"
    val big = s"${System.getProperty("java.io.tmpdir")}/graft_sf25"
    require(new java.io.File(s"$big/events.parquet").isDirectory,
      "run graft.tools.ScaleCurve25 first (it synthesizes the 25x dataset)")

    val md = new StringBuilder
    md.append("# g16 effective-diameter: systolic frontier decay, sf0.1 vs 25×\n\n")
    md.append("Per-round census from `hyperBallDiameter(lgK=8, maxRounds=32)` over the\n")
    md.append("g16 graph (maintained symmetrized link table). `n_changed` is the round's\n")
    md.append("systolic frontier — the number of sketches that changed — i.e. the size of\n")
    md.append("the contribution join's build side; `frontier/|V|` shows the decay the\n")
    md.append("delta propagation banks. The 25× synthesis is 25 shifted copies, so the\n")
    md.append("horizon (round count) must NOT grow — only the per-round width may.\n\n")
    for ((label, dir) <- Seq("sf0.1" -> base, "25x" -> big)) {
      val t0 = System.nanoTime()
      val rows = new LinkGraph(Graph.symEdgesTable(spark, dir))
        .hyperBallDiameter(lgK = 8, maxRounds = 32)
        .orderBy("h").collect()
      val secs = (System.nanoTime() - t0) / 1e9
      val nV = rows.head.getAs[Long]("n_changed")
      md.append(s"## $label  (wall ${f"$secs%.1f"} s, horizon h=${rows.last.getAs[Int]("h")})\n\n")
      md.append("| h | est_pairs | n_changed | frontier/|V| |\n|---|---|---|---|\n")
      rows.foreach { r =>
        val c = r.getAs[Long]("n_changed")
        md.append(f"| ${r.getAs[Int]("h")} | ${r.getAs[Long]("est_pairs")} | $c | ${c.toDouble / nV}%.4f |\n")
      }
      md.append("\n")
      println(s"[g16tail] $label horizon=${rows.last.getAs[Int]("h")} " +
        f"wall=$secs%.1f s tail_frontier=${rows.last.getAs[Long]("n_changed")}")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("audits/g16_tail_decay.md"), md.toString)
    println("[g16tail] wrote audits/g16_tail_decay.md")
    spark.stop()
  }
}
