package graft.tools

import graft.GraftSession
import graft.queries.TextDedup
import org.apache.spark.sql.functions._

/** Dev probe (round 12): stage-level timing of the t13 pipeline on the
  * synthesized 25x/125x datasets to locate the 125x wall-clock bend.
  * Usage: runMain graft.tools.T13Probe <dir>
  */
object T13Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-t13probe")
    spark.range(1000000L).selectExpr("sum(id % 7)").collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[t13probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val (sh, capped, _) = t("lsh3 build (sh+capped+sets)") { TextDedup.probeLsh3(spark, dir) }
    t("shingle rows")(println(s"  sh rows = ${sh.count()}"))
    t("capped rows")(println(s"  capped rows = ${capped.count()}"))
    val cand = TextDedup.probeCandidatePairs(capped)
    t("candidatePairs count")(println(s"  cand = ${cand.count()}"))
    val candCk = cand.localCheckpoint()
    val pairs = TextDedup.probeJaccard(candCk, sh, 0.5)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    t("jaccard verify count")(println(s"  pairs = ${pairs.count()}"))
    val pairsCk = pairs.localCheckpoint()
    t("star CC + census") {
      val (labels, rounds) = new graft.operators.LinkGraph(pairsCk).connectedComponentsStar()
      val n = labels.groupBy(col("lbl")).agg(count(lit(1))).count()
      println(s"  clusters = $n (rounds=$rounds)")
    }
    spark.stop()
  }
}
