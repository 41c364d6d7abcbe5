package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Dev tool: dump `explain("formatted")` for selected queries so scan
  * pushdown (`PushedFilters`, pruned `ReadSchema`), broadcast choices, and
  * whole-stage-codegen spans can be audited (SURVEY.md §5: "t2 should
  * explain key queries"). Writes one text file per query.
  *
  * Usage: runMain graft.tools.ExplainAudit <sfDir> <outDir> [q1 q2 ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir  = args(0)
    val outDir = args(1)
    val names  = if (args.length > 2) args.drop(2).toSeq
                 else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-explain")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$n.txt"), plan)
        } catch {
          case e: Throwable =>
            Files.writeString(Paths.get(s"$outDir/$n.txt"), s"ERROR: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
