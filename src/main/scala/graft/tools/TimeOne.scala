package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: time one query N times in a warm session.
  * Usage: runMain graft.tools.TimeOne <sfDir> <name> [reps]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-time")
    spark.range(1000000L).selectExpr("sum(id % 7)").collect()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[timeone] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
