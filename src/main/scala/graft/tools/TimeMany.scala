package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: time a regex-selected subset of the declared queries with the
  * Bench methodology (count() action, best of 2 back-to-back runs) in ONE
  * warm JVM — fast same-session A/B for optimization work without paying a
  * full 214-query Bench per iteration.
  *
  * Usage: runMain graft.tools.TimeMany <sfDir> <nameRegex> [reps]
  */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val re = args(1).r
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-timemany")
    // Same warmup as Bench.
    try {
      spark.range(1000000L).selectExpr("sum(id % 7)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
      val a = spark.range(1000L).selectExpr("id", "id % 13 AS k", "CAST(id AS STRING) AS s")
      val b = spark.range(100L).selectExpr("id AS k2")
      a.join(b, a("k") === b("k2"))
        .selectExpr("k", "s",
          "row_number() OVER (PARTITION BY k ORDER BY id) AS rn",
          "aggregate(sequence(1, 5), 0L, (x, y) -> x + y) AS h",
          "md5(s) AS m")
        .groupBy("k").count().collect()
    } catch { case _: Throwable => () }
    val names = SparkEntry.queries.keys.toSeq.sorted.filter(n => re.findFirstIn(n).isDefined)
    var total = 0.0
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      total += runs.min
      println(f"[timemany] $name%-35s min=${runs.min}%7.3f  runs=${runs.map(t => f"$t%.3f").mkString(",")}")
    }
    println(f"[timemany] TOTAL(min-sum) ${total}%.3f s over ${names.size} queries")
    spark.stop()
  }
}
