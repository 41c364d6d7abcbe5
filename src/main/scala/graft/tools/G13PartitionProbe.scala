package graft.tools

import graft.{GraftSession, SparkEntry}

/** BENCH-ONLY probe (round 12): the 25× curve flagged
  * `g13_neighborhood_hll` with a rising per-octave exponent (e₁ 0.72 →
  * e₂ 1.18). Hypothesis: not the algorithm (one edge join + one
  * sketch-union HashAggregate per round — linear in edges) but aggregate
  * STATE pressure: at 25× the per-round groupBy packs 25× more ~1KB HLL
  * sketches into the same `spark.sql.shuffle.partitions = 32` reducers,
  * so per-partition hash-agg state grows 25× and spills. On a real
  * cluster the fix is the standard AQE knob —
  * `spark.sql.adaptive.coalescePartitions.initialPartitionNum` high, let
  * AQE coalesce SMALL shuffles back down — which local[32] mirrors
  * exactly. This probe measures g13 warm time at 25× under (a) baseline
  * 32, (b) initialPartitionNum 256, (c) static shuffle.partitions 256,
  * and writes `audits/g13_partition_probe.md`. Not part of the engine.
  */
object G13PartitionProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus, "graft-g13-partition-probe")
    val dataBase = sys.env.get("SPARK_GRAFT_DATA_DIR")
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR").map(d =>
        new java.io.File(d).getAbsoluteFile.getParent))
      .getOrElse("/root/testdata")
    val base = s"$dataBase/sf0.1"
    require(new java.io.File(base).isDirectory,
      s"G13PartitionProbe: resolved sf0.1 base $base does not exist")
    val tmp = System.getProperty("java.io.tmpdir")
    val big = s"$tmp/graft_sf25"
    if (!new java.io.File(s"$big/documents.parquet").isDirectory) {
      println("[g13probe] synthesizing 25x dataset...")
      ScaleCurve.synthesize(spark, base, big, copies = 25)
    }

    def timeOnce(dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries("g13_neighborhood_hll")(spark, dir).write
        .mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def warm(dir: String): (Double, Double) = {
      val cold = timeOnce(dir)
      (cold, math.min(timeOnce(dir), timeOnce(dir)))
    }

    val configs = Seq(
      ("baseline-32", () => {
        spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "32")
        spark.conf.set("spark.sql.shuffle.partitions", "32")
      }),
      ("aqe-init-256", () => {
        spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
        spark.conf.set("spark.sql.shuffle.partitions", "32")
      }),
      ("static-256", () => {
        spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
        spark.conf.set("spark.sql.shuffle.partitions", "256")
      }))

    val rows = configs.map { case (name, set) =>
      set()
      val (cold, w) = warm(big)
      println(f"[g13probe] $name%-14s cold=$cold%7.2fs warm=$w%7.2fs")
      (name, cold, w)
    }
    // sf0.1 sanity leg under the winning config vs baseline: the knob must
    // not tax the small scale (AQE should coalesce it right back).
    spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "32")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    val (c0, w0) = warm(base)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
    val (c1, w1) = warm(base)
    println(f"[g13probe] sf0.1 baseline warm=$w0%6.2fs aqe-init-256 warm=$w1%6.2fs")

    val md = new StringBuilder
    md ++= "# g13 partition-pressure probe (round 12)\n\n"
    md ++= "Measures `g13_neighborhood_hll` at 25× synthesized data under three\n"
    md ++= "shuffle-partition configs (same synthesis as `bench_scale_curve_25x.md`,\n"
    md ++= "warm = best-of-2 after a cold run). Hypothesis under test: the 25× UP\n"
    md ++= "bend is per-reducer hash-agg state pressure (25× more ~1KB sketches\n"
    md ++= "into 32 reducers), fixed by the standard AQE knob\n"
    md ++= "`coalescePartitions.initialPartitionNum`, not by an algorithm change.\n\n"
    md ++= "| config | cold (s) | warm (s) |\n|---|---|---|\n"
    rows.foreach { case (n, c, w) => md ++= f"| $n | $c%.2f | $w%.2f |\n" }
    md ++= f"\nsf0.1 sanity: baseline warm $w0%.2f s vs aqe-init-256 warm $w1%.2f s\n"
    md ++= "(the knob must not tax the gate scale — AQE coalesces it back).\n"
    // Files.writeString writes UTF-8 regardless of platform charset
    // (PrintWriter mangled the non-ASCII glyphs on a POSIX-locale host).
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("audits/g13_partition_probe.md"), md.toString)
    println("[g13probe] wrote audits/g13_partition_probe.md")
    spark.stop()
  }
}
