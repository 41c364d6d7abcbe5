package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder

/** Z-order layout: bit-exact interleave vs a reference implementation, and
  * the actual file-skipping win — a (user, time) box predicate over the
  * z-clustered events layout must touch fewer files than over a
  * time-sorted layout with the same file count, and a user-only predicate
  * (where time-sorting can prune nothing) must prune hard.
  */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- reference Morton implementation (independent bit loop) ---
  private def spreadRef(x: Long): Long =
    (0 until 16).foldLeft(0L)((acc, i) => acc | (((x >> i) & 1L) << (2 * i)))
  private def zRef(a: Long, b: Long): Long = spreadRef(a) | (spreadRef(b) << 1)

  test("interleave2 matches the reference bit loop across the 16-bit domain edges") {
    val samples = (0L to 300L) ++ Seq(1000L, 4095L, 4096L, 32767L, 32768L, 65534L, 65535L)
    val df = samples.flatMap(a => Seq((a, 65535L - a), (a, a), (a, 0L)))
      .toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        ZOrder.interleave2(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z === zRef(a, b), s"($a, $b)") }
  }

  test("rank16 is order-preserving and lands in [0, 65535]") {
    val df = Seq(0L, 1L, 999L, 123456789L, 999999999L).toDF("v")
    val r = df.select(ZOrder.rank16(col("v"), lit(0L), lit(999999999L)).as("r"))
      .as[Long].collect().toSeq
    assert(r === r.sorted)
    assert(r.head === 0L && r.last === 65535L)
    assert(r.forall(x => x >= 0L && x <= 65535L))
    // Degenerate domain (hi == lo) must not divide by zero, and
    // out-of-domain values (stale stats) clamp to the rank edges.
    val edge = Seq(5L, 0L, 99L).toDF("v")
      .select(ZOrder.rank16(col("v"), lit(5L), lit(5L)).as("r0"),
        ZOrder.rank16(col("v"), lit(1L), lit(10L)).as("rc"))
      .as[(Long, Long)].collect()
    assert(edge.forall(_._1 === 0L))
    assert(edge.forall { case (_, rc) => rc >= 0L && rc <= 65535L })
  }

  // Files whose [min, max] stats rectangle intersects the predicate box —
  // exactly the files a stats-pruning reader must touch.
  private def filesTouched(layoutDir: String, uLo: Long, uHi: Long,
      tLo: String, tHi: String): (Long, Long) = {
    val stats = spark.read.parquet(layoutDir)
      .groupBy(input_file_name().as("f"))
      .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
        min("ts").as("tlo"), max("ts").as("thi"))
      .cache()
    val total = stats.count()
    val touched = stats.filter(
      col("uhi") >= uLo && col("ulo") <= uHi &&
      col("thi") >= lit(tLo).cast("timestamp") &&
      col("tlo") < lit(tHi).cast("timestamp")).count()
    stats.unpersist()
    (touched, total)
  }

  test("z-ordered layout skips files on both dimensions; time-sorted only on time") {
    val d = "/root/testdata/sf0.001"
    val e = Tables.events(spark, d)
    val st = e.agg(min(col("user_id")), max(col("user_id")),
      min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val zdir = s"${System.getProperty("java.io.tmpdir")}/zorder_spec_z_${spark.sparkContext.applicationId}"
    val tdir = s"${System.getProperty("java.io.tmpdir")}/zorder_spec_t_${spark.sparkContext.applicationId}"
    e.withColumn("zkey", ZOrder.interleave2(
        ZOrder.rank16(col("user_id"), lit(st.getLong(0)), lit(st.getLong(1))),
        ZOrder.rank16(unix_micros(col("ts")), lit(st.getLong(2)), lit(st.getLong(3)))))
      .repartitionByRange(16, col("zkey")).sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(zdir)
    e.repartitionByRange(16, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(tdir)
    // Layout dirs are per-applicationId — without this they accumulate in
    // tmpdir across test runs (same leak ArtifactStore cleanup solves).
    graft.sources.ArtifactStore.registerExitCleanup(zdir)
    graft.sources.ArtifactStore.registerExitCleanup(tdir)

    // 16 files ≈ the z-curve's top-4-bit grid: 4 user strips × 4 time
    // strips. Box predicate aligned to one grid cell — users 12..14 (the
    // top u-strip: rank ≥ 3/4 of the domain) × the second time quarter
    // ([Jan 8 12:00, Jan 16) of the 30-day span). The time-sorted layout
    // prunes the time quarter (≈4 files) but every surviving file spans
    // all users; z-order intersects ~1 cell plus quantile-boundary slop.
    val (zBox, zTotal) = filesTouched(zdir, 12, 14, "2024-01-08 12:00:00", "2024-01-16")
    val (tBox, tTotal) = filesTouched(tdir, 12, 14, "2024-01-08 12:00:00", "2024-01-16")
    assert(zTotal === 16L && tTotal === 16L)
    assert(zBox < tBox, s"z-order touched $zBox of $zTotal, time-sorted $tBox of $tTotal")

    // User-only predicate (full time range): time-sorting can skip NOTHING,
    // z-order still restricts to the u-strip's cells (~4 of 16 + slop).
    val (zU, _) = filesTouched(zdir, 12, 14, "2024-01-01", "2024-02-01")
    val (tU, _) = filesTouched(tdir, 12, 14, "2024-01-01", "2024-02-01")
    assert(tU === 16L, s"time-sorted layout unexpectedly pruned a user-only predicate ($tU)")
    assert(zU <= 8L, s"z-order should touch at most half the files for a top-quarter user band, got $zU")
  }
}
