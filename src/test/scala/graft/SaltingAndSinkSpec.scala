package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Salting
import graft.sources.SnapshotSink

/** Salted aggregation equivalence + snapshot-overwrite sink protocol. */
class SaltingAndSinkSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("salted sum/count equals the direct groupBy on a skewed column") {
    val li = Tables.lineitem(spark, dir)
    val direct = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("total"))
    val salted = Salting.saltedSumCount(li, Seq("l_returnflag"), col("l_quantity"), 16)
    // Counts are exact; double sums may differ in the last bits from the
    // different combine tree — compare counts exactly, sums to 1e-6.
    val j = direct.toDF("k", "n1", "s1").join(salted.toDF("k", "n2", "s2"), "k")
    assert(j.filter(col("n1") =!= col("n2")).count() === 0)
    assert(j.filter(abs(col("s1") - col("s2")) > 1e-6).count() === 0)
    assert(direct.count() === salted.count())
  }

  test("snapshot overwrite publishes atomically via symlink swap and retires old versions") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_snap_").toString + "/table"
    SnapshotSink.overwrite(Seq((1, "a"), (2, "b")).toDF("id", "v"), path)
    assert(spark.read.parquet(path).count() === 2)
    assert(Files.isSymbolicLink(java.nio.file.Paths.get(path)))
    SnapshotSink.overwrite(Seq((3, "c")).toDF("id", "v"), path)
    val back = spark.read.parquet(path).as[(Int, String)].collect().toSeq
    assert(back === Seq((3, "c")))
    // exactly one live version dir + the symlink remain (old version retired)
    val parent = java.nio.file.Paths.get(path).getParent
    val entries = Files.list(parent).map(_.getFileName.toString).toArray.map(_.toString).sorted
    assert(entries.count(_.startsWith("table.v-")) === 1, entries.mkString(","))
    assert(entries.count(_ == "table") === 1)
    assert(entries.count(_.contains(".lnk-")) === 0)
  }

  test("snapshot overwrite refuses a target it does not manage") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_snap2_")
    val plainDir = dir.resolve("existing")
    Files.createDirectory(plainDir)
    intercept[IllegalArgumentException] {
      SnapshotSink.overwrite(Seq((1, "a")).toDF("id", "v"), plainDir.toString)
    }
  }

  test("versioned publish retains history: live symlink tracks latest, as-of reads serve any version") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sink_ver_")
    graft.sources.ArtifactStore.registerExitCleanup(base.toString)
    val path = base.resolve("tbl").toString
    assert(SnapshotSink.latestVersion(path).isEmpty)
    val vs = (1 to 3).map { i =>
      SnapshotSink.overwriteVersioned(
        Seq.tabulate(i * 10)(n => (n.toLong, s"v$i")).toDF("id", "tag"), path)
    }
    assert(vs == Seq(1, 2, 3))
    assert(SnapshotSink.latestVersion(path).contains(3))
    // Live path = latest version, via the swapped symlink.
    assert(spark.read.parquet(path).count() == 30L)
    assert(java.nio.file.Files.isSymbolicLink(java.nio.file.Paths.get(path)))
    // Time travel: every historical version still readable, content intact.
    (1 to 3).foreach { i =>
      val v = SnapshotSink.readVersion(spark, path, i)
      assert(v.count() == i * 10L)
      assert(v.select("tag").distinct().as[String].collect().toSeq == Seq(s"v$i"))
    }
  }

  test("latestVersion skips stray non-v<int> entries in the .versions dir") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sink_stray_")
    graft.sources.ArtifactStore.registerExitCleanup(base.toString)
    val path = base.resolve("tbl").toString
    SnapshotSink.overwriteVersioned(Seq((1, "a")).toDF("id", "v"), path)
    // Editor droppings / temp dirs must not blow up version discovery.
    Files.createDirectory(java.nio.file.Paths.get(path + ".versions/vtmp"))
    Files.createDirectory(java.nio.file.Paths.get(path + ".versions/junk"))
    assert(SnapshotSink.latestVersion(path).contains(1))
    assert(SnapshotSink.overwriteVersioned(Seq((2, "b")).toDF("id", "v"), path) == 2)
  }

  test("s19 recovery: a partial (v1-only) history is wiped and rebuilt, not topped up") {
    val dir = "/root/testdata/sf0.001"
    val base = Files.createTempDirectory("graft_s19_rec_")
    graft.sources.ArtifactStore.registerExitCleanup(base.toString)
    val path = base.resolve("orders_snap").toString
    // Simulate a crash after the FIRST publish: only the filtered
    // snapshot landed. Naive "publish until 2" would then compare
    // filtered-vs-filtered forever (delta all zero).
    SnapshotSink.overwriteVersioned(
      Tables.orders(spark, dir)
        .filter(org.apache.spark.sql.functions.col("o_orderdate") < "1995-01-01"),
      path)
    assert(SnapshotSink.latestVersion(path).contains(1))
    graft.queries.Etl.ensureTimeTravelVersions(spark, dir, path)
    assert(SnapshotSink.latestVersion(path).contains(2))
    val n1 = SnapshotSink.readVersion(spark, path, 1).count()
    val n2 = SnapshotSink.readVersion(spark, path, 2).count()
    assert(n2 == Tables.orders(spark, dir).count(), "v2 must be the FULL table")
    assert(n1 < n2, "v1 must remain the filtered snapshot")
    // Idempotent once healthy: no further publishes.
    graft.queries.Etl.ensureTimeTravelVersions(spark, dir, path)
    assert(SnapshotSink.latestVersion(path).contains(2))
  }

  test("s20 recovery: crash between agg stage and manifest commit never double-counts") {
    import graft.queries.Etl
    val dir = "/root/testdata/sf0.001"
    val base = Files.createTempDirectory("graft_s20_rec_").toString
    graft.sources.ArtifactStore.registerExitCleanup(base)
    val o = Tables.orders(spark, dir)
    def land(i: Int): Unit =
      o.filter(org.apache.spark.sql.functions.col("o_orderkey") % 3 === i)
        .write.mode("overwrite").parquet(Etl.ingestSlicePath(base, i))
    land(0); land(1); land(2)
    Etl.ingestSlices(spark, base, Seq(0, 1))
    // CRASH WINDOW: slice 2's fold is staged as a new agg version but the
    // manifest publish never happens — the orphan version must be ignored.
    Etl.ingestSlices(spark, base, Seq(0, 1, 2), crashBeforeCommit = true)
    val (doneAfterCrash, verAfterCrash) = Etl.ingestCommitted(spark, base)
    assert(doneAfterCrash.size == 2, "crashed fold must not be committed")
    // Recovery run re-folds slice 2 against the last COMMITTED version.
    Etl.ingestSlices(spark, base, Seq(0, 1, 2))
    val (done, ver) = Etl.ingestCommitted(spark, base)
    assert(done.size == 3)
    assert(ver.get > verAfterCrash.get)
    val got = SnapshotSink.readVersion(spark, s"$base/agg", ver.get)
      .select("o_orderstatus", "n_partial")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = o.groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, "counts after crash recovery must equal full recompute")
  }
}
