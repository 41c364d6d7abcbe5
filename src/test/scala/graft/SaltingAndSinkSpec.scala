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
}
