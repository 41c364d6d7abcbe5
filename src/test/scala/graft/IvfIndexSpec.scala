package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.operators.IvfIndex

/** The persisted-IVF scale claim, proven: writing the inverted file
  * partitioned by list id turns "search list L" into "read partition L" —
  * the scan's PartitionFilters prune every other list before any I/O, so
  * search cost is nprobe/nlists of the corpus regardless of corpus size.
  */
class IvfIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def corpus = Tables.embeddings(spark, dir)
    .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    .withColumn("nrm", sqrt(dotNative(col("emb"), col("emb"))))

  private lazy val model = IvfIndex.build(corpus, nLists = 8)

  test("build partitions the corpus: every vector in exactly one list, all lists used") {
    val lists = model.lists.cache()
    assert(lists.count() === corpus.count())
    assert(lists.select("vec_id").distinct().count() === corpus.count())
    val usedLists = lists.select("lid").distinct().count()
    assert(usedLists >= 2 && usedLists <= 8, s"lists used: $usedLists")
    assert(model.centers.count() === 8)
  }

  test("persisted lists prune to the probed partition (PartitionFilters, not post-scan filter)") {
    val path = Files.createTempDirectory("graft_ivf_").toString + "/lists"
    IvfIndex.persist(model, path)

    val probe = IvfIndex.loadLists(spark, path).filter(col("lid") === 3)
    val plan = probe.queryExecution.explainString(FormattedMode)
    assert(plan.contains("PartitionFilters") && plan.contains("lid"),
      "lid filter must reach the scan as a partition filter:\n" + plan.take(2000))
    // The pruned read returns exactly the in-memory list-3 rows.
    val expect = model.lists.filter(col("lid") === 3).select("vec_id")
    assert(probe.select("vec_id").exceptAll(expect).isEmpty &&
      expect.exceptAll(probe.select("vec_id")).isEmpty)
    // And the scan reads ONLY that partition's files.
    val scanned: Seq[Int] = probe.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned.sum === 1, s"expected 1 selected partition, got ${scanned.sum}")
  }

  test("search over the persisted index equals search over the in-memory lists") {
    val path = Files.createTempDirectory("graft_ivf_s_").toString + "/lists"
    IvfIndex.persist(model, path)
    val probes = corpus.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("emb").as("qe"), col("nrm").as("qnrm"))

    def rows(lists: org.apache.spark.sql.DataFrame) =
      IvfIndex.search(lists, model.centers, probes, k = 5, nprobe = 2)
        .select("qid", "vec_id", "cos_sim", "rn")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSeq.sorted
    val inMem = rows(model.lists)
    val onDisk = rows(IvfIndex.loadLists(spark, path)
      .select("vec_id", "lid", "emb", "nrm"))
    assert(inMem.nonEmpty && inMem === onDisk)
  }
}
