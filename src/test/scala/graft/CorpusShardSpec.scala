package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** The corpus pipeline's WRITE path, proven: training shards land
  * partitioned by (lang, split) — the layout a trainer's data loader
  * reads — and a single-split read prunes every other partition at the
  * scan (PartitionFilters), so "give me lang=en train" never touches val/
  * test or other languages regardless of corpus size.
  */
class CorpusShardSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** The e3_corpus_pipeline doc-level stages (quality filter → exact dedup
    * → deterministic split), reproduced from the same building blocks.
    */
  private def preparedDocs = {
    val deduped = Tables.documents(spark, dir)
      .filter(TextFunctions.qualityScore(col("text")) >= 0.5)
      .withColumn("fp", TextFunctions.fingerprint(col("text")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    deduped.withColumn("split",
      when(h < 80, "train").when(h < 90, "val").otherwise("test"))
      .select("doc_id", "lang", "split", "text")
  }

  test("shards write partitioned by (lang, split); a split read prunes to its partitions") {
    val path = Files.createTempDirectory("graft_shards_").toString + "/docs"
    preparedDocs.write.mode("overwrite").partitionBy("lang", "split").parquet(path)

    val train = spark.read.parquet(path)
      .filter(col("lang") === "en" && col("split") === "train")
    val plan = train.queryExecution.explainString(FormattedMode)
    assert(plan.contains("PartitionFilters") && plan.contains("lang") &&
      plan.contains("split"), plan.take(2000))

    val scanned: Seq[Int] = train.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned.sum === 1, s"expected 1 selected (lang,split) partition, got ${scanned.sum}")

    // Read-back equals the in-memory derivation, split by split.
    val back = spark.read.parquet(path).groupBy("lang", "split").count()
    val expect = preparedDocs.groupBy("lang", "split").count()
    assert(back.exceptAll(expect).isEmpty && expect.exceptAll(back).isEmpty)
  }
}
