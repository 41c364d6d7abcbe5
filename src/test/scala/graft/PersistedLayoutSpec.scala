package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-6 persisted-artifact story: the hot graph/dedup queries
  * read MAINTAINED physical layouts (ArtifactStore bucketed tables /
  * snapshot parquet), and those layouts actually deliver the plan shapes
  * they exist for — no Exchange before the key aggregations, file scans
  * instead of per-session rederivation.
  */
class PersistedLayoutSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(FormattedMode)

  /** Count Exchange NODES in a formatted plan (tree lines only — each node
    * also appears once as a "(n) Exchange" detail header).
    */
  private def exchanges(p: String): Int =
    "[+:]- Exchange".r.findAllIn(p).size

  test("g3_degrees reads the maintained p-bucketed link table with ZERO Exchange") {
    val p = plan("g3_degrees")
    assert(p.contains("Bucketed: true"), p.take(2000))
    assert(p.contains("graft_links_"), "must scan the maintained catalog table")
    assert(exchanges(p) == 0, p.take(3000))
  }

  test("g4 pipeline: bucketed scan, dedup and adjacency groupBy Exchange-free; only the pair agg shuffles") {
    val p = plan("g4_common_neighbors")
    assert(p.contains("Bucketed: true"), p.take(2000))
    assert(exchanges(p) == 1, p.take(3000))
  }

  test("symmetrized edge table: per-src degree agg and src-equi self-join are Exchange-free") {
    val e = graft.queries.Graph.symEdgesTable(spark, dir)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    assert(exchanges(deg.queryExecution.explainString(FormattedMode)) == 0)
    // The pageRank edge preparation: edges ⋈ out-degrees on src — both
    // sides derive from the same bucketed scan, so neither exchanges.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = e.join(deg.withColumnRenamed("src", "__did"),
        e("src") === col("__did"))
      assert(exchanges(joined.queryExecution.explainString(FormattedMode)) == 0)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("t15 reads the persisted standing-corpus artifacts as file scans") {
    val p = plan("t15_incremental_dedup")
    assert(p.contains("t15_corpus_fp"), "fingerprints must come from the snapshot")
    assert(p.contains("t15_corpus_bands"), "band keys must come from the snapshot")
    assert(p.contains("t15_corpus_shingles"), "shingles must come from the snapshot")
    // The corpus side must NOT be re-derived: exactly one scan of the raw
    // documents table (the incoming batch) may remain.
    assert("documents\\.parquet".r.findAllIn(p).size <= 2,
      "corpus side must read snapshots, not rescan documents: " + p.take(3000))
  }

  test("v5 reads the persisted lid-partitioned inverted file, not the Lloyd's derivation") {
    val p = plan("v5_ivf_topk")
    assert(p.contains("ivf_lists"), "lists must come from the published index")
    assert(p.contains("ivf_centers"), "centers must come from the published index")
    // The quantizer must NOT re-run inside the query: in the MAIN plan the
    // raw embeddings table appears only as the probe side. (The formatted
    // output may repeat the probe subtree under "Subqueries" — that's the
    // DPP subquery, asserted below, not a rederivation.)
    val main = p.split("===== Subqueries =====")(0)
    assert("embeddings\\.parquet".r.findAllIn(main).size <= 1,
      "corpus side must read the index, not rescan embeddings: " + main.take(3000))
    // The payoff of partitioning the inverted file by lid: Spark DYNAMIC
    // PARTITION PRUNING drives the index scan from the probe assignment —
    // only the probed lists' directories are read, which is exactly the
    // "probe reads nprobe/nlists of the corpus" contract at scale.
    assert(p.contains("dynamicpruning"),
      "lid-partitioned index scan must be dynamically pruned by the probe assignment")
  }

  test("mm2 reads the persisted media lake with the binary column PRUNED from the scan") {
    val p = plan("mm2_type_summary")
    assert(p.contains("media_lake"), "must scan the published media lake")
    // Column pruning must drop the fat payload column at the parquet scan:
    // no plan node (ReadSchema, Output, aggregate) may reference it.
    assert(!p.contains("content"), p.take(3000))
  }

  test("incoming-vs-capped-corpus banding equals full-union banding where the cap binds") {
    import spark.implicits._
    // One hot bucket; cap = 3. Corpus docs 5,7,9 and 11,13; batch 1,2,3,4.
    // In bucket A the batch evicts every corpus doc from the union cap; in
    // bucket B corpus docs survive. Ground truth caps the FULL union.
    val all = Seq(
      (1L, 0L, "A"), (2L, 0L, "A"), (3L, 0L, "A"), (4L, 0L, "A"),
      (5L, 0L, "A"), (7L, 0L, "A"), (9L, 0L, "A"),
      (2L, 1L, "B"), (11L, 1L, "B"), (13L, 1L, "B"), (15L, 1L, "B")
    ).toDF("doc_id", "band", "band_key")
    val incoming = col("doc_id") <= 4 || col("doc_id") === 2L
    def cap3(df: org.apache.spark.sql.DataFrame) =
      graft.plans.TopKPerKey(df, Seq("band", "band_key"), Seq("doc_id" -> true), 3)
    val truth = cap3(all).filter(incoming)
      .orderBy("band", "doc_id").collect().toSeq
    val corpusCapped = cap3(all).filter(!incoming)
    val viaHelper = graft.queries.TextDedup.capIncomingAgainst(
      all.filter(incoming), corpusCapped, 3, incoming)
      .orderBy("band", "doc_id").collect().toSeq
    assert(viaHelper == truth)
    // Sanity: the cap binds in bucket A (7 docs > cap).
    assert(cap3(all).filter(col("band") === 0L).count() == 3)
  }
}
