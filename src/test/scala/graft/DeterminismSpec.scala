package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partitioning-independence: an oracle-gated query must return identical
  * rows (values AND order) whether the shuffle fans out over 3 or 16
  * partitions — any dependence on partition count (unstable tiebreaks,
  * order-sensitive double sums in compared output, nondeterministic
  * picks) shows up here before it shows up as a flaky driver hash.
  */
class DeterminismSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private val tricky = Seq(
    "a4_pricing_summary",   // decimal-framed double aggregation
    "o4_limit_offset",      // top-k + window pagination
    "w4_topk_per_group",    // ranked groups
    "t4_minhash_neardup",   // multi-stage LSH pipeline
    "t8_rolling_fingerprint",
    "v1_knn_brute",         // rounded-cosine ranking
    "g6_pagerank",          // iterative fixed-point
    "g6_labelprop",
    "st2_session_window",
    "e1_ingest_pages",
    "a1_salted_degree",     // salted two-phase agg
    "g6_components_converged", // convergence loop (round count must not depend on partitioning)
    "v6_cosine_neardup",    // capped-bucket self-join
    "st3_late_drop",        // per-key watermark arithmetic
    "e2_network_nodes",     // serving payload rows (md5 coords, union ordering)
    "e3_corpus_pipeline",   // 4-stage composition (filter→dedup→split→pack)
    "v7_ivf_multiprobe",    // 2-list probe union ranking
    "st4_sessionization",   // lag+cumsum session ids, watermark flag
    "g6_components_star",   // star-contraction loop + fingerprint convergence
    "v8_ann_recall",        // recall join of two deterministic top-5 sets
    "t13_neardup_clusters", // LSH pairs → star components → census
    "t14_mixture_balance",  // integer-hash keep decision per doc
    "w6_cohort_retention",  // week bucketing + cohort-keyed joins
    // Round-6 persisted-artifact paths: ArtifactStore keys include the
    // shuffle conf, so the 3- and 16-partition runs BUILD separate
    // bucketed tables / snapshots — the invariance below proves the
    // artifact content itself is partition-independent.
    "g4_common_neighbors",    // p-bucketed links + capped pair emission
    "g6_pagerank_converged",  // directed-graph artifact + 3-round settle under both confs
    "v5_ivf_topk",            // lid-partitioned IVF snapshot + DPP read
    "t15_incremental_dedup",  // standing-corpus snapshots (fp/bands/shingles)
    "mm2_type_summary",       // media lake with pruned binary scan
    "st2_stream_roundtrip",   // real-stream rerun: checkpoint idempotence → identical landed data
    "s10_zorder_scan",        // z-ordered snapshot scan (result must be layout-invariant)
    "g9_sssp",                // iterative Bellman-Ford relaxation loop
    "v10_semantic_dedup",     // persisted-IVF cluster self-join census
    "s13_incr_agg",           // persisted partial-state merge (decimal monoid)
    "s11_scd2",               // double window chain (per-day collapse + lead)
    "a9_group_sample",        // TopKPerKey hash-ordered per-group pick
    "g10_personalized_pagerank", // seeded iterative fixed-point
    "s14_compacted_scan",     // compacted-snapshot scan (layout-invariant result)
    "st10_stream_topk",       // real-stream windowed agg + publish-time ranking
    "t20_rarity",             // integer-idf mean, rarity-ranked cut
    "e4_embedding_pipeline",  // IVF assign → dedup → decimal-exact census
    "w9_attribution",         // ignoreNulls last_value frame + decimal rollup
    "st11_stream_alerts",     // stateless alert stream vs published profile
    // Round-8 (this session):
    "t31_bloom_contamination", // bloom partial sketches bit-OR merge — order-free
    "v13_pq_rescore",         // PQ codebook train (decimal means) + argmin codes
    "w11_activity_islands",   // collect_set → sorted fold (set order must not leak)
    "w10_gapfill",            // spine explode + LOCF window
    "s18_cdc_apply",          // max(struct) sort-agg resolution
    "t30_bpe_pairs",          // vocab-multiplicity pair census + top-100 cut
    "g15_random_walks",       // md5-seeded neighbor picks over sorted adjacency
    "e7_curation_lineage",    // fate CASE over 3 composed stages + left joins
    "w12_ema",                // collect_list order must not leak into the fold
    "w13_sliding_distinct",   // explode fan-out + distinct agg
    "o6_topk_with_ties",      // rank group-limit across partition counts
    "s19_time_travel",        // versioned publish + as-of read
    "st13_stream_sliding_active", // chained stateful aggs, checkpoint replay per conf
    "w14_pattern_match",      // collect_list order into the symbol string
    "s20_incremental_ingest", // manifest-gated multi-run fold
    "a11_weighted_median",    // tie-collapse + cum-sum crossing
    "t33_vocab_drift")        // decimal TVD numerator fold

  for (name <- tricky) {
    test(s"$name is invariant under shuffle-partition count") {
      val conf = "spark.sql.shuffle.partitions"
      val prior = spark.conf.get(conf)
      try {
        spark.conf.set(conf, "3")
        val a = SparkEntry.queries(name)(spark, dir).collect().toSeq
        spark.conf.set(conf, "16")
        val b = SparkEntry.queries(name)(spark, dir).collect().toSeq
        assert(a === b)
      } finally spark.conf.set(conf, prior)
    }
  }
}
