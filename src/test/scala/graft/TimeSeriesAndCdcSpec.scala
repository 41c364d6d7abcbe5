package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for the round-8 time-series and changelog
  * operators (w10 gap-fill, w11 gaps-and-islands, s18 CDC apply, t30 BPE
  * pair census) that the value-hash oracle can't articulate: density of
  * the filled spine, the islands partition property, tombstone masking,
  * and conservation of pair mass.
  */
class TimeSeriesAndCdcSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("w10 gap-fill: spine is dense per user, counts conserved, carry never null") {
    val out = queries.WindowsAndEvents.queries("w10_gapfill")(spark, sf)
      .cache()
    try {
      // Dense: per user, rows == last-first+1 days and days are distinct.
      val spans = out.groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          (datediff(max(col("day")), min(col("day"))) + 1).as("span"),
          countDistinct(col("day")).as("nd"))
      assert(spans.filter(col("n") =!= col("span") || col("n") =!= col("nd"))
        .count() == 0L, "spine has holes or duplicate days")
      // Conservation: gap-filled zeros add nothing; totals match raw.
      val filled = out.agg(sum("n_events")).head().getLong(0)
      val raw = Tables.events(spark, sf).count()
      assert(filled == raw, s"event mass changed: $filled != $raw")
      assert(out.filter(col("carried_type").isNull).count() == 0L,
        "LOCF left a null after the user's first active day")
    } finally out.unpersist()
  }

  test("w11 islands partition the active days: disjoint, consecutive, complete") {
    val out = queries.WindowsAndEvents.queries("w11_activity_islands")(spark, sf)
      .cache()
    try {
      val nDays = Tables.events(spark, sf)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct().count()
      val islandDays = out.agg(sum("n_days")).head().getLong(0)
      assert(islandDays == nDays, "islands lost or double-counted days")
      // Consecutive: island length equals its date span.
      assert(out.filter(datediff(col("island_end"), col("island_start")) + 1
        =!= col("n_days")).count() == 0L, "an island has an internal gap")
      // Disjoint with a true gap between successive islands per user.
      import org.apache.spark.sql.expressions.Window
      val gaps = out.withColumn("prev_end",
        lag(col("island_end"), 1).over(
          Window.partitionBy("user_id").orderBy("island_start")))
        .filter(col("prev_end").isNotNull &&
          datediff(col("island_start"), col("prev_end")) < 2)
      assert(gaps.count() == 0L, "adjacent islands touch — merge missed")
    } finally out.unpersist()
  }

  test("s18 CDC apply: tombstones mask, last writer wins, base untouched elsewhere") {
    val out = queries.Etl.queries("s18_cdc_apply")(spark, sf).cache()
    try {
      assert(out.filter(col("o_orderkey") % 35 === 0).count() == 0L,
        "a deleted key survived the tombstone")
      assert(out.filter(col("o_orderkey") % 21 === 0).filter(col("version") =!= 2)
        .count() == 0L, "v2 update lost to an earlier writer")
      assert(out.filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 21 =!= 0)
        .filter(col("version") =!= 1).count() == 0L, "v1 update not applied")
      val untouched = out.filter(col("o_orderkey") % 7 =!= 0)
      val base = Tables.orders(spark, sf)
        .filter(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)").as("base_price"))
      assert(untouched.join(base, "o_orderkey")
        .filter(col("price") =!= col("base_price") || col("version") =!= 0)
        .count() == 0L, "an un-logged key drifted from base")
    } finally out.unpersist()
  }

  test("e7 lineage: fates partition the corpus; 'kept' reconciles with e6") {
    val out = queries.TextDedup.queries("e7_curation_lineage")(spark, sf).cache()
    try {
      // Completeness: per-lang fate totals equal the raw corpus counts —
      // no document is unaccounted for, none double-labeled.
      val raw = Tables.documents(spark, sf).groupBy("lang").count()
      assert(out.groupBy("lang").agg(sum("n_docs").as("n"))
        .join(raw, "lang").filter(col("n") =!= col("count")).count() == 0L,
        "fates do not partition the corpus")
      // Consistency: the 'kept' row per lang is exactly e6's n_kept.
      val kept = out.filter(col("fate") === "kept")
        .select(col("lang"), col("n_docs"))
      val e6 = queries.TextDedup.queries("e6_curation_pipeline")(spark, sf)
        .select(col("lang"), col("n_kept"))
      assert(kept.join(e6, "lang")
        .filter(col("n_docs") =!= col("n_kept")).count() == 0L,
        "lineage 'kept' diverged from the e6 pipeline output")
      assert(kept.count() == e6.count())
    } finally out.unpersist()
  }

  test("t30 BPE pairs: pair mass over the vocab equals the corpus token stream's") {
    // Independent recomputation WITHOUT the vocab collapse: per-token
    // character pairs summed over the raw stream must give every top-100
    // pair the same count the vocab-multiplicity plan reports.
    val direct = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "" && length(col("word")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n_direct"))
    val out = queries.TextDedup.queries("t30_bpe_pairs")(spark, sf)
    assert(out.join(direct, "pair")
      .filter(col("n_pairs") =!= col("n_direct")).count() == 0L,
      "vocab-collapsed pair counts diverge from the direct stream census")
    assert(out.count() > 0)
  }
}
