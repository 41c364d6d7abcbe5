package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Merge

/** The reference's E1 crawl/ingest pipeline (SURVEY.md §4): raw page
  * snapshots → parsed link edges → edge replacement per crawled page →
  * page upsert with degree maintenance — the
  * fetch→parse→`record-page!` loop of `src/tropology/parsing.clj` /
  * `db.clj` (public repo) as one declarative batch flow.
  *
  * Tables:
  *   - raw snapshots: `(url, fetched_at TIMESTAMP, html STRING)`
  *   - links:         `(from_code, to_code)` directed, unique pairs
  *   - pages:         `(code, category, is_redirect, has_error,
  *                      times_failed, next_update, incoming, outgoing)`
  *
  * Idempotence (SURVEY.md §6.4): ingesting the same snapshot twice equals
  * ingesting it once — edge replacement is per-source overwrite and the
  * page upsert is keyed — property-tested in IngestSpec.
  *
  * Scale: parse is a pure flatMap (no shuffle); edge replace is an
  * anti-join on the touched-source set (broadcastable — one crawl batch is
  * always small relative to the graph); degree recompute aggregates only
  * once over the merged edge set. With `links` bucketed by `from_code` the
  * anti-join and the out-degree agg are shuffle-free.
  */
object Ingest {

  private val linkRe = "pmwiki\\.php/([A-Za-z]+/[A-Za-z0-9]+)"

  /** Normalized page code of the snapshot URL itself (the crawled page). */
  private def pageCode = lower(regexp_extract(col("url"), linkRe, 1))

  /** S2: extract `(from_code, to_code)` edges from the snapshot HTML —
    * lowercased, self-links and duplicates dropped, external links ignored
    * by the pmwiki pattern.
    */
  def parseLinks(raw: DataFrame): DataFrame =
    raw.select(pageCode.as("from_code"),
        explode(array_distinct(transform(
          regexp_extract_all(col("html"), lit(linkRe), lit(1)),
          c => lower(c)))).as("to_code"))
      .filter(col("to_code") =!= col("from_code"))
      .distinct()

  /** S5: replace every crawled page's out-edges with its freshly parsed
    * set (anti-join on the touched sources + union).
    */
  def replaceEdges(links: DataFrame, raw: DataFrame): DataFrame = {
    val newEdges = parseLinks(raw)
    val touched  = raw.select(pageCode.as("touched_code")).distinct()
    links
      .join(broadcast(touched), col("from_code") === col("touched_code"), "left_anti")
      .union(newEdges)
  }

  /** S4+A1: upsert crawled pages and recompute degrees over the merged
    * edge set. Returns `(pages', links')`.
    */
  def ingest(pages: DataFrame, links: DataFrame, raw: DataFrame,
      recrawlDays: Int = 30): (DataFrame, DataFrame) = {
    val links2 = replaceEdges(links, raw)

    // One row per crawled code — a batch can legitimately contain the same
    // URL twice (re-fetch within the batch); keep the LATEST fetch so the
    // schedule reflects the most recent crawl, and honor Merge.upsert's
    // key-uniqueness contract.
    val crawled = raw
      .groupBy(pageCode.as("code"))
      .agg(max(col("fetched_at")).as("last_fetch"))
      .select(
        col("code"),
        split(col("code"), "/").getItem(0).as("category"),
        lit(false).as("is_redirect"),
        lit(false).as("has_error"),
        lit(0).as("times_failed"),
        (col("last_fetch") + expr(s"INTERVAL $recrawlDays DAYS")).as("next_update"),
        lit(0L).as("incoming"),
        lit(0L).as("outgoing"))

    val merged = Merge.upsert(pages, crawled, "code")

    // Degrees from the post-replacement edge set; linked-to pages that were
    // never crawled still get a row (the reference's "not yet crawled"
    // pages exist via links) — hence the outer join on the degree tables.
    val outDeg = links2.groupBy(col("from_code").as("code"))
      .agg(count(lit(1)).as("new_out"))
    val inDeg = links2.groupBy(col("to_code").as("code"))
      .agg(count(lit(1)).as("new_in"))

    val pages2 = merged
      .join(outDeg, Seq("code"), "full_outer")
      .join(inDeg, Seq("code"), "full_outer")
      .select(
        col("code"),
        coalesce(col("category"), split(col("code"), "/").getItem(0)).as("category"),
        coalesce(col("is_redirect"), lit(false)).as("is_redirect"),
        coalesce(col("has_error"), lit(false)).as("has_error"),
        coalesce(col("times_failed"), lit(0)).as("times_failed"),
        col("next_update"),
        coalesce(col("new_in"), lit(0L)).as("incoming"),
        coalesce(col("new_out"), lit(0L)).as("outgoing"))

    (pages2, links2)
  }

  /** Crawl-failure bookkeeping (the reference's `has_error`/`times_failed`
    * + exponential-backoff rescheduling): pages in `failures`
    * `(code, failed_at TIMESTAMP)` get `has_error = true`,
    * `times_failed + 1`, and
    * `next_update = failed_at + baseDays * 2^times_failed'` days
    * (capped at 2^10) — everyone else is untouched.
    */
  def recordFailures(pages: DataFrame, failures: DataFrame,
      baseDays: Int = 1): DataFrame = {
    // One failure row per code (latest attempt wins) — a repeated code in
    // the batch must not fan the page row out into duplicates.
    val f = broadcast(failures
      .groupBy(col("code").as("f_code"))
      .agg(max(col("failed_at")).as("failed_at")))
    val failed = col("failed_at").isNotNull
    val newTf = col("times_failed") + 1
    val backoffDays =
      expr(s"$baseDays * shiftleft(1, least(times_failed + 1, 10))")
    pages
      .join(f, col("code") === col("f_code"), "left_outer")
      .select(
        col("code"), col("category"), col("is_redirect"),
        when(failed, lit(true)).otherwise(col("has_error")).as("has_error"),
        when(failed, newTf).otherwise(col("times_failed")).as("times_failed"),
        when(failed,
          col("failed_at") + backoffDays * expr("INTERVAL 1 DAY"))
          .otherwise(col("next_update")).as("next_update"),
        col("incoming"), col("outgoing"))
  }
}
