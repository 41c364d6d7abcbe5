package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Ingest

/** E1 ingest pipeline: parse extraction rules, per-source edge
  * replacement, degree maintenance, and the SURVEY §6.4 idempotence
  * property (same snapshot twice == once).
  */
class IngestSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  private def raw(rows: (String, String)*): DataFrame =
    rows.map { case (url, html) => (url, t0, html) }.toDF("url", "fetched_at", "html")

  private def snapshot = raw(
    ("https://x/pmwiki.php/Main/BigBad",
      """<a href="/pmwiki.php/Main/EvilPlan">a</a>
        |<a href="/pmwiki.php/Film/SomeFilm">b</a>
        |<a href="/pmwiki.php/Main/EvilPlan">dup</a>
        |<a href="/pmwiki.php/Main/BigBad">self</a>
        |<a href="http://elsewhere/pmwiki.php/Main/EvilPlan">still-wiki</a>
        |<a href="http://other.com/x">external</a>""".stripMargin),
    ("https://x/pmwiki.php/Film/SomeFilm",
      """<a href="/pmwiki.php/Main/BigBad">back</a>"""))

  private def emptyPages: DataFrame =
    Seq.empty[(String, String, Boolean, Boolean, Int, Timestamp, Long, Long)]
      .toDF("code", "category", "is_redirect", "has_error", "times_failed",
        "next_update", "incoming", "outgoing")

  private def emptyLinks: DataFrame =
    Seq.empty[(String, String)].toDF("from_code", "to_code")

  test("parseLinks lowercases, dedups, drops self-links, ignores non-wiki hrefs") {
    val got = Ingest.parseLinks(snapshot).as[(String, String)].collect().toSet
    assert(got === Set(
      ("main/bigbad", "main/evilplan"),
      ("main/bigbad", "film/somefilm"),
      ("film/somefilm", "main/bigbad")))
  }

  test("ingest builds pages for crawled AND linked-only nodes with correct degrees") {
    val (pages, links) = Ingest.ingest(emptyPages, emptyLinks, snapshot)
    assert(links.count() === 3)
    val byCode = pages.collect().map(r => r.getAs[String]("code") ->
      (r.getAs[Long]("incoming"), r.getAs[Long]("outgoing"),
        r.getAs[Any]("next_update") != null)).toMap
    assert(byCode("main/bigbad") === ((1L, 2L, true)))
    assert(byCode("film/somefilm") === ((1L, 1L, true)))
    // linked-to but never crawled: degree row exists, no schedule yet
    assert(byCode("main/evilplan") === ((1L, 0L, false)))
  }

  test("ingesting the same snapshot twice equals once (idempotence)") {
    val (p1, l1) = Ingest.ingest(emptyPages, emptyLinks, snapshot)
    val (p2, l2) = Ingest.ingest(p1, l1, snapshot)
    assert(l2.exceptAll(l1).isEmpty && l1.exceptAll(l2).isEmpty)
    assert(p2.exceptAll(p1).isEmpty && p1.exceptAll(p2).isEmpty)
  }

  test("failures set has_error and back off exponentially; others untouched") {
    val (p1, _) = Ingest.ingest(emptyPages, emptyLinks, snapshot)
    val failT = Timestamp.valueOf("2024-02-01 00:00:00")
    val failures = Seq(("main/bigbad", failT)).toDF("code", "failed_at")
    val p2 = Ingest.recordFailures(p1, failures, baseDays = 1)
    val p3 = Ingest.recordFailures(p2, failures, baseDays = 1)
    def row(df: org.apache.spark.sql.DataFrame, code: String) = {
      val r = df.filter(col("code") === code).collect()(0)
      (r.getAs[Boolean]("has_error"), r.getAs[Int]("times_failed"),
        r.getAs[Timestamp]("next_update"))
    }
    val (e1, tf1, nu1) = row(p2, "main/bigbad")
    assert(e1 && tf1 === 1 && nu1 === Timestamp.valueOf("2024-02-03 00:00:00")) // +2^1 days
    val (e2, tf2, nu2) = row(p3, "main/bigbad")
    assert(e2 && tf2 === 2 && nu2 === Timestamp.valueOf("2024-02-05 00:00:00")) // +2^2 days
    // untouched page keeps its state
    val (e0, tf0, _) = row(p3, "film/somefilm")
    assert(!e0 && tf0 === 0)
  }

  test("round-r ingest is idempotent from accumulated multi-round state (e5 loop property)") {
    // Seed (round 0), then a round-1 batch plus a failure record — the
    // state mix e5_recrawl_rounds carries between rounds. Replaying the
    // round-1 ingest must change NOTHING: the upsert is keyed, edge
    // replacement is per-source, and the failure bookkeeping of pages
    // outside the batch must survive the degree-recompute outer joins.
    val (p1, l1) = Ingest.ingest(emptyPages, emptyLinks, snapshot)
    val t1 = Timestamp.valueOf("2024-01-02 00:00:00")
    val round1 = Seq(
      ("https://x/pmwiki.php/Main/EvilPlan", t1,
        """<a href="/pmwiki.php/Main/BigBad">b</a> <a href="/pmwiki.php/Main/NewTrope">n</a>"""))
      .toDF("url", "fetched_at", "html")
    val failures = Seq(("film/somefilm", t1)).toDF("code", "failed_at")
    val (p2, l2) = Ingest.ingest(p1, l1, round1)
    val p2f = Ingest.recordFailures(p2, failures)
    val (p3, l3) = Ingest.ingest(p2f, l2, round1) // replay the same round batch
    assert(l3.exceptAll(l2).isEmpty && l2.exceptAll(l3).isEmpty)
    assert(p3.exceptAll(p2f).isEmpty && p2f.exceptAll(p3).isEmpty)
  }

  test("a failed page that later succeeds resets its failure state (e5 lifecycle)") {
    val (p1, l1) = Ingest.ingest(emptyPages, emptyLinks, snapshot)
    val t1 = Timestamp.valueOf("2024-01-02 00:00:00")
    val p1f = Ingest.recordFailures(p1,
      Seq(("film/somefilm", t1)).toDF("code", "failed_at"))
    val t2 = Timestamp.valueOf("2024-01-05 00:00:00")
    val retry = Seq(
      ("https://x/pmwiki.php/Film/SomeFilm", t2,
        """<a href="/pmwiki.php/Main/BigBad">back</a>"""))
      .toDF("url", "fetched_at", "html")
    val (p2, _) = Ingest.ingest(p1f, l1, retry)
    val r = p2.filter(col("code") === "film/somefilm").collect()(0)
    assert(!r.getAs[Boolean]("has_error"))
    assert(r.getAs[Int]("times_failed") === 0)
    assert(r.getAs[Timestamp]("next_update") ===
      Timestamp.valueOf("2024-02-04 00:00:00")) // t2 + 30 days
  }

  test("recrawl replaces a page's out-edges instead of accumulating them") {
    val (p1, l1) = Ingest.ingest(emptyPages, emptyLinks, snapshot)
    val recrawl = raw(
      ("https://x/pmwiki.php/Main/BigBad",
        """<a href="/pmwiki.php/Main/NewTrope">only link now</a>"""))
    val (p2, l2) = Ingest.ingest(p1, l1, recrawl)
    val bigbadOut = l2.filter(col("from_code") === "main/bigbad")
      .select("to_code").as[String].collect().toSet
    assert(bigbadOut === Set("main/newtrope"))
    val out = p2.filter(col("code") === "main/bigbad")
      .select("outgoing").as[Long].head()
    assert(out === 1L)
    // film/somefilm's edges were untouched by this batch
    assert(l2.filter(col("from_code") === "film/somefilm").count() === 1)
  }
}
