package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LinkGraph

/** LinkGraph invariants on a known tiny graph plus consistency checks on
  * the lineitem-derived graph (degree totals vs edge count — the
  * reference's pages.incoming/outgoing ≡ groupBy-count-over-links
  * property from FIXTURES.md).
  */
class LinkGraphSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Path a-b-c-d plus isolated pair e-f (undirected via symmetrized).
  private def tiny = new LinkGraph(
    Seq(("a", "b"), ("b", "c"), ("c", "d"), ("e", "f")).toDF("src", "dst")).symmetrized

  test("degree sums equal edge count") {
    val g = tiny
    val nEdges = g.edges.count()
    val outSum = g.outDegrees.agg(sum("out_deg")).as[Long].head()
    val inSum  = g.inDegrees.agg(sum("in_deg")).as[Long].head()
    assert(outSum === nEdges && inSum === nEdges)
  }

  test("kHop distances on a path graph") {
    val g = tiny
    val src = Seq("a").toDF("id")
    val got = g.kHop(src, 3).as[(String, Int)].collect().toMap
    assert(got === Map("b" -> 1, "c" -> 2, "d" -> 3))
  }

  test("label propagation converges to component minima") {
    val labels = tiny.labelPropagation(4).as[(String, String)].collect().toMap
    assert(labels("a") === "a" && labels("b") === "a" &&
      labels("c") === "a" && labels("d") === "a")
    assert(labels("e") === "e" && labels("f") === "e")
  }

  test("fixed-point PageRank is deterministic and rank-positive") {
    val g = tiny
    val r1 = g.pageRankFixed(3).orderBy("id").as[(String, Long)].collect().toSeq
    val r2 = g.pageRankFixed(3).orderBy("id").as[(String, Long)].collect().toSeq
    assert(r1 === r2)
    assert(r1.forall(_._2 > 0))
    // b and c are the path's interior nodes → strictly higher rank than the ends.
    val m = r1.toMap
    assert(m("b") > m("a") && m("c") > m("d"))
  }

  test("lineitem graph: degree table totals match the edge count") {
    val e = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey").cast("string").as("src"),
        col("l_partkey").cast("string").as("dst"))
    val g = new LinkGraph(e)
    val inSum = g.inDegrees.agg(sum("in_deg")).as[Long].head()
    assert(inSum === e.count())
  }
}
