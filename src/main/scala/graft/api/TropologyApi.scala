package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference's full serving surface (`src/tropology/api.clj`, public
  * repo; SURVEY.md §4): a user of the reference called four entry points —
  * network-for-node, links-for-article, common-links-between, node-info.
  * [[NetworkApi.neighborhoodPayload]] carries the first; this facade adds
  * the remaining three over the same order↔part link graph, so the whole
  * reference API maps 1:1 onto library calls.
  *
  * Everything here is a thin declarative plan over the maintained tables —
  * point lookups push their predicates to the scan, the pair-intersection
  * is a self-join on the shared part key — and each function returns a
  * DataFrame so callers compose (limit, toJSON, write) without collect.
  */
object TropologyApi {

  /** Distinct order→part edges — read from the MAINTAINED p-bucketed
    * links table ([[graft.queries.Graph.rawLinks]]), the same standing
    * artifact the graph queries consume, so the serving facade neither
    * re-derives the edge list from raw lineitem per call nor can drift
    * from the layout (the p-bucketed scan also makes the dedup and every
    * p-keyed agg/join below Exchange-free on the p side).
    */
  private def links(s: SparkSession, dir: String): DataFrame =
    graft.queries.Graph.edges(s, dir)

  /** `network-for-node`: the Sigma.js neighborhood payload (E2). */
  def networkForNode(s: SparkSession, dir: String, k: Int = 10): DataFrame =
    NetworkApi.neighborhoodPayload(s, dir, k)

  /** `links-for-article`: everything the given order references, resolved
    * to part attributes and ranked by global in-degree — the reference's
    * "tropes used by this work" listing.
    */
  def linksForArticle(s: SparkSession, dir: String, orderKey: Long): DataFrame = {
    val e = links(s, dir)
    val indeg = e.groupBy(col("p")).agg(count(lit(1)).as("in_degree"))
    e.filter(col("o") === orderKey)
      .join(indeg, Seq("p"))
      .join(Tables.part(s, dir), col("p") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("in_degree"))
      .orderBy(col("in_degree").desc, col("p_partkey").asc)
  }

  /** `common-links-between`: the references two orders share — the
    * reference's "tropes common to two works" intersection, as a self-join
    * on the shared part key (J3).
    */
  def commonLinksBetween(s: SparkSession, dir: String,
      a: Long, b: Long): DataFrame = {
    val e = links(s, dir)
    e.filter(col("o") === a).select(col("p"))
      .join(e.filter(col("o") === b).select(col("p").as("pb")),
        col("p") === col("pb"), "left_semi")
      .join(Tables.part(s, dir), col("p") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey").asc)
  }

  /** `node-info`: one row of node attributes plus maintained degree
    * counts (the reference's pages-row lookup with incoming/outgoing).
    */
  def nodeInfo(s: SparkSession, dir: String, orderKey: Long): DataFrame = {
    val e = links(s, dir)
    val outdeg = e.filter(col("o") === orderKey)
      .agg(count(lit(1)).as("outgoing"))
    Tables.orders(s, dir)
      .filter(col("o_orderkey") === orderKey)
      .crossJoin(broadcast(outdeg))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("outgoing"))
  }
}
