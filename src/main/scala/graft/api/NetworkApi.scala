package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's E2 entry point (SURVEY.md §4): the network/neighborhood
  * API payload — `{node, nodes:[{id,label,size,x,y}…], edges:[…]}` —
  * that `src/tropology/api.clj` (public repo) assembled in Clojure for the
  * Sigma.js canvas, re-expressed as one declarative plan:
  * filter hub → top-k neighbors by in-degree → resolve attributes →
  * `collect_list(struct(…))` → `to_json`.
  *
  * Layout coordinates: the reference used random x/y per render; an
  * unseeded rand would break golden-file testing (SURVEY.md §6.3), so
  * coords derive from md5(id) — deterministic, uniform-ish in [0,1).
  */
object NetworkApi {

  /** Deterministic pseudo-coordinate in [0, 1): 4 md5 hex nibbles / 65536. */
  private def coord(id: org.apache.spark.sql.Column, salt: String) =
    round(conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 4), 16, 10)
      .cast("double") / 65536.0, 6)

  /** Single-row DataFrame with column `payload` holding the network JSON
    * for the hub order (most distinct parts) over the order↔part graph.
    */
  def neighborhoodPayload(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .localCheckpoint() // eager (r16): 3 consumers, no action between (policy)
    val hub = e.groupBy(col("o")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("o").asc).limit(1)
      .select(col("o").as("hub_o"), col("n").as("hub_deg"))
    val indeg = e.groupBy(col("p")).agg(count(lit(1)).as("part_indeg"))
    val neighbors = e.join(broadcast(hub), col("o") === col("hub_o"))
      .join(indeg, Seq("p"))
      .join(Tables.part(s, dir), col("p") === col("p_partkey"))
      .orderBy(col("part_indeg").desc, col("p").asc)
      .limit(k)

    neighbors
      .groupBy(col("hub_o"), col("hub_deg"))
      .agg(
        collect_list(struct(
          concat(lit("p"), col("p").cast("string")).as("id"),
          col("p_name").as("label"),
          col("part_indeg").as("size"),
          coord(col("p"), "x").as("x"),
          coord(col("p"), "y").as("y"))).as("nbrs"),
        collect_list(struct(
          concat(lit("o"), col("hub_o").cast("string")).as("source"),
          concat(lit("p"), col("p").cast("string")).as("target"))).as("edgs"))
      .select(to_json(struct(
        struct(
          concat(lit("o"), col("hub_o").cast("string")).as("id"),
          col("hub_deg").as("size"),
          coord(col("hub_o"), "x").as("x"),
          coord(col("hub_o"), "y").as("y")).as("node"),
        array_sort(col("nbrs")).as("nodes"),
        array_sort(col("edgs")).as("edges"))).as("payload"))
  }
}
