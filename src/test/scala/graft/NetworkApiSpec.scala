package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.api.NetworkApi

/** E2 network payload: golden-file check (SURVEY.md §6.3 — graph/API
  * shaped results with no DuckDB equivalent are golden-tested with
  * deterministic seeds) plus in-session determinism.
  */
class NetworkApiSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val golden = "src/test/resources/golden/network_payload_sf0001.json"

  test("neighborhood payload matches the golden fixture byte-for-byte") {
    val got = NetworkApi.neighborhoodPayload(spark, "/root/testdata/sf0.001")
      .collect()(0).getString(0)
    val expected = Files.readString(Paths.get(golden))
    assert(got === expected)
  }

  test("payload is deterministic across evaluations") {
    val a = NetworkApi.neighborhoodPayload(spark, "/root/testdata/sf0.001").collect()(0).getString(0)
    val b = NetworkApi.neighborhoodPayload(spark, "/root/testdata/sf0.001").collect()(0).getString(0)
    assert(a === b)
  }

  test("payload parses as JSON with k neighbor nodes and matching edges") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = NetworkApi.neighborhoodPayload(spark, "/root/testdata/sf0.001")
      .select(
        json_tuple(col("payload"), "node", "nodes", "edges")
          .as(Seq("node", "nodes", "edges")))
      .select(
        get_json_object(col("node"), "$.id").as("hub"),
        size(from_json(col("nodes"),
          org.apache.spark.sql.types.DataType.fromDDL("array<struct<id:string>>"))).as("n_nodes"),
        size(from_json(col("edges"),
          org.apache.spark.sql.types.DataType.fromDDL("array<struct<source:string,target:string>>"))).as("n_edges"))
    val (hub, nNodes, nEdges) = df.as[(String, Int, Int)].head()
    assert(hub.startsWith("o") && nNodes === 10 && nEdges === 10)
  }
}
