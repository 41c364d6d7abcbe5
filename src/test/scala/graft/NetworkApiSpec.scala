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

  test("serving boundary: real HTTP round-trip returns the golden network payload byte-for-byte") {
    val server = graft.api.ApiServer.start(spark, "/root/testdata/sf0.001")
    try {
      val port = server.getAddress.getPort
      val client = java.net.http.HttpClient.newHttpClient()
      def get(path: String): java.net.http.HttpResponse[String] =
        client.send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())

      // GET /api/network/:code — the handler.clj route shape — must return
      // the exact bytes NetworkApiSpec's golden fixture pins.
      val net = get("/api/network/o1")
      assert(net.statusCode() === 200)
      assert(net.headers().firstValue("Content-Type").orElse("") === "application/json")
      assert(net.body() === Files.readString(Paths.get(golden)))

      // A row endpoint serves a JSON array with the queried key inside.
      val node = get("/api/node/1")
      assert(node.statusCode() === 200)
      assert(node.body().startsWith("[") &&
        node.body().contains("\"o_orderkey\":1"))

      // Unknown routes and non-numeric keys are 404, not a server error.
      assert(get("/api/nope").statusCode() === 404)
      assert(get("/api/node/abc").statusCode() === 404)
    } finally server.stop(0)
  }

  test("TropologyApi facade: links-for-article, common-links, node-info agree with first principles") {
    import org.apache.spark.sql.functions._
    import graft.api.TropologyApi
    val spark0 = spark
    import spark0.implicits._
    val dir = "/root/testdata/sf0.001"
    val e = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()

    // Pick two orders that provably share at least one part.
    val (a, b) = e.as("x").join(e.as("y"),
        col("x.p") === col("y.p") && col("x.o") < col("y.o"))
      .select(col("x.o"), col("y.o")).as[(Long, Long)].head()

    val linksA = TropologyApi.linksForArticle(spark, dir, a)
    val expectParts = e.filter(col("o") === a).select("p").as[Long].collect().toSet
    assert(linksA.select("p_partkey").as[Long].collect().toSet === expectParts)
    // Ranked by global in-degree, descending.
    val degs = linksA.select("in_degree").as[Long].collect().toSeq
    assert(degs === degs.sortBy(-_))

    val common = TropologyApi.commonLinksBetween(spark, dir, a, b)
      .select("p_partkey").as[Long].collect().toSet
    val expectCommon = e.filter(col("o") === a).select("p").as[Long].collect().toSet
      .intersect(e.filter(col("o") === b).select("p").as[Long].collect().toSet)
    assert(common === expectCommon && common.nonEmpty)

    val info = TropologyApi.nodeInfo(spark, dir, a)
    val row = info.select("o_orderkey", "outgoing").as[(Long, Long)].head()
    assert(row === ((a, expectParts.size.toLong)))
  }
}
