package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL text surface: `Tables.registerAll` + `spark.sql` must answer
  * the same questions as the DataFrame API (a reference user could port
  * their SQL verbatim), including the injected graft_* functions.
  */
class SqlSurfaceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("registerAll exposes every table to spark.sql with the accessor schemas") {
    Tables.registerAll(spark, dir)
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").count() === 1, s"table $n")
    }
    // events view must carry the µs-truncated timestamp type, not raw nanos
    assert(spark.sql("SELECT ts FROM events LIMIT 1").schema.head.dataType ===
      org.apache.spark.sql.types.TimestampType)
  }

  test("a SQL query matches its DataFrame twin") {
    Tables.registerAll(spark, dir)
    val sqlRes = spark.sql(
      """SELECT c_mktsegment, COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    val dfRes = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
    assert(sqlRes.exceptAll(dfRes).isEmpty && dfRes.exceptAll(sqlRes).isEmpty)
  }

  test("injected graft functions work over registered tables in SQL") {
    Tables.registerAll(spark, dir)
    import spark.implicits._
    val n = spark.sql(
      """SELECT vec_id, graft_cosine(CAST(embedding AS ARRAY<DOUBLE>),
        |                            CAST(embedding AS ARRAY<DOUBLE>)) AS c
        |FROM embeddings""".stripMargin)
      .filter(abs(col("c") - 1.0) > 1e-12).count()
    assert(n === 0)
  }

  test("bloom functions compose in plain SQL with a scalar subquery sketch") {
    Tables.registerAll(spark, dir)
    // Sketch the benchmark side in a scalar subquery, probe the corpus
    // side in WHERE — the SQL-text form of t31's prefilter. Every doc_id
    // divisible by 10 is in the sketched set, so the no-false-negatives
    // contract means the filtered count must be >= the true member count.
    val members = spark.sql(
      "SELECT COUNT(*) AS n FROM documents WHERE doc_id % 10 = 0")
      .head().getLong(0)
    val passed = spark.sql(
      """SELECT COUNT(*) AS n FROM documents
        |WHERE graft_might_contain(
        |  (SELECT graft_bloom_agg(doc_id, 100000) FROM documents WHERE doc_id % 10 = 0),
        |  doc_id)""".stripMargin)
      .head().getLong(0)
    assert(passed >= members, "bloom dropped a true member through SQL")
    val total = spark.sql("SELECT COUNT(*) FROM documents").head().getLong(0)
    assert(passed < total, "bloom pruned nothing")
  }
}
