package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._

/** Native DotProduct expression (graft.plans): bitwise agreement with the
  * HOF formulation, SQL registration via GraftExtensions, codegen
  * participation, and null/edge behavior.
  */
class DotProductSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, dir)
    .select(col("vec_id"), asDouble(col("embedding")).as("e"))

  test("graft_dot is bitwise-identical to the HOF fold on real embeddings") {
    import spark.implicits._
    val pairs = emb.toDF("id1", "a").crossJoin(emb.toDF("id2", "b")).limit(5000)
    val diff = pairs
      .select(dot(col("a"), col("b")).as("hof"), dotNative(col("a"), col("b")).as("nat"))
      .filter(col("hof") =!= col("nat")) // bitwise: no tolerance
    assert(diff.count() === 0)
    val c = pairs.limit(100)
      .select(cosine(col("a"), col("b")).as("hof"), cosineNative(col("a"), col("b")).as("nat"))
      .filter(col("hof") =!= col("nat"))
    assert(c.count() === 0)
  }

  test("graft_dot is callable from SQL") {
    import spark.implicits._
    val got = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(got === 11.0)
    val cos = spark.sql("SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .as[Double].head()
    assert(cos === 1.0)
  }

  test("graft_dot participates in whole-stage codegen") {
    // The compact plan string marks whole-stage-codegen stages with "*(n)";
    // the Project evaluating graft_dot must carry that marker (a
    // CodegenFallback expression would force a non-starred Project).
    val plan = emb.select(dotNative(col("e"), col("e")).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_dot.*"),
      s"expected the graft_dot Project inside a codegen stage in:\n$plan")
  }

  test("null array and mismatched lengths both yield null (HOF-fold parity)") {
    import spark.implicits._
    val got = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d").as[Option[Double]].head()
    assert(got.isEmpty)
    val mismatch = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 9.0d), array(3.0d, 4.0d)) AS d")
      .as[Option[Double]].head()
    assert(mismatch.isEmpty, "a truncated vector must not produce a prefix sum")
  }

  test("determinism guard rejects partition-order-sensitive expressions") {
    import spark.implicits._
    val caught = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT rand() AS r").collect()
    }
    assert(caught.getMessage.contains("determinism guard"))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(3).selectExpr("monotonically_increasing_id() AS id2").collect()
    }
    // opt-out restores stock behavior
    spark.conf.set("spark.graft.determinismGuard", "false")
    try assert(spark.sql("SELECT rand(42) AS r").collect().length === 1)
    finally spark.conf.set("spark.graft.determinismGuard", "true")
    // deterministic engine alternatives stay allowed
    assert(spark.sql("SELECT md5('x') AS h").as[String].head().nonEmpty)
  }

  test("non-double inputs are rejected at analysis") {
    intercept[Exception] {
      spark.sql("SELECT graft_dot(array('x'), array('y'))").collect()
    }
  }
}
