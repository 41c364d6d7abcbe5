package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** AsOfJoin correctness: the single-shuffle union+carry-forward
  * implementation must agree row-for-row with the naive
  * join-then-row_number formulation (which is O(left × right-per-key) and
  * only viable at test scale).
  */
class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("asOf matches the naive join + row_number formulation on real data") {
    val left = Tables.events(spark, dir).select("event_id", "user_id", "ts")
    val right = Tables.orders(spark, dir)
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")

    val fast = AsOfJoin.asOf(left, right,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      tiebreak = "o_orderkey", rightCols = Seq("o_orderkey", "o_totalprice"))
      .select("event_id", "o_orderkey")

    val naive = {
      val j = left.join(right,
        col("user_id") === col("o_custkey") && col("ts") >= col("o_orderdate"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("event_id", "o_orderkey")
    }

    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("asOf rejects overlapping and reserved column names") {
    val l = spark.range(1).selectExpr("id AS k", "CAST(id AS TIMESTAMP) AS t", "id AS v")
    val r = spark.range(1).selectExpr("id AS k2", "CAST(id AS TIMESTAMP) AS t2", "id AS v")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, r, "k", "k2", "t", "t2", "v", Seq("v"))
    }
    val r2 = spark.range(1).selectExpr("id AS k2", "CAST(id AS TIMESTAMP) AS t2", "id AS __m")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, r2, "k", "k2", "t", "t2", "__m", Seq("__m"))
    }
  }
}
