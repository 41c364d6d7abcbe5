package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Bucketed interval join vs the naive non-equi join: identical matches on
  * real data, including interval-boundary rows; guard checks.
  */
class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def sides = {
    val ev = Tables.events(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("win_start"),
        (col("ts") + expr("INTERVAL 1 DAY")).as("win_end"))
    (errors, purchases)
  }

  test("bucketed interval join equals the naive non-equi join") {
    val (errors, purchases) = sides
    val bucketed = RangeJoin.intervalJoin(errors, purchases,
      "user_id", "p_user", "ts", "win_start", "win_end", widthSec = 24L * 3600)
      .select("event_id", "purchase_id")
    val naive = errors.join(purchases,
      col("user_id") === col("p_user") &&
        col("ts") >= col("win_start") && col("ts") <= col("win_end"))
      .select("event_id", "purchase_id")

    assert(bucketed.count() > 0, "fixture should produce at least one match")
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty)
  }

  test("narrow buckets (more replicas) give the same result") {
    val (errors, purchases) = sides
    val wide = RangeJoin.intervalJoin(errors, purchases,
      "user_id", "p_user", "ts", "win_start", "win_end", widthSec = 24L * 3600)
      .select("event_id", "purchase_id")
    val narrow = RangeJoin.intervalJoin(errors, purchases,
      "user_id", "p_user", "ts", "win_start", "win_end", widthSec = 3600L)
      .select("event_id", "purchase_id")
    assert(wide.exceptAll(narrow).isEmpty && narrow.exceptAll(wide).isEmpty)
  }

  test("overlapping column names are rejected") {
    val l = spark.range(1).selectExpr("id AS k", "CAST(id AS TIMESTAMP) AS t", "id AS v")
    val r = spark.range(1).selectExpr("id AS k2", "CAST(id AS TIMESTAMP) AS s",
      "CAST(id AS TIMESTAMP) AS e", "id AS v")
    intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(l, r, "k", "k2", "t", "s", "e", 60L)
    }
  }
}
