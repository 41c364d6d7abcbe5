package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Merge

/** Merge.upsert semantics + the SURVEY §6.4 idempotence property:
  * merging the same snapshot twice must equal merging it once.
  */
class MergeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("id", "name", "bal")
  private def updates = Seq((2L, "b2", 25.0), (9L, "new", 99.0))
    .toDF("id", "name", "bal")

  test("upsert inserts new keys, updates matching keys, keeps the rest") {
    val got = Merge.upsert(base, updates, "id")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0), (9L, "new", 99.0)))
  }

  test("upsert is idempotent: applying the same updates twice equals once") {
    val once  = Merge.upsert(base, updates, "id")
    val twice = Merge.upsert(once, updates, "id")
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("upsert of an empty update set is the identity") {
    val got = Merge.upsert(base, updates.limit(0), "id")
    assert(got.exceptAll(base).isEmpty && base.exceptAll(got).isEmpty)
  }

  test("upsert can set a column to NULL (row replacement, not per-column coalesce)") {
    val nullUpdate = Seq((2L, Option.empty[String], 25.0)).toDF("id", "name", "bal")
    val got = Merge.upsert(base, nullUpdate, "id")
      .orderBy("id").as[(Long, Option[String], Double)].collect().toSeq
    assert(got === Seq((1L, Some("a"), 10.0), (2L, None, 25.0), (3L, Some("c"), 30.0)))
  }

  test("upsert rejects schema mismatches") {
    intercept[IllegalArgumentException] {
      Merge.upsert(base, updates.select("name", "id", "bal"), "id")
    }
  }
}
