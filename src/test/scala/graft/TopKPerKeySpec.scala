package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKPerKey

/** Custom whole-operator stack: the heap-based top-k-per-key node must
  * agree with the window row_number formulation, plan through the injected
  * strategy, and respect multi-column orderings.
  */
class TopKPerKeySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("matches the window formulation: top-3 parts per brand by price") {
    val part = Tables.part(spark, dir)
    val custom = TopKPerKey(part, Seq("p_brand"),
      Seq("p_retailprice" -> false, "p_partkey" -> true), k = 3)
      .select("p_brand", "p_partkey", "p_retailprice")

    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    val window = part
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("p_brand", "p_partkey", "p_retailprice")

    assert(custom.exceptAll(window).isEmpty && window.exceptAll(custom).isEmpty)
  }

  test("matches the window formulation on a bigger fact table") {
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    val custom = TopKPerKey(li, Seq("l_partkey"),
      Seq("l_extendedprice" -> false, "l_orderkey" -> true, "l_linenumber" -> true), k = 2)
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    val window = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2).drop("rn")
    assert(custom.exceptAll(window).isEmpty && window.exceptAll(custom).isEmpty)
  }

  test("plans through TopKPerKeyExec with a hash exchange on the key") {
    val p = TopKPerKey(Tables.part(spark, dir), Seq("p_brand"),
      Seq("p_retailprice" -> false, "p_partkey" -> true), k = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey "), p.take(1500)) // exec renders without the Exec suffix
    assert(p.contains("hashpartitioning(p_brand"), p.take(1500))
  }

  test("spill fallback: keys far above maxHeapKeys still match the window form") {
    // Threshold 1 forces every partition with >1 distinct key through the
    // external-sort path (lineitem has ~2k distinct partkeys at sf0.001,
    // spread over 32 shuffle partitions — thousands of keys per the one
    // heap slot allowed).
    spark.conf.set("spark.graft.topk.maxHeapKeys", "1")
    try {
      val li = Tables.lineitem(spark, dir)
        .select("l_partkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      val custom = TopKPerKey(li, Seq("l_partkey"),
        Seq("l_extendedprice" -> false, "l_orderkey" -> true, "l_linenumber" -> true), k = 2)
      // The exec renders its args as "keys, order, k, maxHeapKeys": pin that
      // the conf actually reached the physical node.
      val planLines = custom.queryExecution.executedPlan.toString.linesIterator
      assert(planLines.exists(l => l.contains("TopKPerKey") && l.trim.endsWith(", 2, 1")))
      val w = Window.partitionBy(col("l_partkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      val window = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2).drop("rn")
      assert(custom.exceptAll(window).isEmpty && window.exceptAll(custom).isEmpty)
    } finally spark.conf.unset("spark.graft.topk.maxHeapKeys")
  }

  test("key-only filter pushes through the node to the scan; value filter stays above") {
    val base = TopKPerKey(Tables.part(spark, dir), Seq("p_brand"),
      Seq("p_retailprice" -> false, "p_partkey" -> true), k = 3)

    // Key predicate: commutes with per-key top-k → must reach PushedFilters.
    val keyFiltered = base.filter(col("p_brand") === "Brand#11")
    val kp = keyFiltered.queryExecution.executedPlan.toString
    assert(kp.contains("PushedFilters: [IsNotNull(p_brand), EqualTo(p_brand,Brand#11)]"),
      kp.take(2000))
    // Semantics: identical to filtering before the operator.
    val pre = TopKPerKey(Tables.part(spark, dir).filter(col("p_brand") === "Brand#11"),
      Seq("p_brand"), Seq("p_retailprice" -> false, "p_partkey" -> true), k = 3)
    assert(keyFiltered.exceptAll(pre).isEmpty && pre.exceptAll(keyFiltered).isEmpty)

    // Non-key predicate must NOT push below (it would change the winners).
    val vp = base.filter(col("p_retailprice") > 1000.0)
      .queryExecution.executedPlan.toString
    assert(!vp.contains("PushedFilters: [IsNotNull(p_retailprice)"),
      s"value filter must stay above the operator:\n${vp.take(2000)}")
  }

  test("k larger than any group returns everything") {
    val part = Tables.part(spark, dir)
    val all = TopKPerKey(part, Seq("p_brand"),
      Seq("p_partkey" -> true), k = 1000000)
    assert(all.count() === part.count())
  }

  test("unknown columns are rejected") {
    intercept[IllegalArgumentException] {
      TopKPerKey(Tables.part(spark, dir), Seq("nope"), Seq("p_partkey" -> true), 1)
    }
  }
}
