package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ShortestPaths

/** Structural invariants of the round-6 pipeline operators — properties
  * the DuckDB hash gate can't see (it proves value parity, not that the
  * values mean what they claim): SCD2 ranges must tile each customer's
  * timeline, histogram bins must partition the table, the incremental
  * merge must equal the direct aggregate, transition counts must conserve
  * events, and Bellman-Ford must prefer a cheap 2-hop path over an
  * expensive direct edge.
  */
class PipelineInvariantsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  // --- ShortestPaths operator ---

  test("weighted relaxation takes the cheap 2-hop path over the expensive direct edge") {
    // 1→4 directly costs 100; 1→2→3→4 costs 3. Needs 3 rounds to find;
    // round 1 must report the direct edge's 100.
    val wedges = Seq((1L, 4L, 100L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val src = Seq(1L).toDF("id")
    def distTo4(rounds: Int): Long =
      ShortestPaths.fixedRounds(wedges, src, rounds)
        .filter(col("id") === 4L).select("dist").as[Long].head()
    assert(distTo4(1) === 100L)
    assert(distTo4(3) === 3L)
    assert(distTo4(5) === 3L) // converged: extra rounds change nothing
  }

  test("unit-weight SSSP equals BFS hop distance on the real graph") {
    val li = Tables.lineitem(spark, dir)
    val e = li.select((col("l_orderkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
      .distinct()
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val src = li.agg(min(col("l_orderkey")).as("k")).select((col("k") * 2).as("id"))
    val bfs = new graft.operators.LinkGraph(sym).kHop(src, 3)
      .withColumnRenamed("dist", "hops")
    val sssp = ShortestPaths.fixedRounds(sym.withColumn("w", lit(1L)), src, 3)
      .withColumnRenamed("dist", "cost")
    // Every BFS node at hop h must have unit-weight cost h (sources' cost-0
    // rows are extra in sssp and drop out of the inner join).
    val joined = bfs.join(sssp, "id")
    assert(joined.count() === bfs.count())
    assert(joined.filter(col("hops").cast("long") =!= col("cost")).count() === 0)
  }

  // --- SCD2 (s11) ---

  test("SCD2 versions tile each customer's timeline: no gaps, no overlaps, one current") {
    val h = SparkEntry.queries("s11_scd2")(spark, dir).cache()
    try {
      // Exactly one open-ended current version per customer.
      val perCust = h.groupBy("o_custkey").agg(
        sum(col("is_current")).as("n_current"),
        count(lit(1)).as("n_versions"),
        max(col("version")).as("max_version"))
      assert(perCust.filter(col("n_current") =!= 1).count() === 0)
      // Versions are 1..n contiguous.
      assert(perCust.filter(col("max_version") =!= col("n_versions")).count() === 0)
      // Each version's effective_to equals the NEXT version's effective_from
      // (closed-open tiling), and ranges are non-empty.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("version")
      val chained = h.withColumn("next_from", lead(col("effective_from"), 1).over(w))
      assert(chained.filter(col("next_from").isNotNull &&
        col("effective_to") =!= col("next_from")).count() === 0)
      assert(chained.filter(col("effective_to").isNotNull &&
        !(col("effective_from") < col("effective_to"))).count() === 0)
    } finally h.unpersist()
  }

  // --- Histogram (dq4) ---

  test("equi-width bins partition the orders table and stay ordered") {
    val bins = SparkEntry.queries("dq4_histogram")(spark, dir).collect()
    val total = Tables.orders(spark, dir).count()
    assert(bins.map(_.getAs[Long]("n")).sum === total)
    assert(bins.forall(r => r.getAs[Int]("bin") >= 0 && r.getAs[Int]("bin") <= 9))
    // Bin content ranges must not overlap across ascending bins.
    val sorted = bins.sortBy(_.getAs[Int]("bin"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("bin_max") <= b.getAs[Double]("bin_min"))
      case _ =>
    }
  }

  // --- Incremental aggregate maintenance (s13) ---

  test("incremental merge equals the direct full aggregate") {
    val merged = SparkEntry.queries("s13_incr_agg")(spark, dir)
    val direct = Tables.lineitem(spark, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(28, 4)))
          .cast("double").as("revenue"))
      .orderBy("day")
    assert(merged.collect() === direct.collect())
  }

  // --- Transitions (w8) ---

  test("transition counts conserve events: sum = n_events - n_users") {
    val t = SparkEntry.queries("w8_transitions")(spark, dir)
    val events = Tables.events(spark, dir)
    val expected = events.count() - events.select("user_id").distinct().count()
    assert(t.agg(sum("n")).as[Long].head() === expected)
  }

  // --- Per-group sample (a9) ---

  test("group sample picks at most 3 real customers per nation, deterministically") {
    val s1 = SparkEntry.queries("a9_group_sample")(spark, dir).collect()
    val s2 = SparkEntry.queries("a9_group_sample")(spark, dir).collect()
    assert(s1 === s2)
    val perNation = s1.groupBy(_.getAs[Int]("c_nationkey")).view.mapValues(_.length)
    assert(perNation.values.forall(_ <= 3))
    val custkeys = Tables.customer(spark, dir)
      .select("c_custkey").as[Long].collect().toSet
    assert(s1.forall(r => custkeys.contains(r.getAs[Long]("c_custkey"))))
  }

  // --- Semantic dedup (v10) ---

  test("semantic dedup census is conservation-consistent with the corpus") {
    val census = SparkEntry.queries("v10_semantic_dedup")(spark, dir).collect()
    assert(census.forall(r =>
      r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed") === r.getAs[Long]("n_vectors")))
    val nVec = Tables.embeddings(spark, dir).count()
    assert(census.map(_.getAs[Long]("n_vectors")).sum === nVec)
  }

  // --- Referential integrity (dq5) ---

  test("integrity counts agree with direct set arithmetic") {
    val r = SparkEntry.queries("dq5_ref_integrity")(spark, dir).collect()
      .map(x => x.getAs[String]("check_name") -> x.getAs[Long]("n_violations")).toMap
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val li = Tables.lineitem(spark, dir)
    assert(r("customer_inactive") ===
      c.count() - o.select("o_custkey").distinct()
        .join(c, col("o_custkey") === col("c_custkey"), "left_semi").count())
    assert(r("orders_childless") ===
      o.count() - li.select("l_orderkey").distinct()
        .join(o, col("l_orderkey") === col("o_orderkey"), "left_semi").count())
    // The fixture's fact FKs are consistent — the orphan checks must say so.
    assert(r("lineitem_orphan_order") === 0L)
    assert(r("lineitem_orphan_part") === 0L)
    assert(r("orders_orphan_customer") === 0L)
  }

  // --- Personalized PageRank (g10) ---

  test("personalized ranks are seed-proximity: teleport floor at the seed, support within 3 hops") {
    val ppr = SparkEntry.queries("g10_personalized_pagerank")(spark, dir).collect()
    val li = Tables.lineitem(spark, dir)
    val seedKey = li.agg(min(col("l_orderkey"))).as[Long].head()
    // The seed keeps its teleport floor: rank >= 15% of scale (its walk
    // mass flows OUT — with a low-degree seed a hub neighbor may out-rank
    // it, so seed-on-top is NOT an invariant; the floor is).
    val seedRank = ppr.find(_.getAs[String]("node") === s"o$seedKey")
      .map(_.getAs[Long]("rank"))
    assert(seedRank.exists(_ >= 15L * 1000000000000L / 100L))
    // Every ranked node is within 3 hops of the seed on the same graph.
    val e = li.select((col("l_orderkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
      .distinct()
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val src = li.agg((min(col("l_orderkey")) * 2).as("id"))
    val reach = new graft.operators.LinkGraph(sym).kHop(src, 3)
      .select(col("id")).as[Long].collect().toSet + (seedKey * 2)
    def unpack(n: String): Long =
      n.drop(1).toLong * 2 + (if (n.startsWith("p")) 1 else 0)
    assert(ppr.forall(row => reach.contains(unpack(row.getAs[String]("node")))))
  }

  // --- Attribution (w9) ---

  test("attribution conserves purchases and only credits real touch types") {
    val a = SparkEntry.queries("w9_attribution")(spark, dir).collect()
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    assert(a.map(_.getAs[Long]("n_purchases")).sum === purchases)
    val validTouches = Set("view", "click", "signup", "error", "direct")
    assert(a.forall(r => validTouches.contains(r.getAs[String]("touch"))))
  }

  // --- Compaction (s14) ---

  test("compacted snapshot is exactly 4 files and prunes on source ranges") {
    SparkEntry.queries("s14_compacted_scan")(spark, dir).collect() // ensure published
    // The build block must NOT run — the query above already published the
    // snapshot, and snapshot() only evaluates its by-name build on a miss.
    val compacted = graft.sources.ArtifactStore.snapshot(spark, dir, "documents_compacted") {
      fail("snapshot must already be published")
    }
    val byFile = compacted.groupBy(input_file_name().as("f"))
      .agg(min("source").as("lo"), max("source").as("hi"))
      .collect()
    assert(byFile.length === 4)
    // Range partitioning on (source, doc_id): one source's rows span at
    // most 2 adjacent files, so a single-source predicate prunes >= half
    // the files by min/max stats.
    val touched = byFile.count(r =>
      r.getAs[String]("lo") <= "src3" && "src3" <= r.getAs[String]("hi"))
    assert(touched <= 2, s"source slice touched $touched of 4 files")
  }

  // --- Fuzzy verify (t19) ---

  test("edit-distance similarity is bounded and zero-distance means equal text") {
    val rows = SparkEntry.queries("t19_fuzzy_verify")(spark, dir).cache()
    try {
      assert(rows.filter(col("sim") < 0.0 || col("sim") > 1.0).count() === 0)
      assert(rows.filter(col("edit_dist") < 0).count() === 0)
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      val zero = rows.filter(col("edit_dist") === 0)
        .join(docs.toDF("doc_a", "ta"), "doc_a")
        .join(docs.toDF("doc_b", "tb"), "doc_b")
      assert(zero.filter(col("ta") =!= col("tb")).count() === 0)
    } finally rows.unpersist()
  }

  test("dq7 expectations: uniqueness count matches an independent groupBy; planted rows fire each rule") {
    val res = graft.queries.Relational.queries("dq7_expectations")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val n = Tables.lineitem(spark, dir).count()
    assert(res.values.forall(_.getLong(2) == n))
    // r6 vs an independently computed duplicate-row count
    val dups = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey", "l_linenumber").count()
      .filter(col("count") > 1)
      .agg(sum(col("count") - 1)).collect()(0).getLong(0)
    assert(res("r6").getLong(3) == dups, s"r6 ${res("r6")} vs groupBy $dups")
    // Planted single-row violations must fire r1..r5 exactly once each.
    val src = Tables.lineitem(spark, dir).limit(1)
    val bad = src
      .withColumn("l_quantity", lit(99.0))
      .withColumn("l_extendedprice", lit(-1.0))
      .withColumn("l_discount", lit(0.9))
      .withColumn("l_shipdate", lit(null).cast("timestamp"))
      .withColumn("l_returnflag", lit("X"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_dq7_").toString
    src.unionByName(bad).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val planted = graft.queries.Relational.queries("dq7_expectations")(spark, tmp)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    Seq("r1", "r2", "r3", "r4", "r5").foreach(r =>
      assert(planted(r) == 1L, s"$r should fire once: $planted"))
    assert(planted("r6") == 1L) // same (orderkey, linenumber) twice
  }

  test("a12 approx percentile lands within the sketch's rank-error bound of the exact value") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val approx = graft.queries.Relational
      .queries("a12_approx_percentile")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val li = Tables.lineitem(spark, dir)
    // Rank-error bound: accuracy 10000 → the returned value's RANK is
    // within n/10000 of the target rank. Check by rank, not value.
    for ((flag, (p50, p90)) <- approx) {
      val grp = li.filter(col("l_returnflag") === flag)
      val n = grp.count().toDouble
      def rankOf(v: Double): Double =
        grp.filter(col("l_extendedprice") <= v).count().toDouble / n
      val tol = 1.0 / 10000 + 1.0 / n // sketch bound + discrete-rank slack
      assert(math.abs(rankOf(p50) - 0.5) <= tol + 0.5 / n,
        s"$flag p50 rank ${rankOf(p50)}")
      assert(math.abs(rankOf(p90) - 0.9) <= tol + 0.5 / n,
        s"$flag p90 rank ${rankOf(p90)}")
    }
    assert(approx.nonEmpty)
  }
}
