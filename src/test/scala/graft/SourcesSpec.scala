package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink surface (SURVEY.md §3.1 S7/S9): csv and json round-trips
  * with explicit schemas + options, and the bucketing claim from SCALE.md
  * demonstrated — aggregations and joins on a bucketed key plan NO
  * shuffle exchange.
  */
class SourcesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("csv round-trip with header + explicit schema preserves the table") {
    val src = Tables.customer(spark, dir)
    val out = Files.createTempDirectory("graft_csv_").toString
    src.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read
      .option("header", "true")
      .schema(src.schema)
      .csv(out)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("json round-trip preserves values (schema re-imposed on read)") {
    val src = Tables.orders(spark, dir)
    val out = Files.createTempDirectory("graft_json_").toString
    src.write.mode("overwrite").json(out)
    val back = spark.read.schema(src.schema).json(out)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("csv bad-record handling: PERMISSIVE captures, DROPMALFORMED drops, FAILFAST throws") {
    import org.apache.spark.sql.types._
    val out = Files.createTempDirectory("graft_badcsv_").toString
    Files.writeString(java.nio.file.Paths.get(s"$out/data.csv"),
      "id,qty\n1,10\n2,notanumber\n3,30\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("qty", IntegerType),
      StructField("_corrupt", StringType)))

    val permissive = spark.read.option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt").schema(schema).csv(s"$out/data.csv")
    // Corrupt-record column semantics: must materialize the raw line for the
    // bad row and null for good ones.
    val rows = permissive.cache().collect() // cache: corrupt col needs full-row parse
    assert(rows.length === 3)
    assert(permissive.filter(col("_corrupt").isNotNull).count() === 1)
    assert(permissive.filter(col("_corrupt").isNotNull).select("id").head().getInt(0) === 2)

    val dropped = spark.read.option("header", "true").option("mode", "DROPMALFORMED")
      .schema(StructType(schema.dropRight(1))).csv(s"$out/data.csv")
    assert(dropped.select(sum("qty")).head().getLong(0) === 40L)

    intercept[org.apache.spark.SparkException] {
      spark.read.option("header", "true").option("mode", "FAILFAST")
        .schema(StructType(schema.dropRight(1))).csv(s"$out/data.csv").collect()
    }
  }

  test("multiline json objects parse with multiLine=true") {
    val out = Files.createTempDirectory("graft_mljson_").toString
    Files.writeString(java.nio.file.Paths.get(s"$out/data.json"),
      """[
        |  {"id": 1,
        |   "name": "alpha"},
        |  {"id": 2,
        |   "name": "beta"}
        |]""".stripMargin)
    val ml = spark.read.option("multiLine", "true").json(s"$out/data.json")
    assert(ml.count() === 2)
    assert(ml.orderBy("id").select("name").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSeq === Seq("alpha", "beta"))
    // Without multiLine the same file is one corrupt record, not two rows.
    val single = spark.read.json(s"$out/data.json")
    assert(single.columns.contains("_corrupt_record") || single.count() != 2)
  }

  test("parquet partitioned write prunes partitions on read") {
    val src = Tables.documents(spark, dir).select("doc_id", "lang", "source", "text")
    val out = Files.createTempDirectory("graft_part_").toString
    src.write.mode("overwrite").partitionBy("lang").parquet(out)
    val scan = spark.read.parquet(out).filter(col("lang") === "es")
    assert(scan.count() === src.filter(col("lang") === "es").count())
    // Partition pruning: the executed scan must touch only the es partition.
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition filters in:\n$plan")
  }

  test("dynamic partition overwrite replaces only incoming partitions; static truncates") {
    val src = Tables.documents(spark, dir).select("doc_id", "lang", "text")
    val langs = src.select("lang").distinct().count()
    assert(langs > 1, "fixture must have multiple langs for this test")
    val out = Files.createTempDirectory("graft_dpo_").toString
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try {
      src.write.mode("overwrite").partitionBy("lang").parquet(out)
      val revised = src.filter(col("lang") === "en")
        .withColumn("text", upper(col("text")))
      // Dynamic: only lang=en is replaced — other partitions survive and
      // the revised rows carry the new values.
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      revised.write.mode("overwrite").partitionBy("lang").parquet(out)
      val back = spark.read.parquet(out)
      assert(back.select("lang").distinct().count() === langs)
      assert(back.count() === src.count())
      assert(back.filter(col("lang") === "en" &&
        col("text") =!= upper(col("text"))).count() === 0L)
      // Static: the SAME write truncates the whole table down to lang=en.
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      revised.write.mode("overwrite").partitionBy("lang").parquet(out)
      assert(spark.read.parquet(out).select("lang").distinct().count() === 1L)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  test("bucketed tables eliminate the shuffle for key-aggregations and key-joins") {
    val wasAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val wasBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // Disable broadcast so the join must pick sort-merge — the strategy
    // bucketing makes shuffle-free (at real scale neither side broadcasts).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val e = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
      spark.sql("DROP TABLE IF EXISTS edges_bucketed")
      e.write.mode("overwrite").bucketBy(8, "src").sortBy("src")
        .saveAsTable("edges_bucketed")
      val t = spark.table("edges_bucketed")

      val aggPlan = t.groupBy("src").count().queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"groupBy on the bucket key must not shuffle:\n$aggPlan")

      val t2 = spark.table("edges_bucketed").withColumnRenamed("dst", "dst2")
      val joinPlan = t.join(t2, Seq("src")).queryExecution.executedPlan.toString
      assert(!joinPlan.contains("Exchange"),
        s"self-join on the bucket key must not shuffle:\n$joinPlan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", wasAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", wasBroadcast)
      spark.sql("DROP TABLE IF EXISTS edges_bucketed")
    }
  }

  test("s17 schema evolution: mergeSchema surfaces the late column, NULL-filled for old batches") {
    val out = Files.createTempDirectory("graft_evo_").toString
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
    o.filter(col("o_orderkey") % 2 === 0)
      .write.mode("overwrite").parquet(s"$out/batch=0")
    o.filter(col("o_orderkey") % 2 =!= 0).withColumn("extra", lit(7))
      .write.mode("overwrite").parquet(s"$out/batch=1")
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.columns.contains("extra"))
    assert(merged.count() == o.count(), "no row loss across schemas")
    // NULL exactly on the old batch, populated exactly on the new one.
    assert(merged.filter(col("extra").isNull === (col("o_orderkey") % 2 === 0))
      .count() == o.count())
  }

  test("events.ts normalizes to TIMESTAMP under both parquet encodings") {
    import org.apache.spark.sql.types._
    // The driver's generator has shipped ts as TIMESTAMP(NANOS) (decoded
    // long) and TIMESTAMP(MICROS) (decoded NTZ); both must surface as the
    // LTZ TimestampType with identical µs values (UTC session).
    val base = Tables.events(spark, dir)
    assert(base.schema("ts").dataType == TimestampType,
      s"live testdata must normalize to TimestampType, got ${base.schema("ts").dataType}")

    // Synthesize both encodings from the same instants and re-read through
    // the accessor: long nanos (legacy path, ns→µs truncation in longs)
    // and NTZ micros (current path, value-preserving cast).
    val micros = Seq(0L, 1L, 999999L, 1700000000123456L)
    val rows = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
    val nanosDir = Files.createTempDirectory("graft_ev_ns_").toString
    spark.createDataFrame(rows).toDF("event_id", "us")
      .selectExpr("event_id", "us * 1000 + 999 AS ts") // sub-µs ns must truncate
      .coalesce(1).write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    val ntzDir = Files.createTempDirectory("graft_ev_ntz_").toString
    spark.createDataFrame(rows).toDF("event_id", "us")
      .selectExpr("event_id",
        "CAST(timestamp_micros(us) AS TIMESTAMP_NTZ) AS ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$ntzDir/events.parquet")

    for (d <- Seq(nanosDir, ntzDir)) {
      val got = Tables.events(spark, d)
      assert(got.schema("ts").dataType == TimestampType, s"dir=$d")
      val vals = got.select(unix_micros(col("ts")))
        .as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted.toSeq
      assert(vals == micros.sorted, s"dir=$d got $vals")
    }
  }
}
