package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

/** Structured Streaming behavior tests (SURVEY.md §6.5): watermark
  * drop/keep semantics, within-watermark dedup, stateful per-key logic,
  * session windows, and the foreachBatch file sink — all over MemoryStream
  * replays with controlled event-time order and injected late rows.
  */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  private def ev(id: Long, t: String, uid: Long = 1L, typ: String = "view",
      v: Double = 1.0): Event = Event(id, ts(t), uid, typ, v)

  test("ST1+ST3: tumbling window emits closed windows and drops late rows past the watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = StreamOps.tumblingCounts(ms.toDF(), "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("tumbling_test").outputMode("append").start()
    try {
      // Two events in [10:00,11:00), one at 11:10 to pull the watermark to 11:00.
      ms.addData(ev(1, "2024-01-01T10:00:00Z"), ev(2, "2024-01-01T10:30:00Z"),
        ev(3, "2024-01-01T11:10:00Z"))
      q.processAllAvailable()
      // Watermark advances on the NEXT batch; push it past 11:00.
      ms.addData(ev(4, "2024-01-01T12:30:00Z"))
      q.processAllAvailable()
      val closed = spark.table("tumbling_test")
        .select(col("ws").cast("string"), col("n")).as[(String, Long)].collect().toMap
      assert(closed("2024-01-01 10:00:00") === 2L)
      // A late row behind the watermark (12:20) must be DROPPED: the closed
      // window's count must not change and no new 10:00 row may appear.
      ms.addData(ev(5, "2024-01-01T10:15:00Z"))
      q.processAllAvailable()
      ms.addData(ev(6, "2024-01-01T14:30:00Z")) // advance again to flush
      q.processAllAvailable()
      val rows = spark.table("tumbling_test")
        .filter(col("ws").cast("string") === "2024-01-01 10:00:00")
        .select("n").as[Long].collect()
      assert(rows.toSeq === Seq(2L), "late event must not reopen or re-emit the closed window")
    } finally q.stop()
  }

  test("ST5: dropDuplicatesWithinWatermark keeps one row per event_id") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = StreamOps.dedupEvents(ms.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dedup_test").outputMode("append").start()
    try {
      ms.addData(ev(1, "2024-01-01T10:00:00Z"), ev(1, "2024-01-01T10:00:00Z"),
        ev(2, "2024-01-01T10:01:00Z"))
      q.processAllAvailable()
      ms.addData(ev(1, "2024-01-01T10:02:00Z")) // dup within watermark → dropped
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("ST5b: content dedup collapses re-delivered payloads with fresh event ids") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = StreamOps.dedupByContent(ms.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("content_dedup_test").outputMode("append").start()
    try {
      // Same payload (uid=1, view, 1.0) under three DIFFERENT event ids,
      // plus one distinct payload.
      ms.addData(ev(1, "2024-01-01T10:00:00Z"), ev(2, "2024-01-01T10:01:00Z"),
        ev(3, "2024-01-01T10:02:00Z", uid = 2L, v = 5.0))
      q.processAllAvailable()
      ms.addData(ev(4, "2024-01-01T10:03:00Z")) // re-delivery, new id → dropped
      q.processAllAvailable()
      val ids = spark.table("content_dedup_test").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 3L), "one row per distinct payload, first delivery wins")
    } finally q.stop()
  }

  test("ST4: mapGroupsWithState accumulates per-user state across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = StreamOps.userRunningState(ms.toDS())
      .writeStream.format("memory").queryName("state_test").outputMode("update").start()
    try {
      ms.addData(ev(1, "2024-01-01T10:00:00Z", uid = 7, typ = "view", v = 2.0),
        ev(2, "2024-01-01T10:01:00Z", uid = 7, typ = "error", v = 1.0))
      q.processAllAvailable()
      ms.addData(ev(3, "2024-01-01T10:02:00Z", uid = 7, typ = "error", v = 3.0))
      q.processAllAvailable()
      val last = spark.table("state_test")
        .filter(col("user_id") === 7)
        .orderBy(col("n_events").desc).limit(1)
        .select("n_events", "total_value", "error_streak")
        .as[(Long, Double, Int)].head()
      assert(last === ((3L, 6.0, 2)))
    } finally q.stop()
  }

  test("ST16: transformWithState accumulates ValueState + MapState across micro-batches (RocksDB)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = StreamOps.userStatsTws(ms.toDS())
        .toDF()
        .writeStream.format("memory").queryName("tws_test")
        .outputMode("update").start()
      try {
        // Batch 1: two users; user 7 has two event types.
        ms.addData(ev(1, "2024-01-01T10:00:00Z", uid = 7, typ = "view", v = 2.25),
          ev(2, "2024-01-01T10:01:00Z", uid = 7, typ = "error", v = 1.10),
          ev(3, "2024-01-01T10:01:30Z", uid = 9, typ = "view", v = 5.00))
        q.processAllAvailable()
        // Batch 2: user 7 again — the profile must CONTINUE from state
        // (n=3, cents summed exactly, type count deduplicated), proving
        // both variables survived the batch boundary in RocksDB.
        ms.addData(ev(4, "2024-01-01T10:02:00Z", uid = 7, typ = "view", v = 3.40))
        q.processAllAvailable()
        val rows = spark.table("tws_test")
          .filter(col("user_id") === 7)
          .orderBy(col("n_events"))
          .as[StreamOps.UserTwsStats].collect()
        assert(rows.map(_.n_events).toSeq === Seq(2L, 3L))
        assert(rows.last === StreamOps.UserTwsStats(7L, 3L, 675L, 2L, 340L))
        val u9 = spark.table("tws_test").filter(col("user_id") === 9)
          .as[StreamOps.UserTwsStats].head()
        assert(u9 === StreamOps.UserTwsStats(9L, 1L, 500L, 1L, 500L))
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None    => spark.conf.unset(providerKey)
    }
  }

  test("ST17: transformWithState timers evict idle sessions exactly once; stale timers never fire (RocksDB)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val watermarked = ms.toDF().withWatermark("ts", "0 seconds").as[Event]
      val q = StreamOps.userSessionsTws(watermarked, gapMs = 30 * 60 * 1000L)
        .toDF().writeStream.format("memory").queryName("tws_timer_test")
        .outputMode("append").start()
      try {
        // Batch 1: one session for user 1 (10:00 + 10:10) — timer armed at
        // 10:40, nothing emitted.
        ms.addData(ev(1, "2024-01-01T10:00:00Z"), ev(2, "2024-01-01T10:10:00Z"))
        q.processAllAvailable()
        assert(spark.table("tws_timer_test").isEmpty)
        // Batch 2: 10:20 EXTENDS the session across the batch boundary —
        // the 10:40 timer is now STALE (replaced by 10:50). If it weren't
        // deleted/guarded, the watermark sweep below would fire it and
        // evict a session that was since extended.
        ms.addData(ev(3, "2024-01-01T10:20:00Z"))
        q.processAllAvailable()
        assert(spark.table("tws_timer_test").isEmpty)
        // Sentinel user drags the watermark past BOTH timer times; the
        // next batch's timer sweep must fire the live 10:50 timer exactly
        // once, emitting the full extended session via handleExpiredTimer.
        ms.addData(ev(4, "2024-01-01T11:30:00Z", uid = 99))
        q.processAllAvailable()
        ms.addData(ev(5, "2024-01-01T11:31:00Z", uid = 99))
        q.processAllAvailable()
        val got = spark.table("tws_timer_test")
          .select(col("user_id"), col("session_start").cast("string"),
            col("session_end").cast("string"), col("n_events"))
          .as[(Long, String, String, Long)].collect().toSeq
        assert(got === Seq((1L, "2024-01-01 10:00:00", "2024-01-01 10:20:00", 3L)),
          s"expected exactly one timer-evicted session, got $got")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None    => spark.conf.unset(providerKey)
    }
  }

  test("ST2: session windows split on the gap and emit after the watermark passes") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = StreamOps.sessionStats(ms.toDF(), gap = "30 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("session_test").outputMode("append").start()
    try {
      // user 1: 10:00 + 10:10 (one session), 11:30 (a second session).
      ms.addData(ev(1, "2024-01-01T10:00:00Z"), ev(2, "2024-01-01T10:10:00Z"),
        ev(3, "2024-01-01T11:30:00Z"))
      q.processAllAvailable()
      ms.addData(ev(4, "2024-01-01T15:00:00Z")) // advance watermark, close all prior
      q.processAllAvailable()
      val sessions = spark.table("session_test")
        .filter(col("user_id") === 1)
        .select(col("session_start").cast("string"), col("n_events"))
        .as[(String, Long)].collect().sortBy(_._1)
      assert(sessions.length >= 2)
      assert(sessions.head === (("2024-01-01 10:00:00", 2L)))
      assert(sessions(1) === (("2024-01-01 11:30:00", 1L)))
    } finally q.stop()
  }

  test("ST2 boundary: session ending exactly AT the watermark emits (non-strict predicate)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = StreamOps.sessionStats(ms.toDF(), gap = "30 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("session_boundary_test").outputMode("append").start()
    try {
      // User 1's session is [10:00, 10:30); user 2's 10:40 event sets the
      // watermark to exactly 10:30 after the batch. The no-data batch must
      // then emit user 1's session — session_end == watermark finalizes
      // (the <= the st2_stream_roundtrip oracle encodes) — while user 2's
      // own session [10:40, 11:10) stays in state.
      ms.addData(ev(1, "2024-01-01T10:00:00Z"),
        ev(2, "2024-01-01T10:40:00Z", uid = 2))
      q.processAllAvailable()
      val got = spark.table("session_boundary_test")
        .select(col("user_id"), col("session_end").cast("string"))
        .as[(Long, String)].collect().toSeq
      assert(got === Seq((1L, "2024-01-01 10:30:00")),
        "session_end == watermark must emit; later sessions must not")
    } finally q.stop()
  }

  test("ST4b boundary: timeout exactly AT the watermark does NOT fire (strict predicate)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val watermarked = ms.toDF().withWatermark("ts", "10 minutes").as[Event]
    val q = StreamOps.userSessionsTimeout(watermarked, gapMs = 45 * 60 * 1000L)
      .writeStream.format("memory").queryName("fmgws_boundary_test").outputMode("append").start()
    try {
      // User 1's session ends 10:00 → timeout at 10:45. User 2's 10:55
      // event puts the watermark at exactly 10:45: strictly-less-than means
      // the timeout must NOT fire yet.
      ms.addData(ev(1, "2024-01-01T10:00:00Z"),
        ev(2, "2024-01-01T10:55:00Z", uid = 2))
      q.processAllAvailable()
      assert(spark.table("fmgws_boundary_test").isEmpty,
        "timeoutTimestamp == watermark must not fire (strict <)")
      // One more millisecond of watermark does fire it.
      ms.addData(ev(3, "2024-01-01T10:55:00.001Z", uid = 2))
      q.processAllAvailable()
      val got = spark.table("fmgws_boundary_test")
        .select(col("user_id"), col("session_end").cast("string"))
        .as[(Long, String)].collect().toSeq
      assert(got === Seq((1L, "2024-01-01 10:00:00")))
    } finally q.stop()
  }

  test("ST4b: flatMapGroupsWithState emits sessions when the event-time timeout fires") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val watermarked = ms.toDF().withWatermark("ts", "0 seconds").as[Event]
    val q = StreamOps.userSessionsTimeout(watermarked, gapMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("fmgws_test").outputMode("append").start()
    try {
      // One session for user 1: 10:00 + 10:10.
      ms.addData(ev(1, "2024-01-01T10:00:00Z"), ev(2, "2024-01-01T10:10:00Z"))
      q.processAllAvailable()
      assert(spark.table("fmgws_test").isEmpty) // gap not yet elapsed
      // Another user's late-day event pushes the watermark past 10:40.
      ms.addData(ev(3, "2024-01-01T15:00:00Z", uid = 99))
      q.processAllAvailable()
      ms.addData(ev(4, "2024-01-01T15:01:00Z", uid = 99)) // watermark advances on next batch
      q.processAllAvailable()
      val got = spark.table("fmgws_test")
        .select(col("user_id"), col("session_start").cast("string"),
          col("session_end").cast("string"), col("n_events"))
        .as[(Long, String, String, Long)].collect().toSeq
      assert(got === Seq((1L, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2L)))
    } finally q.stop()
  }

  test("ST4: batch st4_sessionization render matches the flatMapGroupsWithState state machine") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"

    // Real events for a handful of users, replayed through the streaming
    // state machine with the same 45-minute gap the batch query uses. A
    // far-future sentinel user then drags the watermark past every real
    // session's end+gap so ALL of them time out and emit — at which point
    // the streaming output must equal the batch lag+cumsum render row for
    // row (the `closed` flag aside, which the sentinel makes all-true).
    val subset = Tables.events(spark, dir).filter(col("user_id") < 20)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().toSeq
    val ms = MemoryStream[Event]
    val watermarked = ms.toDF().withWatermark("ts", "0 seconds").as[Event]
    val q = StreamOps.userSessionsTimeout(watermarked, gapMs = 45 * 60 * 1000L)
      .writeStream.format("memory").queryName("st4_equiv_test").outputMode("append").start()
    try {
      val sentinelTs = subset.map(_.ts.getTime).max + 10L * 24 * 3600 * 1000
      ms.addData(subset: _*)
      q.processAllAvailable()
      ms.addData(Event(9000001L, new Timestamp(sentinelTs), 999999L, "view", 0.0))
      q.processAllAvailable()
      ms.addData(Event(9000002L, new Timestamp(sentinelTs + 1000), 999999L, "view", 0.0))
      q.processAllAvailable()

      // The state machine keeps epoch-millis (Timestamp.getTime), the batch
      // render keeps the parquet microseconds — truncate both for compare.
      def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String, Long)] =
        df.filter(col("user_id") < 20)
          .select(col("user_id"),
            date_trunc("millisecond", col("session_start")).cast("string"),
            date_trunc("millisecond", col("session_end")).cast("string"),
            col("n_events"))
          .as[(Long, String, String, Long)].collect().toSeq.sorted
      val streamed = rows(spark.table("st4_equiv_test"))
      val batch    = rows(SparkEntry.queries("st4_sessionization")(spark, dir))
      assert(streamed.nonEmpty && streamed === batch)
    } finally q.stop()
  }

  test("ST6: stream-static join enriches events with the customer dimension") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val customers = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val q = StreamOps.enrich(ms.toDF(), customers)
      .writeStream.format("memory").queryName("enrich_test").outputMode("append").start()
    try {
      ms.addData(ev(1, "2024-01-01T10:00:00Z", uid = 1), ev(2, "2024-01-01T10:01:00Z", uid = 99))
      q.processAllAvailable()
      val got = spark.table("enrich_test")
        .select("event_id", "c_mktsegment").as[(Long, Option[String])].collect().toMap
      assert(got(1L) === Some("BUILDING"))
      assert(got(2L) === None)
    } finally q.stop()
  }

  test("ST8: stream-stream join matches across micro-batches via buffered state") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = StreamOps.errorsAfterPurchases(ms.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("ss_join_test").outputMode("append").start()
    try {
      ms.addData(ev(1, "2024-01-01T10:00:00Z", typ = "purchase"))
      q.processAllAvailable()
      assert(spark.table("ss_join_test").isEmpty)
      // The matching error arrives a batch LATER: only buffered join state
      // can produce the match.
      ms.addData(ev(2, "2024-01-01T12:00:00Z", typ = "error"))
      q.processAllAvailable()
      val got = spark.table("ss_join_test")
        .select("event_id", "purchase_id").as[(Long, Long)].collect().toSeq
      assert(got === Seq((2L, 1L)))
      // An error outside the 1-day window after the purchase must not match.
      ms.addData(ev(3, "2024-01-03T10:00:00Z", typ = "error"))
      q.processAllAvailable()
      assert(spark.table("ss_join_test").count() === 1)
    } finally q.stop()
  }

  test("ST9 boundary: outer-join null emits only when the MIN watermark strictly passes the row") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = StreamOps.errorsAfterPurchasesJoin(ms.toDF(), "10 minutes", "left_outer")
      .select(col("event_id"), col("purchase_id"))
      .writeStream.format("memory").queryName("ss_outer_test").outputMode("append").start()
    try {
      // Unmatched error for user 1; an unmatchable purchase (newer than the
      // error) keeps the purchase-side watermark node fed.
      ms.addData(ev(1, "2024-01-01T10:00:00Z", typ = "error"),
        ev(2, "2024-01-01T10:30:00Z", uid = 9, typ = "purchase"))
      q.processAllAvailable()
      // Error-side max 10:00 → min-watermark 09:50 < row: nothing lands.
      assert(spark.table("ss_outer_test").isEmpty)
      // Error-side max 10:10 → min(10:10, 10:30) − 10m = 10:00 == row ts:
      // STRICT eviction must still hold it back.
      ms.addData(ev(3, "2024-01-01T10:10:00Z", uid = 9, typ = "error"))
      q.processAllAvailable()
      assert(spark.table("ss_outer_test").isEmpty,
        "ts == min-watermark must not null-evict (strict <)")
      // One more millisecond: the null row for the unmatched error lands.
      ms.addData(ev(4, "2024-01-01T10:10:00.001Z", uid = 9, typ = "error"))
      q.processAllAvailable()
      val got = spark.table("ss_outer_test")
        .select(col("event_id"), col("purchase_id"))
        .as[(Long, Option[Long])].collect().toSet
      assert(got.contains((1L, None)),
        s"unmatched error must null-emit once strictly behind the min watermark: $got")
    } finally q.stop()
  }

  test("ST7+S8: file-stream source through foreachBatch parquet sink lands every row") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft_sink_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val stream = StreamOps.eventsStream(spark, dir)
    val q = StreamOps.parquetAppendSink(stream, out, ckpt)
    q.awaitTermination()
    val n = spark.read.parquet(out).count()
    val expected = Tables.events(spark, dir).count()
    assert(n === expected)
  }

  test("S8 kafka-shaped source: wire schema lands, decode is lossless, pacing is per-partition-file") {
    val dir = "/root/testdata/sf0.001"
    val scratch = Files.createTempDirectory("graft_kafka_").toString
    graft.sources.ArtifactStore.registerExitCleanup(scratch)
    val landing = s"$scratch/kafka_landing"
    StreamOps.kafkaShapedLanding(spark, dir, landing, partitions = 4)
    // Wire shape: the exact columns a format("kafka") source yields, laid
    // out chunk=i per offset-range fetch (a time slice of EVERY
    // partition — the unit a maxOffsetsPerTrigger consumer advances by),
    // one file per dir so maxFilesPerTrigger=1 paces 4 micro-batches in
    // arrival (mtime) order.
    val wire = spark.read.parquet(landing)
    assert(wire.columns.toSet ===
      Set("key", "value", "topic", "partition", "offset", "timestamp", "chunk"))
    assert(wire.schema("key").dataType === org.apache.spark.sql.types.BinaryType)
    assert(wire.schema("value").dataType === org.apache.spark.sql.types.BinaryType)
    val chunkDirs = new java.io.File(landing).listFiles()
      .filter(_.getName.startsWith("chunk="))
    assert(chunkDirs.length === 4, "one landing dir per offset-range chunk")
    chunkDirs.foreach { cd =>
      assert(cd.listFiles().count(_.getName.endsWith(".parquet")) === 1,
        s"exactly one file per chunk dir, got ${cd.getName}")
    }
    // Chunks advance offsets monotonically on every partition (the Kafka
    // fetch contract): max offset per partition in chunk i < min in i+1.
    val ranges = wire.groupBy("partition", "chunk")
      .agg(min("offset").as("lo"), max("offset").as("hi"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3)))).toMap
    for (((p, c), (lo, _)) <- ranges; prev <- ranges.get((p, c - 1)))
      assert(prev._2 < lo, s"partition $p chunk $c offsets must follow chunk ${c - 1}")
    // Offsets are per-partition monotone from 0 (Kafka's contract).
    val offs = wire.groupBy("partition")
      .agg(min("offset").as("lo"), max("offset").as("hi"), count(lit(1)).as("n"))
      .collect()
    offs.foreach { r =>
      assert(r.getLong(1) === 0L)
      assert(r.getLong(2) === r.getLong(3) - 1)
    }
    // Run the decoded stream to a sink; every row round-trips losslessly.
    val out = Files.createTempDirectory("graft_kafka_out_").toString
    val ckpt = Files.createTempDirectory("graft_kafka_ckpt_").toString
    val q = StreamOps.parquetAppendSink(
      StreamOps.eventsSource(spark, dir, "kafka", scratch), out, ckpt)
    q.awaitTermination()
    // Rate limit honored: at least 4 micro-batches committed (one per file).
    val batches = new java.io.File(s"$ckpt/commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 4, s"expected >=4 paced micro-batches, saw $batches")
    val got = spark.read.parquet(out)
    val want = Tables.events(spark, dir)
    assert(got.count() === want.count())
    assert(got.schema === want.schema)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "kafka-wire JSON round-trip must be lossless")
  }

  test("ST7 recovery: killed mid-stream after a side effect, restart from checkpoint is exactly-once") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val in = Files.createTempDirectory("graft_rec_in_").toString
    val out = Files.createTempDirectory("graft_rec_out_").toString
    val ckpt = Files.createTempDirectory("graft_rec_ckpt_").toString
    Seq(in, out, ckpt).foreach(graft.sources.ArtifactStore.registerExitCleanup)
    // Three input files → with maxFilesPerTrigger=1, three micro-batches.
    val events = Tables.events(spark, dir)
      .select("event_id", "user_id", "event_type", "value")
    events.repartition(3).write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    def source = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)

    // Run 1: crash INJECTED AFTER batch 1's parquet write but BEFORE its
    // checkpoint commit — the worst-ordered failure (side effect landed,
    // offset not committed), which a plain append sink would duplicate.
    val writesPerBatch = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
    def sink(crashAtBatch: Option[Long]) = source.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamOps.writeBatchIdempotent(batch, out, id)
        writesPerBatch.merge(id, 1, (a, b) => a + b)
        if (crashAtBatch.contains(id))
          throw new RuntimeException("injected crash after side effect")
      }
      .start()
    val q1 = sink(crashAtBatch = Some(1L))
    val crashed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    assert(crashed.getMessage.contains("injected crash"),
      s"query died for the wrong reason: ${crashed.getMessage}")

    // Run 2, same checkpoint: must REPLAY batch 1 (written but uncommitted)
    // with the same id, overwrite its orphaned output, continue to batch 2.
    val q2 = sink(crashAtBatch = None)
    q2.awaitTermination()

    // Batch 0 committed before the crash → processed exactly once; batch 1
    // executed twice (crashed attempt + replay) — the recovery boundary.
    assert(writesPerBatch.get(0L) === 1)
    assert(writesPerBatch.get(1L) === 2)
    // Exactly-once OUTPUT despite the double execution: the id multiset of
    // the recovered sink equals the batch table's, no loss, no dupes.
    val got = spark.read.parquet(s"$out/batch=*")
      .select("event_id").as[Long].collect().sorted
    val expected = events.select("event_id").as[Long].collect().sorted
    assert(got.length === expected.length,
      s"row count across restart: got ${got.length}, expected ${expected.length}")
    assert(java.util.Arrays.equals(got, expected))
  }

  test("t27 streaming quality gate lands exactly the batch t25 survivors") {
    // Per-doc metrics carry no cross-doc state, so the stream's admission
    // must equal the batch decision row-for-row — the same contract t17
    // carries for incremental dedup, here checked in-engine (the oracle
    // checks it cross-engine).
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.queries.TextDedup
      .queries("t27_stream_quality_gate")(spark, dir).collect()
    val batch = graft.queries.TextDedup
      .queries("t25_repetition_filter")(spark, dir)
      .filter(org.apache.spark.sql.functions.col("keep") === 1).collect()
    assert(streamed.map(_.toString).sorted.toSeq ==
      batch.map(_.toString).sorted.toSeq,
      s"stream landed ${streamed.length} rows, batch kept ${batch.length}")
  }

  test("ST12: CDC apply across 3 real micro-batches equals the one-shot batch apply") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, dir)
    val base = Files.createTempDirectory("st12_spec_").toString
    graft.sources.ArtifactStore.registerExitCleanup(base)
    // Land the changelog source in three disjoint files so
    // maxFilesPerTrigger=1 forces three genuine micro-batches, each
    // carrying an arbitrary key slice (boundary-invariance is the claim).
    (0 until 3).foreach { i =>
      orders.filter(col("o_orderkey") % 3 === i).coalesce(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val snap = s"$base/snapshot"
    val q = spark.readStream.schema(orders.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.incrementAndGet()
        queries.Etl.applyCdcBatch(b, snap)
      }
      .start()
    q.awaitTermination()
    assert(batches.get() >= 3, s"expected >=3 micro-batches, saw ${batches.get()}")
    val streamed = queries.Etl.cdcFinal(spark.read.parquet(snap))
      .orderBy("o_orderkey").collect()
    val oneShot = queries.Etl.queries("s18_cdc_apply")(spark, dir).collect()
    assert(streamed.map(_.toString).toSeq == oneShot.map(_.toString).toSeq,
      "micro-batched CDC state diverged from the batch apply")
  }

  test("ST15: IVF append across 3 real micro-batches equals the one-shot batch append") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = Files.createTempDirectory("st15_spec_").toString
    graft.sources.ArtifactStore.registerExitCleanup(base)
    // Land the held-out batch (vec_id % 7 == 0) as three disjoint files so
    // maxFilesPerTrigger=1 forces three genuine micro-batches — per-row
    // assignment must make the final standing file batch-boundary
    // invariant.
    (0 until 3).foreach { i =>
      emb.filter(col("vec_id") % 7 === 0 && col("vec_id") % 3 === i).coalesce(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val batchResult = graft.queries.Embeddings
      .queries("v12_ivf_append")(spark, dir).collect()
    // Replay the st15 foreachBatch shape against the staged files. The
    // base index artifacts are shared with v12 (same keyed snapshot).
    val q = graft.queries.Embeddings.queries("st15_stream_ivf_append")(spark, dir)
    val streamedGated = q.collect()
    assert(streamedGated.map(_.toString).toSeq ==
      batchResult.map(_.toString).toSeq,
      "gated streaming append diverged from the batch append")
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    import graft.sources.SnapshotSink
    val standing = s"$base/lists"
    val sq = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.incrementAndGet()
        graft.queries.Embeddings.appendBatchToStanding(b, dir, standing)
      }
      .start()
    sq.awaitTermination()
    assert(batches.get() >= 3, s"expected >=3 micro-batches, saw ${batches.get()}")
    val searched = graft.queries.Embeddings
      .searchStanding(spark, dir, standing).collect()
    assert(searched.map(_.toString).toSeq == batchResult.map(_.toString).toSeq,
      "micro-batched append state diverged from the batch append")
    // At-least-once tolerance: re-deliver one already-applied batch (the
    // crash-between-publish-and-offset-commit window) — the standing
    // file's primary-key collapse must make it a no-op.
    graft.queries.Embeddings.appendBatchToStanding(
      emb.filter(col("vec_id") % 7 === 0 && col("vec_id") % 3 === 1), dir, standing)
    val afterRedelivery = graft.queries.Embeddings
      .searchStanding(spark, dir, standing).collect()
    assert(afterRedelivery.map(_.toString).toSeq ==
      batchResult.map(_.toString).toSeq,
      "re-delivered micro-batch changed the standing index")
  }
}
