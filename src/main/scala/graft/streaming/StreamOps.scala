package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming operators ST1–ST7 (SURVEY.md §3.10).
  *
  * The reference's only "streaming" is a polling crawl loop with time-based
  * scheduling (`src/tropology/core.clj` + the crawl-queue scan, public
  * repo); these are the north-star re-expressions over an unbounded
  * `events` stream. Every transform here takes a STREAMING DataFrame
  * (`spark.readStream...`) and is also valid on a batch frame with
  * identical semantics minus the watermark — which is how the batch-shape
  * variants in [[graft.queries.WindowsAndEvents]] are oracle-checked, while
  * the streaming behaviors (watermark dropping, state, sinks) are asserted
  * in StreamingSpec with MemoryStream fixtures.
  *
  * Scale notes: state stores are keyed by (group key) and partitioned by
  * the shuffle on that key; watermarks bound state size (ST3) — without
  * them session/window state grows without limit at 100 TB/day ingest.
  */
object StreamOps {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** ST1: watermarked tumbling windows per event type. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes",
      win: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec2(col("value"))).cast("double").as("total_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("total_value"))

  /** ST1b: sliding windows. */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes",
      win: String = "1 hour", slide: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win, slide).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))

  /** ST2: session windows per user (gap-based). */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(dec2(col("value"))).cast("double").as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total_value"))

  /** ST5: within-watermark dedup by event id. */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** ST5b: within-watermark CONTENT dedup — the streaming form of exact
    * text dedup (T3): rows are deduplicated by an md5 fingerprint of their
    * payload, not their id, so re-delivered copies with fresh event_ids
    * still collapse. State is one fingerprint per unique payload inside
    * the watermark horizon — bounded, like every watermarked op here.
    */
  def dedupByContent(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      // JSON-encode the payload struct for the fingerprint: field names and
      // escaping make it injective where a delimiter join is not —
      // concat_ws would SKIP null fields, aliasing (type=NULL, value=2.0)
      // with (type="2.0", value=NULL), and a field containing the delimiter
      // could forge another row's fingerprint.
      .withColumn("__fp", md5(to_json(struct(
        col("user_id"), col("event_type"), col("value")))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** ST6: stream-static enrichment join (static side broadcast per batch). */
  def enrich(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(broadcast(customers), col("user_id") === col("c_custkey"), "left_outer")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("c_mktsegment"))

  /** ST8: stream-STREAM interval join — error events matched to the same
    * user's purchases within 1 day after the purchase, both sides unbounded.
    * Both inputs are watermarked and the join carries the time-range
    * predicate, which is what lets the engine BOUND JOIN STATE: a buffered
    * purchase can be dropped once the error-side watermark passes
    * `p_ts + 1 day` (and vice versa) — without the range the state store
    * grows with the full history. Inner-join matches emit in the batch
    * where the match forms; the watermark governs state retention, not
    * emission.
    */
  def errorsAfterPurchases(events: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    errorsAfterPurchasesJoin(events, watermark, "inner")
      .select(col("event_id"), col("purchase_id"))

  /** ST8b: the LEFT OUTER form — unmatched errors surface with a null
    * purchase id, but only once the purchase-side watermark proves no
    * matching purchase can still arrive (a purchase must satisfy
    * `p_ts ∈ [ts − 1 day, ts]`, so the row's match window closes when the
    * watermark passes `ts`). Inner matches still emit as they form; the
    * null rows trail by the watermark delay — the st9 oracle encodes
    * exactly that split.
    */
  def errorsAfterPurchasesJoin(events: DataFrame, watermark: String,
      joinType: String): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    errors.join(purchases,
      col("user_id") === col("p_user") &&
        col("ts") >= col("p_ts") &&
        col("ts") <= col("p_ts") + expr("INTERVAL 1 DAY"),
      joinType)
  }

  // ---- ST4: stateful per-key logic (the crawl-state analogue) ----

  /** Typed event row (matches the events table minus props). */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Per-user crawl-style state: visit count, accumulated value, error
    * streak (consecutive `error` events — the `times_failed` analogue from
    * the reference's pages table).
    */
  case class UserState(nEvents: Long, totalValue: Double, errorStreak: Int)

  case class UserUpdate(user_id: Long, n_events: Long, total_value: Double,
      error_streak: Int)

  /** ST4: mapGroupsWithState — emits the updated per-user aggregate on
    * every micro-batch; state persists across batches in the state store.
    */
  def userRunningState(events: Dataset[Event]): Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[UserState]) =>
          var st = state.getOption.getOrElse(UserState(0L, 0.0, 0))
          batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            st = UserState(
              st.nEvents + 1,
              st.totalValue + e.value,
              if (e.event_type == "error") st.errorStreak + 1 else 0)
          }
          state.update(st)
          UserUpdate(uid, st.nEvents, st.totalValue, st.errorStreak)
      }
  }

  /** Closed session emitted by [[userSessionsTimeout]]. */
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** ST4b: flatMapGroupsWithState with EventTimeTimeout — custom
    * gap-sessionization that EMITS a session only when the event-time
    * watermark passes `last event + gap` (the timeout-driven scheduling
    * pattern; the reference's `next_update` recrawl timer is the same
    * state-machine shape). Demonstrates explicit state + timeouts where
    * `session_window` (ST2) is the declarative shortcut.
    *
    * Input must already be watermarked on `ts` (the caller owns the
    * watermark so the delay is visible at the query site).
    */
  def userSessionsTimeout(events: Dataset[Event], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSession, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[Event], state: GroupState[UserSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid,
              new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs), s.n))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.endMs < gapMs =>
                  cur = Some(s.copy(endMs = math.max(s.endMs, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(uid,
                    new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs), s.n)
                  cur = Some(UserSession(t, t, 1))
                case None =>
                  cur = Some(UserSession(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Open-session state for [[userSessionsTimeout]]. */
  case class UserSession(startMs: Long, endMs: Long, n: Long)

  /** Running per-user aggregate held by [[UserStatsProcessor]]'s
    * ValueState. Money is EXACT integer cents (events.value is an exact
    * 2-dp double, so `math.round(v·100)` is lossless) — never a running
    * double sum, whose value would depend on arrival order and break
    * both determinism and the oracle hash.
    */
  case class UserAggState(n: Long, cents: Long, maxCents: Long)

  /** Per-user profile row emitted by [[UserStatsProcessor]]. */
  case class UserTwsStats(user_id: Long, n_events: Long, total_cents: Long,
      n_types: Long, max_cents: Long)

  /** ST16: Spark 4's `transformWithState` arbitrary-state API (the
    * StatefulProcessor successor to map/flatMapGroupsWithState, backed by
    * the RocksDB state store) — a per-user running profile over TWO typed
    * state variables: a ValueState holding the (n, cents, max) triple and
    * a MapState counting events per event type (n_types = live key count;
    * at 100 TB keys live in RocksDB, not on the JVM heap, and each
    * update touches only the single (user, type) entry rather than
    * rewriting a whole composite blob — the point of the typed-variable
    * API). Emits one UPDATED profile row per user per micro-batch;
    * downstream merges last-writer-wins by user, making the published
    * snapshot batch-boundary invariant (the st12 pattern), so the oracle
    * is the plain batch GROUP BY over events.
    */
  class UserStatsProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTwsStats] {
    import org.apache.spark.sql.streaming.{MapState, TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders => E}
    @transient private var agg: ValueState[UserAggState] = _
    @transient private var typeCounts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      agg = getHandle.getValueState[UserAggState]("agg",
        E.product[UserAggState], TTLConfig.NONE)
      typeCounts = getHandle.getMapState[String, Long]("typeCounts",
        E.STRING, E.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[UserTwsStats] = {
      var st = if (agg.exists()) agg.get() else UserAggState(0L, 0L, Long.MinValue)
      rows.foreach { e =>
        val cents = math.round(e.value * 100)
        st = UserAggState(st.n + 1, st.cents + cents, math.max(st.maxCents, cents))
        val prev = if (typeCounts.containsKey(e.event_type))
          typeCounts.getValue(e.event_type) else 0L
        typeCounts.updateValue(e.event_type, prev + 1)
      }
      agg.update(st)
      Iterator.single(UserTwsStats(user, st.n, st.cents,
        typeCounts.keys().size.toLong, st.maxCents))
    }
  }

  /** Run [[UserStatsProcessor]] over a (watermark-free, TimeMode.None)
    * event stream. The caller owns the sink; the RocksDB state store
    * provider is required by transformWithState and set by the caller
    * for the session (see the st16 query site).
    */
  def userStatsTws(events: Dataset[Event]): Dataset[UserTwsStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new UserStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** ST17: transformWithState EVENT-TIME TIMERS — the processor-timer
    * surface st16's ValueState/MapState half leaves out, and the last
    * Spark-4 arbitrary-state primitive: timeout-driven eviction, the
    * streaming form of the reference's `next_update` recrawl scheduling.
    * Same gap-sessionization state machine as [[userSessionsTimeout]]
    * (st4), but where fMGWS delivers timeouts as a hasTimedOut re-entry,
    * here the processor REGISTERS an explicit timer at `session_end +
    * gap` on every update (deleting the stale one — an un-deleted timer
    * from a superseded session would fire later and evict a session that
    * was since extended), and the runtime calls [[handleExpiredTimer]]
    * once the event-time watermark passes it. Emission set is identical
    * to st4's machine — sessions closed by a later event emit from the
    * data batch; the final open session emits iff its timer fired before
    * end of input — so the st4 oracle replay gates this query unchanged.
    */
  class SessionTimerProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, SessionOut] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoders => E}
    @transient private var session: ValueState[UserSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[UserSession]("session",
        E.product[UserSession], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var closed = List.empty[SessionOut]
      var cur = if (session.exists()) Some(session.get()) else None
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.endMs < gapMs =>
            cur = Some(s.copy(endMs = math.max(s.endMs, t), n = s.n + 1))
          case Some(s) =>
            closed ::= SessionOut(uid,
              new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs), s.n)
            cur = Some(UserSession(t, t, 1))
          case None =>
            cur = Some(UserSession(t, t, 1))
        }
      }
      cur.foreach { s =>
        session.update(s)
        // One LIVE timer per key: drop whatever was scheduled for the
        // superseded session end, then arm the new eviction time.
        getHandle.listTimers().foreach(old => getHandle.deleteTimer(old))
        getHandle.registerTimer(s.endMs + gapMs)
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(uid: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionOut] = {
      // Guard against a stale fire racing a same-batch extension: only the
      // timer matching the CURRENT session's eviction time may emit.
      if (session.exists()) {
        val s = session.get()
        if (s.endMs + gapMs == expired.getExpiryTimeInMs) {
          session.clear()
          return Iterator.single(SessionOut(uid,
            new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs), s.n))
        }
      }
      Iterator.empty
    }
  }

  /** Run [[SessionTimerProcessor]] over a watermarked event stream
    * (TimeMode.EventTime — timers clock on the event-time watermark).
    * Caller owns the watermark and the RocksDB provider, as with
    * [[userStatsTws]].
    */
  def userSessionsTws(events: Dataset[Event], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** ST7: foreachBatch parquet-append sink — the merge-style sink pattern
    * (each micro-batch lands atomically via the file sink protocol; for
    * true upsert semantics the batch would go through
    * [[graft.operators.Merge.upsert]] against the target snapshot).
    */
  def parquetAppendSink(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(path)
      }
      .start()

  /** ST7b: the idempotent-by-batchId write that makes foreachBatch output
    * EXACTLY-ONCE across crash-restart. The checkpoint's offset log pins
    * each micro-batch's (batchId, offsets) BEFORE execution, so a batch
    * interrupted after its side effect but before its commit is re-run on
    * restart with the SAME batchId and data; writing every batch to its
    * own `batch=<id>` dir with overwrite mode makes that replay land on
    * top of the orphaned first attempt instead of duplicating it —
    * exactly-once output from at-least-once replay, no transactional sink
    * required. StreamingSpec kills a query mid-stream (crash injected
    * after the write, before the commit) and proves the restart
    * re-executes only the uncommitted batch, by id-multiset equality.
    */
  def writeBatchIdempotent(batch: DataFrame, path: String, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$path/batch=$batchId")

  /** ST7b as a ready-made sink: [[writeBatchIdempotent]] under an
    * AvailableNow trigger with a checkpoint — restartable at any point
    * with exactly-once output.
    */
  def idempotentParquetSink(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatchIdempotent(batch, path, id)
      }
      .start()

  /** File-stream reader over a fixture table that handles BOTH on-disk
    * layouts: a single FILE named `<table>.parquet` (the driver's
    * testdata layout) or a Spark-written DIRECTORY of part files (any
    * Spark-materialized table — the production layout, and ScaleCurve's
    * synthesized dirs). A file source must be rooted at a directory
    * (FileStreamSource pins basePath to the source path), so: directory
    * layout → stream the table dir itself; file layout → stream the
    * parent dir with a leaf-name glob. Applying the glob to the
    * directory layout would silently match ZERO part files and land an
    * empty stream — the bug the 5× scale curve caught on st17.
    */
  private[graft] def tableFileStream(s: SparkSession, dir: String,
      table: String, schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val tablePath = s"$dir/$table.parquet"
    val hp = new org.apache.hadoop.fs.Path(tablePath)
    val isDir = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
      .getFileStatus(hp).isDirectory
    val reader = s.readStream.schema(schema)
    if (isDir) reader.parquet(tablePath)
    else reader.option("pathGlobFilter", s"$table.parquet").parquet(dir)
  }

  /** Streaming source over the documents parquet — the continuously-
    * ingesting corpus feed that the streaming dedup (t17) consumes.
    */
  def documentsStream(s: SparkSession, dir: String): DataFrame =
    tableFileStream(s, dir, "documents", graft.Tables.documents(s, dir).schema)

  /** JSON timestamp format for the kafka-shaped wire payload: the default
    * (`...SSSXXX`) truncates to milliseconds and the fixture carries
    * microsecond event times — the round-trip must be lossless.
    */
  private val WireTsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** Kafka WIRE-SHAPED landing of the events table: one record per event
    * in the exact schema a `format("kafka")` source yields — binary
    * `key` (the partitioning id), binary `value` (the payload as JSON
    * bytes), `topic`, `partition`, per-partition monotone `offset`,
    * broker `timestamp`. The landing is laid out as `chunk=i` dirs — one
    * OFFSET-RANGE FETCH each, i.e. a time slice of EVERY partition, the
    * unit a `maxOffsetsPerTrigger` Kafka consumer actually advances by —
    * with file mtimes set in chunk order so the file source's
    * oldest-first listing replays them as they "arrived". Pacing by
    * whole partitions instead would feed the watermark one partition's
    * full history at a time and late-drop every subsequent partition —
    * the wrong model: a Kafka trigger advances all partitions together.
    * The sandbox has no broker, so this landing IS the Kafka record
    * shape; everything downstream of the source line is thereby proven
    * source-agnostic (swap in a real broker and only the
    * `readStream.format("kafka")` line changes — see [[eventsSource]]).
    * Published atomically (SnapshotSink swap), idempotent per landing
    * path.
    */
  def kafkaShapedLanding(s: SparkSession, dir: String, landing: String,
      partitions: Int = 4, chunks: Int = 4): Unit =
    if (!java.nio.file.Files.isSymbolicLink(java.nio.file.Paths.get(landing))) {
      val ev = graft.Tables.events(s, dir)
      val payloadCols = ev.columns.map(col)
      val byPartition = org.apache.spark.sql.expressions.Window
        .partitionBy(col("partition")).orderBy(col("ts"), col("event_id"))
      // Chunk = fixed time slice of [min ts, max ts] (broadcast scalar
      // bounds — no global sort); within a partition, offsets ascend with
      // ts, so chunk i's offsets precede chunk i+1's: a chunk is exactly
      // an offset-range advance on every partition at once.
      val bounds = ev.agg(
        min(unix_micros(col("ts"))).as("lo"),
        (max(unix_micros(col("ts"))) + 1L).as("hi"))
      val wire = ev.crossJoin(broadcast(bounds))
        .withColumn("partition", pmod(col("user_id"), lit(partitions)).cast("int"))
        .withColumn("key", col("user_id").cast("string").cast("binary"))
        .withColumn("value", to_json(struct(payloadCols: _*),
          Map("timestampFormat" -> WireTsFormat)).cast("binary"))
        .withColumn("offset", row_number().over(byPartition).cast("long") - 1L)
        .withColumn("chunk", least(lit(chunks - 1),
          floor(lit(chunks) * (unix_micros(col("ts")) - col("lo")) /
            (col("hi") - col("lo")))).cast("int"))
        .select(col("key"), col("value"), lit("events").as("topic"),
          col("partition"), col("offset"), col("ts").as("timestamp"),
          col("chunk"))
        // One file per chunk dir: the hash repartition co-locates each
        // chunk value on one task, so each dir gets exactly one file =
        // one paced fetch per trigger.
        .repartition(chunks, col("chunk"))
      graft.sources.SnapshotSink.overwrite(wire, landing, Seq("chunk"))
      // Deterministic arrival order: chunk i's file predates chunk i+1's.
      val root = java.nio.file.Paths.get(landing).toRealPath()
      for (i <- 0 until chunks) {
        val d = root.resolve(s"chunk=$i")
        if (java.nio.file.Files.isDirectory(d)) {
          val st = java.nio.file.Files.list(d)
          try st.forEach(f => java.nio.file.Files.setLastModifiedTime(f,
            java.nio.file.attribute.FileTime.fromMillis(1_600_000_000_000L + i * 60_000L)))
          finally st.close()
        }
      }
    }

  /** Kafka-shaped streaming source over a [[kafkaShapedLanding]] dir:
    * incremental and rate-limited (`maxFilesPerTrigger = 1`), records
    * decoded exactly the way a `format("kafka")` consumer decodes them —
    * cast `value` to string, `from_json` against the payload schema. The
    * returned frame has the same schema as [[eventsStream]].
    */
  def eventsStreamKafkaShaped(s: SparkSession, landing: String): DataFrame = {
    val wireSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("topic", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("partition", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("offset", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("timestamp", org.apache.spark.sql.types.TimestampType),
      // chunk is the landing's offset-range dir column, not Kafka wire —
      // declared so partition discovery binds it, dropped by the decode.
      org.apache.spark.sql.types.StructField("chunk", org.apache.spark.sql.types.IntegerType)))
    s.readStream
      .schema(wireSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landing)
      .select(from_json(col("value").cast("string"), graft.Schemas.events,
        Map("timestampFormat" -> WireTsFormat)).as("e"))
      .select(col("e.*"))
  }

  /** S8 source switch: the SAME downstream pipeline over either source
    * form. `"files"` = the direct file stream ([[eventsStream]]);
    * `"kafka"` = the Kafka-wire-shaped, rate-limited adapter (`scratch`
    * hosts the landing; required for that format). A real deployment adds
    * a `case "kafka" => s.readStream.format("kafka")...` arm — no
    * downstream change.
    */
  def eventsSource(s: SparkSession, dir: String, format: String,
      scratch: String = ""): DataFrame = format match {
    case "files" => eventsStream(s, dir)
    case "kafka" =>
      require(scratch.nonEmpty, "kafka-shaped source needs a scratch dir")
      val landing = s"$scratch/kafka_landing"
      kafkaShapedLanding(s, dir, landing)
      eventsStreamKafkaShaped(s, landing)
    case other => throw new IllegalArgumentException(
      s"unknown events source format '$other' (files|kafka)")
  }

  /** Streaming source over the events parquet (ST8-of-sorts: file stream
    * source with the same schema as the batch accessor).
    */
  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Sniff the on-disk ts type via the batch reader: older generators wrote
    // TIMESTAMP(NANOS) (decoded as long under the legacy conf, truncated to
    // µs here), the current one writes TIMESTAMP(MICROS) (streamed as-is).
    val rawBatch = s.read.parquet(s"$dir/events.parquet")
    val raw = tableFileStream(s, dir, "events", rawBatch.schema)
    rawBatch.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ→LTZ cast is value-preserving under the UTC session tz;
        // watermarks require TimestampType.
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
}
