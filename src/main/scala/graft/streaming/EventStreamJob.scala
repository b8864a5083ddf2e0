package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** True Structured Streaming surface for the event feed (SURVEY.md §2.10).
  *
  * The reference's "real-time clinical surveillance" is batch-only
  * (healthcare-sql-analytics.sql:442-518 over currently-admitted rows;
  * ENABLE_REAL_TIME_ANALYTICS exists only as an env flag,
  * healthcare-env-example.sh:74). This job honors the claim natively:
  * the SAME transform lambdas run over a batch frame (DuckDB-verified as
  * q36/q39 in [[EventQueries]]) and over a `readStream` frame with
  * watermarked state — Structured Streaming's unified API makes the
  * equivalence literal, and EventStreamSpec asserts it.
  *
  * Scale design: state is keyed by (window, event_type) — cardinality
  * = windows × types, independent of event volume, so the state store
  * stays small at any throughput. The 10-minute watermark bounds state
  * retention; late events beyond it are dropped deterministically.
  */
object EventStreamJob {

  /** Event-time watermark: how long to keep window state open for
    * stragglers. 10 minutes ≪ the 1-hour window, so at most two window
    * generations are ever live per key.
    */
  val WatermarkDelay = "10 minutes"

  /** Typed payload schema for the props JSON column — the from_json
    * path (q38 uses regexp so DuckDB can mirror it; streaming uses the
    * typed struct).
    */
  val propsSchema: StructType = StructType(Seq(
    StructField("k", LongType),
    StructField("tag", StringType)))

  /** Tumbling 1-hour aggregation — identical logic to q36 minus the
    * batch-only global sort (streaming append mode cannot totally
    * order; the sink consumer orders if needed).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", WatermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           Q.avgMoney(col("value")).as("avg_value"),
           Q.sumMoney(col("value")).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour_start"),
        col("event_type"), col("n"), col("avg_value"), col("total_value"))

  /** Threshold alerting — q39's surveillance semantics: users whose
    * per-hour error count reaches the floor. Emitted per closed window
    * in append mode (alerts are immutable once the watermark passes).
    */
  def errorAlerts(events: DataFrame, minErrors: Long = 2): DataFrame =
    events
      .filter(col("event_type") === "error")
      .withWatermark("ts", WatermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_errors"),
           Q.sumMoney(col("value")).as("error_value"))
      .filter(col("n_errors") >= minErrors)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour_start"),
        col("user_id"), col("n_errors"), col("error_value"))

  /** Stream-stream interval join: purchases attributed to the same
    * user's clicks within the preceding hour — the streaming twin of
    * q56's as-of join. Both inputs carry watermarks and the join
    * condition bounds event-time distance, so each side's state store
    * retains at most (watermark + 1h) of rows — bounded state at any
    * scale, Structured Streaming's requirement for stream-stream inner
    * joins. The same function runs in batch (plain range join) because
    * watermarks are a no-op there; StreamJoinSpec asserts batch ≡
    * streamed output.
    */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"),
              col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", WatermarkDelay)
    val p = purchases
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
              col("ts").as("purchase_ts"), col("value").as("amount"))
      .withWatermark("purchase_ts", WatermarkDelay)
    p.join(c,
        col("user_id") === col("click_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
              col("amount"), col("click_id"), col("click_ts"))
  }

  /** Stream-static enrichment: each micro-batch joins the (small,
    * broadcast) static dimension — no streaming state at all, the
    * static side is re-resolvable per batch. Completes the join matrix
    * beside [[clickAttribution]]'s stream-stream interval join.
    */
  def enrichWithUsers(events: DataFrame, users: DataFrame): DataFrame =
    events.join(
        org.apache.spark.sql.functions.broadcast(
          users.select(col("c_custkey"), col("c_mktsegment"))),
        events("user_id") === col("c_custkey"), "left_outer")
      .select(col("event_id"), col("ts"), col("user_id"),
              col("event_type"), col("value"),
              col("c_mktsegment").as("segment"))

  /** Streaming exactly-once dedup: at-least-once sources re-deliver on
    * retry; dropping replays by event_id inside the watermark horizon
    * bounds the dedup state (vs plain dropDuplicates, whose state grows
    * forever on a stream). Replays older than the watermark are late
    * data and dropped by the watermark itself — either path emits each
    * event_id exactly once (StreamDedupSpec).
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", WatermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Typed JSON payload extraction (the from_json path promised by q38). */
  def typedPayload(events: DataFrame): DataFrame =
    events
      .withColumn("payload", from_json(col("props"), propsSchema))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
              col("value"), col("payload.k").as("k"), col("payload.tag").as("tag"))

  // ----- sessionization (custom state: flatMapGroupsWithState) -------

  /** Session gap: events of a user ≤ 120 min apart share a session. */
  val SessionGapUs: Long = 120L * 60 * 1000000

  /** One event in µs-epoch form (the exact-integer time base shared
    * with the q54 batch query and its DuckDB oracle).
    */
  final case class SessEvent(
      user_id: Long, event_id: Long, us: Long, value: Double,
      ts: java.sql.Timestamp) // the watermarked event-time column must
      // survive into the stateful operator's input for EventTimeTimeout

  /** Closed session — schema matches q54's output exactly. */
  final case class Session(
      user_id: Long, session_start: String, n_events: Long,
      total_value: Double, duration_us: Long)

  /** Buffered per-user state between streaming micro-batches. */
  final case class SessBuffer(events: List[SessEvent])

  private def formatStartUs(us: Long): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L)))

  /** Split a user's (sorted) events into gap-delimited sessions. Money
    * math matches the verified Q.sumMoney convention: per-value
    * DECIMAL(18,2) (shortest-repr rounding, same as Spark's double →
    * decimal cast), exact decimal sum, double at the edge — so the
    * stateful path is bit-identical to the windowed batch query.
    */
  def splitSessions(sorted: Seq[SessEvent],
                    gapUs: Long = SessionGapUs): Seq[Session] = {
    if (sorted.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    var run = List(sorted.head)
    def close(runRev: List[SessEvent]): Unit = {
      val es = runRev.reverse
      val total = es.iterator
        .map(e => BigDecimal(java.lang.Double.toString(e.value))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum
      out += Session(es.head.user_id, formatStartUs(es.head.us),
        es.size.toLong, total.toDouble, es.last.us - es.head.us)
    }
    sorted.tail.foreach { e =>
      if (e.us - run.head.us <= gapUs) run = e :: run
      else { close(run); run = List(e) }
    }
    close(run)
    out.toSeq
  }

  private def sortEvents(es: Seq[SessEvent]): Seq[SessEvent] =
    es.sortBy(e => (e.us, e.event_id))

  /** Group sorted events into gap-delimited runs (the event-level view
    * of [[splitSessions]]).
    */
  def groupSessions(sorted: Seq[SessEvent],
                    gapUs: Long = SessionGapUs): Seq[Seq[SessEvent]] = {
    if (sorted.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[SessEvent]]
    var run = scala.collection.mutable.ArrayBuffer(sorted.head)
    sorted.tail.foreach { e =>
      if (e.us - run.last.us <= gapUs) run += e
      else { out += run.toSeq; run = scala.collection.mutable.ArrayBuffer(e) }
    }
    out += run.toSeq
    out.toSeq
  }

  /** Streaming sessionization state transition (EventTimeTimeout):
    * buffer arriving events; once the watermark passes `last event of
    * a run + gap`, no in-order future event can extend that run, so
    * the session is immutable — emit it and drop its events. State per
    * user holds only the open tail, so state size is bounded by
    * session length, never stream length.
    */
  def sessionStateFunc(gapUs: Long = SessionGapUs)(
      userId: Long,
      rows: Iterator[SessEvent],
      state: org.apache.spark.sql.streaming.GroupState[SessBuffer]): Iterator[Session] = {
    val buffered = state.getOption.map(_.events).getOrElse(Nil)
    val all = sortEvents(buffered ++ rows.toSeq)
    if (all.isEmpty) { state.remove(); return Iterator.empty }
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val (closed, open) = groupSessions(all, gapUs).partition(
      g => g.last.us + gapUs < wmUs)
    if (open.isEmpty) state.remove()
    else {
      state.update(SessBuffer(open.flatten.toList))
      // Re-check as soon as the watermark could close the OLDEST open
      // run (min, not max: an idle user's several-run backlog must not
      // wait for the youngest run's gap to clear).
      val wakeMs = Math.floorDiv(
        open.map(_.last.us).min + gapUs, 1000L) + 1
      state.setTimeoutTimestamp(math.max(wakeMs, state.getCurrentWatermarkMs() + 1))
    }
    closed.flatMap(splitSessions(_, gapUs)).iterator
  }

  /** Typed sessionization over a batch or streaming event frame (both
    * carry the raw `ts` timestamp column). Batch uses NoTimeout — each
    * group sees all its rows in one call, so the result equals the q54
    * window query exactly. Streaming uses EventTimeTimeout against the
    * `ts` watermark and emits only watermark-closed sessions.
    *
    * `gapUs` parameterizes the session gap (default: the q54
    * 120-minute convention). At gap = interval length this same
    * operator IS the q135 interval-merge: overlapping/touching
    * `[us, us+gap)` windows merge exactly when the inter-event gap is
    * ≤ gap, so episodes = sessions and episode coverage = session
    * duration + the trailing half-open window (`EventStreamSpec` pins
    * the identity) — one stateful sessionizer serves both shapes,
    * batch and streaming.
    */
  def sessionize(events: DataFrame, streaming: Boolean,
                 gapUs: Long = SessionGapUs): org.apache.spark.sql.Dataset[Session] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val withWm = if (streaming) events.withWatermark("ts", WatermarkDelay) else events
    val typed = withWm
      .select(col("user_id"), col("event_id"),
              expr("unix_micros(ts)").as("us"), col("value"), col("ts"))
      .as[SessEvent]
    if (streaming)
      typed.groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
          sessionStateFunc(gapUs))
    else
      typed.groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
          (_: Long, rows: Iterator[SessEvent],
           _: org.apache.spark.sql.streaming.GroupState[SessBuffer]) =>
            splitSessions(sortEvents(rows.toSeq), gapUs).iterator)
  }

  /** File-source streaming read of the events table: parquet files
    * arriving in a directory, schema pinned (never inferred), raw-long
    * → µs timestamp conversion as in Tables.load — row-adaptive to the
    * ts unit, so a stream started on an empty drop directory converts
    * whichever generation's files arrive later correctly.
    */
  def readEventStream(spark: SparkSession, dir: String,
                      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(Tables.schemas("events"))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .withColumn("ts", expr(Tables.tsToMicrosExpr))

  /** Run the hourly aggregation as a real streaming query over parquet
    * files in `srcDir`, writing closed windows to `outDir` until all
    * available data is processed (Trigger.AvailableNow — the batch-like
    * run mode a backfill on a cluster would use). Append mode: only
    * watermark-finalized windows are written; the trailing windows
    * (within WatermarkDelay of the max event time) remain open by
    * design — exactly the at-most-once-emitted contract alerts need.
    */
  def runHourlyAgg(spark: SparkSession, srcDir: String, outDir: String,
                   checkpointDir: String): StreamingQuery = {
    val q = hourlyAgg(readEventStream(spark, srcDir))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q
  }
}
