package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.Trigger

/** Proves the streaming job computes the SAME frame as the DuckDB-verified
  * batch queries (q36/q39): the transform lambdas are shared, so running
  * them over readStream + watermark in complete mode must reproduce the
  * batch result row-for-row. This is the unified-API guarantee the
  * engine's "real-time" claim rests on (SURVEY.md §2.10).
  */
class EventStreamSpec extends SparkSpec {

  private def streamDir: String = {
    val dir = Files.createTempDirectory("graft-stream-src")
    Files.copy(
      Paths.get(s"${SparkSpec.Sf0001}/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  private def sortedRows(rows: Array[Row]): Seq[Seq[Any]] =
    rows.map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("streaming hourly aggregation ≡ batch q36 (complete mode, AvailableNow)") {
    val batch = EventQueries.q36.build(spark, SparkSpec.Sf0001).collect()

    val q = EventStreamJob.hourlyAgg(
        EventStreamJob.readEventStream(spark, streamDir))
      .writeStream
      .queryName("stream_hourly")
      .outputMode("complete")
      .format("memory")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.sql("SELECT * FROM stream_hourly").collect()
    assert(streamed.length == batch.length)
    assert(sortedRows(streamed) == sortedRows(batch))
  }

  test("streaming error alerts ≡ batch q39") {
    val batch = EventQueries.q39.build(spark, SparkSpec.Sf0001)
      .select("hour_start", "user_id", "n_errors", "error_value").collect()

    val q = EventStreamJob.errorAlerts(
        EventStreamJob.readEventStream(spark, streamDir))
      .writeStream
      .queryName("stream_alerts")
      .outputMode("complete")
      .format("memory")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.sql("SELECT * FROM stream_alerts").collect()
    assert(streamed.length == batch.length)
    assert(sortedRows(streamed) == sortedRows(batch))
  }

  test("stateful sessionization (batch mode) ≡ q54 window query") {
    val batch = EventQueries.q54.build(spark, SparkSpec.Sf0001).collect()
    val stateful = EventStreamJob.sessionize(
        graft.Tables.load(spark, SparkSpec.Sf0001, "events"), streaming = false)
      .toDF().collect()
    assert(stateful.length == batch.length)
    assert(sortedRows(stateful) == sortedRows(batch))
  }

  test("q135 interval-merge ≡ the stateful sessionizer at a 30-minute gap") {
    // episodes ARE sessions under gap = interval length: [us, us+30m)
    // windows merge exactly when the inter-event gap is ≤ 30 min, and
    // episode coverage = session duration + the trailing half-open
    // window — so the one stateful sessionizer (batch AND streaming)
    // serves the q135 shape too.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val LenUs = 1800000000L
    val viaSessions = EventStreamJob.sessionize(
        graft.Tables.load(spark, SparkSpec.Sf0001, "events"),
        streaming = false, gapUs = LenUs)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_episodes"),
        sum($"duration_us" + LenUs).as("covered_us"),
        max($"duration_us" + LenUs).as("longest_us"),
        max($"n_events").as("busiest_episode_events"))
      .orderBy($"user_id")
      .collect().map(_.toSeq)
    val batch = EventQueries.q135.build(spark, SparkSpec.Sf0001)
      .collect().map(_.toSeq)
    assert(viaSessions.toSeq === batch.toSeq)
  }

  test("streaming sessionization emits a watermark-closed subset of q54") {
    val batchKeys = EventQueries.q54.build(spark, SparkSpec.Sf0001).collect()
      .map(_.toSeq).toSet
    val q = EventStreamJob.sessionize(
        EventStreamJob.readEventStream(spark, streamDir), streaming = true)
      .writeStream
      .queryName("stream_sessions")
      .outputMode("append")
      .format("memory")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.sql("SELECT * FROM stream_sessions").collect()
    assert(streamed.nonEmpty, "no sessions closed by watermark")
    val bad = streamed.filterNot(r => batchKeys.contains(r.toSeq))
    assert(bad.isEmpty, s"streamed sessions not in batch result: ${bad.take(3).toSeq}")
  }

  test("typed payload extraction parses props JSON") {
    val df = EventStreamJob.typedPayload(
      graft.Tables.load(spark, SparkSpec.Sf0001, "events"))
    assert(df.columns.toSeq == Seq("event_id", "ts", "user_id", "event_type",
      "value", "k", "tag"))
    assert(df.filter(df("k").isNotNull).count() > 0)
  }
}
