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

  /** Typed JSON payload extraction (the from_json path promised by q38). */
  def typedPayload(events: DataFrame): DataFrame =
    events
      .withColumn("payload", from_json(col("props"), propsSchema))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
              col("value"), col("payload.k").as("k"), col("payload.tag").as("tag"))

  /** File-source streaming read of the events table: parquet files
    * arriving in a directory, schema pinned (never inferred), ns→µs
    * timestamp conversion as in Tables.load.
    */
  def readEventStream(spark: SparkSession, dir: String,
                      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(Tables.schemas("events"))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

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
