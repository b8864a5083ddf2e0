package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming transition-anomaly monitor — the operational form of the
  * q160 directly-follows matrix (the [[DriftMonitorJob]] pattern
  * applied to PROCESS shape instead of content shape): event batches
  * land as files, every micro-batch's transition shares are scored
  * against a reference matrix PINNED at job start, and two alarms
  * fire within the batch that causes them:
  *
  *  - `novel` — a transition the reference NEVER saw (the
  *    process-mining "impossible path": a checkout that skips
  *    payment, an error state entered from a screen that cannot
  *    reach it);
  *  - `anomalous` — a known transition whose outflow share moved
  *    more than `thresholdPpm` from the pinned share (a funnel step
  *    silently eroding).
  *
  * The reference is pinned, not rolling, for the boiled-frog reason
  * documented on [[DriftMonitorJob]]. Transitions are BATCH-SCOPED by
  * design — a pair spanning two micro-batches is not generated; the
  * monitor is state-light (zero streaming state beyond file progress)
  * and the cross-batch seam rate is bounded by 1/batch-size per user.
  *
  * Scale shape: the pinned matrix is |event types|²-bounded — a
  * bounded driver round-trip at start, rebuilt per batch inside the
  * batch's own session (the foreachBatch clone-session rule). Per
  * batch the only data-sized work is the one window pass + one
  * aggregate of [[MarkovTransitions.transitionShares]]. The sink is
  * partitioned by batch id with dynamic overwrite — replay-safe.
  */
object TransitionMonitorJob {

  /** Start the monitor over `srcDir` (events-schema parquet drops),
    * scoring against the reference events at `refDir`. Emits
    * (from_type, to_type, n, p_ppm, ref_ppm, novel, anomalous,
    * batch_id) rows to `outDir` per micro-batch.
    */
  def run(spark: SparkSession, srcDir: String, refDir: String,
          outDir: String, checkpointDir: String,
          thresholdPpm: Long = 200000L,
          maxFilesPerTrigger: Int = 1): StreamingQuery = {
    // pin the reference matrix NOW: |types|² rows — bounded driver
    // round-trip, the DriftMonitorJob stance
    val refRows = MarkovTransitions.transitionShares(
        graft.Tables.load(spark, refDir, "events"))
      .select("from_type", "to_type", "p_ppm")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    require(refRows.nonEmpty, s"reference events at $refDir have no transitions")
    EventStreamJob.readEventStream(spark, srcDir, maxFilesPerTrigger)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        import ss.implicits._
        val ref = refRows.toDF("from_type", "to_type", "ref_ppm")
        MarkovTransitions.transitionShares(batch)
          .join(broadcast(ref), Seq("from_type", "to_type"), "left_outer")
          .withColumn("novel", $"ref_ppm".isNull)
          .withColumn("ref_ppm", coalesce($"ref_ppm", lit(0L)))
          .withColumn("anomalous",
            $"novel" || abs($"p_ppm" - $"ref_ppm") > thresholdPpm)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
