package graft.streaming

import graft.Tables
import graft.text.Psi
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming distribution-drift monitor — the operational form of the
  * q117 PSI operator: document batches land as files in a drop
  * directory (the [[CorpusIngestJob]] front door), and every
  * micro-batch's per-source length distribution is scored against a
  * reference distribution PINNED AT JOB START. A crawl source whose
  * profile shifts mid-ingest (upstream truncation, template change)
  * raises `drifted = true` rows in the monitor sink within one batch —
  * before any content-level metric moves and without waiting for a
  * batch job over the accumulated corpus.
  *
  * The reference is pinned, not rolling, deliberately: a rolling
  * reference absorbs slow drift (the boiled-frog failure a monitor
  * exists to catch). Re-pin by restarting the job against a refreshed
  * reference corpus — the checkpoint keeps batch progress, the
  * reference is derived state.
  *
  * Scale design: the reference compresses to O(log max_len) rows ONCE
  * at start — collected to the driver (bounded by the bucket count,
  * never by data) and recreated per batch in the batch's own session,
  * so no cross-session plan reuse and nothing corpus-sized ever sits
  * on the driver. Per batch, the only data-sized work is
  * [[Psi.bucketCounts]]'s single map pass; the score algebra runs on
  * sub-hundred-row frames. The sink is partitioned by batch id and
  * written with dynamic partition overwrite — a replayed batch
  * rewrites its own partition (the [[CorpusIngestJob]] replay-safety
  * pattern), so at-least-once foreachBatch still yields exactly-once
  * monitor rows.
  */
object DriftMonitorJob {

  /** Start the monitor over `srcDir` (documents-schema parquet drops),
    * scoring against the reference corpus at `refDir`. Emits
    * (source, n_docs, n_buckets, psi, top_bucket, drifted, batch_id)
    * rows to `outDir`, one set per micro-batch.
    */
  def run(spark: SparkSession, srcDir: String, refDir: String,
          outDir: String, checkpointDir: String,
          threshold: Double = 0.2,
          maxFilesPerTrigger: Int = 1): StreamingQuery = {
    // pin the reference NOW: O(log max_len) (b, r) rows — bounded
    // driver round-trip, the DistributedRank/BandIndex stance
    val refRows = Psi.reference(
        spark.read.schema(Tables.schemas("documents")).parquet(refDir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    require(refRows.nonEmpty, s"reference corpus at $refDir is empty")
    CorpusIngestJob.readDocStream(spark, srcDir, maxFilesPerTrigger)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batch.sparkSession, not the outer session (the foreachBatch
        // clone-session rule); the pinned reference is rebuilt from
        // the collected rows IN that session — no cross-session frames
        val ss = batch.sparkSession
        import ss.implicits._
        val ref = refRows.toDF("b", "r")
        Psi.score(Psi.bucketCounts(batch), ref, threshold)
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
