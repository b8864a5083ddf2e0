package graft.streaming

import graft.Tables
import graft.etl.BandIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus ingestion — the crawl-pipeline front door: document
  * batches arrive as files in a directory, every micro-batch is deduped
  * against the persisted [[BandIndex]] (exact fingerprint semi-join +
  * MinHash near-dup, both reading the bucketed index tables only), and
  * the kept slice is appended to BOTH the curated corpus sink and the
  * index — history is never re-read and never re-tokenized, so
  * per-batch cost stays batch-sized forever.
  *
  * `foreachBatch`, not a streaming sink: the per-batch work is a
  * multi-output transaction (classify → append index → append corpus)
  * built from joins the incremental engine can't express; Structured
  * Streaming serializes batches, which is exactly the ordering the
  * index append needs (batch N+1 must see batch N's kept docs — the
  * cross-batch dedup guarantee the spec proves).
  *
  * Intra-batch duplicates are upstream's job (the batch-level q40/q45
  * operators) — this job's contract is batch-vs-history.
  */
object CorpusIngestJob {

  /** File-source stream of document batches, schema pinned. */
  def readDocStream(spark: SparkSession, dir: String,
                    maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(Tables.schemas("documents"))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Run until all available files are processed (Trigger.AvailableNow).
    * The band index at `indexName`/`indexPath` must exist
    * ([[BandIndex.create]] on the seed corpus — or on an empty frame for
    * a from-scratch corpus).
    */
  def run(spark: SparkSession, srcDir: String, indexName: String,
          indexPath: String, outDir: String, checkpointDir: String,
          buckets: Int = 32): StreamingQuery =
    readDocStream(spark, srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // classify vs the index, append kept docs to it (BandIndex.ingest),
        // then land the same kept slice in the curated corpus sink.
        // batch.sparkSession, NOT the outer session: foreachBatch frames
        // are bound to the streaming clone, and reads + writes + cache
        // invalidation must all go through ONE session or batch N+1
        // classifies against batch N's stale file listing
        val ss = batch.sparkSession
        val flags = BandIndex.ingest(ss, batch, indexName, indexPath, buckets)
        batch.join(flags.filter(col("flag") === "kept").select("doc_id"),
            Seq("doc_id"), "left_semi")
          .write.mode("append").parquet(outDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
