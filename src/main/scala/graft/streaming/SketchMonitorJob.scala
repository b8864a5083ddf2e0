package graft.streaming

import graft.text.Cms
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming token-frequency sketch — the operational form of the q124
  * CMS audit: document batches land as files in a drop directory (the
  * [[CorpusIngestJob]] front door) and every micro-batch contributes
  * its own d×w count-min cell grid to the sink. Because the sketch is
  * LINEAR ([[Cms]]), the running corpus sketch is a plain (row,
  * bucket) sum over the per-batch grids — frequency queries over an
  * unbounded ingest with O(d·w) state per batch, no token-level
  * streaming state, and no rescan of history.
  *
  * Replay safety: the sink is partitioned by batch id and written with
  * dynamic partition overwrite — a replayed batch rewrites its OWN
  * partition (the [[CorpusIngestJob]] pattern), so at-least-once
  * foreachBatch still sums every batch exactly once in
  * [[mergedSketch]]. This is the property that makes the merged
  * estimates trustworthy: a double-counted batch would silently
  * inflate every estimate while staying one-sided — no gate would
  * catch it downstream.
  *
  * Scale design: per batch, the only data-sized work is the token
  * explode compressed immediately to the batch vocab dict; the sink
  * gains ≤ d·w rows per batch. Merging b batches is one map-side
  * combinable aggregate over b·d·w int-width rows.
  */
object SketchMonitorJob {

  /** Start the sketch builder over `srcDir` (documents-schema parquet
    * drops). Emits (r0, b, c, d, w, batch_id) cell rows to `outDir`,
    * one d×w grid per micro-batch — the geometry rides along in every
    * row (constant-valued, dictionary-compressed to nothing) so
    * [[mergedSketch]] can refuse a mismatched read instead of
    * silently undercounting.
    */
  def run(spark: SparkSession, srcDir: String, outDir: String,
          checkpointDir: String,
          d: Int = Cms.DefaultD, w: Int = Cms.DefaultW,
          maxFilesPerTrigger: Int = 1): StreamingQuery = {
    // pre-create the sink dir: a drop directory with no files yet (the
    // from-scratch case) terminates AvailableNow with zero batches and
    // nothing ever writes outDir — mergedSketch must then see an empty
    // directory, not PATH_NOT_FOUND (the CurationPipeline corpusDir
    // pattern; Hadoop FS API, outDir may be s3a://.../hdfs)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(outPath)
    CorpusIngestJob.readDocStream(spark, srcDir, maxFilesPerTrigger)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batch.sparkSession, not the outer session (the foreachBatch
        // clone-session rule)
        Cms.cells(batch, d, w)
          .withColumn("d", lit(d)).withColumn("w", lit(w))
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

  /** The running corpus sketch: sum the per-batch grids. Linearity
    * makes this ≡ [[Cms.cells]] over the union of all ingested
    * batches (SketchMonitorSpec pins the identity).
    *
    * The caller's (d, w) must match the geometry the grids were built
    * with — estimating against a differently-shaped sketch targets
    * cells that were never populated and silently UNDER-estimates,
    * breaking the one-sided guarantee; a mismatch fails fast instead
    * (the BandIndex pinned-LshParams stance). The check is a bounded
    * driver round-trip over the ≤ few distinct stored geometries.
    */
  def mergedSketch(spark: SparkSession, outDir: String,
                   d: Int = Cms.DefaultD, w: Int = Cms.DefaultW): DataFrame = {
    val geoms = storedGeometry(spark, outDir)
    require(geoms.forall(_ == (d, w)),
      s"sketch at $outDir was built with geometry ${geoms.toSeq} " +
        s"but ($d, $w) was requested — estimates against a mismatched " +
        "grid silently undercount; pass the storedGeometry(outDir) values " +
        "or rebuildFromCorpus with the new geometry")
    Cms.merge(readCells(spark, outDir).select("r0", "b", "c"))
  }

  /** The distinct (d, w) geometries of the grids stored at `outDir` —
    * the programmatic way to recover the geometry a sketch store was
    * built with (callers previously had to parse [[mergedSketch]]'s
    * exception message). Normally 1 entry; empty for a fresh store.
    */
  def storedGeometry(spark: SparkSession, outDir: String): Seq[(Int, Int)] =
    readCells(spark, outDir).select("d", "w").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq

  private def readCells(spark: SparkSession, outDir: String): DataFrame =
    spark.read
      .schema("r0 INT, b BIGINT, c BIGINT, d INT, w INT")
      .parquet(outDir)

  /** The TAKEDOWN story for derived sketch state. CMS cells are
    * add-only, so [[graft.etl.Erasure.erase]] — which scrubs the
    * corpus sink, band index, and manifest — cannot reach the erased
    * docs' token counts inside the stored grids; until this runs,
    * estimates still include them (an over-count: the one-sided bound
    * survives, the forgetting does not). This rebuilds the ENTIRE
    * store from the post-erasure corpus in one pass: every historical
    * grid is replaced by a single `batch_id = -1` grid (negative so a
    * resumed stream's monotone non-negative batch ids never collide),
    * after which estimates of tokens unique to erased docs drop to 0.
    *
    * Offline maintenance, like [[graft.etl.BandIndex.compactIfNeeded]]:
    * run BETWEEN stream restarts — the full-directory overwrite and a
    * concurrent micro-batch append race destructively. Not subtraction:
    * the drop stream sketches every landed batch (re-crawls included),
    * so subtracting one corpus copy of an erased doc would leave
    * residue from its duplicate landings; the corpus rebuild is the
    * form that is exact by construction.
    *
    * Geometry may be changed on rebuild (the store is re-derived
    * whole) — the default keeps the stored one when present.
    */
  def rebuildFromCorpus(spark: SparkSession, corpusDir: String,
                        outDir: String,
                        d: Int = Cms.DefaultD, w: Int = Cms.DefaultW): Unit = {
    // the CorpusIngestJob sink layout (the Erasure.eraseFromCorpus read)
    val corpus = spark.read
      .schema(graft.Tables.schemas("documents").add("ingest_batch", "long"))
      .parquet(corpusDir)
    Cms.cells(corpus, d, w)
      .withColumn("d", lit(d)).withColumn("w", lit(w))
      .withColumn("batch_id", lit(-1L))
      .write.mode("overwrite") // FULL overwrite: replaces all history
      .partitionBy("batch_id")
      .parquet(outDir)
  }
}
