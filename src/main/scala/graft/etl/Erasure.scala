package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end document erasure — the takedown / right-to-be-forgotten
  * workflow across BOTH stores a curated corpus lives in: the parquet
  * sink ([[graft.streaming.CorpusIngestJob]]'s output, partitioned by
  * `ingest_batch`) and the derived [[BandIndex]]. The reference's
  * compliance posture (PII masking, encryption, audit) implies
  * deletion must reach derived data too; for an LLM corpus this is
  * the standard takedown path.
  *
  * Scale design of the sink rewrite: erasing k docs from a corpus of
  * N batches rewrites ONLY the partitions that contain them — a
  * semi-join finds the affected `ingest_batch` ids (bounded by the
  * partition count, not doc count), the surviving rows of those
  * partitions are materialized (localCheckpoint — the write overwrites
  * the very files being read), and a dynamic partition overwrite swaps
  * them in. Partitions with no erased docs are never read past the
  * semi-join probe and never rewritten. A partition whose EVERY doc is
  * erased is deleted outright (dynamic overwrite only replaces
  * partitions present in the written data, so an emptied partition
  * must be removed explicitly or its files would survive).
  *
  * Idempotent: re-running with the same ids finds no affected
  * partitions and is a no-op. OFFLINE, like [[BandIndex.remove]] —
  * not concurrent-safe with an active ingest stream.
  */
object Erasure {

  /** Remove `docIds` rows from the partitioned corpus sink. Returns
    * the number of docs actually erased.
    */
  def eraseFromCorpus(spark: SparkSession, corpusDir: String,
                      docIds: DataFrame): Long = {
    val schema = graft.Tables.schemas("documents").add("ingest_batch", "long")
    val corpus = spark.read.schema(schema).parquet(corpusDir)
    val ids = docIds.select("doc_id").distinct().localCheckpoint()
    // affected partitions: bounded by partition count, not doc count
    val hit = corpus.join(ids, Seq("doc_id"), "left_semi")
      .groupBy(col("ingest_batch")).agg(count(lit(1)).as("n_erase"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (hit.isEmpty) return 0L
    val erased = hit.values.sum
    // survivors of the affected partitions only; materialized BEFORE
    // the overwrite destroys its own input files
    val survivors = corpus
      .filter(col("ingest_batch").isin(hit.keys.toSeq: _*))
      .join(ids, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val surviving = survivors.select(col("ingest_batch")).distinct()
      .collect().map(_.getLong(0)).toSet
    survivors.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .parquet(corpusDir)
    // fully-emptied partitions never appear in the dynamic overwrite:
    // delete their directories, or the erased files would live on
    val root = new org.apache.hadoop.fs.Path(corpusDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (hit.keySet -- surviving).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"ingest_batch=$b"), true)
    }
    erased
  }

  /** Full takedown: erase from the corpus sink AND the band index, in
    * that order (the sink holds the text itself — the most sensitive
    * artifact dies first; the index holds only derived hashes and is
    * cleansed by the idempotent [[BandIndex.remove]], resumable on
    * failure by re-running).
    */
  def erase(spark: SparkSession, corpusDir: String, indexName: String,
            indexPath: String, docIds: DataFrame,
            buckets: Int = 32): Long = {
    val n = eraseFromCorpus(spark, corpusDir, docIds)
    BandIndex.remove(spark, indexName, indexPath, docIds, buckets)
    n
  }
}
