package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash band index for incremental deduplication — the
  * storage half of the every-crawl pattern
  * [[graft.text.TextQueries.q88]] expresses inline (that query
  * recomputes the corpus side because its DuckDB oracle needs one
  * self-contained expression; a production pipeline must not).
  *
  * Lifecycle:
  *  - [[create]]: tokenize the corpus ONCE; write two bucketed parquet
  *    tables — `<name>_docs` (doc_id, n, fp, th) bucketed by `fp` for
  *    the exact layer, `<name>_bands` (doc_id, n, band_val) bucketed by
  *    `band_val` for the near layer.
  *  - [[dedupBatch]]: classify an incoming batch (exact / near / kept)
  *    reading ONLY the index — corpus text is never re-read, corpus
  *    tokens never recomputed.
  *  - [[append]]: add the kept batch's signatures to both tables —
  *    the index is appended to, never rebuilt.
  *
  * Scale design: bucketing by the join key is what kills the per-batch
  * corpus shuffle — the exact semi-join (on fp) and the band join (on
  * band_val) both find the corpus side pre-partitioned on disk, so the
  * only exchanges are on the BATCH side (batch-sized, by definition).
  * The exact-verify join fetches token hashes for colliding old docs
  * only; its candidate side is batch-scaled, so AQE broadcasts it and
  * the `_docs` lookup stays map-side (no forced broadcast — the
  * shuffle fallback survives a pathological batch, the q83 lesson).
  * Band ids are folded INTO the 64-bit band hash (`xxhash64(bandNo,
  * …)`) so one long is the entire join key; hash collisions only merge
  * buckets, adding spurious candidates that exact verification removes
  * (the q45 argument). Signature math (tokenize → 8 salted md5 min
  * hashes → 2 bands of 4, threshold 0.99) is bit-identical to
  * q45/q88, so the classifications agree with the verified queries.
  *
  * Tables are written via `saveAsTable` with an explicit `path`:
  * external data, catalog-tracked bucketing. On a fresh session,
  * re-register with `CREATE TABLE <name>_bands USING parquet ...
  * CLUSTERED BY (band_val) INTO <n> BUCKETS LOCATION ...` — the
  * layout on disk is plain bucketed parquet.
  */
object BandIndex {

  private val Threshold = 0.99

  def docsTable(name: String): String = name + "_docs"
  def bandsTable(name: String): String = name + "_bands"

  /** Per-doc signature rows off (doc_id, text): distinct token array →
    * count, order-invariant fingerprint, 64-bit token hashes, 8 salted
    * min-hashes. NULL text coalesces to the one-empty-token array (the
    * q88 cross-engine convention).
    */
  private[etl] def signatures(docs: DataFrame): DataFrame = {
    val mins = (1 to 8).map(i => expr(
      s"array_min(transform(ta, t -> md5(cast(concat('$i|', t) as binary))))")
      .as(s"m$i"))
    docs
      .select(col("doc_id"),
        array_distinct(split(coalesce(col("text"), lit("")), " ")).as("ta"))
      .withColumn("n", size(col("ta")).cast("long"))
      .withColumn("fp", md5(concat_ws(" ", array_sort(col("ta"))).cast("binary")))
      .withColumn("th", transform(col("ta"), t => xxhash64(t)))
      .select(Seq(col("doc_id"), col("n"), col("fp"), col("th")) ++ mins: _*)
  }

  /** Signature rows → band rows (doc_id, n, band_val); the band number
    * is folded into the hash so band_val alone is the join key.
    */
  private[etl] def bandRows(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("n"), explode(array(
      xxhash64(lit(1), concat(col("m1"), col("m2"), col("m3"), col("m4"))),
      xxhash64(lit(2), concat(col("m5"), col("m6"), col("m7"), col("m8")))))
      .as("band_val"))

  private def writeBucketed(df: DataFrame, table: String, path: String,
                            buckets: Int, bucketCol: String): Unit =
    df.write
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .option("path", s"$path/$table")
      .format("parquet")
      .mode("append")
      .saveAsTable(table)

  /** Build the index from a corpus of (doc_id, text [, …]) — the ONE
    * time corpus text is tokenized.
    *
    * Write ORDER is a crash-safety invariant: bands BEFORE
    * fingerprints. The two appends are not atomic; if a failure lands
    * between them, the recovery semantics differ by order. Bands-first:
    * a doc with band rows but no fp row is re-KEPT on replay (the
    * exact layer misses it, and the near layer's verify can't fetch
    * its token hashes), so the retried append writes the missing fp
    * row — at worst the bands table holds duplicate rows, which the
    * candidate `distinct()` absorbs. Fp-first would flag the replayed
    * doc as an exact dup of itself, the kept slice comes back empty,
    * and the band rows are never backfilled — the near-dup layer goes
    * permanently blind to that doc.
    */
  def create(spark: SparkSession, corpus: DataFrame, name: String,
             path: String, buckets: Int = 32): Unit = {
    // localCheckpoint: one tokenization feeding both tables, released
    // by the ContextCleaner (not a session-lifetime cache entry)
    val sigs = signatures(corpus).localCheckpoint()
    writeBucketed(bandRows(sigs), bandsTable(name), path, buckets, "band_val")
    writeBucketed(sigs.select("doc_id", "n", "fp", "th"),
      docsTable(name), path, buckets, "fp")
  }

  /** Append docs (normally the kept slice of a batch) to the index.
    * `saveAsTable(mode=append)` with the identical bucket spec adds new
    * per-bucket files; bucketed reads union them, partitioning intact.
    *
    * The explicit refresh matters when `docs` belongs to a DIFFERENT
    * session than the one reading the index (foreachBatch hands frames
    * bound to the streaming clone session): the insert command only
    * invalidates the writing session's relation cache, so without the
    * refresh `spark`'s next [[dedupBatch]] would classify against a
    * stale file listing and silently re-admit duplicates.
    */
  def append(spark: SparkSession, docs: DataFrame, name: String,
             path: String, buckets: Int = 32): Unit = {
    create(spark, docs, name, path, buckets)
    Seq(docsTable(name), bandsTable(name))
      .foreach(spark.catalog.refreshTable)
  }

  /** Classify a batch of (doc_id, text [, …]) against the persisted
    * index: returns (doc_id, flag) with flag ∈ exact | near | kept.
    * Reads only the index tables — never corpus text.
    */
  def dedupBatch(spark: SparkSession, batch: DataFrame, name: String): DataFrame = {
    // batch tokenized once (three consumers below)
    val sigs = signatures(batch).localCheckpoint()
    val fps = spark.table(docsTable(name))
    val bands = spark.table(bandsTable(name))
    // exact layer: fingerprint semi-join — corpus side pre-bucketed on fp
    val exact = sigs.join(fps.select("fp"), Seq("fp"), "left_semi")
      .select("doc_id")
    val survivors = sigs.join(exact, Seq("doc_id"), "left_anti")
    // near layer: compact band keys vs the pre-bucketed band index
    val cand = bandRows(survivors).as("i")
      .join(bands.as("o"),
        col("i.band_val") === col("o.band_val") &&
        col("i.n") >= col("o.n") * Threshold &&
        col("o.n") >= col("i.n") * Threshold)
      .select(col("i.doc_id").as("doc_id"), col("o.doc_id").as("old_id"),
              col("i.n").as("ni"), col("o.n").as("no"))
      .distinct()
    // exact verify on colliding pairs only: fetch old token hashes from
    // the index, intersect map-side on longs
    val near = cand
      .join(sigs.select(col("doc_id"), col("th").as("tia")), Seq("doc_id"))
      .join(fps.select(col("doc_id").as("old_id"), col("th").as("toa")), Seq("old_id"))
      .withColumn("isz", size(array_intersect(col("tia"), col("toa"))).cast("long"))
      .filter(col("isz") * 1.0 / (col("ni") + col("no") - col("isz")) >= Threshold)
      .select("doc_id").distinct()
    sigs.select("doc_id")
      .join(exact.withColumn("ex", lit(1)), Seq("doc_id"), "left_outer")
      .join(near.withColumn("nr", lit(1)), Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        when(col("ex").isNotNull, "exact")
          .when(col("nr").isNotNull, "near")
          .otherwise("kept").as("flag"))
  }

  /** The kept slice of a batch, per [[dedupBatch]] flags — shared by
    * [[ingest]] and streaming callers that sink the kept docs
    * elsewhere before appending (one definition, consumers can't
    * drift).
    */
  def keptOf(batch: DataFrame, flags: DataFrame): DataFrame =
    batch.join(flags.filter(col("flag") === "kept").select("doc_id"),
      Seq("doc_id"), "left_semi")

  /** One full incremental step: classify the batch, append the kept
    * docs to the index, return the per-doc flags. Callers that also
    * persist the kept slice to another sink should write that sink
    * BETWEEN [[dedupBatch]] and [[append]] (see
    * [[graft.streaming.CorpusIngestJob]]) so a replayed batch
    * re-derives the same kept set instead of finding itself already
    * indexed.
    */
  def ingest(spark: SparkSession, batch: DataFrame, name: String,
             path: String, buckets: Int = 32): DataFrame = {
    val flags = dedupBatch(spark, batch, name).localCheckpoint()
    append(spark, keptOf(batch, flags), name, path, buckets)
    flags
  }
}
