package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query-able curation lineage (round-8 stretch): one row per
  * (doc_id, decision event) recording which pipeline stage decided a
  * doc's fate, in which pipeline round, and why — so a takedown or
  * quality audit can answer "why is/isn't this doc in the corpus?"
  * with one indexed lookup instead of a pipeline re-run.
  *
  * The reference keeps no per-record provenance at all (its pipeline
  * logs aggregate counts only, healthcare-data-pipeline-main.py:
  * 507-546); this is the audit surface a 100 TB training-data corpus
  * needs for governance (takedown receipts), debugging (which gate
  * cost us this domain) and datasheets.
  *
  * == Storage layout ==
  * Parquet under `lineageDir`, hash-partitioned on
  * `doc_bucket = pmod(doc_id, Buckets)` — a doc lookup computes its
  * bucket from the id alone and reads ONE partition directory
  * (partition pruning, no full-ledger scan), while stage/round audits
  * scan all buckets but prune columns. Append-only: a doc's history is
  * the ordered set of its rows (round, then stage order); erasure of
  * the DOC does not erase its lineage — the ledger row for an erased
  * doc carries no text, only the id and the verdict, which is exactly
  * the receipt a takedown needs to keep. (If ids themselves are
  * PII-adjacent, point `remove` at the ledger too.)
  *
  * == Scale shape ==
  * Every writer appends a frame that is an anti-join or projection of
  * frames the pipeline already computed — no extra corpus scans; the
  * write shuffles only (doc_id, source, small strings) rows. Lookups
  * are partition-pruned; the per-(stage, verdict, source) audit is one
  * map-side-combinable aggregate over pruned columns.
  */
object Lineage {

  val Buckets = 32

  /** Stage ordering for history rendering: ingest dedup first, then
    * the batch gates in [[CurationPipeline.run]] execution order, then
    * selection, then post-run erasure.
    */
  val StageOrder: Seq[String] = Seq(
    "ingest_dedup", "canonicalize", "trim", "noise", "rules",
    "perplexity", "decontaminate", "select", "erasure")

  private def stageRank(c: org.apache.spark.sql.Column) = {
    val m = map(StageOrder.zipWithIndex.flatMap {
      case (s, i) => Seq(lit(s), lit(i))
    }: _*)
    coalesce(element_at(m, c), lit(StageOrder.size))
  }

  /** Append decision rows. `docs` needs (doc_id, source); `detail` may
    * reference columns of `docs` (e.g. a dup_of id rendered into it).
    */
  def record(spark: SparkSession, lineageDir: String, docs: DataFrame,
             stage: String, verdict: String,
             detail: org.apache.spark.sql.Column, round: Long): Unit = {
    docs
      .select(
        col("doc_id").cast("long").as("doc_id"),
        coalesce(col("source"), lit("")).as("source"),
        lit(stage).as("stage"), lit(verdict).as("verdict"),
        detail.cast("string").as("detail"),
        lit(round).as("round"),
        pmod(col("doc_id").cast("long"), lit(Buckets.toLong)).as("doc_bucket"))
      .write.mode("append").partitionBy("doc_bucket").parquet(lineageDir)
  }

  /** The one-indexed-lookup the stretch goal names: a single doc's
    * full decision history, partition-pruned to its bucket directory.
    */
  def explain(spark: SparkSession, lineageDir: String, docId: Long): DataFrame = {
    spark.read.parquet(lineageDir)
      .filter(col("doc_bucket") === docId % Buckets && col("doc_id") === docId)
      .orderBy(col("round"), stageRank(col("stage")))
      .select("doc_id", "source", "stage", "verdict", "detail", "round")
  }

  /** Each doc's TERMINAL state per round (the last stage that touched
    * it): 'selected' docs are in that round's training manifest;
    * every other verdict names the gate that excluded them; an
    * 'erased' row (any round) overrides — erasure is terminal across
    * rounds by definition.
    */
  def terminalStates(spark: SparkSession, lineageDir: String): DataFrame = {
    val ev = spark.read.parquet(lineageDir)
    val erased = ev.filter(col("stage") === "erasure")
      .groupBy(col("doc_id")).agg(
        first(col("source")).as("source"),
        lit("erasure").as("stage"), lit("erased").as("verdict"),
        max(col("round")).as("round"))
    val last = ev.filter(col("stage") =!= "erasure")
      .groupBy(col("doc_id"))
      .agg(max_by(
        struct(col("source"), col("stage"), col("verdict"), col("round")),
        struct(col("round"), stageRank(col("stage")))).as("t"))
      .select(col("doc_id"), col("t.source").as("source"),
        col("t.stage").as("stage"), col("t.verdict").as("verdict"),
        col("t.round").as("round"))
    last.join(erased.select(col("doc_id").as("e_id")),
        col("doc_id") === col("e_id"), "left_anti")
      .unionByName(erased)
  }

  /** Audit ledger: docs per (stage, verdict, source) — one
    * map-side-combinable aggregate over pruned columns.
    */
  def audit(spark: SparkSession, lineageDir: String): DataFrame =
    spark.read.parquet(lineageDir)
      .groupBy(col("stage"), col("verdict"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("stage"), col("verdict"), col("source"))
}
