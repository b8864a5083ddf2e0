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
    * Fails fast while [[compact]] holds the ledger's maintenance
    * lease (the [[BandIndex.append]] stance): an append racing the
    * commit phase could land between a bucket's old-file delete list
    * being written and executed, and while the marker protocol never
    * DELETES an unlisted file, the writer deserves a loud signal
    * instead of interleaving with maintenance.
    */
  def record(spark: SparkSession, lineageDir: String, docs: DataFrame,
             stage: String, verdict: String,
             detail: org.apache.spark.sql.Column, round: Long): Unit = {
    BandIndex.assertNoMaintenance(spark, lineageDir, "record lineage")
    docs
      .select(
        col("doc_id").cast("long").as("doc_id"),
        coalesce(col("source"), lit("")).as("source"),
        lit(stage).as("stage"), lit(verdict).as("verdict"),
        detail.cast("string").as("detail"),
        lit(round).as("round"),
        pmod(col("doc_id").cast("long"), lit(Buckets.toLong)).as("doc_bucket"))
      .repartition(col("doc_bucket")) // one file per bucket per append
      .write.mode("append").partitionBy("doc_bucket").parquet(lineageDir)
  }

  /** Append MANY stages' decision rows in ONE write job. `decisions`
    * needs (doc_id, source, stage, verdict, detail) — the caller has
    * already rendered stage/verdict/detail per row — and lands as a
    * single parquet append instead of one job per stage: a pipeline
    * recording N gates pays one shuffle-free pass over frames it
    * already computed plus one commit, not N (the q263 bench fix —
    * 4 record() jobs re-ran the shared fingerprint scan 4×).
    * Same maintenance-fence stance as [[record]].
    */
  def recordBatch(spark: SparkSession, lineageDir: String,
                  decisions: DataFrame, round: Long): Unit = {
    BandIndex.assertNoMaintenance(spark, lineageDir, "record lineage")
    decisions
      .select(
        col("doc_id").cast("long").as("doc_id"),
        coalesce(col("source"), lit("")).as("source"),
        col("stage").cast("string").as("stage"),
        col("verdict").cast("string").as("verdict"),
        col("detail").cast("string").as("detail"),
        lit(round).as("round"),
        pmod(col("doc_id").cast("long"), lit(Buckets.toLong)).as("doc_bucket"))
      // cluster by bucket first: without it every input task writes a
      // file into every bucket dir (tasks × Buckets tiny files per
      // append — the commit/list cost, not the rows, dominated q263's
      // bench time), with it each bucket lands as one file per append
      // — the same layout compact() converges to
      .repartition(col("doc_bucket"))
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

  // ---------------------------------------------------------------
  // Compaction (round-9 stretch: VERDICT r8 item 8). The ledger is
  // append-only forever, and every record() call lands a fresh file
  // set in each touched bucket directory — a long-lived corpus's
  // ledger degrades into thousands of kilobyte files per bucket and
  // the "one indexed lookup" promise drowns in file-open overhead.
  // compact() folds each over-pressure bucket back to one file,
  // under the SAME maintenance-lease protocol as the BandIndex
  // generation swaps (shared lease file, fencing token verified at
  // the commit point, stale-crash takeover semantics).
  //
  // Commit protocol — file-level, loss-proof, resumable:
  //   1. rewrite the pressed buckets into `<dir>/.gen/doc_bucket=N/`
  //      (dot-dirs are invisible to the parquet reader), verify the
  //      row count matches the snapshot it was derived from;
  //   2. fence-check, then atomically land `<dir>/.compact_commit` —
  //      the list of superseded old files (the ONLY files the
  //      protocol is ever allowed to delete);
  //   3. move each .gen file into its live bucket as
  //      `compacted-<name>`, delete the listed old files, clear the
  //      marker, then the .gen dir.
  // Crash walk: before the marker → .gen is a stale snapshot and the
  // next compact discards it (rows at risk: zero — nothing live was
  // touched). After the marker → redoCommit() finishes the moves and
  // deletes idempotently on the next call (a re-crashed redo re-runs;
  // moved files are skipped via target-exists, deletes are
  // best-effort-idempotent). The only anomalous window is DURING a
  // commit, where a reader could double-count a bucket — compaction
  // is offline maintenance exactly like BandIndex.compact, and the
  // lease keeps writers out; readers during maintenance are outside
  // the contract.
  // ---------------------------------------------------------------

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem,
                        dir: org.apache.hadoop.fs.Path)
      : Seq[org.apache.hadoop.fs.Path] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.filter(_.isFile).map(_.getPath)
      .filterNot(p => p.getName.startsWith("_") || p.getName.startsWith("."))

  /** Fold every bucket holding more than `maxFilesPerBucket` data
    * files down to one file, content-identical (it is a pure file
    * consolidation — the ledger's rows carry their own (round, stage)
    * ordering, so row order inside a file is free). Returns true when
    * a commit ran, false for the no-op probe. Lease-enforced; crash-
    * resumable (see the protocol walk above).
    */
  def compact(spark: SparkSession, lineageDir: String,
              maxFilesPerBucket: Int = 8,
              leaseTtlMs: Long = BandIndex.DefaultLeaseTtlMs): Boolean =
    BandIndex.withLease(spark, lineageDir, "lineage_compact", leaseTtlMs) {
      fence => compactUnderLease(spark, lineageDir, maxFilesPerBucket, fence)
    }

  private[etl] def compactUnderLease(spark: SparkSession, lineageDir: String,
                                     maxFilesPerBucket: Int,
                                     fence: String,
                                     // test-only injection point: fires
                                     // between the file-list snapshot and
                                     // the rewrite, where a guard-raced
                                     // record() could land files
                                     afterListing: () => Unit = () => ())
      : Boolean = {
    val root = new org.apache.hadoop.fs.Path(lineageDir)
    val fs = fsOf(spark, root)
    val genRoot = new org.apache.hadoop.fs.Path(lineageDir, ".gen")
    val marker = new org.apache.hadoop.fs.Path(lineageDir, ".compact_commit")
    // heal first: a marker means a prior commit crashed mid-flight —
    // its .gen rows are the LIVE copy of the deleted old files, so the
    // only legal move is forward. A markerless .gen is a stale
    // snapshot (its lease may have lapsed and appends landed since):
    // discard, never promote.
    if (fs.exists(marker)) redoCommit(spark, lineageDir)
    else if (fs.exists(genRoot)) fs.delete(genRoot, true)

    val pressed = (if (fs.exists(root)) fs.listStatus(root).toSeq else Seq.empty)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("doc_bucket="))
      .map(st => st.getPath -> dataFiles(fs, st.getPath))
      .filter(_._2.size > maxFilesPerBucket)
    if (pressed.isEmpty) return false
    afterListing()

    // one job rewrites all pressed buckets; basePath keeps doc_bucket
    // as a partition column so the .gen layout mirrors the live one.
    // CRITICAL: the read is pinned to the exact FILE list `pressed`
    // captured, not the bucket directories — a directory read would
    // take a second, later listing, and a record() that slipped its
    // check-time assertNoMaintenance guard just before the lease
    // landed could commit files between the two listings: folded into
    // .gen but absent from the delete list → silent row duplication
    // after the commit (and the genN==oldN verify, reading the same
    // later listing, could not see it). Pinning files makes
    // delete-list == rewrite-source by construction; a late append's
    // files are simply left live, untouched, for the next compaction.
    val snapshot = pressed.flatMap(_._2)
    val src = spark.read.option("basePath", lineageDir)
      .parquet(snapshot.map(_.toString): _*)
    src.repartition(col("doc_bucket"))
      .write.mode("overwrite").partitionBy("doc_bucket")
      .parquet(genRoot.toString)
    val oldN = src.count() // same file-index snapshot the write used
    // no basePath here: .gen is the explicit root (user-given roots
    // are exempt from the hidden-path filter; its doc_bucket=N
    // children partition-discover normally)
    val genN = spark.read.parquet(genRoot.toString).count()
    require(genN == oldN,
      s"lineage compact verify failed: $genN compacted rows vs $oldN " +
        s"source rows at $lineageDir — aborting before the commit point")

    // commit point: fence, then atomically land the delete list
    BandIndex.verifyFence(spark, lineageDir, fence)
    val tmpMarker = new org.apache.hadoop.fs.Path(
      lineageDir, ".compact_commit.tmp")
    val outS = fs.create(tmpMarker, true)
    try outS.write(snapshot.map(_.toString)
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally outS.close()
    require(fs.rename(tmpMarker, marker),
      s"could not land commit marker $marker")
    redoCommit(spark, lineageDir)
    true
  }

  /** Finish (or re-finish) a marked commit: move remaining .gen files
    * into their live buckets, delete exactly the marker-listed old
    * files, clear marker then .gen. Idempotent at every step.
    */
  private[etl] def redoCommit(spark: SparkSession, lineageDir: String): Unit = {
    val fs = fsOf(spark, new org.apache.hadoop.fs.Path(lineageDir))
    val genRoot = new org.apache.hadoop.fs.Path(lineageDir, ".gen")
    val marker = new org.apache.hadoop.fs.Path(lineageDir, ".compact_commit")
    if (!fs.exists(marker)) return
    if (fs.exists(genRoot)) {
      fs.listStatus(genRoot)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("doc_bucket="))
        .foreach { bdir =>
          val live = new org.apache.hadoop.fs.Path(lineageDir, bdir.getPath.getName)
          if (!fs.exists(live)) fs.mkdirs(live)
          dataFiles(fs, bdir.getPath).foreach { f =>
            val tgt = new org.apache.hadoop.fs.Path(live, "compacted-" + f.getName)
            if (!fs.rename(f, tgt))
              require(fs.exists(tgt), // already moved by a crashed redo
                s"lineage compact commit: cannot move $f to $tgt")
          }
        }
    }
    val in = fs.open(marker)
    val listed =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    listed.foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), false))
    fs.delete(marker, false)
    fs.delete(genRoot, true)
    ()
  }
}
