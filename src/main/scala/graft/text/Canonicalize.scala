package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate CANONICALIZATION as a reusable transform: q100 reports
  * what a survivor policy would keep; this actually keeps it — the
  * dedup step a corpus pipeline ships (find pairs → name clusters →
  * keep one representative per cluster, drop the rest).
  *
  * Survivor policies (all deterministic — no rand(), stable reruns):
  *   - [[KeepLongest]]: longest doc wins (by `n_chars`), ties to the
  *     smallest doc_id — the q100 policy: most content survives.
  *   - [[KeepFirst]]: smallest doc_id wins — the "first crawled"
  *     stance incremental ingest ([[graft.etl.BandIndex.dedupBatch]])
  *     converges to, offered batch-side for parity.
  *
  * Scale design (same spine as q100): pairs via
  * [[TextQueries.ngramJaccardPairs]] (inverted index + PPJoin length
  * filter — never all-pairs), clusters via
  * [[TextQueries.componentLabels]] (min-label propagation with
  * pointer-doubling shortcuts, O(log diameter) rounds), and the election is ONE map-side-combinable
  * struct-max aggregate per cluster — a viral boilerplate cluster of
  * millions of members never serializes a per-cluster window sort.
  * The survivor filter is a label-keyed equi-join (AQE-skew-splittable),
  * and the returned frame keeps the caller's full schema: survivors
  * are selected by id, columns pass through untouched.
  */
object Canonicalize {

  sealed trait Policy
  /** Longest doc (max n_chars) wins; ties to the smallest doc_id. */
  case object KeepLongest extends Policy
  /** Smallest doc_id wins (first-crawled stance). */
  case object KeepFirst extends Policy

  /** How near-dup pairs are found — the similarity DEFINITION, not just
    * a tuning knob, so it is explicit at the call site.
    */
  sealed trait PairSource
  /** Exact 3-gram shingle Jaccard ≥ t via the inverted index + PPJoin
    * length filter (the q51 pipeline) — exact recall, heavier index.
    */
  final case class NgramJaccard(t: Double = 0.8) extends PairSource
  /** MinHash LSH candidates + exact token-set Jaccard verify ≥
    * params.threshold (the q45 pipeline) — the 100 TB path: banding
    * bounds the candidate set, recall follows the [[LshParams]]
    * S-curve (probabilistic; a missed candidate is a missed pair).
    */
  final case class MinhashLsh(params: LshParams = LshParams())
      extends PairSource

  /** Returns the survivors of `docs` (schema preserved, one doc per
    * near-dup cluster, singletons always survive). `docs` must carry
    * `doc_id`, `text`, and — for [[KeepLongest]] — `n_chars`.
    */
  def survivors(docs: DataFrame,
                policy: Policy = KeepLongest,
                pairs: PairSource = NgramJaccard()): DataFrame = {
    // the election key per policy: max(struct(k, -id)) elects (max k,
    // then min id) in one map-side-combinable aggregate. KeepFirst
    // never references n_chars, so frames without it canonicalize too.
    val k = policy match {
      case KeepLongest => col("n_chars").cast("long")
      case KeepFirst   => lit(0L)
    }
    // barrier the edge list (the q100/q72/q98 stance): componentLabels
    // re-reads edges several times per propagation round — without the
    // barrier the whole pair-generation pipeline would re-execute on
    // every read instead of once
    val rawPairs = pairs match {
      case NgramJaccard(t) => pairsOf(docs, t)
      case MinhashLsh(p)   => TextQueries.minhashNearDupPairsOf(docs, p)
    }
    val edges = graft.Barrier(rawPairs.select(col("doc_a"), col("doc_b")))
    val labs = docs.select(col("doc_id"), k.as("k"))
      .join(TextQueries.componentLabels(edges)
          .withColumnRenamed("node", "doc_id"),
        Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("k"),
        coalesce(col("lab"), col("doc_id")).as("lab"))
    val canonIds = labs.groupBy(col("lab"))
      .agg(max(struct(col("k"), (-col("doc_id")).as("neg"))).as("w"))
      .select((-col("w.neg")).as("doc_id"))
    docs.join(canonIds, Seq("doc_id"), "left_semi")
  }

  /** Near-dup pairs over an in-memory documents frame — the
    * [[TextQueries.ngramJaccardPairs]] pipeline (inverted index, PPJoin
    * length filter, skew-split candidate join) applied to `docs`
    * directly instead of a table path, so callers can canonicalize any
    * intermediate frame (a crawl batch, a filtered slice), not only
    * the on-disk corpus.
    */
  private[graft] def pairsOf(docs: DataFrame, t: Double): DataFrame =
    TextQueries.ngramJaccardPairsOf(docs, t)
}
