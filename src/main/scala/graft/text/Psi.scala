package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PSI drift scoring as a reusable transform — the q117 operator's
  * model (population-stability index over power-of-2 token-length
  * buckets) split into its three stages, so a monitor can score ONE
  * corpus against ANOTHER's pinned reference instead of only a corpus
  * against itself: [[bucketCounts]] (per-source distribution),
  * [[reference]] (the corpus-wide rollup), [[score]] (the exact-integer
  * PSI algebra). q117 composes exactly these — the oracle certifies
  * the same definitions the streaming monitor
  * ([[graft.streaming.DriftMonitorJob]]) runs per micro-batch.
  *
  * Determinism is the q117 contract: +1-smoothed counts, sign-stable
  * exact-long terms (both factors of (cs·Nr − rs·Ns)·(L(cs·Nr) −
  * L(rs·Ns)) share a sign because the quantized log2 [[TextQueries
  * .lqSql]] is monotone), decimal(38,0) sums, and a final three-IEEE-op
  * conversion to the true PSI scale.
  *
  * Scale design: [[bucketCounts]] is the ONLY stage that touches the
  * corpus — one map pass (no explode; the per-doc work is
  * `size(split(...))`) compressed immediately by a (source, bucket)
  * aggregate of cardinality |sources|·O(log max_len). Everything in
  * [[score]] is broadcast algebra on sub-hundred-row frames.
  */
object Psi {

  /** (source, b, c): per-source power-of-2 length-bucket counts —
    * b = length(bin(n_tokens)), the integer log2 needing no libm.
    */
  def bucketCounts(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        expr("length(bin(cast(size(split(coalesce(text, ''), ' ')) as bigint)))")
          .cast("long").as("b"))
      .groupBy(col("source"), col("b")).agg(count(lit(1)).as("c"))

  /** (b, r): the corpus-wide reference distribution. */
  def reference(docs: DataFrame): DataFrame =
    bucketCounts(docs).groupBy(col("b")).agg(sum(col("c")).as("r"))

  /** Score each source in `counts` against `ref`: (source, n_docs,
    * n_buckets, psi, top_bucket, drifted). The bucket grid is the
    * UNION of both sides' buckets (a batch bucket the reference never
    * saw gets r = 0, maximally penalized by smoothing — exactly what a
    * drift monitor wants from out-of-profile lengths).
    */
  def score(counts: DataFrame, ref: DataFrame,
            threshold: Double = 0.2): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    import TextQueries.lqSql
    val cc = counts.cache()
    val bref = cc.select($"b").distinct()
      .join(ref, Seq("b"), "full_outer")
      .select($"b", coalesce($"r", lit(0L)).as("r"))
      .cache() // |buckets| rows: totals + grid read it
    val srcTot = cc.groupBy($"source").agg(sum($"c").as("n_docs"))
    val nBuckets = bref.agg(count(lit(1)).as("nb"), sum($"r").as("n_total"))
    val grid = srcTot.crossJoin(broadcast(bref))
      .join(cc, Seq("source", "b"), "left_outer")
      .crossJoin(broadcast(nBuckets))
      .withColumn("c0", coalesce($"c", lit(0L)))
      .withColumn("cs", $"c0" + 1L).withColumn("rs", $"r" + 1L)
      .withColumn("ns", $"n_docs" + $"nb")
      .withColumn("nr", $"n_total" + $"nb")
      .withColumn("d", $"cs" * $"nr" - $"rs" * $"ns")
      .withColumn("dl", expr(s"${lqSql("cs * nr")} - ${lqSql("rs * ns")}"))
      .withColumn("term", expr("cast(d as decimal(38,0)) * dl"))
    grid.groupBy($"source")
      .agg(max($"n_docs").as("n_docs"),
        count_if($"c0" > 0).as("n_buckets"),
        sum($"term").as("psi_q"),
        max($"ns").as("nsv"), max($"nr").as("nrv"),
        // worst bucket: largest term, ties to the SMALLER bucket id
        max(struct($"term", (-$"b").as("negb"))).as("w"))
      .select($"source", $"n_docs", $"n_buckets",
        expr("cast(psi_q as double) * 0.6931471805599453" +
          " / (cast(nsv as double) * cast(nrv as double) * 1048576.0)")
          .as("psi"),
        (-$"w.negb").as("top_bucket"))
      .withColumn("drifted", $"psi" >= threshold)
  }
}
