package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Advisor-driven broadcast-vs-shuffle choice (VERDICT r10 item 8 —
  * stretch): [[graft.Tables.maybeBroadcast]] generalized from a STATIC
  * table whitelist to a MEASURED decision. The candidate build side's
  * key-count frame — the exact pass [[ExplainAdvisor]]'s CMS sketch
  * rides, and the stats-collection pass a self-tuning planner pays —
  * yields its row count; the frame is broadcast iff that count is at
  * or under the configured threshold.
  *
  * Semantics: a broadcast HINT never changes results, only the
  * physical join strategy — both branches are the identical logical
  * join ([[AdvisedBroadcastSpec]] proves hash-identical output on both
  * sides of the threshold). So the decision needs no safety margin for
  * correctness, only for driver memory: the default threshold (500k
  * rows ≈ tens of MB hashed) is far under any sane driver heap while
  * comfortably above every dimension/aggregate frame the registry
  * broadcasts today.
  *
  * Why rows, not Catalyst's sizeInBytes: post-aggregate frames carry
  * no reliable size statistic before execution (the planner falls back
  * to child-size products, which is exactly how AQE ends up
  * shuffle-joining a 20k-row support frame at plan time and only
  * fixing it adaptively after the first exchange materializes). The
  * one aggregate this spends is the advisor's own cost model: measure
  * once, place the hint, skip the misplanned first exchange.
  *
  * At 100 TB: the count pass is map-side combinable over the
  * candidate frame only (never the probe side), and the threshold
  * decision degrades gracefully — an overgrown "dimension" simply
  * stops being broadcast, the join falls back to the shuffled
  * equi-join it would have been anyway.
  */
object AdvisedBroadcast {

  /** Row-count ceiling for an advised broadcast (session conf). */
  val ThresholdKey = "spark.graft.advisedBroadcastRows"
  val DefaultThreshold = 500000L

  /** `df` with a broadcast hint iff its measured row count is at or
    * under the threshold. The count is ONE aggregate over `df` — pass
    * a barriered/cached frame when `df` is also consumed elsewhere, or
    * the count pass recomputes its plan.
    */
  def apply(df: DataFrame): DataFrame = {
    val threshold = df.sparkSession.conf
      .get(ThresholdKey, DefaultThreshold.toString).toLong
    val n = df.agg(count(lit(1))).head().getLong(0)
    if (n <= threshold) broadcast(df) else df
  }
}
