package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Gopher quality-rule battery (Rae et al. 2021 §A1.1) as a
  * reusable transform — q107 is the per-source audit over these same
  * rule definitions; [[graft.etl.CurationPipeline]] applies them as the
  * crawl-side quality gate ahead of budget selection.
  *
  * The stat aggregates and rule predicates are defined ONCE here and
  * shared by the audit query and the gate (the `gramHashArr` stance: a
  * drifted copy cannot vacuously agree), while each caller keeps its
  * own optimal frame shape — q107 carries `source` through the
  * aggregation and never joins; the gate joins flags back to the full
  * doc rows because it must preserve arbitrary caller columns.
  *
  * Every threshold evaluates as an integer cross-multiplication
  * (pct-scaled counts against n·pct), so rule outcomes are exact and
  * engine-independent — no float division at the boundaries.
  */
object QualityRules {

  /** Thresholds, in the units the rules quote: token-count bounds,
    * mean-word-length bounds (whole chars), stopword floor, and
    * percentage caps/floors for top-token share, symbol-ish tokens and
    * letter-bearing tokens.
    */
  final case class Params(
      minWords: Long = 50,
      maxWords: Long = 100000,
      minMeanLen: Long = 3,
      maxMeanLen: Long = 10,
      minStop: Long = 2,
      topTokenPctMax: Int = 20,
      symbolPctMax: Int = 10,
      alphaPctMin: Int = 80,
      stopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "in"))

  /** Per-doc stat aggregates over the compressed (t = token, c = count)
    * frame: total tokens, summed token chars, stopword hits, the top
    * token's count, symbol-ish hits, letter-bearing hits. Callers group
    * by doc_id (plus whatever rides along) and splat these.
    */
  def statAggs(p: Params): Seq[Column] = Seq(
    sum(col("c")).as("n"),
    sum(col("c") * length(col("t"))).as("sum_len"),
    sum(when(col("t").isin(p.stopwords: _*), col("c")).otherwise(0L)).as("n_stop"),
    max(col("c")).as("max_cnt"),
    sum(when(col("t").like("%#%") || col("t").like("%...%"), col("c"))
      .otherwise(0L)).as("n_sym"),
    sum(when(col("t").rlike("[a-zA-Z]"), col("c")).otherwise(0L)).as("n_alpha"))

  /** The six (flag name, failure predicate) pairs over [[statAggs]]'s
    * column names. Integer cross-multiplications only.
    */
  def flagCols(p: Params): Seq[(String, Column)] = Seq(
    "f_wc" -> (col("n") < p.minWords || col("n") > p.maxWords),
    "f_wl" -> (col("sum_len") < col("n") * p.minMeanLen ||
               col("sum_len") > col("n") * p.maxMeanLen),
    "f_stop" -> (col("n_stop") < p.minStop),
    "f_rep" -> (col("max_cnt") * 100 > col("n") * p.topTokenPctMax),
    "f_sym" -> (col("n_sym") * 100 > col("n") * p.symbolPctMax),
    "f_alpha" -> (col("n_alpha") * 100 < col("n") * p.alphaPctMin))

  /** Appends the six failure flags and their conjunction `rules_pass`
    * to `docs` (needs `doc_id` and `text`; every other column rides
    * along). Flags compute on a doc_id-keyed stats frame and join back
    * — one doc-keyed exchange each side at scale.
    */
  def withRuleFlags(docs: DataFrame, p: Params = Params()): DataFrame = {
    val toks = split(coalesce(col("text"), lit("")), " ")
    val tokCounts = docs
      .select(col("doc_id"), explode(toks).as("t"))
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("c"))
    val aggs = statAggs(p)
    val stats = tokCounts.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val flags = flagCols(p)
    val flagged = flags.foldLeft(stats) { case (df, (nm, c)) => df.withColumn(nm, c) }
      .withColumn("rules_pass", flags.map { case (nm, _) => !col(nm) }.reduce(_ && _))
      .select(col("doc_id") +: (flags.map(f => col(f._1)) :+ col("rules_pass")): _*)
    // inner join: split() yields at least one token for every doc (even
    // empty text), so the stats frame always has the doc's row
    docs.join(flagged, Seq("doc_id"))
  }

  /** The docs that pass every rule, flags dropped — schema-preserving
    * (the curation-gate form).
    */
  def passing(docs: DataFrame, p: Params = Params()): DataFrame =
    withRuleFlags(docs, p).filter(col("rules_pass"))
      .drop("rules_pass").drop(flagCols(p).map(_._1): _*)
}
