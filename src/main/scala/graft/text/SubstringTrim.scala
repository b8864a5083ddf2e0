package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring trimming — the CUT that q101's dup-run audit only
  * measures (Lee et al. 2021, "Deduplicating Training Data Makes
  * Language Models Better"): remove from every document the token
  * spans covered by contiguous duplicated-8-gram runs of at least
  * `minRunTokens` tokens. Repetition this long is boilerplate the
  * model would otherwise memorize; the audit showed where it is, this
  * produces the corpus without it.
  *
  * Policy: ALL occurrences are scrubbed (the boilerplate-removal
  * stance — a header duplicated across a million pages should survive
  * in none of them). Keep-one-full-copy dedup is the composition with
  * [[Canonicalize]]: elect a survivor first, then trim the rest.
  *
  * Scale shape (the q101 pipeline plus one join): gram df counting
  * shuffles (doc_id, pos, 60-bit hash) longs only; islands form in a
  * per-doc window (a task never spans one document); cut intervals
  * compress to ≤(tokens/minRun) structs per doc and join back to the
  * corpus on doc_id — the ONE text-moving exchange (equi-join,
  * AQE-skew-splittable; at 100 TB write the trimmed corpus partitioned
  * by that key and the move is the write). The cut itself is a pure
  * map over (tk, intervals) arrays inside the row.
  */
object SubstringTrim {

  /** Appends to `docs` (needs doc_id, text): `text_trimmed`,
    * `n_tokens_before`, `n_tokens_after`. Documents without a
    * qualifying run (or shorter than 8 tokens) pass through with
    * `text_trimmed = text`. Token positions are 1-based; a duplicated
    * 8-gram starting at p covers tokens p..p+7; maximal consecutive
    * dup-gram islands of c grams cover c+7 tokens and qualify when
    * c + 7 >= minRunTokens.
    */
  def trim(docs: DataFrame, minRunTokens: Int = 16): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    require(minRunTokens >= 8, // a single 8-gram already covers 8 tokens
      s"minRunTokens must be >= 8, got $minRunTokens")
    val toks = graft.Barrier(docs
      .select($"doc_id", split($"text", " ").as("tk"))
      .filter(size($"tk") >= 8))
    // (doc, 1-based pos, hash) — two consumers: df aggregate + probe
    val grams = graft.Barrier(toks
      .select($"doc_id", posexplode(TextQueries.gramHashArr).as(Seq("p0", "gh")))
      .select($"doc_id", ($"p0" + 1).as("pos"), $"gh"))
    val dupKeys = grams.groupBy($"gh")
      .agg(countDistinct($"doc_id").as("df"))
      .filter($"df" >= 2)
      .select($"gh")
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val intervals = grams.join(dupKeys, Seq("gh"), "left_semi")
      .withColumn("grp", $"pos" - row_number().over(w))
      .groupBy($"doc_id", $"grp")
      .agg(min($"pos").as("iv_s"), (max($"pos") + 7).as("iv_e"))
      .filter($"iv_e" - $"iv_s" + 1 >= minRunTokens)
      .groupBy($"doc_id")
      .agg(collect_list(struct($"iv_s".as("s"), $"iv_e".as("e"))).as("ivs"))
    docs.join(intervals, Seq("doc_id"), "left")
      .withColumn("kept",
        when($"ivs".isNull, split($"text", " ")).otherwise(expr(
          """transform(
            |  filter(
            |    transform(split(text, ' '), (x, i) -> struct(x AS t, i + 1 AS p)),
            |    tp -> NOT exists(ivs, v -> tp.p >= v.s AND tp.p <= v.e)),
            |  tp -> tp.t)""".stripMargin)))
      .withColumn("text_trimmed", array_join($"kept", " "))
      .withColumn("n_tokens_before",
        size(split($"text", " ")).cast("long"))
      .withColumn("n_tokens_after", size($"kept").cast("long"))
      .drop("ivs", "kept")
  }
}
