package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 document scoring (Robertson/Spärck Jones; the Lucene "+1"
  * idf variant) against a fixed query-term set — the retrieval
  * primitive a curation stack uses for benchmark-decontamination
  * lookups ("which training docs score highest against this eval
  * question?") and targeted corpus search.
  *
  * Every score is an EXACT LONG. With k1 = 1.2 and b = 0.75 the
  * per-term contribution
  *
  *   idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * multiplies out (by 10·avgdl·N = 10·T, avgdl = T/N) to
  *
  *   (idfq(t) · 22·T·tf) div (10·T·tf + 3·T + 9·N·dl)
  *
  * with T = corpus tokens, N = docs — integer cross-multiplied
  * numerator/denominator (the q104 stance), and idfq(t) =
  * lq(2N+2) − lq(2df+1), the fixed-point log2 ([[TextQueries.lqSql]])
  * of the Lucene idf ln((N+1)/(df+0.5)) with both arguments doubled
  * to stay integral. Integer division, not IEEE: deterministic on any
  * engine, at ~10⁶ quantization — far below anything a ranking could
  * feel. Long ceiling: idfq·22·T·tf needs T·tf < ~2·10¹¹; since
  * round 6 this is RUNTIME-GUARDED (T·max_tf rides the same stats
  * aggregate; past the bound the task fails with a named
  * GRAFT_CEILING error whose remedy is the documented q104 move:
  * lift the score core to decimal(38,0)).
  *
  * Scale shape: for a literal query-term set the whole scorer is a
  * PURE MAP — per-doc tf comes from `size(filter(tk, ...))` inside
  * the row (no explode), corpus stats are ONE 1-row aggregate
  * broadcast back, and ranking is TakeOrdered. Nothing corpus-sized
  * ever shuffles. A large term set (query-by-document) switches to
  * explode + broadcast-join against a term-stats table — same
  * algebra, one bounded exchange.
  */
object Bm25 {

  /** Appends `score_q` (exact long, 0 when no term matches) and `dl`
    * to `docs` (needs `doc_id`, `text`). Terms must be non-empty and
    * SQL-literal-safe (the registered query pins corpus tokens).
    */
  /** T·tf must stay under ~2·10¹¹ for the long score core. */
  private[graft] val TokenTfCeiling = 200_000_000_000L

  def score(docs: DataFrame, terms: Seq[String],
            ceiling: Long = TokenTfCeiling): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.join(scoredBase(docs, terms, ceiling)
      .select($"doc_id", $"dl", $"score_q"), Seq("doc_id"))
  }

  /** The scorer's full intermediate — (doc_id, dl, tf_0..tf_{n-1},
    * n_docs, t_tok, df_0..df_{n-1}, score_q) — for consumers that fuse
    * BM25 with other signals computed off the same term statistics
    * (q139 reciprocal-rank fusion). Same algebra and guard as
    * [[score]].
    */
  private[text] def scoredBase(docs: DataFrame, terms: Seq[String],
                               ceiling: Long = TokenTfCeiling): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    require(terms.nonEmpty, "BM25 needs at least one query term")
    require(terms.forall(_.matches("[A-Za-z0-9_]+")),
      s"query terms must be identifier-like literals, got $terms")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      expr(s"size(filter(split(text, ' '), x -> x = '$t'))")
        .cast("long").as(s"tf_$i")
    }
    val base = graft.Barrier(docs.select(
      Seq($"doc_id", expr("size(split(text, ' '))").cast("long").as("dl")) ++
        tfCols: _*))
    val maxTf = // greatest() needs ≥ 2 args
      if (terms.size == 1) col("tf_0")
      else greatest(terms.indices.map(i => col(s"tf_$i")): _*)
    val statCols = Seq(count(lit(1)).as("n_docs"), sum($"dl").as("t_tok"),
      max(maxTf).as("max_tf")) ++
      terms.indices.map(i => count_if(col(s"tf_$i") > 0).as(s"df_$i"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
      // guard rides t_tok (load-bearing — pruning can't drop it):
      // every term contribution multiplies idfq·22·T·tf, so T·max_tf
      // over the bound means some score core would wrap a long.
      .withColumn("t_tok", graft.Q.ceilingGuardOn($"t_tok",
        // decimal, not long: the guard product must not itself wrap
        $"t_tok".cast("decimal(38,0)") * $"max_tf", ceiling, "bm25",
        "T*max_tf (the idfq*22*T*tf score core must fit a long)",
        "lift the score core to decimal(38,0) — the documented q104 move"))
      .drop("max_tf")
    val contrib = terms.indices.map { i =>
      s"((${TextQueries.lqSql("2 * n_docs + 2")}" +
        s" - ${TextQueries.lqSql(s"2 * df_$i + 1")}) * 22 * t_tok * tf_$i)" +
        s" div (10 * t_tok * tf_$i + 3 * t_tok + 9 * n_docs * dl)"
    }.mkString(" + ")
    base.crossJoin(broadcast(stats))
      .withColumn("score_q", expr(contrib))
  }

  /** The oracle-side rendering of the same algebra (DuckDB SQL), kept
    * next to the Spark form so the two drift together or not at all.
    * `d` must provide doc_id, source, dl, tf_0..tf_{n-1}; emits the
    * scored SELECT body (callers wrap with ranking).
    */
  def oracleScoreSql(nTerms: Int): String = {
    val contrib = (0 until nTerms).map { i =>
      s"((${TextQueries.lqDuck("2 * n_docs + 2")}" +
        s" - ${TextQueries.lqDuck(s"2 * df_$i + 1")}) * 22 * t_tok * tf_$i)" +
        s" // (10 * t_tok * tf_$i + 3 * t_tok + 9 * n_docs * dl)"
    }.mkString(" + ")
    s"SELECT doc_id, source, dl, $contrib AS score_q FROM d CROSS JOIN tot"
  }
}
