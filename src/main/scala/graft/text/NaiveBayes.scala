package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes language classifier (the add-one-smoothed
  * bag-of-words baseline of Manning et al., IR ch. 13) — trained and
  * resubstitution-evaluated on the corpus itself, reporting the
  * confusion matrix per true language. This is the model-based
  * upgrade of q43's heuristic lang-ID: q43 scores against fixed
  * marker lists; this LEARNS per-class token distributions and
  * exposes exactly where classes collide (the confusion cells), which
  * is the audit a curation pipeline runs before trusting any lang
  * column it did not produce.
  *
  * Determinism (the q116 stance): libm ln() low bits are not
  * cross-engine stable, so the per-token log-likelihood rides as the
  * QUANTIZED integer surprisal surp_q(c,w) = (tot_c + V)·10⁶ div
  * (cnt_cw + 1) — a monotone transform of −log p(w|c) exact in both
  * engines (positive numerator, so Spark's truncating `div` and
  * DuckDB's flooring `//` agree); the class prior joins the same way
  * as prior_q(c) = (N + K)·10⁶ div (n_c + 1); argmin breaks ties on
  * the lexicographically smaller language.
  *
  * Scale shape: the corpus tokenizes ONCE into per-(doc, token)
  * counts (map-side combinable); the model is a (V × K)-row grid
  * (vocabulary × languages — broadcast-sized) built from
  * class-token counts; scoring is ONE equi-join of doc-token counts
  * against the model on the token (K rows per token — a constant
  * fanout), compressed immediately by a (doc, class) aggregate and a
  * per-doc struct-min election. Nothing wider than V×K or the
  * doc-token frame ever shuffles. Overflow: (tot_c + V)·10⁶ rides a
  * decimal(38,0), exact to ~10³² class tokens.
  */
object NaiveBayes {

  val Quantum = 1000000L

  val q203 = Q(
    "q203_naive_bayes_lang",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", $"lang", split(coalesce($"text", lit("")), " ").as("tk"))
      val docTok = graft.Barrier(docs
        .select($"doc_id", $"lang", explode($"tk").as("w"))
        .groupBy($"doc_id", $"lang", $"w")
        .agg(count(lit(1)).as("c")))
      // class-token counts and the smoothing grid (vocab x classes)
      val cw = docTok.groupBy($"lang".as("cls"), $"w")
        .agg(sum($"c").as("cnt"))
      val vocab = docTok.select($"w").distinct()
      val classes = docTok.select($"lang".as("cls")).distinct()
      val v = vocab.agg(count(lit(1)).as("v"))
      val totc = cw.groupBy($"cls").agg(sum($"cnt").as("totc"))
      val model = vocab.crossJoin(classes)
        .join(cw, Seq("cls", "w"), "left_outer")
        .join(broadcast(totc), "cls")
        .crossJoin(broadcast(v))
        .select($"cls", $"w",
          expr(s"cast((cast(totc + v as decimal(38,0)) * $Quantum)" +
            " div (coalesce(cnt, 0) + 1) as bigint)").as("surp_q"))
      // class priors on the same quantized ladder
      val perDoc = docs.select($"doc_id", $"lang")
      val nAll = perDoc.agg(count(lit(1)).as("n"),
        countDistinct($"lang").as("k"))
      val prior = perDoc.groupBy($"lang".as("cls"))
        .agg(count(lit(1)).as("nc"))
        .crossJoin(broadcast(nAll))
        .select($"cls",
          expr(s"cast((cast(n + k as decimal(38,0)) * $Quantum)" +
            " div (nc + 1) as bigint)").as("prior_q"))
      val scored = docTok.join(model, "w")
        .groupBy($"doc_id", $"lang", $"cls")
        .agg(sum($"c" * $"surp_q").as("ssum"))
        .join(broadcast(prior), "cls")
        .withColumn("score", $"ssum" + $"prior_q")
      val pred = scored.groupBy($"doc_id", $"lang")
        .agg(min(struct($"score", $"cls")).as("w"))
        .select($"lang".as("true_lang"), $"w.cls".as("pred_lang"))
      pred.groupBy($"true_lang", $"pred_lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy($"true_lang", $"pred_lang")
    },
    Some(s"""WITH tok AS (
      |  SELECT doc_id, lang, UNNEST(string_split(COALESCE(text, ''), ' ')) AS w
      |  FROM documents),
      |doc_tok AS (
      |  SELECT doc_id, lang, w, COUNT(*) AS c FROM tok GROUP BY 1, 2, 3),
      |cw AS (
      |  SELECT lang AS cls, w, CAST(SUM(c) AS BIGINT) AS cnt
      |  FROM doc_tok GROUP BY 1, 2),
      |vocab AS (SELECT DISTINCT w FROM doc_tok),
      |v AS (SELECT COUNT(*) AS v FROM vocab),
      |classes AS (SELECT DISTINCT lang AS cls FROM doc_tok),
      |totc AS (SELECT cls, CAST(SUM(cnt) AS BIGINT) AS totc FROM cw GROUP BY 1),
      |model AS (
      |  SELECT cl.cls, vo.w,
      |         CAST((t.totc + (SELECT v FROM v)) * $Quantum
      |              // (COALESCE(c.cnt, 0) + 1) AS BIGINT) AS surp_q
      |  FROM vocab vo CROSS JOIN classes cl
      |  LEFT JOIN cw c ON c.cls = cl.cls AND c.w = vo.w
      |  JOIN totc t ON t.cls = cl.cls),
      |nall AS (
      |  SELECT COUNT(*) AS n, COUNT(DISTINCT lang) AS k FROM documents),
      |prior AS (
      |  SELECT lang AS cls,
      |         CAST(((SELECT n FROM nall) + (SELECT k FROM nall)) * $Quantum
      |              // (COUNT(*) + 1) AS BIGINT) AS prior_q
      |  FROM documents GROUP BY 1),
      |scored AS (
      |  SELECT d.doc_id, d.lang, m.cls,
      |         CAST(SUM(d.c * m.surp_q) AS BIGINT) + ANY_VALUE(p.prior_q) AS score
      |  FROM doc_tok d JOIN model m ON m.w = d.w
      |  JOIN prior p ON p.cls = m.cls
      |  GROUP BY 1, 2, 3),
      |pred AS (
      |  SELECT lang AS true_lang, cls AS pred_lang FROM (
      |    SELECT doc_id, lang, cls,
      |           ROW_NUMBER() OVER (PARTITION BY doc_id
      |             ORDER BY score, cls) AS rn
      |    FROM scored) WHERE rn = 1)
      |SELECT true_lang, pred_lang, COUNT(*) AS n_docs
      |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    doc = "text: add-one multinomial Naive Bayes lang classifier, confusion matrix via quantized integer surprisal (no cross-engine ln)")

  val all: Seq[Q] = Seq(q203)
}
