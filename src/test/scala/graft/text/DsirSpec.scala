package graft.text

import graft.{SparkEntry, SparkSpec, Tables}
import graft.etl.CurationPipeline
import org.apache.spark.sql.functions._

/** [[Dsir.scoreAffinity]] receipts: the reusable transform must agree
  * with the q105 operator (same model, different code path), and the
  * [[CurationPipeline.ByTargetAffinity]] selection built on it must
  * spend its budget on target-like docs deterministically.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, SparkSpec.Sf0001, "documents")

  test("scoreAffinity reproduces q105's scores on the q105 split") {
    // q105: target = alphabetically-first source, pool = the rest
    val tgtSrc = docs.agg(min($"source")).head().getString(0)
    val pool = docs.filter($"source" =!= tgtSrc)
    val target = docs.filter($"source" === tgtSrc)
    val scored = Dsir.scoreAffinity(pool, target)
      .select($"doc_id", $"dsir_q")
    val q105 = SparkEntry.queries("q105_importance_resample")(spark, SparkSpec.Sf0001)
      .select($"rank", $"doc_id", $"score_q")
    val joined = q105.join(scored, Seq("doc_id")).collect()
    assert(joined.length === 10)
    joined.foreach { r =>
      assert(r.getLong(r.fieldIndex("score_q")) === r.getLong(r.fieldIndex("dsir_q")),
        s"doc ${r.getLong(r.fieldIndex("doc_id"))}")
    }
    // and the transform's own top-10 order is q105's order
    val topIds = scored.orderBy($"dsir_q".desc, $"doc_id").limit(10)
      .select($"doc_id").as[Long].collect().toSeq
    val q105Ids = q105.orderBy($"rank").select($"doc_id").as[Long].collect().toSeq
    assert(topIds === q105Ids)
  }

  test("ByTargetAffinity selection spends the budget on target-like docs") {
    val frame = Seq(
      // the target domain: a distinctive vocabulary
      (1L, "protein folding kinase domain ligand binding affinity assay", "seed"),
      (2L, "kinase inhibitor binding assay protein structure domain fold", "seed"),
      // pool: one doc in-domain, one out-of-domain, equal lengths
      (10L, "ligand affinity assay for the kinase binding domain protein", "web"),
      (11L, "cheap flights hotel deals best casino bonus click here now", "web"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text").cast("long"))
    // budget = 3/4 of tokens: room for the seed docs + ONE pool doc
    val sel = CurationPipeline.selectByBudget(frame, 3, 4,
      CurationPipeline.ByTargetAffinity("seed"))
    val ids = sel.select($"doc_id").as[Long].collect().toSet
    assert(ids.contains(10L), s"in-domain pool doc must be selected: $ids")
    assert(!ids.contains(11L), s"out-of-domain doc must be cut: $ids")

    // determinism + prefix property: the selected set is exactly the
    // (dsir_q desc, doc_id) prefix whose cumulative tokens fit
    val scored = Dsir.scoreAffinity(
        CurationPipeline.scoreQuality(frame),
        frame.filter($"source" === "seed"))
      .select($"doc_id", $"dsir_q", $"m")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, sc, _) => (-sc, id) }
    val budget = scored.map(_._3).sum * 3 / 4
    val wantIds = scored
      .scanLeft((0L, 0L, 0L))((acc, d) => (d._1, d._2, acc._3 + d._3))
      .drop(1).takeWhile(_._3 <= budget).map(_._1).toSet
    assert(ids === wantIds)
  }

  test("an absent target source degrades to smoothing-only (no crash, uniform weights)") {
    val frame = Seq(
      (1L, "alpha beta gamma", "web"),
      (2L, "delta epsilon zeta", "web"))
      .toDF("doc_id", "text", "source")
    val scored = Dsir.scoreAffinity(frame, frame.filter($"source" === "nope"))
    // with an empty target, every bucket has ct = 1: scores differ only
    // through the raw-side counts, and every doc gets a finite long
    assert(scored.count() === 2)
    assert(scored.filter($"dsir_q".isNull).count() === 0)
  }
}
