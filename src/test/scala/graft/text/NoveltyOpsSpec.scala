package graft.text

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Receipts for q118 (gram novelty in crawl order): the parallel
  * min-election form is pinned against the LITERAL sequential
  * definition — a driver-side HashSet scan over docs in doc_id order —
  * which is precisely the formulation the query's Scaladoc claims to
  * parallelize.
  */
class NoveltyOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, SparkSpec.Sf0001, "documents")

  test("q118 matches a sequential crawl-order HashSet scan") {
    // independent form: materialize each doc's gram array (the shared
    // production key — the spec differs in OPERATOR shape, not key),
    // then replay the crawl serially on the driver
    val perDocGrams = docs
      .select($"doc_id", $"source", split($"text", " ").as("tk"))
      .filter(size($"tk") >= 8)
      .select($"doc_id", $"source", TextQueries.gramHashArr.as("gs"))
      .collect()
      .sortBy(_.getLong(0))
    val seen = scala.collection.mutable.HashSet.empty[Long]
    val perDoc = perDocGrams.map { r =>
      val gs = r.getSeq[Long](2).distinct
      val novel = gs.count(seen.add) // add() is true iff first sighting
      (r.getLong(0), r.getString(1), novel.toLong, gs.size.toLong)
    }
    val want = perDoc
      .groupBy(_._2)
      .map { case (src, ds) =>
        val novelSum = ds.map(_._3).sum
        val totSum = ds.map(_._4).sum
        val stalest = ds
          .map { case (doc, _, nv, tot) => (nv * 1000000L / tot, doc) }
          .min
        (src, ds.size.toLong, novelSum, totSum,
          novelSum.toDouble / totSum.toDouble, stalest._2, stalest._1)
      }
      .toSeq
      .sortBy(_._1)
      .map(t => Seq[Any](t._1, t._2, t._3, t._4, t._5, t._6, t._7))
    val got = SparkEntry.queries("q118_gram_novelty")(spark, SparkSpec.Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("q118 novelty is an exhaustion curve: a replayed corpus scores zero new grams") {
    // append an exact copy of every doc with shifted ids (a full
    // re-crawl): every copy gram was already seen, so corpus-level
    // novel_grams must not grow at all, while distinct_grams doubles
    val base = docs
      .select($"doc_id", $"source", split($"text", " ").as("tk"))
      .filter(size($"tk") >= 8)
      .select($"doc_id", $"source", explode(TextQueries.gramHashArr).as("gh"))
      .distinct()
    val shift = 1000000L
    val replay = base.withColumn("doc_id", $"doc_id" + shift)
    val both = base.unionByName(replay)
    val novelByEra = both.groupBy($"gh")
      .agg(min($"doc_id").as("first_doc"))
      .groupBy(($"first_doc" >= shift).as("in_replay"))
      .agg(count(lit(1)).as("novel"))
      .collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(novelByEra.getOrElse(true, 0L) === 0L,
      "a doc-for-doc re-crawl must contribute zero novel grams")
    assert(novelByEra(false) > 0L)
  }
}
