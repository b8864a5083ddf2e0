package graft.similarity

import graft.{SparkEntry, SparkSpec, Tables}
import scala.math.BigDecimal.RoundingMode

/** q108 receipts: the pair mining re-derived driver-side with plain
  * Scala — per anchor, scan every other vector, elect the best
  * same-label and best different-label neighbor explicitly — sharing
  * no Spark expression with the production struct-max pipeline.
  */
class ContrastivePairsSpec extends SparkSpec {
  import spark.implicits._

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  private def rnd(x: Double): Double =
    BigDecimal(java.lang.Double.toString(x)).setScale(4, RoundingMode.HALF_UP).toDouble

  private def groundTruth(dir: String): Seq[(Long, String, Long, Double)] = {
    val rows = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val anchors = rows.filter(_._1 % 25 == 0)
    anchors.toSeq.flatMap { case (qid, qv, qlab) =>
      val scored = rows.filter(_._1 != qid).map { case (vid, v, lab) =>
        (if (lab == qlab) "pos" else "neg", vid, rnd(cosine(qv, v)))
      }
      scored.groupBy(_._1).toSeq.map { case (ptype, cands) =>
        // best score, then smallest neighbor id — the q108 tie-break
        val (_, vid, sc) = cands.minBy(c => (-c._3, c._2))
        (qid, ptype, vid, sc)
      }
    }.sortBy(t => (t._1, t._2))
  }

  test("q108 matches a driver-side brute-force election") {
    val got = SparkEntry.queries("q108_contrastive_pairs")(spark, SparkSpec.Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == groundTruth(SparkSpec.Sf0001))
    // every anchor yields exactly one positive and one negative here
    // (10 labels, each with many members)
    val byAnchor = got.groupBy(_._1)
    assert(byAnchor.nonEmpty)
    byAnchor.foreach { case (_, ps) =>
      assert(ps.map(_._2).sorted == Seq("neg", "pos"))
    }
  }

  test("q108 hard negative is never from the anchor's own label") {
    val e = Tables.load(spark, SparkSpec.Sf001, "embeddings")
      .select($"vec_id", $"label")
    val labels = e.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = SparkEntry.queries("q108_contrastive_pairs")(spark, SparkSpec.Sf001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    got.foreach { case (qid, ptype, nid) =>
      if (ptype == "neg") assert(labels(nid) != labels(qid))
      else assert(labels(nid) == labels(qid))
    }
  }
}
