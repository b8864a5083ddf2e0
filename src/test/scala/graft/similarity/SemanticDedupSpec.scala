package graft.similarity

import graft.{SparkEntry, SparkSpec, Tables}
import scala.math.BigDecimal.RoundingMode

/** q106 receipts: the SemDeDup-style election re-derived DRIVER-side —
  * plain-Scala cosines, union-find components, explicit election —
  * sharing no Spark expression with the production pipeline, plus the
  * invariant the operator exists to enforce (no near-dup pair survives).
  */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.load(spark, SparkSpec.Sf0001, "embeddings")

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
  // Spark's Round semantics: decimal HALF_UP over the double's
  // canonical string form (BigDecimal.valueOf)
  private def rnd(x: Double, s: Int): Double =
    BigDecimal(java.lang.Double.toString(x)).setScale(s, RoundingMode.HALF_UP).toDouble
  private def quant(sim6: Double): Long =
    BigDecimal(java.lang.Double.toString(sim6 * 1e6))
      .setScale(0, RoundingMode.HALF_UP).toLong

  private def collected: Array[(Long, Array[Float], Int)] =
    emb.select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))

  private def exactPairs(rows: Array[(Long, Array[Float], Int)]) =
    for {
      a <- rows; b <- rows
      if a._3 == b._3 && a._1 < b._1 && rnd(cosine(a._2, b._2), 4) >= 0.4
    } yield (a._1, b._1)

  test("q106 matches a driver-side union-find + explicit election") {
    val rows = collected
    val pairs = exactPairs(rows)
    // union-find to the component's min id (what componentLabels yields)
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // own-centroid similarity: argmax over centroids 8..15 on
    // (round 6dp, centroid-id tiebreak), quantized to a long
    val cents = rows.filter(r => r._1 >= 8 && r._1 < 16)
      .map(r => (r._1, r._2)).sortBy(_._1)
    def simq(v: Array[Float]): Long = {
      val best = cents.map { case (cid, cv) => (rnd(cosine(v, cv), 6), -cid) }.max
      quant(best._1)
    }
    val labeled = rows.map(r => (r._1, r._3, simq(r._2), find(r._1)))
    val keepVec = labeled.groupBy(_._4).map { case (lab, ms) =>
      lab -> ms.map(m => (m._3, m._1)).min._2
    }
    val want = labeled.groupBy(_._2).toSeq.sortBy(_._1).map { case (label, ms) =>
      val kept = ms.filter(m => keepVec(m._4) == m._1)
      Seq[Any](label, ms.length.toLong, kept.length.toLong,
        (ms.length - kept.length).toLong, kept.map(_._3).sum)
    }
    val got = SparkEntry.queries("q106_semantic_dedup")(spark, SparkSpec.Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(got === want)

    // the operator's reason to exist: no surviving near-dup pair — every
    // pair had both endpoints in one cluster, which kept exactly one
    val keptIds = labeled.filter(m => keepVec(m._4) == m._1).map(_._1).toSet
    assert(pairs.forall { case (a, b) =>
      !(keptIds.contains(a) && keptIds.contains(b)) })
    // and per cluster exactly one survivor
    labeled.groupBy(_._4).foreach { case (lab, ms) =>
      assert(ms.count(m => keepVec(m._4) == m._1) === 1, s"cluster $lab")
    }
  }

  test("q106 kept counts reconcile with q49's pair graph") {
    // independent cardinality: n_kept summed over labels must equal
    // (total vecs) - (edges collapsed by union-find), i.e. the number
    // of connected components counting singletons
    val rows = collected
    val pairs = exactPairs(rows)
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    var merges = 0
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(math.max(ra, rb)) = math.min(ra, rb); merges += 1 }
    }
    val out = SparkEntry.queries("q106_semantic_dedup")(spark, SparkSpec.Sf0001)
      .collect()
    val keptTotal = out.map(r => r.getLong(r.fieldIndex("n_kept"))).sum
    assert(keptTotal === rows.length - merges)
  }
}
