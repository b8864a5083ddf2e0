package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** [[Triangles]] core against a brute-force all-triples reference on
  * fixture graphs — the degree-ordered enumeration must count every
  * triangle exactly once regardless of graph shape (cliques, stars,
  * disjoint pieces, hub-and-spoke skew).
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def eDf(edges: Seq[(Long, Long)]): DataFrame =
    edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("a", "b")

  /** Brute force: per-vertex triangle membership over all triples. */
  private def refTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val vs = es.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    def adj(x: Long, y: Long) = es((math.min(x, y), math.max(x, y)))
    val tris = for {
      i <- vs.indices; j <- (i + 1) until vs.size; k <- (j + 1) until vs.size
      if adj(vs(i), vs(j)) && adj(vs(j), vs(k)) && adj(vs(i), vs(k))
    } yield (vs(i), vs(j), vs(k))
    val counts = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    vs.map(v => v -> counts.getOrElse(v, 0L)).toMap
  }

  private def got(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.vertexTriangles(eDf(edges))
      .select("v", "tri").as[(Long, Long)].collect().toMap

  test("K4 clique: every vertex on 3 triangles, 4 total") {
    val e = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val m = got(e)
    assert(m == refTriangles(e))
    assert(m.values.toSeq == Seq.fill(4)(3L) && m.values.sum / 3 == 4L)
  }

  test("star graph is triangle-free (the skew shape: hub generates no wedges)") {
    val e = (2L to 12L).map(v => (1L, v))
    val m = got(e)
    assert(m.values.forall(_ == 0L) && m.size == 12)
  }

  test("hub with one rim edge: exactly the one closed triad counts") {
    val e = (2L to 12L).map(v => (1L, v)) :+ (5L, 9L)
    val m = got(e)
    assert(m == refTriangles(e))
    assert(m(1L) == 1L && m(5L) == 1L && m(9L) == 1L && m(2L) == 0L)
  }

  test("mixed fixture: disjoint triangle + square-with-diagonal matches brute force") {
    // triangle {1,2,3}; square 4-5-6-7 with diagonal 5-7 → two triangles
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (6L, 7L), (4L, 7L), (5L, 7L))
    val m = got(e)
    assert(m == refTriangles(e))
    assert(m(5L) == 2L && m(7L) == 2L && m(4L) == 1L && m(6L) == 1L)
  }

  test("pseudo-random graph matches brute force (orientation is lossless and duplicate-free)") {
    // deterministic congruential edge list over 20 vertices
    val e = (1 to 120).map { i =>
      val a = (i * 7919L) % 20 + 1
      val b = (i * 104729L) % 20 + 1
      (a, b)
    }.filter { case (a, b) => a != b }
    assert(got(e) == refTriangles(e))
  }

  test("backbone keeps only pairs co-occurring in >= 2 baskets") {
    // parts 1,2 share baskets 10 and 11; parts 1,3 share only 10
    val lp = Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 1L), (11L, 2L))
      .toDF("o", "p")
    val e = Triangles.backbone(lp).as[(Long, Long)].collect().toSet
    assert(e == Set((1L, 2L)))
  }
}
