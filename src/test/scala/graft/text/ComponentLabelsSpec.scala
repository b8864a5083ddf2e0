package graft.text

import graft.SparkSpec

/** Contract of [[TextQueries.componentLabels]] after the round-5 →
  * round-6 rewrite (propagate + pointer-doubling shortcut): the
  * returned label is the component's MINIMUM node id, and convergence
  * is log-round — a chain far longer than the old 25-round cap must
  * finish, not abort.
  */
class ComponentLabelsSpec extends SparkSpec {
  import spark.implicits._

  test("path graph of diameter 60 converges to the chain minimum") {
    // 1-2-3-...-61: the shape plain min-label propagation needs 60
    // rounds for (the r5 implementation aborted at 25); the shortcut
    // version must converge well under the cap.
    val edges = (1L to 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labs = TextQueries.componentLabels(edges).as[(Long, Long)].collect()
    assert(labs.length === 61)
    assert(labs.forall(_._2 === 1L), s"non-min labels: ${labs.filterNot(_._2 == 1L).take(5).toSeq}")
  }

  test("long chain converges in O(log diameter) rounds: a tight cap suffices") {
    // diameter 500 under a cap of 16 rounds — impossible for plain
    // propagation (needs ~500), comfortable for pointer doubling
    // (distance covered ~doubles per round).
    val edges = (1L to 500L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labs = TextQueries.componentLabels(edges, maxRounds = 16)
      .as[(Long, Long)].collect()
    assert(labs.length === 501 && labs.forall(_._2 === 1L))
  }

  test("random multi-component graph agrees with a local union-find") {
    // Deterministic LCG edge sample over 200 nodes — several
    // components of mixed shape (chains, merged blobs, isolates are
    // absent by construction since labels only cover edge endpoints).
    var seed = 0x9E3779B97F4A7C15L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    val edges = (1 to 150).map { _ =>
      val a = math.floorMod(next(), 200L) + 1
      val b = math.floorMod(next(), 200L) + 1
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct

    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // union-by-min: root IS the component minimum
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n)).toMap

    val got = TextQueries.componentLabels(edges.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
  }
}
