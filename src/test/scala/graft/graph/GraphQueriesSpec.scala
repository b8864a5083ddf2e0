package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** [[GraphQueries]] cores against driver-side reference loops on
  * fixture graphs whose answers are computable by hand — the integer
  * arithmetic must agree term-for-term, not just approximately.
  */
class GraphQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Plain-Scala reference: same integer PageRank recurrence. */
  private def refPageRank(baskets: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val byO = baskets.distinct.groupBy(_._1).view.mapValues(_.map(_._2))
    val edges = byO.values.flatMap { ps =>
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val wout = edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val verts = wout.keySet
    val n = verts.size.toLong
    var r = verts.map(v => v -> Scale / n).toMap
    (1 to iters).foreach { _ =>
      val m = edges.toSeq
        .map { case ((s, d), w) => d -> (r(s) / wout(s)) * w }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      r = verts.map(v => v ->
        ((15 * Scale) / (100 * n) + (85 * m(v)) / 100)).toMap
    }
    r
  }

  private def lpDf(baskets: Seq[(Long, Long)]): DataFrame =
    baskets.toDF("o", "p")

  test("pageRank matches the reference loop on a weighted hub graph") {
    // orders: {1,2}, {2,3}, {2,3}, {3,4} — vertex 2 and 3 are hubs,
    // edge (2,3) has weight 2
    val baskets = Seq[(Long, Long)]((10, 1), (10, 2), (11, 2), (11, 3),
      (12, 2), (12, 3), (13, 3), (13, 4))
    val got = GraphQueries.pageRank(lpDf(baskets), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == refPageRank(baskets, 3))
    // the hubs outrank the leaves, symmetrically
    assert(got(2L) == got(3L) && got(2L) > got(1L) && got(1L) == got(4L))
  }

  test("pageRank truncation only loses mass: total in (0, Scale]") {
    val baskets = Seq[(Long, Long)]((1, 1), (1, 2), (1, 3), (2, 3),
      (2, 4), (3, 4), (3, 5), (3, 1))
    val total = GraphQueries.pageRank(lpDf(baskets), iters = 4)
      .agg(org.apache.spark.sql.functions.sum($"r")).as[Long].head()
    assert(total > 0 && total <= Scale)
  }

  test("pageRank cuts lineage per iteration: plan size constant in iters") {
    val baskets = Seq[(Long, Long)]((1, 1), (1, 2), (2, 2), (2, 3))
    def planNodes(iters: Int): Int =
      GraphQueries.pageRank(lpDf(baskets), iters = iters)
        .queryExecution.analyzed.collect { case p => p }.size
    val d2 = planNodes(2)
    val d10 = planNodes(10)
    // Barrier.cut per round: the returned frame always reads ONE
    // checkpointed RDD, so the analyzed plan cannot grow with the
    // iteration count (the q182 quadratic re-analysis hazard)
    assert(d10 == d2, s"plan grew with iterations: $d2 -> $d10 nodes")
    // and the deep run still matches the reference loop exactly
    val got = GraphQueries.pageRank(lpDf(baskets), iters = 10)
      .as[(Long, Long)].collect().toMap
    assert(got == refPageRank(baskets, 10))
  }

  test("frequentPairs: A-Priori prune keeps exactly the above-average-support items' pairs") {
    // items 1,2 in 3 baskets each (frequent); 3,4 in 1 each (pruned):
    // avg support = (3+3+1+1)/4 = 2
    val baskets = Seq[(Long, Long)](
      (1, 1), (1, 2), (1, 3),
      (2, 1), (2, 2), (2, 4),
      (3, 1), (3, 2))
    val got = GraphQueries.frequentPairs(lpDf(baskets))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3L))) // pairs touching 3 or 4 pruned
  }

  test("frequentPairs support equals the unpruned pair count for surviving pairs") {
    // every item equally popular -> avg == each support -> all pruned
    // (strict > threshold), so the miner returns no pairs rather than
    // arbitrary ones — the documented relative-threshold semantics
    val uniform = Seq[(Long, Long)]((1, 1), (1, 2), (2, 1), (2, 2))
    assert(GraphQueries.frequentPairs(lpDf(uniform)).isEmpty)
  }
}
