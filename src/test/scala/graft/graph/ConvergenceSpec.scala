package graft.graph

import graft.SparkSpec

/** Fixed-point early exit (VERDICT r11 item 7): every iterative core
  * here computes r_{t+1} as a pure function of r_t in exact integer
  * arithmetic, so EXACT equality of two consecutive rounds makes all
  * later rounds the identity — exiting early must be bit-identical to
  * running the fixed round count. These specs prove (a) identity of
  * the armed-check form vs the never-checks form on fixtures that DO
  * converge early and on ones that do NOT, and (b) that the exit
  * actually fires (work counted via an accumulator on the RDD path).
  */
class ConvergenceSpec extends SparkSpec {
  import spark.implicits._

  private def lpDf(baskets: Seq[(Long, Long)]) = baskets.toDF("o", "p")

  // a tiny symmetric pair graph: integer PageRank reaches its exact
  // fixed point immediately (r* = Scale/2 maps to itself)
  private val pairBaskets = Seq[(Long, Long)]((1, 1), (1, 2))

  // a hub graph that keeps drifting for many integer rounds
  private val hubBaskets = Seq[(Long, Long)]((10, 1), (10, 2), (11, 2),
    (11, 3), (12, 2), (12, 3), (13, 3), (13, 4))

  test("pageRank: early exit is output-identical on a converging fixture") {
    val armed = GraphQueries.pageRank(lpDf(pairBaskets), iters = 12,
      checkFrom = 2).as[(Long, Long)].collect().toMap
    val fixed = GraphQueries.pageRank(lpDf(pairBaskets), iters = 12,
      checkFrom = Int.MaxValue).as[(Long, Long)].collect().toMap
    assert(armed == fixed)
    assert(armed.values.toSet == Set(500000000000L)) // the exact fixed point
  }

  test("pageRank: armed check changes nothing on a non-trivial fixture") {
    val armed = GraphQueries.pageRank(lpDf(hubBaskets), iters = 6,
      checkFrom = 2).as[(Long, Long)].collect().toMap
    val fixed = GraphQueries.pageRank(lpDf(hubBaskets), iters = 6,
      checkFrom = Int.MaxValue).as[(Long, Long)].collect().toMap
    assert(armed == fixed)
  }

  test("hits: early exit is output-identical, converging and not") {
    // uniform bipartite: normalized scores stabilize after round 1
    val uni = Seq((1L, 10L, 1L), (2L, 10L, 1L), (1L, 20L, 1L), (2L, 20L, 1L))
    // skewed: keeps moving
    val skew = Seq((1L, 10L, 2L), (1L, 20L, 3L), (2L, 10L, 1L), (3L, 10L, 1L))
    for (edges <- Seq(uni, skew)) {
      val (h1, a1) = Hits.hits(edges.toDF("c", "p", "w"), iters = 8,
        checkFrom = 2)
      val (h2, a2) = Hits.hits(edges.toDF("c", "p", "w"), iters = 8,
        checkFrom = Int.MaxValue)
      assert(h1.as[(Long, Long)].collect().toMap ==
        h2.as[(Long, Long)].collect().toMap)
      assert(a1.as[(Long, Long)].collect().toMap ==
        a2.as[(Long, Long)].collect().toMap)
    }
  }

  test("kCore peelLadder: early exit is output-identical, converging and not") {
    def undirected(pairs: Seq[(Long, Long)]) =
      (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    // 4-clique: every degree is 3 ≥ k, round 1 removes nothing →
    // fixed point immediately; the armed run replicates rows 3..8
    val clique = undirected(Seq((1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L)))
    // path graph at k=2: endpoints strip one per round — never stable
    // within the ladder
    val path = undirected((1L to 9L).sliding(2).toSeq.map(s => (s(0), s(1))))
    for ((edges, k) <- Seq((clique, 3), (path, 2))) {
      val armed = KCore.peelLadder(edges, rounds = 8, k = k, checkFrom = 2)
        .collect().map(_.toSeq).toSeq
      val fixed = KCore.peelLadder(edges, rounds = 8, k = k,
        checkFrom = Int.MaxValue).collect().map(_.toSeq).toSeq
      assert(armed == fixed)
    }
    graft.Barrier.release(spark)
  }

  test("messageRounds: exit fires (fold work stops) and output is identical") {
    import org.apache.spark.sql.functions._
    // symmetric two-vertex edge frame in the (src, dst, w, wout) shape
    val ew = Seq((1L, 2L, 1L, 1L), (2L, 1L, 1L, 1L))
      .toDF("src", "dst", "w", "wout")
    // constant dynamics: fixed point after round 1 whatever init says
    val acc = spark.sparkContext.longAccumulator("folds")
    val armed = GraphQueries.messageRounds(ew, iters = 40,
      init = _ => 7L, msg = (r, _, _) => r,
      fold = (_, m) => { acc.add(1); m }, checkFrom = 2)
      .as[(Long, Long)].collect().toMap
    val fixed = GraphQueries.messageRounds(ew, iters = 40,
      init = _ => 7L, msg = (r, _, _) => r,
      fold = (_, m) => m, checkFrom = Int.MaxValue)
      .as[(Long, Long)].collect().toMap
    assert(armed == fixed)
    assert(armed == Map(1L -> 7L, 2L -> 7L))
    // 40 fixed rounds would fold 80 times; the armed run exits at
    // round 2 (persisted checked rounds are not recomputed), so the
    // accumulator stays far below the fixed-round count
    assert(acc.value < 20, s"early exit did not fire: ${acc.value} folds")
  }

  test("q230 shape: armed check is identical to fixed-round on the oracle tables") {
    val dir = "/root/testdata/sf0.001"
    val lp = graft.Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey".as("o"), $"l_partkey".as("p"))
    import org.apache.spark.sql.functions._
    val e = graft.Barrier(GraphQueries.coEdges(lp, bySrc = true)
      .filter($"w" >= 2)
      .withColumn("wout", sum($"w").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"src"))))
    // the real q230 seed (deterministic degree argmax) so the walk is
    // non-trivial — an all-zero walk would converge vacuously
    val seed = e.groupBy($"src").agg(count(lit(1)).as("d"))
      .orderBy($"d".desc, $"src").limit(1)
      .collect().headOption.map(_.getLong(0)).getOrElse(0L)
    def run(checkFrom: Int) = GraphQueries.messageRounds(e, 8,
      init = n => if (n == seed) 1000000000L else 0L,
      msg = (pr, w, wout) => Math.multiplyExact(pr, w) / wout,
      fold = (v, m) => Math.multiplyExact(m, 850L) / 1000L +
        (if (v == seed) 150000000L else 0L),
      checkFrom = checkFrom).as[(Long, Long)].collect().toMap
    try assert(run(2) == run(Int.MaxValue))
    finally graft.Barrier.release(spark)
  }
}
