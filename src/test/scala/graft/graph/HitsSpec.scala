package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Hits]] core against a plain-Scala reference of the same integer
  * sum-normalized mutual recursion on hand bipartite fixtures.
  */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Reference: same integer recurrence (hubs normalized once per
    * round, auths raw in the loop and normalized at output — the r13
    * semantics), BigInt intermediates.
    */
  private def ref(edges: Seq[(Long, Long, Long)], iters: Int)
      : (Map[Long, Long], Map[Long, Long]) = {
    def normalize(m: Map[Long, BigInt]): Map[Long, Long] = {
      val t = m.values.sum
      m.map { case (k, v) => k -> ((v * Scale) / t).toLong }
    }
    var hubs = normalize(edges.groupBy(_._1).view
      .mapValues(es => BigInt(es.map(_._3).sum)).toMap)
    var authsRaw = Map.empty[Long, BigInt]
    (1 to iters).foreach { _ =>
      authsRaw = edges.groupBy(_._2).view
        .mapValues(_.map(e => BigInt(e._3) * hubs(e._1)).sum).toMap
      hubs = normalize(edges.groupBy(_._1).view
        .mapValues(_.map(e => BigInt(e._3) * authsRaw(e._2)).sum).toMap)
    }
    (hubs, normalize(authsRaw))
  }

  test("hits matches the reference recursion on a weighted bipartite fixture") {
    // customers 1,2,3; parts 10,20: part 10 bought by everyone (the
    // authority), part 20 only by customer 1 (who becomes the hub)
    val edges = Seq((1L, 10L, 2L), (1L, 20L, 3L), (2L, 10L, 1L), (3L, 10L, 1L))
    val (wantH, wantA) = ref(edges, 3)
    val (hubs, auths) = Hits.hits(edges.toDF("c", "p", "w"), iters = 3)
    assert(hubs.as[(Long, Long)].collect().toMap == wantH)
    assert(auths.as[(Long, Long)].collect().toMap == wantA)
  }

  test("normalization: scores sum to Scale minus deterministic truncation") {
    val edges = Seq((1L, 10L, 5L), (2L, 10L, 1L), (2L, 20L, 4L), (3L, 30L, 2L))
    val (hubs, auths) = Hits.hits(edges.toDF("c", "p", "w"), iters = 2)
    val hsum = hubs.agg(sum($"h")).as[Long].head()
    val asum = auths.agg(sum($"a")).as[Long].head()
    assert(hsum > Scale - 10 && hsum <= Scale)
    assert(asum > Scale - 10 && asum <= Scale)
  }

  test("a universally-bought part outranks a niche one") {
    val edges = Seq((1L, 10L, 1L), (2L, 10L, 1L), (3L, 10L, 1L), (3L, 20L, 1L))
    val (_, auths) = Hits.hits(edges.toDF("c", "p", "w"), iters = 3)
    val m = auths.as[(Long, Long)].collect().toMap
    assert(m(10L) > m(20L))
  }
}
