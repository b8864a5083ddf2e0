package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[WeightedSample]] contracts: the ES cost is monotone in the weight
  * (more weight can only improve rank) and a heavily-weighted minority
  * dominates the selection — the property that makes it a WEIGHTED
  * sample rather than a uniform one.
  */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("cost is monotone non-increasing in the weight") {
    val base = (1L to 50L).map(i => (i, 3L)).toDF("doc_id", "w")
    val heavier = (1L to 50L).map(i => (i, 12L)).toDF("doc_id", "w")
    val c1 = WeightedSample.withCost(base)
      .select($"doc_id", $"cost_q").as[(Long, Long)].collect().toMap
    val c2 = WeightedSample.withCost(heavier)
      .select($"doc_id", $"cost_q").as[(Long, Long)].collect().toMap
    assert(c1.keySet.forall(k => c2(k) <= c1(k)))
    // quadrupled weight divides the cost by exactly 4 (integer div)
    assert(c1.keySet.forall(k => c2(k) == (c1(k) * 3) / 12))
  }

  test("a 100x-weighted minority dominates the top-k selection") {
    val docs = (1L to 1000L).map(i =>
      (i, if (i <= 100) 10000L else 100L)).toDF("doc_id", "w")
    val top50 = WeightedSample.withCost(docs)
      .orderBy($"cost_q", $"doc_id").limit(50)
      .select($"doc_id").as[Long].collect()
    val heavy = top50.count(_ <= 100)
    assert(heavy >= 40, s"only $heavy of 50 selections were heavy-weighted")
  }
}
