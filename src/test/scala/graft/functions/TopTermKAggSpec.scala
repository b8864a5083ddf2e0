package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[TopTermKAggregator]] (q94's bounded top-k) must reproduce the
  * window formulation `row_number().over(partitionBy(g).orderBy(score
  * desc, term))` ≤ k exactly — for any k, group count, and input
  * partitioning (shuffle-order independence is the associativity+
  * commutativity claim), including groups smaller than k and exact
  * score ties broken by term.
  */
class TopTermKAggSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random rows with deliberate score collisions
  private def data(n: Int, groups: Int, parts: Int) =
    (1 to n).map { i =>
      (i % groups, s"t${(i * 131) % n}", ((i * 37) % 11).toLong + 1L,
       ((i * 53) % 7).toLong + 1L)
    }.toDF("g", "term", "tf", "df")
      .withColumn("score", $"tf" * lit(1000000L) / lit(1) * $"df")
      .withColumn("score", $"score".cast("long"))
      .repartition(parts)

  for (n <- Seq(1, 20, 200); groups <- Seq(1, 4); parts <- Seq(1, 7);
       k <- Seq(1, 5)) {
    test(s"top-$k ≡ window row_number (n=$n, groups=$groups, parts=$parts)") {
      val df = data(n, groups, parts)
        // terms repeat across i; collapse to unique (g, term) like q94's
        // (source, term) aggregate, keeping the max score per term
        .groupBy($"g", $"term")
        .agg(max($"score").as("score"), max($"tf").as("tf"),
             max($"df").as("df"))
      val topk = udaf(new TopTermKAggregator(k), Encoders.product[TopTermIn])
      val got = df.groupBy($"g")
        .agg(topk($"score", $"term", $"tf", $"df").as("tk"))
        .select($"g", posexplode($"tk.items"))
        .select($"g", ($"pos" + 1).as("rank"), $"col.term", $"col.score")
        .as[(Int, Long, String, Long)].collect().toSet
      val w = Window.partitionBy($"g").orderBy($"score".desc, $"term")
      val want = df.withColumn("rank", row_number().over(w))
        .filter($"rank" <= k)
        .select($"g", $"rank".cast("long"), $"term", $"score")
        .as[(Int, Long, String, Long)].collect().toSet
      assert(got === want)
    }
  }

  test("carried stats (tf, df) survive the buffer unchanged") {
    val df = Seq((1, "a", 3L, 2L, 9000000L), (1, "b", 5L, 1L, 5000000L))
      .toDF("g", "term", "tf", "df", "score")
    val topk = udaf(new TopTermKAggregator(2), Encoders.product[TopTermIn])
    val rows = df.groupBy($"g")
      .agg(topk($"score", $"term", $"tf", $"df").as("tk"))
      .select(posexplode($"tk.items"))
      .select($"col.term", $"col.tf", $"col.df")
      .as[(String, Long, Long)].collect().toSet
    assert(rows === Set(("a", 3L, 2L), ("b", 5L, 1L)))
  }

  test("k < 1 is rejected") {
    intercept[IllegalArgumentException] { new TopTermKAggregator(0) }
  }
}
