package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[DistributedRank]] must reproduce the single-task window's
  * row_number and NTILE values exactly, for any row count, tile count,
  * and input partitioning — including the N < n and N % n != 0 edges.
  */
class DistributedRankSpec extends SparkSpec {
  import spark.implicits._

  private def data(n: Int, parts: Int) =
    (1 to n).map(i => ((i * 37) % n, i.toLong)).toDF("v", "id")
      .repartition(parts)

  for (n <- Seq(1, 5, 16, 100); parts <- Seq(1, 7)) {
    test(s"row_number matches window ordering (n=$n, parts=$parts)") {
      val df = data(n, parts)
      val got = DistributedRank
        .withRowNumber(df, Seq($"v".desc, $"id"), "rn")
        .select($"id", $"rn").as[(Long, Long)].collect().toMap
      val want = df
        .withColumn("rn", row_number().over(Window.orderBy($"v".desc, $"id")))
        .select($"id", $"rn".cast("long")).as[(Long, Long)].collect().toMap
      assert(got === want)
    }
  }

  for (n <- Seq(1, 3, 4, 7, 100); k <- Seq(1, 3, 4, 8)) {
    test(s"ntile($k) matches window NTILE (n=$n)") {
      val df = data(n, 5)
      val got = DistributedRank
        .withNtile(df, k, Seq($"v".desc, $"id"), "tile")
        .select($"id", $"tile").as[(Long, Int)].collect().toMap
      val want = df
        .withColumn("tile", ntile(k).over(Window.orderBy($"v".desc, $"id")))
        .select($"id", $"tile").as[(Long, Int)].collect().toMap
      assert(got === want)
    }
  }

  for (n <- Seq(1, 16, 100); parts <- Seq(1, 7)) {
    test(s"prefix sum matches window running sum (n=$n, parts=$parts)") {
      val df = data(n, parts).withColumn("w", ($"id" % 13) + 1)
      val got = DistributedRank
        .withPrefixSum(df, Seq($"v".desc, $"id"), $"w", "ps")
        .select($"id", $"ps").as[(Long, Long)].collect().toMap
      val win = Window.orderBy($"v".desc, $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df
        .withColumn("ps", sum($"w").over(win))
        .select($"id", $"ps").as[(Long, Long)].collect().toMap
      assert(got === want)
    }
  }

  test("prefix sum treats null values as 0 (SQL SUM semantics), no NPE") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("id", "w")
    val got = DistributedRank.withPrefixSum(df, Seq($"id"), $"w", "ps")
      .select($"id", $"ps").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 5L, 2L -> 5L, 3L -> 12L))
  }

  // The q89 contract: per-key ranking must equal the per-source window
  // on ANY input split — low-cardinality keys (few groups, many rows),
  // single-row groups, and key runs spanning partition boundaries.
  for (n <- Seq(1, 5, 16, 100); groups <- Seq(1, 3, 7); parts <- Seq(1, 7)) {
    test(s"per-key row_number matches partitioned window " +
         s"(n=$n, groups=$groups, parts=$parts)") {
      val df = data(n, parts).withColumn("k", $"id" % groups)
      val got = DistributedRank
        .withRowNumberPerKey(df, Seq("k"), Seq($"v".desc, $"id"), "rn")
        .select($"id", $"rn").as[(Long, Long)].collect().toMap
      val want = df
        .withColumn("rn", row_number().over(
          Window.partitionBy($"k").orderBy($"v".desc, $"id")))
        .select($"id", $"rn".cast("long")).as[(Long, Long)].collect().toMap
      assert(got === want)
    }
  }

  test("per-key row_number handles composite and null keys") {
    val df = Seq(
      (1L, Some("a"), 1), (2L, Some("a"), 1), (3L, Some("a"), 2),
      (4L, None, 1), (5L, None, 1), (6L, Some("b"), 1)
    ).toDF("id", "k1", "k2").repartition(4)
    val got = DistributedRank
      .withRowNumberPerKey(df, Seq("k1", "k2"), Seq($"id"), "rn")
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("rn", row_number().over(
        Window.partitionBy($"k1", $"k2").orderBy($"id")))
      .select($"id", $"rn".cast("long")).as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("per-key row_number rejects an empty key list") {
    val df = data(5, 2)
    intercept[IllegalArgumentException] {
      DistributedRank.withRowNumberPerKey(df, Seq.empty, Seq($"id"))
    }
  }

  test("result is identical under different input partitionings") {
    val a = DistributedRank.withRowNumber(data(50, 2), Seq($"v", $"id"))
      .select($"id", $"rn").as[(Long, Long)].collect().toSet
    val b = DistributedRank.withRowNumber(data(50, 9), Seq($"v", $"id"))
      .select($"id", $"rn").as[(Long, Long)].collect().toSet
    assert(a === b)
  }
}
