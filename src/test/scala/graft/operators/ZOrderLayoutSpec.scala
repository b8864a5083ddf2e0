package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** [[DataLayout]]: the bit interleave against hand-computed values,
  * and the measured pruning claim — a z-ordered layout's per-file
  * bounding boxes skip files for a second-dimension predicate that a
  * linear sort must fully scan.
  */
class ZOrderLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("morton interleave matches hand-computed values") {
    val got = Seq((3L, 5L), (0L, 0L), (65535L, 0L), (0L, 65535L), (1L, 1L))
      .toDF("x", "y")
      .select(expr(DataLayout.mortonSql("x", "y")).as("z"))
      .as[Long].collect().toSeq
    // (3,5): x bits {0,1} -> even positions 0,2 = 1+4; y bits {0,2} ->
    // odd positions 1,5 = 2+32
    assert(got == Seq(1L + 4 + 2 + 32, 0L,
      (0 until 16).map(i => 1L << (2 * i)).sum,
      (0 until 16).map(i => 1L << (2 * i + 1)).sum,
      3L))
  }

  test("z-ordered files prune a suppkey predicate that a partkey sort cannot") {
    val li = Tables.load(spark, SparkSpec.Sf0001, "lineitem")
      .select($"l_partkey", $"l_suppkey")
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    DataLayout.writeZOrdered(li, "l_partkey", "l_suppkey", 8, s"$tmp/z")
    li.repartitionByRange(8, $"l_partkey")
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/linear")

    // per-file bounding boxes == what a min/max-stats reader prunes on
    def boxes(path: String) =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min($"l_suppkey").as("lo"), max($"l_suppkey").as("hi"))
        .select($"lo", $"hi").as[(Long, Long)].collect().toSeq
    val (zb, lb) = (boxes(s"$tmp/z"), boxes(s"$tmp/linear"))
    assert(zb.size == 8 && lb.size == 8)

    // suppkey-box predicate: suppkey in [1, maxSupp/8]
    val maxSupp = li.agg(max($"l_suppkey")).as[Long].head()
    val cut = math.max(1L, maxSupp / 8)
    def intersecting(bs: Seq[(Long, Long)]) =
      bs.count { case (lo, hi) => lo <= cut && hi >= 1 }
    // the partkey sort leaves every file full-width in suppkey
    assert(intersecting(lb) == 8)
    // the z-order gives each file a bounded suppkey box: files skip
    assert(intersecting(zb) < 8,
      s"z-order skipped nothing: boxes=$zb")
  }
}
