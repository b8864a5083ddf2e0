package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizedAnnSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization: |q| ≤ 127, the max-|x| component hits ±127, zero vectors guard") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector: no NaN, all-zero q
      (3L, Array(2.0f, 1.0f, -2.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val q = VectorQueries.int8Quantized(vecs)
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    assert(q(1L)._1 === Seq(64L, -127L, 32L, 0L)) // 0.5·127/1 = 63.5 → HALF_UP 64
    assert(q(2L)._1 === Seq(0L, 0L, 0L, 0L))
    assert(q(2L)._2 === 0L)
    assert(q(3L)._1 === Seq(127L, 64L, -127L, 32L))
    q.values.foreach { case (arr, n2) =>
      assert(arr.forall(v => v >= -127L && v <= 127L))
      assert(n2 === arr.map(v => v * v).sum)
    }
  }

  test("quantized coarse rank finds the exact top-1 on separated clusters") {
    // probe near cluster A; int8 noise (~0.4% of scale) cannot flip a
    // 0.9-vs-0.1 cosine separation
    def v(base: Float, jitter: Float) =
      Array(base, base + jitter, base - jitter, 1.0f)
    val vecs = Seq(
      (0L, v(1.0f, 0.01f)),  // probe
      (10L, v(1.0f, 0.02f)), // same cluster — the true top-1
      (20L, v(-1.0f, 0.01f)),
      (21L, v(-1.0f, 0.03f))
    ).toDF("vec_id", "embedding")
    val qv = VectorQueries.int8Quantized(vecs)
    val probe = qv.filter($"vec_id" === 0L)
      .select($"q".as("qq"), $"n2".as("qn2"))
    val top = qv.filter($"vec_id" =!= 0L).crossJoin(probe)
      .withColumn("dot",
        expr("aggregate(zip_with(q, qq, (x, y) -> x * y), 0L, (a, x) -> a + x)"))
      .withColumn("s", expr("cast(dot as double) / sqrt(cast(n2 * qn2 as double))"))
      .orderBy($"s".desc).select($"vec_id").head().getLong(0)
    assert(top === 10L)
  }

  test("q131 executes on driver data: 8 probes × 5 ranked neighbors, scores in [-1, 1]") {
    val rows = VectorQueries.q131.build(spark, SparkSpec.Sf0001).collect()
    assert(rows.length === 40)
    rows.foreach { r =>
      val q8 = r.getAs[Double]("q8_score")
      val ex = r.getAs[Double]("exact_score")
      assert(q8 >= -1.0001 && q8 <= 1.0001)
      assert(ex >= -1.0001 && ex <= 1.0001)
      // int8 coarse score tracks the exact score: 64-dim symmetric
      // quantization error stays well under 0.05 cosine
      assert(math.abs(q8 - ex) < 0.05, s"quantization drift: $r")
    }
  }
}
