package graft.multimodal

import graft.SparkSpec
import graft.multimodal.MultimodalQueries.{EncoderBatch, MediaRecord, encodeBatch}

/** The q87 batch-inference contract: the encoder must receive bounded
  * batches (never single rows, never a whole partition), must emit one
  * embedding per input in input order, and the query result must be
  * independent of how rows land in partitions/batches.
  */
class BatchEmbedSpec extends SparkSpec {
  import spark.implicits._

  private def rec(i: Long) =
    MediaRecord(i, s"s${i % 3}", s"payload-$i-${"x" * (i % 50).toInt}".getBytes("UTF-8"))

  test("encoder emits one embedding per input, order-preserving") {
    val batch = (1L to 10L).map(rec)
    val out = encodeBatch(batch)
    assert(out.map(_.doc_id) === batch.map(_.doc_id))
    // deterministic: same batch → same dims
    assert(out.head.emb.toSeq === encodeBatch(batch).head.emb.toSeq)
  }

  test("grouped iterator hands the encoder ≤EncoderBatch records per call") {
    val n = 101
    var calls = 0
    var maxSeen = 0
    val out = (1L to n.toLong).map(rec).iterator
      .grouped(EncoderBatch)
      .flatMap { b =>
        calls += 1; maxSeen = math.max(maxSeen, b.size); encodeBatch(b)
      }.toSeq
    assert(out.size === n)
    assert(maxSeen <= EncoderBatch)
    assert(calls === (n + EncoderBatch - 1) / EncoderBatch)
  }

  test("q87 result is partition-layout independent") {
    val base = MultimodalQueries.q87.build(spark, SparkSpec.Sf0001)
      .as[(String, Long, Long)].collect().toSet
    // different parallelism → different batch boundaries → same result
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val alt = MultimodalQueries.q87.build(spark, SparkSpec.Sf0001)
        .as[(String, Long, Long)].collect().toSet
      assert(alt === base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
