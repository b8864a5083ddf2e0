package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixture checks for q160 (directly-follows matrix) and q161 (Hill
  * tail estimate): hand-countable ledgers and a driver-side fixed-point
  * replica.
  */
class MarkovZipfSpec extends SparkSpec {
  import spark.implicits._

  private def lq(n: Long): Long = {
    require(n >= 1)
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    e * 1048576L + ((n - (1L << e)) * 1048576L) / (1L << e)
  }

  test("markov pairs: per-user order, cross-user isolation, ppm shares") {
    // user 1: a b a b   user 2: a b   user 3: c  (no transition)
    // transitions: a→b ×3, b→a ×1; outflow(a)=3, outflow(b)=1
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(sec: Int) = new java.sql.Timestamp(ts0.getTime + sec * 1000L)
    val ev = Seq(
      (1L, t(0), 1L, "a"), (1L, t(1), 2L, "b"), (1L, t(2), 3L, "a"), (1L, t(3), 4L, "b"),
      (2L, t(0), 5L, "a"), (2L, t(5), 6L, "b"),
      (3L, t(0), 7L, "c")).toDF("user_id", "ts", "event_id", "event_type")
    val byUser = Window.partitionBy($"user_id")
      .orderBy(expr("unix_micros(ts)"), $"event_id")
    val pairs = ev
      .withColumn("next_type", lead($"event_type", 1).over(byUser))
      .filter($"next_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
    val outflow = pairs.groupBy($"from_type").agg(sum($"n").as("out_n"))
    val got = pairs.join(outflow, "from_type")
      .select($"from_type", $"to_type", $"n",
        expr("(n * 1000000) div out_n").as("p"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(("a", "b", 3L, 1000000L), ("b", "a", 1L, 1000000L)))
  }

  test("markov same-timestamp events order by event_id (the q77 total order)") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq(
      (1L, ts0, 2L, "y"), (1L, ts0, 1L, "x")).toDF("user_id", "ts", "event_id", "event_type")
    val byUser = Window.partitionBy($"user_id")
      .orderBy(expr("unix_micros(ts)"), $"event_id")
    val got = ev.withColumn("nt", lead($"event_type", 1).over(byUser))
      .filter($"nt".isNotNull)
      .select($"event_type", $"nt").as[(String, String)].collect().toSeq
    assert(got == Seq(("x", "y")))
  }

  test("hill estimator: fixed-point fold matches the driver replica on a planted tail") {
    // frequencies: 64, 32, 16, 8 with k = 3, f_{k+1} = 8
    // sum_log2q = (lq64 - lq8) + (lq32 - lq8) + (lq16 - lq8) = (3+2+1)*2^20
    val sum = (lq(64) - lq(8)) + (lq(32) - lq(8)) + (lq(16) - lq(8))
    assert(sum == 6 * 1048576L)
    // alpha_log2_x1e6 = 3·2^20·1e6 div sum = 500000 (α_log2 = 0.5:
    // each rank doubling halves the frequency ⇒ pure Zipf s=1 would
    // give 1.0 on rank-log2; this geometric-in-RANK fixture gives 0.5
    // by construction of the replica — the engine must agree exactly)
    val alpha = (3L * 1048576L * 1000000L) / sum
    assert(alpha == 500000L)
    val freq = Seq(("a", 64L), ("b", 32L), ("c", 16L), ("d", 8L)).toDF("t", "f")
    val top = freq.orderBy($"f".desc, $"t").limit(4)
      .withColumn("rk", row_number().over(Window.orderBy($"f".desc, $"t")))
    val fk1 = top.filter($"rk" === 4).select($"f".as("f_k1"))
    val got = top.filter($"rk" <= 3).crossJoin(fk1)
      .agg(sum_distinct(lit(0L)) + org.apache.spark.sql.functions.sum(expr(
        "((length(bin(f)) - 1) * 1048576L + (((f) - shiftleft(1L, length(bin(f)) - 1)) * 1048576L div shiftleft(1L, length(bin(f)) - 1)))" +
        " - ((length(bin(f_k1)) - 1) * 1048576L + (((f_k1) - shiftleft(1L, length(bin(f_k1)) - 1)) * 1048576L div shiftleft(1L, length(bin(f_k1)) - 1)))")))
      .as[Long].head()
    assert(got == sum)
  }
}
