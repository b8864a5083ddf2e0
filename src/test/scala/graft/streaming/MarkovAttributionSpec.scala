package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** Pins q211's removal-effect semantics on a hand-computed chain —
  * the oracle certifies engine agreement; this certifies the MATH:
  *   user 1: click → purchase
  *   user 2: view → click → purchase
  *   user 3: view (no purchase)
  *   user 4: error (no purchase)
  * Chain: p(click)=1, p(view)=1/2, p(error)=0,
  * p(START) = (1·1 + 2·½ + 1·0)/4 = ½. Every division is exact in
  * ppb, so the assertions are EXACT longs, not tolerances.
  * Removing click severs every converting path (effect = base);
  * removing view halves the start mass reaching click (effect = ¼);
  * error and signup (unobserved) carry zero effect.
  */
class MarkovAttributionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("markov-fixture").toString
    val base = 1700000000000000L // µs, well inside the 1973–5138 window
    // (event_id, ts, user_id, event_type)
    val rows = Seq(
      (1L, base + 1L, 1L, "click"), (2L, base + 2L, 1L, "purchase"),
      (3L, base + 1L, 2L, "view"), (4L, base + 2L, 2L, "click"),
      (5L, base + 3L, 2L, "purchase"),
      (6L, base + 1L, 3L, "view"),
      (7L, base + 1L, 4L, "error"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", org.apache.spark.sql.functions.lit(1.0))
      .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("q211 removal effects match the hand-computed chain exactly") {
    val out = MarkovAttribution.q211.build(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val Base = 500000000L
    assert(out.keySet == Set("click", "error", "signup", "view"))
    // every variant reports the same base conversion
    assert(out.values.forall(_._1 == Base))
    assert(out("click") == ((Base, 0L, Base)))           // severs all paths
    assert(out("view") == ((Base, 250000000L, 250000000L))) // halves them
    assert(out("error") == ((Base, Base, 0L)))           // never converts
    assert(out("signup") == ((Base, Base, 0L)))          // unobserved
  }

  test("q211 attribution shares sum to 1 on the fixture") {
    val shares = MarkovAttribution.q211.build(spark, dir)
      .collect().map(_.getDouble(4))
    assert(math.abs(shares.sum - 1.0) < 1e-12)
    // click carries 2/3 of the credit, view 1/3 — exact doubles here
    assert(shares.max == 2.0 / 3.0)
  }
}
