package graft.operators

import graft.SparkSpec

/** [[Survival]] KM core against hand-computed ledgers — the at-risk
  * denominators, the censoring semantics (leave the denominator,
  * produce no curve row) and the exact fixed-point log2 terms.
  */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replica of the engine-shared quantized log2. */
  private def lq(n: Long): Long = {
    require(n >= 1)
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    e * 1048576L + ((n - (1L << e)) * 1048576L) / (1L << e)
  }

  private def curve(outcomes: Seq[(Long, Long)]): Seq[(Long, Long, Long, Option[Long])] =
    Survival.kmCurve(outcomes.toDF("dur", "ev"))
      .as[(Long, Long, Long, Option[Long])].collect().toSeq

  test("textbook cohort: at-risk ledger, censoring, and exact log2 terms") {
    // durations (dur, ev): events at 1, 3, 4; censored at 2 and 5
    val got = curve(Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 0L)))
    // t=1: n=5 d=1; t=3: n=3 d=1; t=4: n=2 d=1
    val s1 = lq(4) - lq(5)
    val s3 = s1 + (lq(2) - lq(3))
    val s4 = s3 + (lq(1) - lq(2))
    assert(got == Seq(
      (1L, 5L, 1L, Some(s1)),
      (3L, 3L, 1L, Some(s3)),
      (4L, 2L, 1L, Some(s4))))
  }

  test("censored subjects leave the denominator but never make a row") {
    // same event times, one cohort with a trailing censor: the censor
    // inflates every at-risk count before its time, adds no row
    val base = Seq((2L, 1L), (4L, 1L))
    val a = curve(base.map(d => (d._1, d._2)))
    val b = curve(base :+ (9L, 0L))
    assert(a.map(_._1) == b.map(_._1)) // same event times
    assert(b.map(_._2) == a.map(_._2).map(_ + 1)) // +1 at risk everywhere
  }

  test("survival zero poisons the curve tail to NULL, not a fake log") {
    // everyone fails: last event time has n = d, survival hits zero
    val got = curve(Seq((1L, 1L), (1L, 1L), (2L, 1L)))
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got.head._4.contains(lq(1) - lq(3)))
    assert(got.last._4.isEmpty)
  }

  test("tied events at one time collapse into a single multi-death factor") {
    // 3 subjects all failing at t=2: one row, d=3, n=3, survival zero
    val got = curve(Seq((2L, 1L), (2L, 1L), (2L, 1L)))
    assert(got == Seq((2L, 3L, 3L, None)))
  }
}
