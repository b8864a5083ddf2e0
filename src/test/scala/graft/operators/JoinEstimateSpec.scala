package graft.operators

import graft.SparkSpec

/** [[JoinEstimate]] one-sided contract: the CMS inner product never
  * underestimates the true join size, even with the bucket space
  * crushed far below the key cardinality.
  */
class JoinEstimateSpec extends SparkSpec {
  import spark.implicits._

  private def refJoinSize(a: Seq[(String, Long)], b: Seq[(String, Long)]): Long = {
    val bm = b.toMap
    a.map { case (k, c) => c * bm.getOrElse(k, 0L) }.sum
  }

  private val a = Seq(("u1", 5L), ("u2", 3L), ("u3", 7L), ("u9", 2L))
  private val b = Seq(("u1", 4L), ("u3", 1L), ("u5", 6L))

  test("estimate >= exact at every geometry, including collision-saturated w") {
    val exact = refJoinSize(a, b)
    assert(exact == 5L * 4 + 7L * 1)
    for (w <- Seq(1, 2, 4, 1024)) {
      val est = JoinEstimate.estimate(
        a.toDF("t", "cnt"), b.toDF("t", "cnt"), d = 4, w = w)
        .as[Long].head()
      assert(est >= exact, s"w=$w underestimated: $est < $exact")
    }
  }

  test("single shared key is estimated exactly at any w") {
    // one key per side, same key: every row's bucket product is a*b
    val est = JoinEstimate.estimate(
      Seq(("only", 11L)).toDF("t", "cnt"),
      Seq(("only", 13L)).toDF("t", "cnt"), d = 4, w = 2)
      .as[Long].head()
    assert(est == 143L)
  }

  test("disjoint single keys can only overestimate (never negative, never under)") {
    val est = JoinEstimate.estimate(
      Seq(("ka", 11L)).toDF("t", "cnt"),
      Seq(("kb", 13L)).toDF("t", "cnt"), d = 4, w = 1)
      .as[Long].head()
    assert(est == 143L) // w=1 forces the collision: exact 0, est a*b
  }
}
