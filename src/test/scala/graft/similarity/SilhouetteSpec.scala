package graft.similarity

import graft.SparkSpec

/** [[VectorQueries.silhouetteOf]] sign semantics on fixtures whose
  * geometry is obvious: well-separated clusters score positive,
  * a point parked on the foreign centroid scores negative and is
  * counted as a candidate misassignment.
  */
class SilhouetteSpec extends SparkSpec {
  import spark.implicits._

  // 64-dim vector: value `a` in dim 0, `b` in dim 1, zeros elsewhere
  private def v(a: Float, b: Float): Seq[Float] =
    Seq(a, b) ++ Seq.fill(62)(0.0f)

  test("separated clusters: every label sums positive, zero negatives") {
    val e = Seq(
      (1L, v(0.9f, 0.0f), 0), (2L, v(0.8f, 0.1f), 0),
      (3L, v(0.0f, 0.9f), 1), (4L, v(0.1f, 0.8f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = VectorQueries.silhouetteOf(e)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(0, 1))
    assert(got.forall { case (_, n, sum, neg) => n == 2 && sum > 0 && neg == 0 })
  }

  test("a point sitting on the foreign centroid is counted negative") {
    val e = Seq(
      (1L, v(0.9f, 0.0f), 0), (2L, v(0.9f, 0.0f), 0),
      (3L, v(0.0f, 0.9f), 1), (4L, v(0.0f, 0.9f), 1),
      (5L, v(0.0f, 0.9f), 0)) // labeled 0, lives at cluster 1's centroid
      .toDF("vec_id", "embedding", "label")
    val got = VectorQueries.silhouetteOf(e)
      .as[(Int, Long, Long, Long)].collect()
      .map { case (l, n, sum, neg) => l -> ((n, sum, neg)) }.toMap
    // label 0: the stray point's own-centroid distance (pulled to
    // (0.6, 0.3)) exceeds its distance to label 1's centroid -> negative
    assert(got(0)._1 == 3 && got(0)._3 == 1)
    // label 1: both points sit exactly on their centroid -> a = 0,
    // silhouette saturates at +10000 each
    assert(got(1) == ((2L, 20000L, 0L)))
  }
}
