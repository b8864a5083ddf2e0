package graft.similarity

import graft.SparkSpec

/** [[Mmr.mmrOf]] diversity semantics: a near-duplicate of an already
  * selected result loses to a diverse lower-relevance candidate —
  * the property that separates MMR from plain top-k.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def v(a: Float, b: Float): Seq[Float] =
    Seq(a, b) ++ Seq.fill(62)(0.0f)

  test("near-duplicate of the first pick is deferred behind a diverse candidate") {
    // probe along (1,0); A most relevant, B a near-copy of A, C on
    // the OPPOSITE angular side — almost as relevant as B but far
    // from A: 7*rel(B) - 3*sim(A,B) ~ 3.957 loses to
    // 7*rel(C) - 3*sim(A,C) ~ 4.023, while plain top-2 keeps {A, B}
    val e = Seq(
      (0L, v(1.0f, 0.0f), 0),        // probe
      (1L, v(0.99f, 0.10f), 0),      // A
      (2L, v(0.98f, 0.11f), 0),      // B ~ A
      (3L, v(0.975f, -0.115f), 0))   // C: mirrored side of the probe
      .toDF("vec_id", "embedding", "label")
    val got = Mmr.mmrOf(e, nCand = 3, k = 2)
      .select("pos", "vec_id").as[(Int, Long)].collect().toSeq
    assert(got == Seq((1, 1L), (2, 3L)))
  }

  test("k larger than the candidate pool returns the whole pool, relevance-first head") {
    val e = Seq(
      (0L, v(1.0f, 0.0f), 0),
      (1L, v(0.9f, 0.1f), 0),
      (2L, v(0.1f, 0.9f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Mmr.mmrOf(e, nCand = 5, k = 5)
      .select("pos", "vec_id").as[(Int, Long)].collect().toSeq
    assert(got.map(_._2).toSet == Set(1L, 2L) && got.head == ((1, 1L)))
  }
}
