package graft.similarity

import graft.{SparkEntry, SparkSpec}

/** Receipts for q126 (IVF recall curve): the curve's structural
  * invariants plus a cross-query consistency check against the two
  * REGISTERED queries it audits (q47 ground truth, q52 at nprobe=2) —
  * an independent formulation that reuses no q126 code.
  */
class IvfRecallSpec extends SparkSpec {

  private lazy val curve =
    SparkEntry.queries("q126_ivf_recall_curve")(spark, SparkSpec.Sf0001)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("recall is monotone in nprobe and full probe recovers brute force exactly") {
    val byProbe = Seq(1, 2, 4, 8).map(p => curve(p)._3)
    assert(byProbe == byProbe.sorted,
      s"recall_q must be monotone in nprobe: $byProbe")
    // 8 centroids exist, so nprobe=8 probes every cell: ≡ brute force
    assert(curve(8)._3 == 1000000L)
    assert(curve(8)._2 == curve(8)._1)
  }

  test("the nprobe=2 point agrees with the registered q47/q52 outputs") {
    def pairs(name: String) =
      SparkEntry.queries(name)(spark, SparkSpec.Sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("q47_cosine_topk")
    val ivf = pairs("q52_ivf_ann") // the nprobe=2 default
    assert(curve(2)._1 == exact.size)
    assert(curve(2)._2 == (exact & ivf).size,
      "q126's nprobe=2 hit count must equal |q52 ∩ q47|")
  }
}
