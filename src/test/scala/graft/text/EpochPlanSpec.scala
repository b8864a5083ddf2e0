package graft.text

import graft.{SparkEntry, SparkSpec, Tables}

/** q111 receipts: the epoch plan re-derived driver-side with plain
  * Scala integer arithmetic over collected texts, plus the properties
  * the plan exists to deliver (budget conservation up to flooring;
  * √-temperature flattens — small sources upsample, large downsample,
  * relative to the natural mixture).
  */
class EpochPlanSpec extends SparkSpec {

  private def groundTruth(dir: String): Seq[(String, Long, Long, Long, Boolean)] = {
    val byaSource = Tables.load(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
      .groupBy(_._1).map { case (src, xs) => src -> xs.map(_._2).sum }
      .toSeq.sortBy(_._1)
    val budget = byaSource.map(_._2).sum
    val ws = byaSource.map { case (_, n) => math.sqrt(n.toDouble).toLong }
    val sumw = ws.sum
    byaSource.zip(ws).map { case ((src, n), w) =>
      val target = budget * w / sumw
      (src, n, target, target * 1000 / n, target > n)
    }
  }

  test("q111 matches a driver-side integer re-derivation") {
    for (dir <- Seq(SparkSpec.Sf0001, SparkSpec.Sf001)) {
      val got = SparkEntry.queries("q111_epoch_plan")(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4))).toSeq
      assert(got == groundTruth(dir), s"mismatch at $dir")
    }
  }

  test("q111 conserves the budget up to flooring and flattens the mixture") {
    val rows = SparkEntry.queries("q111_epoch_plan")(spark, SparkSpec.Sf001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = rows.map(_._2).sum
    val allocated = rows.map(_._3).sum
    // each floor division loses < 1 token-unit of the budget
    assert(allocated <= total && total - allocated < rows.length)
    // √-temperature flattening, in its provable integer form: epochs
    // (∝ w/n, w = ⌊√n⌋) are antitone in source size up to the
    // quantization factor — for n_a < n_b, w_b/n_b ≤ K/w_b ≤ K/w_a and
    // w_a/n_a > w_a/(w_a+1)², so eb ≤ ea·((w_a+1)/w_a)², plus ±1 per
    // floor division. (Strict antitonicity is false near square
    // boundaries: w jumps +1 while n barely grows.)
    val mean = total / rows.length
    for {
      (sa, na, _, ea) <- rows
      (sb, nb, _, eb) <- rows
      if na < nb
    } {
      val wa = math.sqrt(na.toDouble).toLong
      assert(ea * (wa + 1) * (wa + 1) / (wa * wa) + 2 >= eb,
        s"epochs not antitone beyond quantization: $sa($na)=$ea $sb($nb)=$eb")
    }
    // below-mean sources upsample (Cauchy-Schwarz puts the crossing at
    // or above the mean for exact √) — up to the same 1/w quantization
    // slack: w = ⌊√n⌋ undershoots √n by up to one unit
    for ((src, n, target, _) <- rows if n < mean) {
      val w = math.sqrt(n.toDouble).toLong
      assert(target + n / w + 2 >= n,
        s"below-mean source $src not upsampled: n=$n target=$target")
    }
  }
}
