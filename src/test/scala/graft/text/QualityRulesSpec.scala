package graft.text

import graft.{SparkEntry, SparkSpec, Tables}

/** Receipts for q107: the rule battery is re-derived through a plain
  * driver-side Scala evaluation of every rule over the raw text — no
  * Spark operators, no shared tokenization helpers — and compared
  * row-for-row. A defect in the two-level aggregation (the compressed
  * (doc, token, count) path) cannot survive agreement with a per-doc
  * loop that never compresses anything.
  */
class QualityRulesSpec extends SparkSpec {

  private val stop = Set("the", "a", "of", "to", "and", "in")

  private def groundTruth(dir: String): Seq[Seq[Any]] = {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    case class Fails(wc: Boolean, wl: Boolean, st: Boolean, rep: Boolean,
        sym: Boolean, alpha: Boolean) {
      def pass: Boolean = !wc && !wl && !st && !rep && !sym && !alpha
    }
    val perDoc = docs.map { case (_, source, text) =>
      val ts = text.split(" ", -1).toSeq
      val n = ts.size.toLong
      val sumLen = ts.map(_.length.toLong).sum
      val nStop = ts.count(stop.contains).toLong
      val maxCnt = ts.groupBy(identity).values.map(_.size).max.toLong
      val nSym = ts.count(t => t.contains("#") || t.contains("...")).toLong
      val nAlpha = ts.count(_.exists(c => Character.isLetter(c))).toLong
      source -> Fails(
        wc = n < 50 || n > 100000,
        wl = sumLen < n * 3 || sumLen > n * 10,
        st = nStop < 2,
        rep = maxCnt * 5 > n,
        sym = nSym * 10 > n,
        alpha = nAlpha * 5 < n * 4)
    }
    perDoc.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, fs0) =>
      val fs = fs0.map(_._2)
      Seq[Any](src, fs.size.toLong,
        fs.count(_.wc).toLong, fs.count(_.wl).toLong, fs.count(_.st).toLong,
        fs.count(_.rep).toLong, fs.count(_.sym).toLong,
        fs.count(_.alpha).toLong, fs.count(_.pass).toLong)
    }
  }

  test("q107 matches a driver-side per-doc rule evaluation") {
    for (dir <- Seq(SparkSpec.Sf0001, SparkSpec.Sf001)) {
      val got = SparkEntry.queries("q107_gopher_rules")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(got == groundTruth(dir), s"mismatch at $dir")
    }
  }

  test("q107 has real signal on the corpus: some docs fail, some pass") {
    val rows = SparkEntry.queries("q107_gopher_rules")(spark, SparkSpec.Sf001)
      .collect()
    val idx = rows.head.schema.fieldNames.zipWithIndex.toMap
    val totalDocs = rows.map(_.getLong(idx("n_docs"))).sum
    val totalPass = rows.map(_.getLong(idx("n_pass"))).sum
    val wcFails = rows.map(_.getLong(idx("fail_word_count"))).sum
    // the corpus plants 10-to-99-word docs: the 50-word floor must fire
    // on some docs and pass others — an all-zero or all-fail battery
    // would mean the thresholds degenerated
    assert(wcFails > 0 && wcFails < totalDocs)
    assert(totalPass < totalDocs)
  }
}
