package graft

/** Aggregator for the same-box A/B bench protocol (`tools/bench_ab.sh`):
  * reads two files of [[Bench]] JSON lines — interleaved reps of the
  * round-start binary (base) and HEAD — and prints ONE JSON object
  * separating box drift from code drift mechanically.
  *
  * Method: per query, take the min across reps on each side (the
  * intrinsic-cost estimate Bench itself uses) and form
  * `ratio = head_min / base_min`. Box drift moves EVERY query's ratio
  * together, so the MEDIAN ratio across shared queries estimates the
  * box factor; each query's `norm_ratio = ratio / median_ratio` is the
  * box-corrected code delta. Queries with `norm_ratio > 1.25` are
  * flagged as code-attributable regressions (the round-5 adjudication
  * threshold — q47's 1.62× raw ratio against a 0.66 median would have
  * flagged as box, not code, without any manual digging).
  *
  * Usage: `BenchAb <base.jsonl> <head.jsonl> <baseRev> <headRev>`.
  * The parser handles exactly the shape [[Bench]] prints (a flat
  * `"queries":{"name":sec,...}` object per line) — it is a tool for
  * this repo's own artifacts, not a general JSON reader.
  */
object BenchAb {

  private val PairRe = """"([A-Za-z0-9_]+)":([0-9.eE+-]+)""".r

  /** The per-query min map of one side's JSON lines. Only FULL bench
    * lines count (they carry "queries_median"); the compact summary
    * line Bench prints last (r13 — for the driver's tail capture)
    * holds a 5-query subset and must not be folded in.
    */
  private[graft] def minsOf(lines: Seq[String]): Map[String, Double] = {
    val all = lines.filter(_.contains("\"queries_median\":")).flatMap { line =>
      val start = line.indexOf("\"queries\":{") + "\"queries\":".length
      val end = line.indexOf('}', start)
      PairRe.findAllMatchIn(line.substring(start, end + 1))
        .map(m => m.group(1) -> m.group(2).toDouble)
    }
    all.groupMapReduce(_._1)(_._2)(math.min)
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 1.0
    else if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
  }

  private def fmt(d: Double): String = f"$d%.4f"

  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: BenchAb <base.jsonl> <head.jsonl> <baseRev> <headRev>")
    val Array(baseFile, headFile, baseRev, headRev) = args
    def readLines(p: String): Seq[String] = {
      val src = scala.io.Source.fromFile(p, "UTF-8")
      try src.getLines().toList finally src.close()
    }
    val base = minsOf(readLines(baseFile))
    val head = minsOf(readLines(headFile))
    val shared = (base.keySet & head.keySet).toSeq.sorted
    val ratios = shared.map(q => q -> head(q) / base(q)).toMap
    val boxFactor = median(shared.map(ratios))
    val rows = shared.map { q =>
      val norm = ratios(q) / boxFactor
      s""""$q":{"base_min":${fmt(base(q))},"head_min":${fmt(head(q))},""" +
        s""""ratio":${fmt(ratios(q))},"norm_ratio":${fmt(norm)}}"""
    }
    val flagged = shared.filter(q => ratios(q) / boxFactor > 1.25)
    // Flag-floor mechanization (VERDICT r12 item 3): a sub-second base
    // query's min-of-N delta is below this instrument's resolution —
    // every focused re-run since r7 has dispelled such flags as
    // scheduler noise, and re-running 28 of them cost r12 an hour for
    // zero findings. Only flags whose BASE cost is ≥ 1 s can carry a
    // measurable code regression; the rest are recorded separately so
    // the artifact is fully adjudicated by construction. Material
    // flags still demand the focused re-run (bench_ab.sh automates it).
    val (material, subRes) = flagged.partition(q => base(q) >= 1.0)
    val line =
      s"""{"protocol":"interleaved same-box A/B","base_rev":"$baseRev",""" +
      s""""head_rev":"$headRev","shared_queries":${shared.length},""" +
      s""""box_factor_median_ratio":${fmt(boxFactor)},""" +
      s""""total_base_min":${fmt(shared.map(base).sum)},""" +
      s""""total_head_min":${fmt(shared.map(head).sum)},""" +
      s""""code_regressions_norm_gt_1.25":${
        material.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""below_resolution_flags":${
        subRes.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""queries":${rows.mkString("{", ",", "}")}}"""
    println(line)
  }
}
