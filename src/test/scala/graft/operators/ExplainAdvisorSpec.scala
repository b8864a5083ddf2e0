package graft.operators

import graft.SparkSpec

/** VERDICT r9 item 8 (stretch): the explain-advisor composes the
  * repo's own sketches (q140 CMS join size, q254 equi-depth histogram
  * selectivity) into per-site estimate-vs-actual advice for a
  * registered query — actuals read from the EXECUTED plan's metrics.
  * Three queries, three contracts:
  *
  *  - q02 (star join): every advised inner join is one-sided
  *    (CMS ≥ actual) AND within 3× — the bound a broadcast-vs-shuffle
  *    decision needs;
  *  - q03 (range filters): histogram estimates within 10% of exact;
  *  - q10 (LEFT OUTER against an aggregate): the side subtree keeps
  *    the estimate honest for the matched pairs, but the outer join's
  *    output adds unmatched rows the sketch does not model — the site
  *    is advised with `one_sided=false`, never claimed as a bound.
  */
class ExplainAdvisorSpec extends SparkSpec {

  private val dir = SparkSpec.Sf001

  test("q02 star join: every advised inner join one-sided and ≤3×") {
    val advice = ExplainAdvisor.advise(spark, dir,
      graft.operators.CoreQueries.q02.build)
    val joins = advice.filter(_.kind == "join")
    assert(joins.size >= 3, s"expected ≥3 modelable join sites: $advice")
    joins.foreach { a =>
      assert(a.oneSided, s"star-join sites are inner: $a")
      assert(a.actual > 0, s"metric actual must be populated: $a")
      assert(a.estimated >= a.actual,
        s"CMS estimate must be one-sided (≥ actual): $a")
      assert(a.estimated <= 3 * a.actual,
        s"estimate must stay within 3× of actual at W=65536: $a")
    }
    assert(advice.exists(_.kind == "shuffle"))
  }

  test("q03 range filters: histogram estimates within 10% of exact") {
    val advice = ExplainAdvisor.advise(spark, dir,
      graft.operators.CoreQueries.q03.build)
    val filters = advice.filter(_.kind == "filter")
    assert(filters.size >= 2,
      s"the between() should advise two range conjuncts: $advice")
    filters.foreach { a =>
      assert(a.actual > 0, a.toString)
      assert(math.abs(a.errPpm) <= 100000L,
        s"equi-depth estimate must be within 10%: $a")
    }
  }

  test("q10 outer join vs aggregate: advised, but never claimed one-sided") {
    val advice = ExplainAdvisor.advise(spark, dir,
      graft.operators.CoreQueries.q10.build)
    val joins = advice.filter(_.kind == "join")
    assert(joins.nonEmpty, s"the outer-join site should be advised: $advice")
    joins.foreach { a =>
      assert(!a.oneSided,
        s"an OUTER join estimate must not claim the one-sided bound: $a")
      assert(a.actual > 0, a.toString)
      // the estimate models the matched pairs; the outer output can
      // only exceed it by the unmatched left rows — sanity bound
      assert(a.actual <= a.estimated + 160000L,
        s"outer actual beyond est + |left|: $a")
    }
    assert(advice.exists(_.kind == "shuffle"))
  }
}
