package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan pins for the round-8 operators' scale-critical shapes
  * (the PlanSpec stance): a query that silently loses a broadcast or
  * picks up a cartesian still passes the value oracle, so the shape
  * itself is asserted. Each test names the invariant its PLANS.md
  * annotation claims.
  */
class Round8PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): String = {
    df.collect()
    val p = df.queryExecution.executedPlan
    val fin = p.collectFirst { case a: AdaptiveSparkPlanExec => a.finalPhysicalPlan }
      .getOrElse(p)
    fin.toString
  }

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, SparkSpec.Sf0001)

  test("q272 newsvendor rank windows are brand-PARTITIONED (no single-task corpus window)") {
    val plan = planOf(q("q272_newsvendor_stock"))
    // every Window node must carry the p_brand partition key
    val windows = plan.split('\n').filter(_.contains("Window ["))
    assert(windows.nonEmpty)
    windows.foreach(w =>
      assert(w.contains("p_brand"), s"unpartitioned window:\n$w"))
  }

  test("q272/q278 broadcast the part dimension") {
    for (name <- Seq("q272_newsvendor_stock", "q278_sbc_quadrant")) {
      val plan = planOf(q(name))
      assert(plan.contains("BroadcastHashJoin"), s"$name: ${plan.take(1500)}")
      assert(!plan.contains("CartesianProduct"), name)
    }
  }

  test("no round-8 operator plans a cartesian product or BNLJ over non-singleton frames") {
    val names = Seq(
      "q264_roc_auc", "q265_brier_decomposition", "q266_cuped_adjustment",
      "q267_welch_ttest", "q268_kruskal_wallis", "q269_jarque_bera",
      "q270_fleiss_kappa", "q271_cochran_armitage", "q273_seasonal_decomposition",
      "q274_ljung_box", "q275_kmv_distinct", "q276_theta_forecast",
      "q277_rmst", "q279_clv_gupta_lehmann", "q280_anderson_darling",
      "q281_breslow_day", "q282_greenwood_ci", "q283_decomposition_strength")
    for (name <- names) {
      val plan = planOf(q(name))
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian")
      // BroadcastNestedLoopJoin is legitimate ONLY against 1-row/constant
      // frames (the grid/total broadcasts); a corpus-side BNLJ is not.
      // All these queries join on keys or broadcast bounded frames, so a
      // BNLJ appearing at all should name a literal/aggregate side.
    }
  }

  test("q267 Welch computes in ONE map-side-combinable aggregate (no join, no window)") {
    val plan = planOf(q("q267_welch_ttest"))
    assert(!plan.contains("Join"), plan.take(1500))
    assert(!plan.contains("Window"), plan.take(1500))
    assert(plan.contains("partial_"), "no partial aggregation:\n" + plan.take(1500))
  }

  test("q270 Fleiss rates in a pure map + 1-row aggregate (no explode, no join)") {
    val plan = planOf(q("q270_fleiss_kappa"))
    assert(!plan.contains("Join"), plan.take(1500))
    assert(!plan.contains("Generate"), "explode crept into q270:\n" + plan.take(1500))
  }

  test("q211/q241 driver-side loops leave NO per-round Spark stages (plan is the final local result)") {
    // the returned frame is the already-computed bounded result: its plan
    // must be a LocalTableScan (+ sort/project), not an iterative join tree
    for (name <- Seq("q211_markov_attribution", "q241_bradley_terry")) {
      val plan = planOf(q(name))
      assert(plan.contains("LocalTableScan"), s"$name:\n${plan.take(1000)}")
      assert(!plan.contains("Join"), s"$name still plans joins:\n${plan.take(1000)}")
    }
  }
}
