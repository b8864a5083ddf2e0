package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** [[AdvisedBroadcast]] — the measured broadcast-vs-shuffle choice:
  * picks broadcast EXACTLY when the measured row count is at or under
  * the threshold, and the choice never changes results (same logical
  * join, different physical strategy).
  */
class AdvisedBroadcastSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: DataFrame): String = {
    df.collect()
    val p = df.queryExecution.executedPlan
    p.collectFirst { case a: AdaptiveSparkPlanExec => a.finalPhysicalPlan }
      .getOrElse(p).toString
  }

  private def probe = (1L to 5000L).map(i => (i % 100, i)).toDF("k", "v")
  private def dim = (0L until 100L).map(i => (i, s"d$i")).toDF("k", "d")

  private def withThreshold[A](t: Long)(body: => A): A = {
    val prev = spark.conf.getOption(AdvisedBroadcast.ThresholdKey)
    spark.conf.set(AdvisedBroadcast.ThresholdKey, t.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(AdvisedBroadcast.ThresholdKey, v)
      case None => spark.conf.unset(AdvisedBroadcast.ThresholdKey)
    }
  }

  test("under the threshold: broadcast join is chosen") {
    withThreshold(100L) {
      val j = probe.join(AdvisedBroadcast(dim), "k")
      assert(plan(j).contains("BroadcastHashJoin"))
    }
  }

  test("over the threshold: no hint — the shuffled equi-join fallback") {
    // autoBroadcastJoinThreshold off isolates the HINT's effect: with
    // it on, the planner's own size estimate may still broadcast a
    // tiny frame, which is fine in production but hides what this
    // test asserts (the advisor declined to hint)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withThreshold(99L) { // dim has 100 rows: 100 > 99 → no hint
      val j = probe.join(AdvisedBroadcast(dim), "k")
      val p = plan(j)
      assert(!p.contains("BroadcastHashJoin"), p.take(1500))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(1500))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("boundary: exactly-at-threshold broadcasts (<= semantics)") {
    withThreshold(100L) {
      val j = probe.join(AdvisedBroadcast(dim), "k")
      assert(plan(j).contains("BroadcastHashJoin"))
    }
  }

  test("the choice never changes results: both sides hash-identical") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val under = withThreshold(100L) {
        graft.ContentHash.rowsAndHash(probe.join(AdvisedBroadcast(dim), "k"))
      }
      val over = withThreshold(1L) {
        graft.ContentHash.rowsAndHash(probe.join(AdvisedBroadcast(dim), "k"))
      }
      assert(under == over)
      assert(under._1 == 5000L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
