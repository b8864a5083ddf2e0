package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev tool: run one registry query and print its AQE-finalized
  * physical plan — the single-query complement of [[PlanDump]] (which
  * regenerates all of PLANS.md) for iterating on one operator's plan
  * shape without a 5-minute full dump.
  *
  * Usage: runMain graft.ExplainOne <queryName> [sfDir]
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_readmission_rate")
    val dir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .appName("explainone").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan
    val fin = p.collectFirst { case a: AdaptiveSparkPlanExec => a.finalPhysicalPlan }
      .getOrElse(p)
    println(fin.toString)
    Barrier.release(spark)
    spark.stop()
  }
}
