package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off attribution probe: run a handful of join-heavy queries
  * through [[graft.operators.ExplainAdvisor.advise]] and print each
  * join site's estimate/actual so the logicalLink attribution rate is
  * checkable without a full sweep.
  */
object AdvisorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q02_star_join", "q131_quantized_ann", "q16_agg_join")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    names.filter(qs.contains).foreach { n =>
      val advice =
        try graft.operators.ExplainAdvisor.advise(spark, dir, qs(n))
        finally graft.Barrier.release(spark)
      advice.filter(_.kind == "join").foreach { a =>
        println(s"$n | ${a.site} | est=${a.estimated} actual=${a.actual}")
      }
    }
    spark.stop()
  }
}
