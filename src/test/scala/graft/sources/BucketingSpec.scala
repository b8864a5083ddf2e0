package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketing is the at-rest answer to the co-located join (SURVEY.md
  * §4.1: the reference's secondary indexes map to partitioning + file
  * layout). Writing both sides bucketed on the join key lets a
  * sort-merge join run with ZERO Exchange — at 100 TB that's the
  * difference between a terabyte-scale shuffle per join and none. This
  * spec proves the property on the real testdata: orders and customer
  * bucketed 8 ways on custkey join with no shuffle in the final plan.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without any Exchange in the plan") {
    val warehouse = Files.createTempDirectory("graft-bucketing").toString
    val orders = graft.Tables.load(spark, SparkSpec.Sf0001, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val customer = graft.Tables.load(spark, SparkSpec.Sf0001, "customer")
      .select($"c_custkey".as("o_custkey"), $"c_mktsegment")

    orders.write.mode("overwrite")
      .option("path", s"$warehouse/orders_b")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed")
    customer.write.mode("overwrite")
      .option("path", s"$warehouse/customer_b")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("customer_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join MUST co-locate by bucket layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"), Seq("o_custkey"))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(plan.contains("Bucketed: true"), plan.take(2000))
      // no shuffle on the JOIN key (the groupBy after it still shuffles
      // on c_mktsegment — that one is expected)
      assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
        s"bucketed join still shuffles:\n${plan.take(2000)}")
      // sanity: same result as the plain parquet join
      val expect = orders.join(customer, Seq("o_custkey"))
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toSet
      assert(joined.as[(String, Long)].collect().toSet === expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }
}
