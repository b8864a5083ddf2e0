package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.types.ArrayType

/** Physical-plan regression guards: the scale-critical plan shapes the
  * builder prompt calls out (broadcast the dims, push filters into the
  * parquet scan, prune columns at the reader, stay inside whole-stage
  * codegen, partial map-side aggregation) must survive refactors — a
  * query that silently loses its broadcast hint or pushdown still
  * passes the correctness oracle, so only a plan assertion catches it.
  */
class PlanSpec extends SparkSpec {

  /** Execute (AQE finalizes plans lazily) and return the final physical
    * plan string.
    */
  private def planOf(df: DataFrame): String = {
    df.collect()
    val p = df.queryExecution.executedPlan
    val fin = p.collectFirst { case a: AdaptiveSparkPlanExec => a.finalPhysicalPlan }
      .getOrElse(p)
    fin.toString
  }

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, SparkSpec.Sf0001)

  test("q02 star join broadcasts every dimension (no dim shuffles)") {
    val plan = planOf(q("q02_star_join_revenue"))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // exactly one genuine shuffle join is allowed: lineitem ⋈ orders
    assert(plan.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 3)
  }

  test("q03's range predicate reaches the parquet scan (PushedFilters)") {
    val df = q("q03_eq_range_filter")
    df.collect()
    val leaves = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val scan = leaves.find(_.contains("PushedFilters: [I"))
    assert(scan.isDefined, s"no pushed filters in leaves:\n${leaves.mkString("\n")}")
  }

  test("q02's lineitem scan prunes to the referenced columns only") {
    val df = q("q02_star_join_revenue")
    df.collect()
    val leaves = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val liScan = leaves.find(_.contains("lineitem"))
    assert(liScan.isDefined)
    // 16-column table: the query touches orderkey/extendedprice/discount
    assert(!liScan.get.contains("l_comment"),
      s"lineitem scan reads unused columns:\n${liScan.get}")
  }

  test("q17 aggregate runs inside whole-stage codegen with partial agg") {
    val plan = planOf(q("q17_count_distinct"))
    // codegen'd operators carry the `*(stageId)` prefix in plan strings
    assert(plan.contains("*("), plan.take(2000))
    // partial + final HashAggregate pairs (map-side combine before shuffle)
    assert(plan.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2,
      plan.take(2000))
  }

  test("q60's salted join spreads keys (join on key AND salt)") {
    val plan = planOf(q("q60_salted_skew_join"))
    assert(plan.contains("__salt"), plan.take(2000))
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    import spark.implicits._
    val set = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = set.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      set.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables.load(spark, SparkSpec.Sf001, "lineitem")
      val o = Tables.load(spark, SparkSpec.Sf001, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
      val joined = li.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_linestatus").count()
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
             optimized.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n${optimized.take(1500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q69 takes top-20 via TakeOrderedAndProject, not a full-vocab window sort") {
    val plan = planOf(q("q69_vocab_coverage"))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    // the window must run AFTER the limit: exactly one Window operator,
    // and no global Sort feeding it over the unbounded vocab frame
    val windows = plan.sliding("Window".length).count(_ == "Window")
    assert(windows >= 1, plan.take(2000))
  }

  test("q49 candidate join is keyed by cell pair (no label-wide cartesian)") {
    val df = q("q49_embedding_neardup")
    df.collect()
    val plan = planOf(df)
    // the celled⋈celled join must be an equi-join whose keys include the
    // cell columns — a plain within-label join degrades to O(n²/|labels|)
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("cell"), plan.take(3000))
  }

  /** Flatten an (AQE-finalized) physical plan into every node, descending
    * through materialized query stages and reused exchanges — `collect`
    * alone stops at stage boundaries.
    */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.finalPhysicalPlan)
      case q: QueryStageExec => q +: allNodes(q.plan)
      case r: ReusedExchangeExec => r +: allNodes(r.child)
      case other => other +: other.children.flatMap(allNodes)
    }
    self ++ p.subqueries.flatMap(allNodes)
  }

  test("q88 band join shuffles compact keys only — no array column crosses an exchange") {
    // AQE off: at tiny SFs the near-dup branch is empty and adaptive
    // re-optimization erases it (PropagateEmptyRelation), hiding the
    // very join under test — the static plan keeps the shape data-free
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val nodes = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      allNodes(q("q88_incremental_dedup").queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    // the band join: an equi-join keyed (in part) by band_val
    val bandJoins = nodes.collect {
      case j: BaseJoinExec
        if j.leftKeys.exists(_.references.exists(_.name == "band_val")) => j
    }
    assert(bandJoins.nonEmpty,
      s"no band_val-keyed join found:\n${nodes.map(_.nodeName).mkString("\n")}")
    // every exchange feeding it must carry scalar columns only — a token
    // array in this shuffle is the corpus-scaled cost the design forbids
    bandJoins.foreach { j =>
      val exchanges = allNodes(j).collect { case e: Exchange => e }
      exchanges.foreach { e =>
        val arrays = e.output.filter(_.dataType.isInstanceOf[ArrayType])
        assert(arrays.isEmpty,
          s"band-join exchange carries array columns ${arrays.map(_.name)}:\n$e")
      }
    }
  }

  test("q93 interval join runs as a bucket equi-join, never a nested loop") {
    val plan = planOf(q("q93_interval_bucket_join"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("bucket"), plan.take(3000))
  }

  test("q02/q16 degrade to shuffled equi-joins when dims outgrow the broadcast threshold") {
    // At sf100+ `part`/`customer` no longer fit autoBroadcastJoinThreshold;
    // the hint switch models that: with graft.broadcastDims off AND the
    // auto threshold disabled, every dim join must still plan as a sane
    // shuffled equi-join (SMJ/SHJ) — never a BroadcastNestedLoopJoin or
    // cartesian — and produce identical results.
    val set = Map(Tables.BroadcastDimsKey -> "false",
                  "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = set.keys.map(k => k -> spark.conf.getOption(k)).toMap
    val expected = Map(
      "q02_star_join_revenue" -> q("q02_star_join_revenue").collect().toSeq,
      "q16_benchmark_join" -> q("q16_benchmark_join").collect().toSeq)
    try {
      set.foreach { case (k, v) => spark.conf.set(k, v) }
      expected.foreach { case (name, want) =>
        val df = q(name)
        val got = df.collect().toSeq
        val plan = planOf(df)
        assert(!plan.contains("BroadcastNestedLoopJoin") &&
               !plan.contains("CartesianProduct"),
          s"$name fallback plan has a non-equi join:\n${plan.take(3000)}")
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"$name fallback did not plan a shuffled equi-join:\n${plan.take(3000)}")
        assert(!plan.contains("BroadcastHashJoin"),
          s"$name still broadcasts with hints off and threshold -1:\n${plan.take(3000)}")
        assert(got == want, s"$name results differ in fallback mode")
      }
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("directory partitioning prunes at the scan (PartitionFilters)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-prune").toString
    val orders = Tables.load(spark, SparkSpec.Sf0001, "orders")
      .withColumn("yr", year($"o_orderdate"))
    sources.Formats.writeParquetPartitioned(
      orders, tmp, partitionCols = Seq("yr"), sortWithin = Seq("o_custkey"))
    val filtered = spark.read.parquet(tmp).filter($"yr" === 1995)
    filtered.collect()
    val scan = filtered.queryExecution.executedPlan
      .collectLeaves().map(_.toString)
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(scan.contains("PartitionFilters: [isnotnull(yr"), scan)
    assert(scan.contains("(yr"), scan) // the =1995 predicate, pruned pre-scan
  }
  test("q196 kNN audit: probes broadcast, top-5 via WindowGroupLimit heaps") {
    val plan = planOf(q("q196_knn_label_audit"))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "probe frame must broadcast, not shuffle: " + plan.take(1500))
    assert(plan.contains("WindowGroupLimit"),
      "per-probe top-k must run as per-partition heaps: " + plan.take(1500))
  }

  test("q206 HBOS scoring joins only broadcast histograms (no fact shuffle join)") {
    val plan = planOf(q("q206_hbos_anomaly"))
    val shuffleJoins = plan.sliding("SortMergeJoin".length)
      .count(_ == "SortMergeJoin")
    assert(shuffleJoins == 0,
      s"all four histogram joins must broadcast; found $shuffleJoins SortMergeJoin: " + plan.take(2000))
    assert(plan.contains("TakeOrderedAndProject"),
      "top-20 must be TakeOrdered, not a global sort: " + plan.take(1500))
  }

  test("q205 Kendall tau-b never shuffles the corpus past the cell aggregate") {
    val df = q("q205_kendall_tau_b")
    df.collect()
    // the contingency collapse is the ONLY corpus-sized aggregate; the
    // cell self-join runs on <= 550 rows, so the final plan's exchanges
    // must all carry the tiny cell/tie frames (partial agg upstream).
    val plan = planOf(df)
    assert(plan.contains("partial"), "cell aggregate must map-side combine: " + plan.take(1500))
  }

  test("q199 OLS is one pass: no window, no second scan of orders") {
    val plan = planOf(q("q199_ols_trend"))
    assert(!plan.contains("Window"), "moment sums need no window: " + plan.take(1500))
    val orderScans = plan.sliding("orders.parquet".length)
      .count(_ == "orders.parquet")
    assert(orderScans <= 1, s"orders scanned $orderScans times: " + plan.take(2000))
  }

}
