package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only (like [[PlanDump]]): materialize an N× scale-up of a
  * testdata `documents` table for empirical scaling runs.
  *
  * Each copy gets disjoint doc_ids AND a per-copy token namespace
  * (every token prefixed `c<i>_`), so copies share no tokens: the
  * near-dup/gram structure of the corpus is replicated per copy
  * instead of creating millions of artificial cross-copy duplicates —
  * the workload's CHARACTER stays fixed while its volume scales,
  * which is what a scaling curve must hold constant.
  *
  * Fact tables scale the same way: per-copy key offsets keep order /
  * part / customer namespaces disjoint (the co-purchase graph and the
  * match graph replicate per copy instead of densifying), customer
  * names get a copy prefix (no artificial cross-copy fuzzy matches),
  * while DATES are shared — volume per calendar day grows with the
  * factor, which is exactly what the calendar-bounded-frame claims
  * (q153/q159) must absorb.
  *
  * Usage: runMain graft.ScaleGen <srcSfDir> <destDir> <factor>
  * (writes documents/orders/lineitem/customer parquet; queries over
  * other tables are out of a scaled dir's scope.)
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, destDir, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, srcDir, "documents")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val copies = (0 until factor).map { i =>
      docs.select(
        (col("doc_id") + lit(i * maxId)).as("doc_id"),
        // per-copy token namespace: prefix every token
        concat(lit(s"c${i}_"),
          regexp_replace(col("text"), " ", s" c${i}_")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    copies.reduce(_ unionByName _)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$destDir/documents.parquet")

    val cust = Tables.load(spark, srcDir, "customer")
    val ord = Tables.load(spark, srcDir, "orders")
    val li = Tables.load(spark, srcDir, "lineitem")
    val maxCust = cust.agg(max(col("c_custkey"))).head().getLong(0) + 1
    val maxOrd = ord.agg(max(col("o_orderkey"))).head().getLong(0) + 1
    val maxPart = li.agg(max(col("l_partkey"))).head().getLong(0) + 1
    val maxSupp = li.agg(max(col("l_suppkey"))).head().getLong(0) + 1

    (0 until factor).map { i =>
      cust.select((col("c_custkey") + lit(i * maxCust)).as("c_custkey"),
        concat(lit(s"c${i}_"), col("c_name")).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    }.reduce(_ unionByName _).repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$destDir/customer.parquet")

    (0 until factor).map { i =>
      ord.select((col("o_orderkey") + lit(i * maxOrd)).as("o_orderkey"),
        (col("o_custkey") + lit(i * maxCust)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }.reduce(_ unionByName _).repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$destDir/orders.parquet")

    (0 until factor).map { i =>
      li.select((col("l_orderkey") + lit(i * maxOrd)).as("l_orderkey"),
        (col("l_partkey") + lit(i * maxPart)).as("l_partkey"),
        (col("l_suppkey") + lit(i * maxSupp)).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    }.reduce(_ unionByName _).repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$destDir/lineitem.parquet")

    // Events: per-copy user/event namespaces, SHARED timestamps — the
    // per-calendar-instant event volume grows with the factor (the same
    // stance as the fact tables), so session/transition/attribution
    // structure replicates per copy instead of densifying.
    val ev = Tables.load(spark, srcDir, "events")
    val maxEv = ev.agg(max(col("event_id"))).head().getLong(0) + 1
    val maxUser = ev.agg(max(col("user_id"))).head().getLong(0) + 1
    (0 until factor).map { i =>
      // ts must round-trip as RAW MICROS LONGS: Tables.load reads events.ts
      // with an explicit LongType schema (+ the magnitude CASE), so writing
      // the converted TimestampType here would produce a file every
      // Tables.load consumer fails to read (INT96/INT64-timestamp vs
      // bigint — caught in round 8 when scaled-events queries crashed).
      ev.select((col("event_id") + lit(i * maxEv)).as("event_id"),
        unix_micros(col("ts")).as("ts"),
        (col("user_id") + lit(i * maxUser)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _).repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$destDir/events.parquet")
    spark.stop()
  }
}
