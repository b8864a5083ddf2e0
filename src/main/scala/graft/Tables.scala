package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** IO layer: schema-declared loaders for the driver testdata tables
  * (TESTDATA.md / FIXTURES.md §2) and temp-view registration.
  *
  * Mirrors the reference's warehouse catalog (star schema DDL,
  * healthcare-sql-analytics.sql:10-139) re-expressed as explicit Spark
  * `StructType`s over Parquet — columnar at rest, schema-on-read never
  * inferred (SURVEY.md §1.3). Role mapping reference→testdata is
  * FIXTURES.md §3 (customer≈dim_patient, orders≈fact_encounters,
  * lineitem≈fact_lab_results, part/supplier≈dimensions, events≈feed).
  */
object Tables {

  /** Explicit schemas: production reads must never rely on inference.
    * These match the driver-generated parquet exactly; a drifting file
    * fails fast at analysis time instead of silently reading nulls.
    */
  val schemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType))),
    // events.ts is read as the raw INT64 under the parquet timestamp
    // annotation (NANOS generations are rejected by Spark's native
    // reader outright) and converted in load() with the row-adaptive
    // tsToMicrosExpr.
    "events" -> StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
  )

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast in joins at the tested
    * scale factors. NOT an invariant at every scale: at sf100+, `part`
    * (and eventually `customer`/`supplier`) outgrow any sane
    * `autoBroadcastJoinThreshold`, and a forced `broadcast()` hint
    * would OOM the driver instead of degrading. Queries therefore hint
    * through [[maybeBroadcast]], which a deployment can switch off
    * (`spark.graft.broadcastDims=false`) to let the planner size-decide
    * — the joins are all equi-joins, so the worst case is a shuffled
    * sort-merge join, never a nested-loop (`PlanSpec` pins this).
    */
  val broadcastable: Set[String] = Set("region", "nation", "supplier", "part")

  /** Conf switch for the dimension broadcast hints (default on). */
  val BroadcastDimsKey = "spark.graft.broadcastDims"

  /** Broadcast hint for a dimension side, honoring [[BroadcastDimsKey]].
    * With the switch off the join keys still make every call site a
    * shuffled equi-join under the planner's own size estimates — the
    * safe fallback for dims that outgrow the threshold at large SFs.
    */
  def maybeBroadcast(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get(BroadcastDimsKey, "true").toBoolean)
      org.apache.spark.sql.functions.broadcast(df)
    else df

  /** Raw-long events.ts → µs timestamp, ROW-adaptive to the unit.
    *
    * The testdata generator has shipped ts as both TIMESTAMP(NANOS)
    * and TIMESTAMP(MICROS) across generations; both are physical
    * INT64, so the loader always reads the raw long and picks the
    * divisor per VALUE by magnitude: any value ≥ 1e17 can only be
    * nanos (1e17 µs ≈ year 5138, 1e17 ns ≈ 1973), making the test
    * exact for any event timeline between 1973 and 5138. Per-row
    * (one codegen'd CASE on a long) rather than sniffed-per-path:
    * a path-level sniff breaks on an empty drop directory — the
    * normal from-scratch streaming case — by pinning the wrong unit
    * before any file arrives, and footer-type sniffing would
    * misclassify raw-long frames round-tripped through Spark (plain
    * INT64, no timestamp annotation). Nanos truncate sub-µs —
    * lossless for query semantics, all downstream bucketing is
    * ≥ second granularity.
    *
    * VALIDITY WINDOW: exact only for events between 1973-03 and 5138 —
    * a nanos value below 1e17 (pre-1973, incl. negative epochs) reads
    * as µs, silently ~1000× too small. [[TsUnitAuditKey]] turns the
    * window into a check: with `spark.graft.tsUnitAudit=true`, [[load]]
    * runs ONE aggregate over the raw longs and fails fast when a batch
    * mixes values on both sides of the threshold — the signature of
    * data outside the assumed range (a uniform batch is what every
    * shipped generator writes; a mixed one means sub-1973 nanos or
    * post-5138 µs are present and the per-row CASE is misreading
    * part of it). Off by default: the audit is an extra scan per
    * `load("events")`, and the driver testdata is in-window.
    */
  val tsToMicrosExpr: String =
    "timestamp_micros(CASE WHEN ts >= 100000000000000000 THEN ts div 1000 ELSE ts END)"

  /** The µs/ns decision threshold of [[tsToMicrosExpr]] (1e17). */
  val TsUnitThreshold: Long = 100000000000000000L

  /** Conf switch for the [[assertUniformTsUnit]] audit (default off). */
  val TsUnitAuditKey = "spark.graft.tsUnitAudit"

  /** Fail fast when `raw.ts` (raw longs) mixes magnitudes across the
    * [[TsUnitThreshold]] — evidence the timeline leaves the 1973–5138
    * window where the per-value unit test is exact. One map-side-
    * combined aggregate to a single row.
    */
  def assertUniformTsUnit(raw: DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    val r = raw.agg(
      sum(when(col("ts") >= TsUnitThreshold, 1L).otherwise(0L)).as("hi"),
      count(col("ts")).as("n")).head()
    val (hi, n) = (if (r.isNullAt(0)) 0L else r.getLong(0), r.getLong(1))
    if (hi != 0L && hi != n)
      throw new IllegalStateException(
        s"GRAFT_TS_UNIT: events.ts mixes magnitudes across 1e17 ($hi of $n " +
        "values read as nanos): the batch has timestamps outside the " +
        "1973–5138 window where the per-value µs/ns test is exact — fix " +
        "the producer's unit, or convert explicitly instead of Tables.load")
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")
    val df =
      if (name == "events") {
        if (spark.conf.get(TsUnitAuditKey, "false").toBoolean)
          assertUniformTsUnit(raw)
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr(tsToMicrosExpr))
      } else raw
    // Parallelism guard for the compute-heavy tables: the testdata
    // ships as one row group per file, so a scan arrives as ONE task
    // and every map-side stage runs single-threaded regardless of
    // session cores. For documents/embeddings — whose consumers run
    // per-row lambda/array work (shingling, higher-order functions,
    // vector math) costing far more than a narrow exchange — spreading
    // the scan unlocks full-width map stages. Relational facts are NOT
    // spread: their queries hit a Catalyst shuffle almost immediately,
    // so an extra exchange is pure overhead. Scale behavior: on a real
    // cluster a 100 TB scan has thousands of file splits, the guard is
    // false, and no exchange is added — this fires only when the scan
    // is under-split relative to the session.
    val parallelism = spark.sparkContext.defaultParallelism
    if (spread(name) && df.rdd.getNumPartitions * 2 < parallelism)
      df.repartition(parallelism)
    else df
  }

  /** Tables whose consumers do heavy per-row compute before any shuffle. */
  val spread: Set[String] = Set("documents", "embeddings")

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
