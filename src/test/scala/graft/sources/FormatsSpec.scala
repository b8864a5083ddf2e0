package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S2/S4/S5 ingestion + sink surface ([[Formats]]): schema'd csv/json
  * round-trips, malformed-row quarantine, and the partitioned parquet
  * warehouse layout.
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val orders = Tables.load(spark, SparkSpec.Sf0001, "orders")

  test("csv round-trip preserves schema and rows under declared schema") {
    val dir = tmp("graft-csv")
    orders.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(s"$dir/orders")
    val back = Formats.readCsv(spark, s"$dir/orders",
      Tables.schemas("orders"))
    assert(back.schema === Tables.schemas("orders"))
    assert(back.count() === orders.count())
    // value-level check on an aggregate (cheap, order-insensitive)
    val a = orders.agg(sum($"o_orderkey"), max($"o_orderdate")).collect()(0)
    val b = back.agg(sum($"o_orderkey"), max($"o_orderdate")).collect()(0)
    assert(a === b)
  }

  test("orc round-trip preserves schema and rows under declared schema") {
    val dir = tmp("graft-orc")
    Formats.writeOrc(orders, s"$dir/orders")
    val back = Formats.readOrc(spark, s"$dir/orders", Tables.schemas("orders"))
    assert(back.schema === Tables.schemas("orders"))
    assert(back.count() === orders.count())
    val a = orders.agg(sum($"o_orderkey"), max($"o_orderdate")).collect()(0)
    val b = back.agg(sum($"o_orderkey"), max($"o_orderdate")).collect()(0)
    assert(a === b)
  }

  test("json round-trip preserves schema and rows under declared schema") {
    val dir = tmp("graft-json")
    orders.write.mode("overwrite").json(s"$dir/orders")
    val back = Formats.readJson(spark, s"$dir/orders",
      Tables.schemas("orders"))
    assert(back.schema === Tables.schemas("orders"))
    assert(back.count() === orders.count())
    val a = orders.agg(sum($"o_custkey"), avg($"o_totalprice")).collect()(0)
    val b = back.agg(sum($"o_custkey"), avg($"o_totalprice")).collect()(0)
    assert(a === b)
  }

  test("permissive csv quarantines malformed rows, failFast throws") {
    val dir = tmp("graft-badcsv")
    Files.writeString(java.nio.file.Path.of(dir, "part.csv"),
      "o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,o_orderpriority\n" +
      "1,10,O,99.5,2024-01-01 00:00:00,1-URGENT\n" +
      "not-a-number,10,O,oops,2024-01-01 00:00:00,1-URGENT\n")
    val lax = Formats.readCsv(spark, dir, Tables.schemas("orders"),
      failFast = false).cache()
    assert(lax.count() === 2)
    assert(lax.filter(col(Formats.CorruptCol).isNotNull).count() === 1)
    assert(lax.filter(col(Formats.CorruptCol).isNull)
      .select($"o_orderkey").as[Long].collect().toSeq === Seq(1L))
    // count() alone skips field parsing on CSV — force a column read
    intercept[Exception] {
      Formats.readCsv(spark, dir, Tables.schemas("orders"))
        .agg(sum($"o_totalprice")).collect()
    }
  }

  test("permissive json quarantines malformed rows") {
    val dir = tmp("graft-badjson")
    Files.writeString(java.nio.file.Path.of(dir, "part.json"),
      """{"o_orderkey": 1, "o_custkey": 10, "o_orderstatus": "O"}""" + "\n" +
      """{"o_orderkey": "zzz", "o_custkey": {}}""" + "\n" +
      "{broken\n")
    val lax = Formats.readJson(spark, dir, Tables.schemas("orders"),
      failFast = false).cache()
    assert(lax.count() === 3)
    assert(lax.filter(col(Formats.CorruptCol).isNotNull).count() === 2)
  }

  test("xml reads records by rowTag under declared schema; permissive quarantines") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-xml").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/feed.xml"),
      """<records>
        |  <rec><id>1</id><name>alice</name><score>93.5</score></rec>
        |  <rec><id>2</id><name>bob</name><score>81.25</score></rec>
        |</records>""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = Formats.readXml(spark, s"$dir/feed.xml", schema, rowTag = "rec")
    val rows = df.orderBy("id").collect()
    assert(rows.length === 2)
    assert(rows(0).getLong(0) === 1L)
    assert(rows(0).getString(1) === "alice")
    assert(rows(1).getDouble(2) === 81.25)
    // malformed value: permissive captures the record, failFast throws
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/feed.xml"),
      """<records>
        |  <rec><id>1</id><name>ok</name><score>1.0</score></rec>
        |  <rec><id>oops</id><name>bad</name><score>2.0</score></rec>
        |</records>""".stripMargin)
    val perm = Formats.readXml(spark, s"$dir/feed.xml", schema, rowTag = "rec",
      failFast = false).cache() // corrupt-col-only queries require a parsed cache
    assert(perm.count() === 2)
    assert(perm.filter(perm(Formats.CorruptCol).isNotNull).count() === 1)
    intercept[Exception] {
      Formats.readXml(spark, s"$dir/feed.xml", schema, rowTag = "rec").collect()
    }
  }

  test("partitioned parquet sink prunes partitions on read") {
    val dir = tmp("graft-warehouse")
    val withYear = orders.withColumn("o_year", year($"o_orderdate"))
    Formats.writeParquetPartitioned(withYear, s"$dir/orders",
      partitionCols = Seq("o_year"), sortWithin = Seq("o_custkey"))
    val back = spark.read.parquet(s"$dir/orders")
    assert(back.count() === orders.count())
    // partition pruning: the filtered scan must read only matching rows
    val y = back.filter($"o_year" === 1995)
    val expected = withYear.filter($"o_year" === 1995).count()
    assert(y.count() === expected && expected > 0)
    // pruned plan reads a subset of partition directories
    val scanned = y.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanned.contains("PartitionFilters"))
  }
}
