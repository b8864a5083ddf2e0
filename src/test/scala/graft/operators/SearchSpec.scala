package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** [[Search]] — the E2 parameterized query-builder: filters must compose
  * exactly as the equivalent hand-written predicates, unset fields must
  * be true no-ops, validation must mirror the reference's request
  * validators, and every grouping period must produce its documented
  * string shape.
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val dir = SparkSpec.Sf0001
  private def cust = Tables.load(spark, dir, "customer")

  test("no params → every customer (filters are true no-ops)") {
    assert(Search.customers(spark, dir, SearchParams()).count() === cust.count())
  }

  test("segment filter ≡ direct predicate") {
    val got = Search.customers(spark, dir,
      SearchParams(mktSegment = Some("BUILDING"))).count()
    assert(got === cust.filter($"c_mktsegment" === "BUILDING").count())
    assert(got > 0)
  }

  test("balance range + nation compose as AND") {
    val p = SearchParams(nationName = Some("GERMANY"),
      minBal = Some(0.0), maxBal = Some(5000.0))
    val nat = Tables.load(spark, dir, "nation")
    val want = cust
      .join(nat, $"c_nationkey" === $"n_nationkey")
      .filter($"n_name" === "GERMANY" &&
              $"c_acctbal" >= 0.0 && $"c_acctbal" <= 5000.0)
      .count()
    assert(Search.customers(spark, dir, p).count() === want)
  }

  test("priority IN-list is a semi-join: no row multiplication, subset of base") {
    val p = SearchParams(orderPriorities = Some(Seq("1-URGENT")))
    val got = Search.customers(spark, dir, p)
    // semi-join keeps customer grain — distinct custkeys == row count
    assert(got.count() === got.select($"c_custkey").distinct().count())
    assert(got.count() <= cust.count())
    val want = cust.join(
      Tables.load(spark, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_custkey").distinct(),
      $"c_custkey" === $"o_custkey").count()
    assert(got.count() === want)
  }

  test("inverted balance range is rejected (reference validator semantics)") {
    intercept[IllegalArgumentException] {
      Search.customers(spark, dir,
        SearchParams(minBal = Some(100.0), maxBal = Some(50.0)))
    }
  }

  test("unknown grouping period is rejected") {
    intercept[IllegalArgumentException] {
      Search.encounterMetrics(spark, dir,
        MetricsParams("1996-01-01", "1997-01-01", groupBy = "decade"))
    }
    intercept[IllegalArgumentException] {
      Search.encounterMetrics(spark, dir,
        MetricsParams("1997-01-01", "1996-01-01"))
    }
  }

  test("demographics partitions the base set: each dim's counts sum to base size") {
    val p = SearchParams(minBal = Some(1000.0), maxBal = Some(8000.0))
    val base = Search.customers(spark, dir, p).count()
    val byDim = Search.demographics(spark, dir, p)
      .groupBy($"dim").agg(sum($"n").as("tot"))
      .as[(String, Long)].collect().toMap
    assert(byDim.keySet === Set("segment", "nation", "balance_band"))
    assert(byDim.values.forall(_ === base), s"$byDim vs base=$base")
  }

  private val periodShape = Map(
    "day" -> "\\d{4}-\\d{2}-\\d{2}",
    "week" -> "\\d{4}-\\d{2}-\\d{2}",
    "month" -> "\\d{4}-\\d{2}",
    "quarter" -> "\\d{4}-Q[1-4]")

  for ((g, re) <- periodShape) {
    test(s"metrics groupBy=$g: period shape, conserved totals") {
      val df = Search.encounterMetrics(spark, dir,
        MetricsParams("1996-01-01", "1997-01-01", groupBy = g))
      val rows = df.select($"period", $"n_encounters").as[(String, Long)].collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_._1.matches(re)), rows.take(3).mkString(","))
      // bucketing never drops or duplicates rows
      val total = Tables.load(spark, dir, "orders")
        .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1997-01-01")
        .count()
      assert(rows.map(_._2).sum === total)
    }
  }

  test("hostile param values are literals, never SQL (injection-proof by construction)") {
    // the reference's injection test is a placeholder ("in real
    // implementation, we'd use parameterized queries",
    // healthcare-tests.py:442-452); here params become Column literals
    // inside the plan — there is no string-SQL surface to inject into
    val p = SearchParams(
      mktSegment = Some("BUILDING'; DROP TABLE customer; --"),
      orderPriorities = Some(Seq("1-URGENT' OR '1'='1")))
    val got = Search.customers(spark, dir, p)
    assert(got.count() === 0) // matches nothing; parses nothing
    // and the tables are still there
    assert(cust.count() > 0)
  }

  test("optional status filter scopes the metrics") {
    def tot(st: Option[String]): Long =
      Search.encounterMetrics(spark, dir,
        MetricsParams("1996-01-01", "1997-01-01", orderStatus = st))
        .agg(sum($"n_encounters")).as[Long].head()
    assert(tot(Some("F")) < tot(None))
    assert(tot(Some("F")) > 0)
  }
}
