package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The library's SparkSessionExtensions entry point: a session built
  * with `withExtensions(new GraftExtensions)` can call the native
  * expressions from SQL with no per-session registration.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("cosine_sim is injected and computes over array<float> in SQL") {
    val base = SparkSpec.spark // ensure a SparkContext exists
    // Extensions bind at session build time, so build a fresh session;
    // getOrCreate reuses the running SparkContext, keeping this cheap.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = s.sql(
        """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c1,
          |       cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                  array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c0
          |""".stripMargin).collect()(0)
      assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(row.getDouble(1)) < 1e-12)
      val dp = s.sql(
        """SELECT dot_product(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                   array(CAST(2.0 AS DOUBLE), CAST(0.5 AS DOUBLE))) AS d
          |""".stripMargin).collect()(0)
      assert(math.abs(dp.getDouble(0) - 4.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
