package graft.functions

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions.udaf

/** [[QualityAggregator]]: the one-pass profile must agree with q26's
  * two-pass composed-aggregate form, stay bounded, and be callable from
  * SQL once registered via functions.udaf (§2.9 UDAF surface).
  */
class QualityAggSpec extends SparkSpec {
  import spark.implicits._

  test("q67 one-pass ≡ q26 composed aggregates (same metrics)") {
    val one = SparkEntry.queries("q67_quality_onepass")(spark, SparkSpec.Sf0001)
      .collect()(0)
    val two = SparkEntry.queries("q26_quality_score")(spark, SparkSpec.Sf0001)
      .collect()(0)
    assert(one.getAs[Long]("n_rows") === two.getAs[Long]("n_rows"))
    assert(one.getAs[Double]("completeness") === two.getAs[Double]("completeness"))
    assert(one.getAs[Double]("validity") === two.getAs[Double]("validity"))
    assert(one.getAs[Double]("overall_quality") === two.getAs[Double]("overall_quality"))
  }

  test("metrics bounded in [0,1] and SQL-callable after udaf registration") {
    spark.udf.register("quality_profile",
      udaf(new QualityAggregator(5.0, 45.0)))
    Seq((10.0, 0.05, 0.02), (50.0, 0.0, 0.0), (20.0, 0.1, 0.08))
      .toDF("qty", "disc", "tax").createOrReplaceTempView("qa_fixture")
    val r = spark.sql(
      "SELECT quality_profile(qty, disc, tax) AS p FROM qa_fixture")
      .select($"p.n_rows", $"p.completeness", $"p.validity", $"p.overall_quality")
      .collect()(0)
    assert(r.getLong(0) === 3L)
    // completeness: qty 3/3, disc 2/3 (zero = missing), tax 2/3 → 7/9
    assert(r.getDouble(1) === 7.0 / 9.0)
    // validity: qty in [5,45] → 2 of 3
    assert(r.getDouble(2) === 2.0 / 3.0)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }
}
