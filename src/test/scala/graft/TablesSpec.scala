package graft

class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("ts-unit audit: uniform batches pass, mixed magnitudes fail fast") {
    // ADVICE r5: a nanos timestamp below 1e17 (pre-1973) reads as µs
    // ~1000× too small with no error. The audit turns the documented
    // validity window into a check: uniform batches (what every
    // shipped generator writes) pass, mixed magnitudes — the signature
    // of out-of-window data — raise a named error.
    Tables.assertUniformTsUnit(
      Seq(1700000000000000L, 1710000000000000L).toDF("ts")) // µs, ~2023
    Tables.assertUniformTsUnit(
      Seq(1700000000000000000L, 1710000000000000000L).toDF("ts")) // ns
    Tables.assertUniformTsUnit(Seq.empty[Long].toDF("ts")) // empty drop dir
    val ex = intercept[IllegalStateException] {
      Tables.assertUniformTsUnit(
        Seq(1700000000000000L, 1710000000000000000L).toDF("ts"))
    }
    assert(ex.getMessage.contains("GRAFT_TS_UNIT"))
  }

  test("load runs the audit only under the conf switch; driver data passes it") {
    spark.conf.set(Tables.TsUnitAuditKey, "true")
    try assert(Tables.load(spark, SparkSpec.Sf0001, "events").count() > 0)
    finally spark.conf.unset(Tables.TsUnitAuditKey)
  }
}
