package graft.text

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Receipts for q119 (per-source quantile normalization): the
  * DistributedRank form is pinned against the natural window-function
  * formulation, and the calibration guarantee — every source's
  * selected share is the same closed-form quota, independent of its
  * score distribution — is asserted directly.
  */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, SparkSpec.Sf0001, "documents")

  test("q119 matches the window-function formulation") {
    val d = docs.select($"doc_id", $"source",
      size(split(coalesce($"text", lit("")), " ")).cast("long").as("score"))
    val r = d
      .withColumn("rn", row_number().over(
        Window.partitionBy($"source").orderBy($"score".desc, $"doc_id".asc)))
      .withColumn("n_s", count(lit(1)).over(Window.partitionBy($"source")))
      .withColumn("grn", row_number().over(
        Window.orderBy($"score".desc, $"doc_id".asc)))
      .withColumn("n_tot", count(lit(1)).over(
        Window.partitionBy()))
      .withColumn("pct_q", expr(
        "CASE WHEN n_s > 1 THEN (rn - 1) * 1000000L div (n_s - 1) ELSE 0L END"))
      .withColumn("gpct_q", expr(
        "CASE WHEN n_tot > 1 THEN (grn - 1) * 1000000L div (n_tot - 1) ELSE 0L END"))
    val want = r.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        count_if($"pct_q" <= 100000).as("n_cal_selected"),
        count_if($"gpct_q" <= 100000).as("n_raw_selected"),
        min(when($"pct_q" <= 100000, $"score")).as("cal_cut_score"),
        sum(when($"pct_q" <= 100000, $"doc_id")).as("cal_doc_checksum"))
      .orderBy($"source")
      .collect().map(_.toSeq).toSeq
    val got = SparkEntry.queries("q119_quantile_normalize")(spark, SparkSpec.Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("q119 calibrated share is the closed-form quota for every source") {
    // ranks selected per source: #{r : (r-1)*1e6 div (n_s-1) <= 1e5}
    // = floor(100000*(n_s-1)/1e6) + 1 — a pure function of n_s, which
    // is the calibration claim (share independent of the score profile)
    val out = SparkEntry.queries("q119_quantile_normalize")(spark, SparkSpec.Sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nS = r.getLong(r.fieldIndex("n_docs"))
      val nCal = r.getLong(r.fieldIndex("n_cal_selected"))
      val quota = if (nS > 1) 100000L * (nS - 1) / 1000000L + 1 else 1L
      assert(nCal === quota, s"source ${r.getString(0)}: n_s=$nS")
    }
  }
}
