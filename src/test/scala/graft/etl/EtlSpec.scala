package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ETL-library semantics mirroring the reference's own unit assertions
  * (healthcare-tests.py: masking :127-140, transform :165-204, quality
  * :180-190, anomalies :207-225).
  */
class EtlSpec extends SparkSpec {

  import spark.implicits._

  test("masking: literal mask preserves NULLs, hash is 64 lowercase hex") {
    val df = Seq(
      (1L, "MRN0001", "123-45-6789"),
      (2L, "MRN0002", null: String)
    ).toDF("id", "mrn", "ssn")
    val masked = Masking.maskSensitiveData(df,
      hashPattern = "(?i)^mrn$", maskPattern = Masking.defaultMaskPattern)
    val rows = masked.orderBy($"id").collect()
    assert(rows(0).getString(1).matches("[0-9a-f]{64}"))
    assert(rows(0).getString(2) == Masking.MaskToken)
    assert(rows(1).isNullAt(2), "NULL must stay NULL through masking")
  }

  test("masking: sha2 matches the reference's hashlib.sha256 hexdigest") {
    // echo -n MRN0001 | sha256sum — bit-exact cross-engine contract
    val got = Seq("MRN0001").toDF("mrn")
      .select(Masking.hashPii($"mrn")).as[String].head()
    assert(got == "375a4677da3e96a3ea9f12cca7ae2651421bd77549c9b0a1c88d0259d8482ae1")
  }

  test("masking is idempotent on the mask token") {
    val df = Seq((1L, "x@y.com")).toDF("id", "email")
    val once = Masking.maskSensitiveData(df)
    val twice = Masking.maskSensitiveData(once)
    assert(once.collect().sameElements(twice.collect()))
  }

  test("transform: birth_date → birth_year, gender recode with Unknown default") {
    val df = Seq(
      ("1980-05-01", "M"), ("1990-06-02", "F"), ("2000-07-03", "X")
    ).toDF("birth_date", "gender")
      .withColumn("birth_date", $"birth_date".cast("date"))
    val out = Transforms.transformPatientData(df)
    assert(!out.columns.contains("birth_date"))
    assert(out.columns.contains("birth_year"))
    val got = out.select($"birth_year", $"gender").orderBy($"birth_year").collect()
    assert(got.map(_.getInt(0)).sameElements(Array(1980, 1990, 2000)))
    assert(got.map(_.getString(1)).sameElements(Array("Male", "Female", "Unknown")))
  }

  test("quality score: clean frame scores 1.0, nulls lower completeness") {
    val clean = Seq((1L, 10.0), (2L, 11.0), (3L, 12.0), (4L, 13.0))
      .toDF("id", "v")
    val r = QualityScore.score(clean)
    assert(r.completeness == 1.0 && r.overall >= 0.99)

    val dirty = Seq((1L, Some(10.0)), (2L, None), (3L, Some(12.0)), (4L, None))
      .toDF("id", "v")
    val d = QualityScore.score(dirty)
    assert(d.completeness == 0.75) // 6 of 8 cells filled
    assert(d.overall < r.overall)
    assert(d.overall >= 0.0 && d.overall <= 1.0)
  }

  test("anomaly detection finds the planted outlier (reference :207-225)") {
    val df = (Seq.fill(50)(100.0) :+ 10000.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "charges")
    val got = Pipeline.detectAnomalies(df, "charges").collect()
    assert(got.length == 1 && got(0).getDouble(1) == 10000.0)
  }
}
