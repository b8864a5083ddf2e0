package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** End-to-end E1 orchestration: generate → transform → load → analyze →
  * report, on a small deterministic scale (reference demo ratios
  * 1000/5000/10000, healthcare-data-pipeline-main.py:553,565,586).
  */
class PipelineSpec extends SparkSpec {

  test("pipeline run writes warehouse tables + report and gates quality") {
    val out = Files.createTempDirectory("graft-pipeline").toString
    val r = Pipeline.run(spark, out, nPatients = 200)

    assert(r.patients == 200 && r.encounters == 1000 && r.labs == 2000)
    assert(r.quality.overall > 0.9, s"quality gate: ${r.quality}")

    val patients = spark.read.parquet(s"$out/dim_patient")
    assert(patients.count() == 200)
    // Privacy transforms applied: birth_date dropped, mrn hashed, ssn masked.
    assert(!patients.columns.contains("birth_date"))
    assert(patients.columns.contains("birth_year"))
    val p0 = patients.orderBy("patient_id").collect()(0)
    assert(p0.getAs[String]("mrn").matches("[0-9a-f]{64}"))
    assert(p0.getAs[String]("ssn") == Masking.MaskToken)
    assert(Set("Male", "Female", "Other")
      .contains(p0.getAs[String]("gender")))

    assert(spark.read.parquet(s"$out/fact_encounters").count() == 1000)
    assert(spark.read.parquet(s"$out/fact_lab_results").count() == 2000)

    val report = Files.readString(java.nio.file.Paths.get(r.reportPath))
    assert(report.contains("\"patients\":200"))
    assert(report.contains("readmission_analysis"))
  }

  test("re-run upserts the warehouse: overlapping keys replaced, new appended") {
    val out = Files.createTempDirectory("graft-pipeline-upsert").toString
    Pipeline.run(spark, out, nPatients = 100)
    Pipeline.run(spark, out, nPatients = 150) // keys 1..100 overlap, 101..150 new
    val patients = spark.read.parquet(s"$out/dim_patient")
    assert(patients.count() == 150)
    assert(patients.select("patient_id").distinct().count() == 150)
    assert(spark.read.parquet(s"$out/fact_encounters").count() == 750)
  }

  test("generation is deterministic: same ids ⇒ same rows, any partitioning") {
    val a = Pipeline.generateEncounters(spark, 100).repartition(7)
      .orderBy("encounter_id").collect()
    val b = Pipeline.generateEncounters(spark, 100).repartition(3)
      .orderBy("encounter_id").collect()
    assert(a.sameElements(b))
  }

  test("readmission RCA matches a brute-force self-join oracle") {
    import spark.implicits._
    val enc = Pipeline.generateEncounters(spark, 50)
    val fast = Pipeline.analyzeReadmissions(enc)
      .select("encounter_type", "encounters", "readmissions").collect()

    // Naive O(n²) EXISTS self-join — the reference's own formulation
    // (healthcare-sql-analytics.sql:164-171); must agree with the
    // window-based plan exactly.
    enc.createOrReplaceTempView("enc_oracle")
    val slow = spark.sql(
      """WITH flagged AS (
        |  SELECT e1.encounter_type,
        |         EXISTS(SELECT 1 FROM enc_oracle e2
        |                WHERE e2.patient_id = e1.patient_id
        |                  AND e2.encounter_id <> e1.encounter_id
        |                  AND e2.encounter_date BETWEEN e1.encounter_date
        |                      AND date_add(e1.discharge_date, 30)
        |                  AND e2.encounter_date >= e1.encounter_date) AS readmit
        |  FROM enc_oracle e1)
        |SELECT encounter_type, COUNT(*) AS encounters,
        |       SUM(CASE WHEN readmit THEN 1 ELSE 0 END) AS readmissions
        |FROM flagged GROUP BY encounter_type HAVING COUNT(*) >= 10
        |""".stripMargin)
      .select("encounter_type", "encounters", "readmissions").collect()

    val key = (r: org.apache.spark.sql.Row) => r.getString(0)
    assert(fast.map(key).toSet == slow.map(key).toSet)
    val slowMap = slow.map(r => key(r) -> (r.getLong(1), r.getLong(2))).toMap
    fast.foreach { r =>
      assert(slowMap(key(r)) == ((r.getLong(1), r.getLong(2))),
        s"mismatch for ${key(r)}")
    }
  }
}
