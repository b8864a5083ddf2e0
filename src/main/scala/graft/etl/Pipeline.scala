package graft.etl

import graft.functions.DetRand
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end pipeline orchestration mirroring the reference's E1 entry
  * point (run_pipeline, healthcare-data-pipeline-main.py:507-546:
  * generate → transform → load → analyze → report), re-expressed as
  * DataFrame stages.
  *
  * Scale contrast with the reference: its load is row-at-a-time ORM
  * `session.merge` (:606-670 — the scalability cliff SURVEY.md §3 E1
  * names), its analysis a SQL string shipped to an external DB. Here
  * every stage is a declarative plan over the same SparkSession —
  * generation is O(rows/partition) with no driver materialization,
  * the load is a parallel columnar parquet write, and the RCA runs as
  * one window pass (no self-join; see CoreQueries.q01 scale note).
  */
object Pipeline {

  final case class PipelineResult(
      patients: Long, encounters: Long, labs: Long,
      quality: QualityScore.QualityReport,
      reportPath: String)

  /** Deterministic synthetic patients (S3, reference :548-563: seeded
    * gender categorical, ages, charges ~ Gamma(2, 2000)). Scales by
    * spark.range partitioning; every column is a pure function of the
    * row id (DetRand), so regenerate-anywhere reproducibility holds.
    */
  def generatePatients(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(1, n + 1).toDF("patient_id")
      .withColumn("mrn", concat(lit("MRN"), format_string("%08d", $"patient_id")))
      .withColumn("ssn",
        format_string("%03d-%02d-%04d",
          (DetRand.u($"patient_id", 11) * 899 + 100).cast("int"),
          (DetRand.u($"patient_id", 12) * 99 + 1).cast("int"),
          (DetRand.u($"patient_id", 13) * 9999 + 1).cast("int")))
      .withColumn("gender",
        when(DetRand.u($"patient_id", 1) < 0.49, "M")
          .when(DetRand.u($"patient_id", 1) < 0.98, "F")
          .otherwise("O"))
      .withColumn("birth_date",
        date_add(lit("1930-01-01").cast("date"),
          (DetRand.u($"patient_id", 2) * 25000).cast("int")))
      .withColumn("race",
        when(DetRand.u($"patient_id", 3) < 0.6, "White")
          .when(DetRand.u($"patient_id", 3) < 0.78, "Black")
          .when(DetRand.u($"patient_id", 3) < 0.9, "Hispanic")
          .when(DetRand.u($"patient_id", 3) < 0.97, "Asian")
          .otherwise("Other"))
  }

  /** Deterministic encounters: ~ratio encounters per patient (reference
    * demo scale 1000 patients / 5000 encounters, :553,:565), Poisson(3)
    * length of stay (:577), Gamma(2, 2000) charges (:588), dates spread
    * over 1992-1998 (the testdata's date envelope).
    */
  def generateEncounters(spark: SparkSession, nPatients: Long, perPatient: Int = 5): DataFrame = {
    import spark.implicits._
    spark.range(1, nPatients * perPatient + 1).toDF("encounter_id")
      .withColumn("patient_id", (($"encounter_id" - 1) % nPatients) + 1)
      .withColumn("encounter_date",
        date_add(lit("1992-01-01").cast("date"),
          (DetRand.u($"encounter_id", 21) * 2500).cast("int")))
      .withColumn("encounter_type",
        when(DetRand.u($"encounter_id", 22) < 0.45, "Outpatient")
          .when(DetRand.u($"encounter_id", 22) < 0.75, "Inpatient")
          .when(DetRand.u($"encounter_id", 22) < 0.92, "Emergency")
          .otherwise("Observation"))
      .withColumn("length_of_stay",
        DetRand.poisson3(DetRand.u($"encounter_id", 23)).cast("int"))
      .withColumn("total_charges",
        round(DetRand.gamma2(2000.0,
          DetRand.u($"encounter_id", 24), DetRand.u($"encounter_id", 25)), 2))
      .withColumn("discharge_date", expr("date_add(encounter_date, length_of_stay)"))
  }

  /** Deterministic lab results: ~2 per encounter (reference :586),
    * values ~N-ish via sum of uniforms, abnormal flags on the tails.
    */
  def generateLabs(spark: SparkSession, nEncounters: Long, perEncounter: Int = 2): DataFrame = {
    import spark.implicits._
    spark.range(1, nEncounters * perEncounter + 1).toDF("lab_id")
      .withColumn("encounter_id", (($"lab_id" - 1) % nEncounters) + 1)
      .withColumn("test_code",
        when(DetRand.u($"lab_id", 31) < 0.3, "GLU")
          .when(DetRand.u($"lab_id", 31) < 0.55, "HGB")
          .when(DetRand.u($"lab_id", 31) < 0.8, "WBC")
          .otherwise("A1C"))
      .withColumn("value", round(
        lit(50.0) + (DetRand.u($"lab_id", 32) + DetRand.u($"lab_id", 33)
          + DetRand.u($"lab_id", 34)) * 50.0, 3))
      .withColumn("abnormal_flag",
        when($"value" > 180.0, "HH").when($"value" > 150.0, "H")
          .when($"value" < 60.0, "LL").when($"value" < 75.0, "L")
          .otherwise("N"))
  }

  /** RCA: 30-day readmission rates by encounter type — the reference's
    * analyze_readmissions (:267-317), decorrelated to ONE window pass
    * (same plan shape as CoreQueries.q01; no fact×fact join).
    */
  def analyzeReadmissions(encounters: DataFrame): DataFrame = {
    val byPatient = Window.partitionBy(col("patient_id"))
      .orderBy(col("encounter_date"), col("encounter_id"))
    val sameDay = Window.partitionBy(col("patient_id"), col("encounter_date"))
    encounters
      .withColumn("next_dt", lead(col("encounter_date"), 1).over(byPatient))
      .withColumn("same_day_n", count(lit(1)).over(sameDay))
      .withColumn("readmit",
        (col("same_day_n") > 1) ||
        (col("next_dt").isNotNull &&
         col("next_dt") <= expr("date_add(discharge_date, 30)")))
      .groupBy(col("encounter_type"))
      .agg(
        count(lit(1)).as("encounters"),
        sum(when(col("readmit"), 1L).otherwise(0L)).as("readmissions"),
        (sum(when(col("readmit"), 1L).otherwise(0L)) * 100.0 / count(lit(1)))
          .as("readmission_rate"))
      .filter(col("encounters") >= 10)
      .orderBy(desc("readmission_rate"))
  }

  /** Anomaly scan (reference _detect_anomalies :319-338): z-score > 2.5σ
    * rows per numeric metric. Stats via one agg, joined back broadcast —
    * never a driver-side loop.
    */
  def detectAnomalies(df: DataFrame, column: String, z: Double = 2.5): DataFrame = {
    val stats = df.agg(
      avg(col(column)).as("mu"), stddev(col(column)).as("sigma"))
    df.crossJoin(broadcast(stats))
      .filter(abs(col(column) - col("mu")) > lit(z) * col("sigma"))
      .drop("mu", "sigma")
  }

  /** Full E1 run: generate → transform (privacy + recode + quality gate)
    * → load (columnar full-refresh, S4's batch equivalent) → analyze →
    * report (JSON sink, S5). Returns row counts + quality for callers.
    */
  def run(spark: SparkSession, outDir: String, nPatients: Long = 1000): PipelineResult = {
    val rawPatients = generatePatients(spark, nPatients)
    val patients = Transforms.transformPatientData(rawPatients)
    val quality = QualityScore.score(rawPatients.drop("mrn", "ssn"))

    val encounters = generateEncounters(spark, nPatients)
    val labs = generateLabs(spark, nPatients * 5)

    // Load: parallel columnar write. A first run is a plain overwrite;
    // a re-run over an existing warehouse is a true key-based upsert
    // ([[graft.operators.Upsert.mergeByKey]] — the distributed
    // equivalent of the reference's row-at-a-time session.merge,
    // SURVEY.md §2.1 S4): same-key rows take the new version, unknown
    // keys append, untouched history survives.
    def load(df: DataFrame, table: String, key: String): Unit = {
      val path = s"$outDir/$table"
      val merged =
        if (new java.io.File(path).exists()) {
          val base = spark.read.parquet(path)
          graft.operators.Upsert.mergeByKey(base, df, Seq(key))
            .localCheckpoint() // materialize before overwriting the input
        } else df
      merged.write.mode("overwrite").parquet(path)
    }
    load(patients, "dim_patient", "patient_id")
    load(encounters, "fact_encounters", "encounter_id")
    load(labs, "fact_lab_results", "lab_id")

    val enc = spark.read.parquet(s"$outDir/fact_encounters")
    val rca = analyzeReadmissions(enc).collect()
    val anomalies = detectAnomalies(enc, "total_charges").count()

    val reportPath = s"$outDir/report.json"
    val rcaJson = rca.map { r =>
      s"""{"encounter_type":"${r.getString(0)}","encounters":${r.getLong(1)},""" +
      s""""readmissions":${r.getLong(2)},"readmission_rate":${r.getDouble(3)}}"""
    }.mkString("[", ",", "]")
    val report =
      s"""{"patients":$nPatients,"encounters":${nPatients * 5},""" +
      s""""labs":${nPatients * 10},"quality_overall":${quality.overall},""" +
      s""""charge_anomalies":$anomalies,"readmission_analysis":$rcaJson}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(reportPath), report)

    PipelineResult(nPatients, nPatients * 5, nPatients * 10, quality, reportPath)
  }
}
