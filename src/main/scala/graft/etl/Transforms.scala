package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference ETL transforms (healthcare-data-pipeline-main.py:211-231
  * transform_patient_data): schema enforcement by derive/drop, domain
  * recode with default, all as declarative column expressions.
  */
object Transforms {

  /** Dict recode + default (reference :221-223: gender map + fillna).
    * Map-literal lookup + coalesce — a broadcast-free, codegen'd
    * expression.
    */
  def recode(c: Column, mapping: Map[String, String], default: String): Column =
    coalesce(element_at(typedLit(mapping), c), lit(default))

  val genderMap: Map[String, String] =
    Map("M" -> "Male", "F" -> "Female", "O" -> "Other")

  /** Privacy transform: birth_date → birth_year, date dropped
    * (reference :216-218).
    */
  def birthDateToYear(df: DataFrame, dateCol: String = "birth_date"): DataFrame =
    if (df.columns.contains(dateCol))
      df.withColumn("birth_year", year(col(dateCol))).drop(dateCol)
    else df

  /** Full patient transform mirroring the reference's sequence:
    * derive birth_year, recode gender, hash MRN, mask direct
    * identifiers.
    */
  def transformPatientData(df: DataFrame): DataFrame = {
    val withYear = birthDateToYear(df)
    val recoded =
      if (withYear.columns.contains("gender"))
        withYear.withColumn("gender", recode(col("gender"), genderMap, "Unknown"))
      else withYear
    Masking.maskSensitiveData(recoded,
      hashPattern = "(?i)^mrn$",
      maskPattern = Masking.defaultMaskPattern)
  }
}
