package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII protection transforms (reference: SecurityManager + ETL masking,
  * healthcare-data-pipeline-main.py:44-54 hash_pii, :182-197
  * mask_sensitive_data). Column classification is regex-driven on
  * column NAMES (planner-side plain Scala over df.columns — zero
  * runtime cost); the per-value transforms are codegen'd builtins
  * (sha2, when) — no UDFs in the data path.
  */
object Masking {

  /** The reference's literal mask token (healthcare-data-pipeline-main.py:195). */
  val MaskToken = "***MASKED***"

  /** Column-name patterns → action. The reference classifies ssn/phone/
    * email for literal masking (:184-188) and MRN for SHA-256 hashing
    * (:193, :616).
    */
  val defaultHashPattern = "(?i).*(mrn|medical_record|c_name).*"
  val defaultMaskPattern = "(?i).*(ssn|social|phone|email|address).*"

  /** SHA-256 hash of a PII column — bit-exact with the reference's
    * hashlib.sha256(...).hexdigest() (64 lowercase hex chars).
    */
  def hashPii(c: Column): Column = sha2(c.cast("string"), 256)

  /** Literal mask preserving NULLs (the reference's
    * `lambda x: mask if pd.notna(x) else x`, :195).
    */
  def maskValue(c: Column): Column =
    when(c.isNotNull, lit(MaskToken))

  /** Apply classification + transform across a whole frame. */
  def maskSensitiveData(
      df: DataFrame,
      hashPattern: String = defaultHashPattern,
      maskPattern: String = defaultMaskPattern): DataFrame =
    df.columns.foldLeft(df) { (d, name) =>
      if (name.matches(hashPattern)) d.withColumn(name, hashPii(col(name)))
      else if (name.matches(maskPattern)) d.withColumn(name, maskValue(col(name)))
      else d
    }
}
