package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Encoding-noise detection — the ONE definition shared by the q125
  * audit and the [[graft.etl.CurationPipeline]] noise gate.
  *
  * The suspect-character class: C0 controls minus tab/newline/CR
  * (binary junk in a "text" column), C1 controls and the Ã/Â lead
  * chars (every two-byte UTF-8 sequence mis-decoded as Latin-1 lands
  * on one of them), and U+FFFD (a decoder already gave up upstream).
  * A single character class — no alternation — so leftmost-match
  * semantics cannot differ between regex engines.
  */
object EncodingNoise {

  val SuspectClass: String =
    "[\\u0000-\\u0008\\u000B\\u000C\\u000E-\\u001F\\u0080-\\u009F\\u00C2\\u00C3\\uFFFD]"

  /** Suspect-character count of a text column (codegen'd regexp_count;
    * null-safe).
    */
  def artifactCount(text: Column): Column =
    regexp_count(coalesce(text, lit("")), lit(SuspectClass)).cast("long")

  /** Schema-preserving gate: keep docs whose artifact density stays at
    * or under `maxPerMcharQ` artifacts per million chars (exact
    * integer, the q125 quotient; an empty doc has density 0 and
    * passes). `maxPerMcharQ = 0` keeps only artifact-free docs.
    */
  def passing(docs: DataFrame, maxPerMcharQ: Long): DataFrame =
    // floor(a·10⁶ / b) ≤ m  ⟺  a·10⁶ < (m+1)·b — exact integers, no
    // division in the filter
    docs.filter(
      artifactCount(col("text")) * lit(1000000L) <
        lit(maxPerMcharQ + 1) *
          greatest(length(coalesce(col("text"), lit(""))).cast("long"), lit(1L)))
}
