package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Encoding-noise detection — the ONE definition shared by the q125
  * audit and the [[graft.etl.CurationPipeline]] noise gate.
  *
  * Two patterns, each alternation-free (so leftmost-match semantics
  * cannot differ between regex engines):
  *
  *  - [[SuspectClass]]: C0 controls minus tab/newline/CR (binary junk
  *    in a "text" column), C1 controls, and U+FFFD (a decoder already
  *    gave up upstream).
  *  - [[MojibakePair]]: a two-byte-UTF-8 LEAD char (U+00C2–U+00DF —
  *    covering Latin, Greek, Cyrillic, Hebrew, Arabic mojibake, not
  *    just the Ã/Â of Latin-1 supplement) immediately followed by a
  *    TRAIL-range char (U+0080–U+00BF). Matching the PAIR, not the
  *    bare lead, is what keeps legitimate Latin-1 text clean: German
  *    "Übung" (Ü = U+00DC, a lead char) is followed by 'b' — no
  *    match; mojibake "Ã©" (C3 A9) matches. A C1-control trail is
  *    counted by both patterns — suspicious twice over, and a noise
  *    SCORE may say so.
  */
object EncodingNoise {

  val SuspectClass: String =
    "[\\u0000-\\u0008\\u000B\\u000C\\u000E-\\u001F\\u0080-\\u009F\\uFFFD]"

  val MojibakePair: String =
    "[\\u00C2-\\u00DF][\\u0080-\\u00BF]"

  /** Suspect-character count of a text column (two codegen'd
    * regexp_counts; null-safe).
    */
  def artifactCount(text: Column): Column = {
    val t = coalesce(text, lit(""))
    (regexp_count(t, lit(SuspectClass)) +
      regexp_count(t, lit(MojibakePair))).cast("long")
  }

  /** Schema-preserving gate: keep docs whose artifact density is at
    * most `maxPerMcharQ` parts per million as an EXACT RATIONAL bound
    * — a·10⁶ ≤ m·len, no floor quantization, so `maxPerMcharQ = 0`
    * keeps exactly the artifact-free docs at ANY length (a floored
    * per-million quotient would let a >1 Mchar doc smuggle
    * ⌊len/10⁶⌋ artifacts through a zero threshold). An empty doc has
    * density 0 and passes.
    */
  def passing(docs: DataFrame, maxPerMcharQ: Long): DataFrame =
    docs.filter(
      artifactCount(col("text")) * lit(1000000L) <=
        lit(maxPerMcharQ) *
          length(coalesce(col("text"), lit(""))).cast("long"))
}
