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
  *  - [[MojibakePair]]: a UTF-8 LEAD char (U+00C2–U+00F4 — every
  *    valid 2-byte lead C2–DF, 3-byte lead E0–EF, and 4-byte lead
  *    F0–F4, so Latin, Greek, Cyrillic, Hebrew, Arabic, CJK, curly-
  *    quote and emoji mojibake all count; C0/C1 and F5+ are not valid
  *    UTF-8 leads) immediately followed by a TRAIL-range char
  *    (U+0080–U+00BF). Matching the PAIR, not the bare lead, is what
  *    keeps legitimate Latin-1 text clean: German "Übung" (Ü =
  *    U+00DC, a lead char) is followed by 'b' — no match; French
  *    "découpé" (é = U+00E9, now in the lead class) is followed by
  *    'c' — no match; mojibake "Ã©" (C3 A9) and "â€™" (E2 80 99, a
  *    curly quote read as Latin-1) match. A C1-control trail is
  *    counted by both patterns — suspicious twice over, and a noise
  *    SCORE may say so. SCOPE: this catches strict-Latin-1 misdecodes;
  *    cp1252 misdecodes map trail bytes 0x80–0x9F to U+20AC/U+2122/…
  *    (outside the trail class) and are only partially caught — via
  *    trail bytes 0xA0–0xBF, which cp1252 and Latin-1 share.
  */
object EncodingNoise {

  val SuspectClass: String =
    "[\\u0000-\\u0008\\u000B\\u000C\\u000E-\\u001F\\u0080-\\u009F\\uFFFD]"

  val MojibakePair: String =
    "[\\u00C2-\\u00F4][\\u0080-\\u00BF]"

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
