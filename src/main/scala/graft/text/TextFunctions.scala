package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization library for the text operators. Two tiers:
  *
  *  - [[wsTokens]]: whitespace split — what the word-soup corpus needs
  *    and what every q4x query uses (single-space separated).
  *  - [[bpeTokens]]: a BPE-ish pre-tokenizer for real corpora — splits
  *    into letter runs, digit runs, and single punctuation marks (the
  *    classic GPT-2-style pre-tokenization classes, minus byte-level
  *    merges which need a learned vocabulary). Engine-portable: the
  *    same pattern works in Spark (Java regex) and DuckDB (RE2), which
  *    the q55 oracle exploits.
  *
  * Both are pure Column expressions — codegen'd, no UDFs.
  */
object TextFunctions {

  /** Whitespace tokenizer (splits on runs of whitespace). */
  def wsTokens(text: Column): Column = split(text, "\\s+")

  /** BPE-ish pre-tokenizer pattern: letter runs | digit runs | a single
    * non-alphanumeric, non-space mark.
    */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** BPE-ish pre-tokenization of lower-cased text into pieces. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(BpePattern), lit(0))

  /** Default English stopword set shared by the quality / lang-id
    * heuristics (q42/q43 keep their inline lists for oracle parity).
    */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "it")
}
