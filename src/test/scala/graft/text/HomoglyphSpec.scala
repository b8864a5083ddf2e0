package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Homoglyph]] on injected spoofed fixtures — the driver corpus is
  * clean ASCII (the registry run certifies the all-zero path), so the
  * positive paths live here (the q125 convention).
  */
class HomoglyphSpec extends SparkSpec {
  import spark.implicits._

  private def count1(text: String): Long =
    Seq(text).toDF("text")
      .select(Homoglyph.mixedWordCount($"text")).as[Long].head()

  test("latin-cyrillic homoglyph words flag; pure-script words do not") {
    // "pаypal" carries U+0430 CYRILLIC SMALL A amid Latin letters
    assert(count1("login to pаypal now") == 1L)
    // a fully-Cyrillic word is legitimate foreign text, not a spoof
    assert(count1("привет world") == 0L)
    // fully-Latin corpus: clean
    assert(count1("plain ascii words only") == 0L)
  }

  test("greek-script mixing flags too; counts are per word") {
    // U+03BF GREEK SMALL OMICRON inside a Latin word, twice
    assert(count1("gοogle and gοogle again") == 2L)
  }

  test("per-source ledger elects the min doc id among the worst") {
    val docs = Seq(
      (1L, "clean text here", "web"),
      (2L, "pаypal lоgin", "web"),   // 2 mixed words
      (3L, "pаypal x y", "web"),           // 1 mixed word
      (4L, "another pаypal here", "mail"), // 1 mixed word
      (5L, "all clean", "mail"))
      .toDF("doc_id", "text", "source")
    val got = Homoglyph.auditOf(docs)
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      "mail" -> (2L, 1L, 1L, Some(4L)),
      "web" -> (3L, 3L, 2L, Some(2L))))
  }

  test("a clean source reports zero with NULL worst doc") {
    val docs = Seq((9L, "spotless", "s")).toDF("doc_id", "text", "source")
    val row = Homoglyph.auditOf(docs)
      .as[(String, Long, Long, Long, Option[Long])].head()
    assert(row == (("s", 1L, 0L, 0L, None)))
  }
}
