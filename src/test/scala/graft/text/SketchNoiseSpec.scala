package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Receipts for q124 (CMS heavy hitters) and q125 (encoding noise):
  * the CMS one-sided bound is certified under FORCED collisions (a
  * sketch narrower than the vocabulary), and the noise audit's nonzero
  * path under injected mojibake/control junk — both things the clean,
  * small-vocab driver corpus cannot exercise.
  */
class SketchNoiseSpec extends SparkSpec {
  import spark.implicits._

  test("q124 on the corpus: estimates are exact-count-or-above, never under") {
    val rows = TextQueries.cmsHeavyHittersOf(
      Tables.load(spark, SparkSpec.Sf0001, "documents"),
      d = 4, w = 1024, k = 20).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("exact_count"))
      assert(r.getAs[Long]("overestimate_q") >= 0L)
    }
  }

  test("CMS under forced collisions: one-sided error, exact driver-side replay") {
    // 200 distinct tokens into a w=16 sketch — every bucket collides
    val docsDf = (0 until 50).map { i =>
      (i.toLong, (0 until 40).map(j => s"t${(i * 40 + j) % 200}").mkString(" "))
    }.toDF("doc_id", "text")
    val got = TextQueries.cmsHeavyHittersOf(docsDf, d = 2, w = 16, k = 10)
      .collect()
    // driver-side replay: counts and the sketch from MessageDigest
    def h(r: Int, t: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$r|$t".getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 16).toInt
    }
    val toks = (0 until 50).flatMap(i =>
      (0 until 40).map(j => s"t${(i * 40 + j) % 200}"))
    val cnt = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val sketch = (for { r <- 1 to 2; (t, c) <- cnt.toSeq }
        yield ((r, h(r, t)), c))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val want = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(10)
      .map { case (t, c) =>
        val est = (1 to 2).map(r => sketch((r, h(r, t)))).min
        (t, c, est)
      }
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === want)
    // collisions actually happened (the sketch is narrower than vocab)
    assert(got.exists(r => r.getAs[Long]("overestimate_q") > 0L),
      "w=16 over 200 tokens must collide")
    got.foreach(r =>
      assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("exact_count")))
  }

  test("q125 flags injected mojibake and control junk, clean docs stay zero") {
    val docsDf = Seq(
      (1L, "clean ascii text only", "web"),
      (2L, "cafÃ© menu Ã©té", "web"), // Ã twice
      (3L, "null\u0000byte and bell\u0007", "logs"),
      (4L, "lost �� chars", "logs"),
      (5L, "tabs\tand\nnewlines are fine", "logs")
    ).toDF("doc_id", "text", "source")
    val got = TextQueries.encodingNoiseOf(docsDf).collect()
      .map(r => r.getString(0) -> r).toMap
    val web = got("web")
    assert(web.getAs[Long]("n_docs") == 2L)
    assert(web.getAs[Long]("n_affected") == 1L)
    assert(web.getAs[Long]("n_artifacts") == 2L) // the two Ã leads
    assert(web.getAs[Long]("worst_doc") == 2L)
    val logs = got("logs")
    assert(logs.getAs[Long]("n_docs") == 3L)
    assert(logs.getAs[Long]("n_affected") == 2L)
    assert(logs.getAs[Long]("n_artifacts") == 4L) // NUL + BEL + 2×U+FFFD
    // ties broken toward the smaller doc_id
    assert(logs.getAs[Long]("worst_doc") == 3L)
  }

  test("mojibake pairs catch non-Latin double-encoding; legit Latin-1 stays clean") {
    // Greek "κόσμος" read as Latin-1: 6 lead+trail pairs (plus C1
    // trails double-counted by the control class — suspicious twice
    // over, by design)
    val greekMojibake = new String("κόσμος".getBytes("UTF-8"), "ISO-8859-1")
    // legitimate German: Ü IS a lead char but is followed by 'b', not
    // a trail — the pair pattern is what keeps real Latin-1 text clean
    val docsDf = Seq(
      (1L, greekMojibake, "crawl"),
      (2L, "Übung fürs Leben — ganz natürlich", "crawl")
    ).toDF("doc_id", "text", "source")
    val got = TextQueries.encodingNoiseOf(docsDf).collect()(0)
    assert(got.getAs[Long]("n_affected") == 1L)
    assert(got.getAs[Long]("worst_doc") == 1L)
    assert(got.getAs[Long]("n_artifacts") >= 6L)
  }

  test("3/4-byte mojibake counts; legit French/Spanish accents stay clean") {
    // ADVICE r5: leads were 2-byte-only (U+00C2–U+00DF), so CJK or
    // curly-quote mojibake with trails ≥ U+00A0 sailed through a
    // noiseGate=Some(0). CJK "你好" read as Latin-1 is E4 BD A0 E5 A5
    // BD → two lead+trail pairs (ä½, å¥), zero C1 controls — caught
    // ONLY by the extended lead class.
    val cjkMojibake = new String("你好".getBytes("UTF-8"), "ISO-8859-1")
    val docsDf = Seq(
      (1L, cjkMojibake, "crawl"),
      // é/ï/ñ are now lead chars, but each is followed by a letter —
      // the pair semantics keep real French/Spanish clean
      (2L, "découpé déjà naïve mañana", "crawl")
    ).toDF("doc_id", "text", "source")
    val got = TextQueries.encodingNoiseOf(docsDf).collect()(0)
    assert(got.getAs[Long]("n_affected") == 1L)
    assert(got.getAs[Long]("n_artifacts") == 2L)
    assert(got.getAs[Long]("worst_doc") == 1L)
  }

  test("passing(0) means artifact-free at ANY length (exact rational bound)") {
    import org.apache.spark.sql.functions._
    val long = "x".repeat(1100000) + "Ã©" // 1 artifact in >1 Mchar
    val docsDf = Seq(
      (1L, long, "web"),
      (2L, "perfectly clean and long enough", "web")
    ).toDF("doc_id", "text", "source")
    val kept = EncodingNoise.passing(docsDf, 0L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // a floored per-million quotient would keep doc 1 (density rounds
    // to 0); the rational bound must not
    assert(kept == Set(2L))
    // and the boundary is inclusive: density exactly m passes
    val at2 = Seq((3L, "Ã©" + "y".repeat(999998), "web"))
      .toDF("doc_id", "text", "source") // 1 artifact per 1e6 chars
    assert(EncodingNoise.passing(at2, 1L).count() == 1L)
    assert(EncodingNoise.passing(at2, 0L).count() == 0L)
  }
}
