package graft.text

import graft.{Q, SparkSpec}
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** The round-6 exactness-ceiling guards: documented integer/decimal
  * ceilings (q99 surprisal, q104 PMI, BM25 score core) must fail LOUD
  * with a named GRAFT_CEILING error and a remedy — not silently NULL
  * under Spark's non-ANSI overflow. Ceilings are injectable so a tiny
  * corpus can cross them.
  */
class CeilingGuardSpec extends SparkSpec {
  import spark.implicits._

  private def msgOf(e: Throwable): String = {
    var m = Option(e.getMessage).getOrElse("")
    var c = e.getCause
    while (c != null) { m += " | " + Option(c.getMessage).getOrElse(""); c = c.getCause }
    m
  }

  private val tinyDocs = Seq(
    (1L, "alpha beta alpha beta gamma", "s1"),
    (2L, "alpha beta alpha beta delta", "s1"),
    (3L, "alpha beta alpha beta gamma alpha beta", "s2"),
    (4L, "epsilon zeta alpha beta alpha beta", "s2"),
    (5L, "alpha beta alpha beta eta alpha beta", "s2"))
    .toDF("doc_id", "text", "source")

  test("ceilingGuard passes values under the bound untouched") {
    val out = Seq(7L).toDF("v")
      .select(Q.ceilingGuard($"v", bound = 10L, "qx", "stat", "remedy"))
      .head().getLong(0)
    assert(out === 7L)
  }

  test("ceilingGuard raises a named error with the remedy past the bound") {
    val e = intercept[Exception] {
      Seq(11L).toDF("v")
        .select(Q.ceilingGuard($"v", bound = 10L, "qx", "the stat",
          "do the documented thing"))
        .collect()
    }
    val m = msgOf(e)
    assert(m.contains("GRAFT_CEILING"), m)
    assert(m.contains("qx") && m.contains("the stat") && m.contains("11"), m)
    assert(m.contains("do the documented thing"), m)
  }

  test("q104 PMI fails fast when the corpus token count crosses its ceiling") {
    val e = intercept[Exception] {
      TextQueries.pmiCollocations(tinyDocs, ceiling = 5L).collect()
    }
    val m = msgOf(e)
    assert(m.contains("GRAFT_CEILING") && m.contains("q104_pmi_collocations"), m)
    assert(m.contains("ANSI mode"), m)
    // under the real ceiling the same corpus runs clean
    assert(TextQueries.pmiCollocations(tinyDocs).collect() != null)
  }

  test("q99 surprisal fails fast when the corpus token count crosses its ceiling") {
    val e = intercept[Exception] {
      TextQueries.docSurprisal(tinyDocs, ceiling = 5L).collect()
    }
    val m = msgOf(e)
    assert(m.contains("GRAFT_CEILING") && m.contains("q99_doc_surprisal"), m)
    assert(m.contains("decimal(38,0)"), m)
    assert(TextQueries.docSurprisal(tinyDocs).count() === 2)
  }

  test("bm25 fails fast when T*max_tf crosses its ceiling") {
    val e = intercept[Exception] {
      Bm25.score(tinyDocs, Seq("alpha"), ceiling = 10L).collect()
    }
    val m = msgOf(e)
    assert(m.contains("GRAFT_CEILING") && m.contains("bm25"), m)
    assert(m.contains("decimal(38,0)"), m)
    assert(Bm25.score(tinyDocs, Seq("alpha")).count() === 5)
  }
}
