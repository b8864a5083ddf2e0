package graft.text

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Receipts for q123 (measured LSH recall curve): pinned against a
  * driver-side brute-force that recomputes the MinHash signatures from
  * MessageDigest directly (no Spark expression shares code with the
  * query), plus the zero-miss property for identical documents.
  */
class RecallCurveSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("q123 matches a driver-side signature-and-all-pairs replay") {
    val sample = Tables.load(spark, SparkSpec.Sf0001, "documents")
      .filter($"doc_id" % 4 === 0)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).distinct.toSet))
    val sigs = sample.map { case (id, ts) =>
      val ms = (1 to 8).map(i => ts.map(t => md5hex(s"$i|$t")).min)
      (id, ts, ms.take(4).mkString, ms.drop(4).mkString)
    }
    val buckets = scala.collection.mutable.Map.empty[Int, (Long, Long)]
      .withDefaultValue((0L, 0L))
    for {
      (a, ta, b1a, b2a) <- sigs; (b, tb, b1b, b2b) <- sigs if a < b
    } {
      val i = (ta & tb).size
      val j = i.toDouble / (ta.size + tb.size - i)
      if (j >= 0.5) {
        val bk = math.min(math.floor(j * 10).toInt, 9)
        val cand = if (b1a == b1b || b2a == b2b) 1L else 0L
        val (p, c) = buckets(bk); buckets(bk) = (p + 1, c + cand)
      }
    }
    val want = (5 to 9).map { bk =>
      val (p, c) = buckets(bk)
      Seq[Any](bk / 10.0, p, c, if (p > 0) c * 1000000L / p else null)
    }
    val got = SparkEntry.queries("q123_lsh_recall_curve")(
      spark, SparkSpec.Sf0001).collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("identical docs are never missed: the top bucket's recall includes them") {
    // two identical token sets have identical signatures, so band
    // equality holds with probability 1 — verified through the public
    // q45 pair pipeline, which must report the pair at jaccard 1.0
    val docsDf = Seq(
      (4L, "alpha beta gamma delta epsilon zeta eta theta"),
      (8L, "alpha beta gamma delta epsilon zeta eta theta"),
      (12L, "iota kappa lambda mu nu xi omicron pi")
    ).toDF("doc_id", "text")
    val pairs = TextQueries.minhashNearDupPairsOf(docsDf, LshParams())
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((4L, 8L)))
    assert(pairs.head.getAs[Double]("jaccard") === 1.0)
  }
}
