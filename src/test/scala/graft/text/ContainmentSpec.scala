package graft.text

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Receipts for q122 (directed n-gram containment): pinned against a
  * driver-side brute-force over RAW SHINGLE STRING SETS (no hashing,
  * no prefix filter, no inverted index — every operator-shape choice
  * in the query is absent here), plus the quote property the measure
  * exists for.
  */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  test("q122 matches a brute-force string-set replay (prefix filter lossless)") {
    val rows = Tables.load(spark, SparkSpec.Sf0001, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.split(" ", -1).length >= 3)
    val sets = rows.map { case (id, text) =>
      val tk = text.split(" ", -1)
      id -> (0 to tk.length - 3).map(i => tk.slice(i, i + 3).mkString(" ")).toSet
    }.toMap
    val want = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a != b
      i = (sa & sb).size if 5L * i >= 4L * sa.size
    } yield {
      val na = sa.size.toLong; val nb = sb.size.toLong
      Seq[Any](a, b, na, nb,
        BigDecimal(i * 1.0 / na).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble,
        BigDecimal(i * 1.0 / (na + nb - i))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).sortBy(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]))
    val got = SparkEntry.queries("q122_containment_quotes")(
      spark, SparkSpec.Sf0001).collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("q122 catches a quote that Jaccard misses") {
    // a 30-token excerpt embedded verbatim in a 300-token doc: perfect
    // containment, tiny Jaccard
    val words = (0 until 300).map(i => s"w${(i * 7919) % 4093}")
    val long = words.mkString(" ")
    val quote = words.slice(100, 130).mkString(" ")
    val docsDf = Seq((1L, long), (2L, quote)).toDF("doc_id", "text")
    val cont = TextQueries.containmentPairsOf(docsDf, 4, 5).collect()
    val hit = cont.find(r => r.getLong(0) == 2L && r.getLong(1) == 1L)
    assert(hit.isDefined, "quote→container pair not found")
    assert(hit.get.getAs[Double]("containment") === 1.0)
    assert(hit.get.getAs[Double]("jaccard") < 0.2)
    // the symmetric measure at the same threshold sees nothing
    assert(TextQueries.ngramJaccardPairsOf(docsDf, 0.8).collect().isEmpty)
  }
}
