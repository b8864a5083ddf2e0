package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[TextQueries.lshCandidatePairs]]: the chunked triangle decomposition
  * must emit exactly the same pair set as a naive band-equality self-join
  * for ANY chunk size — chunking is execution parallelism, not semantics.
  */
class LshPairsSpec extends SparkSpec {
  import spark.implicits._

  /** Buckets with sizes 1/2/5/9, docs in several buckets, plus length
    * outliers the PPJoin filter must drop.
    */
  private lazy val bands: DataFrame = {
    val rows =
      // (doc_id, n, band_id, band_val)
      Seq((1L, 100L), (2L, 100L), (3L, 101L), (4L, 100L), (5L, 300L))
        .map { case (d, n) => (d, n, 1, "hot") } ++ // 5-doc bucket, one outlier
      Seq((10L, 50L), (11L, 50L)).map { case (d, n) => (d, n, 1, "pair") } ++
      Seq((20L, 10L)).map { case (d, n) => (d, n, 2, "solo") } ++
      (30L to 38L).map(d => (d, 40L + d % 3, 2, "nine")) ++
      // same docs collide again in another band — distinct() must dedupe
      Seq((1L, 100L), (2L, 100L)).map { case (d, n) => (d, n, 2, "re") }
    rows.toDF("doc_id", "n", "band_id", "band_val")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select($"doc_a", $"doc_b", $"na", $"nb")
      .as[(Long, Long, Long, Long)].collect().toSet

  private lazy val naive: Set[(Long, Long, Long, Long)] = pairSet(
    bands.as("a").join(bands.as("b"),
        $"a.band_id" === $"b.band_id" && $"a.band_val" === $"b.band_val" &&
        $"a.doc_id" < $"b.doc_id" &&
        $"a.n" >= $"b.n" * 0.9 && $"b.n" >= $"a.n" * 0.9)
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
              $"a.n".as("na"), $"b.n".as("nb"))
      .distinct())

  test("naive fixture sanity: dedupes bands, drops length outliers") {
    assert(naive.contains((1L, 2L, 100L, 100L)))
    assert(!naive.exists(p => p._1 == 5L || p._2 == 5L)) // n=300 outlier
    assert(!naive.exists(p => p._1 == 20L || p._2 == 20L)) // singleton
    assert(naive.count(p => p._1 >= 30L) === 36) // C(9,2) in "nine"
  }

  for (cs <- Seq(1, 2, 3, 4, 1000)) {
    test(s"chunked pair generation matches naive self-join at chunkSize=$cs") {
      val got = pairSet(
        TextQueries.lshCandidatePairs(bands, lengthRatio = 0.9, chunkSize = cs))
      assert(got === naive)
    }
  }

  for (cs <- Seq(1, 2, 1000); dd <- Seq(true, false)) {
    test(s"duplicate doc in one bucket emits no self-pair (chunkSize=$cs, dedupe=$dd)") {
      // doc 7 appears twice in bucket "dup" (a caller passing duplicate
      // (doc, value) rows — e.g. a repeated shingle without upstream
      // array_distinct); a naive a<b self-join never yields (7,7).
      val dup = Seq((7L, 60L, 1, "dup"), (7L, 60L, 1, "dup"),
                    (8L, 60L, 1, "dup"), (9L, 61L, 1, "dup"))
        .toDF("doc_id", "n", "band_id", "band_val")
      val got = TextQueries
        .lshCandidatePairs(dup, lengthRatio = 0.9, chunkSize = cs, dedupe = dd)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
      assert(got.forall { case (a, b) => a < b },
        s"self or misordered pair in ${got.toSeq}")
      assert(got.toSet === Set((7L, 8L), (7L, 9L), (8L, 9L)))
    }
  }

  test("dedupe=false keeps one row per shared bucket (intersection counts)") {
    val rows = TextQueries
      .lshCandidatePairs(bands, lengthRatio = 0.9, chunkSize = 2, dedupe = false)
      .groupBy($"doc_a", $"doc_b").count()
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    // docs 1,2 share the "hot" (band 1) and "re" (band 2) buckets
    assert(rows((1L, 2L)) === 2L)
    // docs 10,11 share only "pair"
    assert(rows((10L, 11L)) === 1L)
  }
}
