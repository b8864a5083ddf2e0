package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[SkewJoin.saltedInnerJoin]] is pure execution parallelism: for any
  * salt count the joined multiset must equal the plain equi-join —
  * including duplicate keys on BOTH sides and keys missing from either.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // Skewed big side: key 1 dominates; key 3 matches nothing; small side
  // has a duplicate key (2) so the join fans out, and a dangling key (9).
  private lazy val big: DataFrame =
    (Seq.fill(500)(1L) ++ Seq(2L, 2L, 3L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "row_id")
  private lazy val small: DataFrame =
    Seq((1L, "a"), (2L, "b"), (2L, "b2"), (9L, "z")).toDF("k", "v")

  private def sorted(df: DataFrame): Seq[(Long, Long, String)] =
    df.select($"k", $"row_id", $"v").as[(Long, Long, String)]
      .collect().toSeq.sorted

  private lazy val plain = sorted(big.join(small, Seq("k")))

  test("plain fixture sanity: hot key fans out, unmatched keys drop") {
    assert(plain.count(_._1 == 1L) === 500)
    assert(plain.count(_._1 == 2L) === 4) // 2 big rows × 2 small rows
    assert(!plain.exists(r => r._1 == 3L || r._1 == 9L))
  }

  for (salts <- Seq(1, 2, 8, 64)) {
    test(s"salted join equals plain join at salts=$salts") {
      val got = sorted(
        SkewJoin.saltedInnerJoin(big, small, "k", salts, $"row_id"))
      assert(got === plain)
    }
  }

  test("salt column does not leak into the output schema") {
    val out = SkewJoin.saltedInnerJoin(big, small, "k", 4, $"row_id")
    assert(!out.columns.contains("__salt"))
  }
}
