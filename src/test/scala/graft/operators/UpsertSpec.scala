package graft.operators

import graft.SparkSpec

/** [[Upsert.mergeByKey]] must behave like SQL MERGE: matched keys take
  * the update's row, unmatched base rows survive untouched, new keys
  * append — and the operation is idempotent for the same delta.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base =
    Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "name", "v")
  private lazy val delta =
    Seq((2L, "b2", 99), (4L, "d", 40)).toDF("id", "name", "v")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, String, Int)].collect().toSet

  test("updates replace, inserts append, untouched rows survive") {
    val merged = Upsert.mergeByKey(base, delta, Seq("id"))
    assert(rows(merged) === Set(
      (1L, "a", 10), (2L, "b2", 99), (3L, "c", 30), (4L, "d", 40)))
  }

  test("idempotent: re-applying the same delta changes nothing") {
    val once = Upsert.mergeByKey(base, delta, Seq("id"))
    val twice = Upsert.mergeByKey(once, delta, Seq("id"))
    assert(rows(once) === rows(twice))
  }

  test("empty delta is a no-op") {
    val merged = Upsert.mergeByKey(base, delta.limit(0), Seq("id"))
    assert(rows(merged) === rows(base))
  }
}
