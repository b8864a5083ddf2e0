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

  // ---- SCD2 ----

  private def d(s: String) = java.sql.Date.valueOf(s)

  /** patient dim: key id, attributes (city, plan), validity interval. */
  private lazy val scdBase = Seq(
    // id 1: one closed historical row + the current open row
    (1L, "boston", "ppo", d("2020-01-01"), Option(d("2022-06-01"))),
    (1L, "salem", "ppo", d("2022-06-01"), None: Option[java.sql.Date]),
    // id 2: single open row
    (2L, "denver", "hmo", d("2021-03-15"), None: Option[java.sql.Date]))
    .toDF("id", "city", "plan", "valid_from", "valid_to")

  private def scdRows(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "city", "plan", "valid_from", "valid_to")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDate(3).toString, Option(r.getDate(4)).map(_.toString))).toSet

  test("scd2: change closes the open row and opens a new version") {
    val updates = Seq((1L, "boston", "hdhp", d("2024-02-01")))
      .toDF("id", "city", "plan", "effective")
    val out = Upsert.scd2Merge(scdBase, updates, Seq("id"))
    assert(scdRows(out) === Set(
      (1L, "boston", "ppo", "2020-01-01", Some("2022-06-01")), // history intact
      (1L, "salem", "ppo", "2022-06-01", Some("2024-02-01")),  // closed at eff
      (1L, "boston", "hdhp", "2024-02-01", None),              // new open row
      (2L, "denver", "hmo", "2021-03-15", None)))              // untouched
  }

  test("scd2: identical attributes are a no-op; new keys open first rows") {
    val updates = Seq(
      (2L, "denver", "hmo", d("2024-02-01")),  // unchanged → no churn
      (9L, "austin", "ppo", d("2024-02-01"))) // brand-new key
      .toDF("id", "city", "plan", "effective")
    val out = Upsert.scd2Merge(scdBase, updates, Seq("id"))
    assert(scdRows(out) === scdRows(scdBase) +
      ((9L, "austin", "ppo", "2024-02-01", None)))
  }

  test("scd2: a fully-closed key re-activates instead of losing the update") {
    val closedOnly = Seq(
      (5L, "boston", "ppo", d("2020-01-01"), Option(d("2021-01-01"))))
      .toDF("id", "city", "plan", "valid_from", "valid_to")
    val updates = Seq((5L, "miami", "hmo", d("2024-02-01")))
      .toDF("id", "city", "plan", "effective")
    val out = Upsert.scd2Merge(closedOnly, updates, Seq("id"))
    assert(scdRows(out) === Set(
      (5L, "boston", "ppo", "2020-01-01", Some("2021-01-01")),
      (5L, "miami", "hmo", "2024-02-01", None)))
  }

  test("scd2: malformed updates fail instead of corrupting history") {
    // effective before the open row's valid_from → inverted interval
    val late = Seq((1L, "nowhere", "ppo", d("2021-01-01")))
      .toDF("id", "city", "plan", "effective")
    intercept[Exception] {
      Upsert.scd2Merge(scdBase, late, Seq("id")).collect()
    }
    // NULL effective → would half-apply
    val nullEff = Seq((1L, "nowhere", "ppo", null.asInstanceOf[java.sql.Date]))
      .toDF("id", "city", "plan", "effective")
    intercept[Exception] {
      Upsert.scd2Merge(scdBase, nullEff, Seq("id")).collect()
    }
    // effective EQUAL to the open row's valid_from → zero-length closed
    // version invisible to [from, to) lookups; same-day corrections are
    // SCD1 fixes and must be folded upstream
    val sameDay = Seq((1L, "nowhere", "ppo", d("2022-06-01")))
      .toDF("id", "city", "plan", "effective")
    intercept[Exception] {
      Upsert.scd2Merge(scdBase, sameDay, Seq("id")).collect()
    }
    // duplicate keys in one batch → the open row would multiply through
    // the join into several closed + several open rows
    val dup = Seq(
      (1L, "lowell", "ppo", d("2024-02-01")),
      (1L, "quincy", "hmo", d("2024-03-01")))
      .toDF("id", "city", "plan", "effective")
    intercept[Exception] {
      Upsert.scd2Merge(scdBase, dup, Seq("id")).collect()
    }
    // duplicate keys on a BRAND-NEW key fail too (the firstRows branch)
    val dupNew = Seq(
      (9L, "lowell", "ppo", d("2024-02-01")),
      (9L, "quincy", "hmo", d("2024-03-01")))
      .toDF("id", "city", "plan", "effective")
    intercept[Exception] {
      Upsert.scd2Merge(scdBase, dupNew, Seq("id")).collect()
    }
  }

  test("scd2: exactly one open row per key; intervals chain") {
    val updates = Seq((1L, "lowell", "ppo", d("2024-02-01")))
      .toDF("id", "city", "plan", "effective")
    val out = Upsert.scd2Merge(scdBase, updates, Seq("id")).cache()
    val openPerKey = out.filter($"valid_to".isNull)
      .groupBy($"id").count().as[(Long, Long)].collect().toMap
    assert(openPerKey === Map(1L -> 1L, 2L -> 1L))
    // id 1's three versions chain with no gaps or overlaps
    val chain = out.filter($"id" === 1L).orderBy($"valid_from")
      .select("valid_from", "valid_to").collect()
    assert(chain.length === 3)
    assert(chain(0).getDate(1) === chain(1).getDate(0))
    assert(chain(1).getDate(1) === chain(2).getDate(0))
    out.unpersist()
  }
}
