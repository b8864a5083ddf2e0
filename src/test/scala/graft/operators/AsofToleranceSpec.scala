package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** [[AsofJoin.latestWithin]]: the staleness bound nulls exactly the
  * matches older than the tolerance, and an unbounded tolerance
  * degenerates to [[AsofJoin.latestBefore]].
  */
class AsofToleranceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val right = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 12:00:00"), 200.0),
    (2L, ts("2024-01-01 09:00:00"), 300.0))
    .toDF("user_id", "rts", "rv")
  private val left = Seq(
    (1L, ts("2024-01-01 12:10:00"), 10L), // 10 min after rv=200 -> fresh
    (1L, ts("2024-01-01 11:00:00"), 11L), // 60 min after rv=100 -> stale
    (2L, ts("2024-01-01 09:20:00"), 12L), // 20 min after rv=300 -> fresh
    (3L, ts("2024-01-01 09:00:00"), 13L)) // no right row at all
    .toDF("user_id", "lts", "lid")

  test("carries survive only within the tolerance window") {
    val got = AsofJoin.latestWithin(left, right, "user_id", "lts", "rts",
        Seq("rv"), toleranceUs = 30L * 60 * 1000000)
      .select("lid", "rv").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(10L -> Some(200.0), 11L -> None,
      12L -> Some(300.0), 13L -> None))
  }

  test("an unbounded tolerance degenerates to latestBefore") {
    val bounded = AsofJoin.latestWithin(left, right, "user_id", "lts", "rts",
        Seq("rv"), toleranceUs = Long.MaxValue / 2)
      .select("lid", "rv").as[(Long, Option[Double])].collect().toSet
    val plain = AsofJoin.latestBefore(left, right, "user_id", "lts", "rts",
        Seq("rv"))
      .select("lid", "rv").as[(Long, Option[Double])].collect().toSet
    assert(bounded == plain)
  }
}
