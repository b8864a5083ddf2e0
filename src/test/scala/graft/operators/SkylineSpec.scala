package graft.operators

import graft.SparkSpec

/** [[Skyline.skyline]] vs the brute-force definition on adversarial
  * fixtures — the grid prune must be lossless at any point layout,
  * including ties on one or both dimensions.
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Double, Int)]): Set[Long] =
    pts.filter { case (_, p, s) =>
      !pts.exists { case (_, p2, s2) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s)
      }
    }.map(_._1).toSet

  private def run(pts: Seq[(Long, Double, Int)]): Set[Long] =
    Skyline.skyline(pts.toDF("id", "price", "size"), "price", "size")
      .select("id").as[Long].collect().toSet

  test("matches brute force on a staircase with interior points") {
    val pts = Seq[(Long, Double, Int)](
      (1, 1.0, 1), (2, 2.0, 3), (3, 3.0, 5), (4, 4.0, 7), // frontier
      (5, 2.5, 2), (6, 3.5, 4), (7, 4.0, 6), (8, 5.0, 7)) // dominated
    assert(run(pts) == brute(pts))
    assert(run(pts) == Set(1L, 2L, 3L, 4L))
  }

  test("ties on both dimensions all survive (neither dominates)") {
    val pts = Seq[(Long, Double, Int)](
      (1, 1.0, 5), (2, 1.0, 5), (3, 2.0, 4))
    assert(run(pts) == Set(1L, 2L))
    assert(run(pts) == brute(pts))
  }

  test("deterministic pseudo-random cloud matches brute force") {
    // hash-derived layout (no Random): dense enough that grid cells
    // collide and the staircase has many interior cells to prune
    val pts = (1L to 400L).map { i =>
      val h = i * 2654435761L % 997
      (i, (h % 100).toDouble, (h / 100 % 50).toInt)
    }
    assert(run(pts) == brute(pts))
  }

  test("degenerate: all points identical -> all survive") {
    val pts = Seq[(Long, Double, Int)]((1, 7.0, 7), (2, 7.0, 7), (3, 7.0, 7))
    assert(run(pts) == Set(1L, 2L, 3L))
  }
}
