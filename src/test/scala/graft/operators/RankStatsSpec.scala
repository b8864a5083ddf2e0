package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixture checks for q168 (p-chart), q169 (Lorenz deciles) and q170
  * (Spearman): closed forms and hand ledgers.
  */
class RankStatsSpec extends SparkSpec {
  import spark.implicits._

  test("p-chart: a month matching the center line is in control; a spike is not") {
    // pbar = 360/3000 = 0.12, 3σ(n=1000) ≈ 0.0308: months at 0.10
    // (dev 0.02) sit inside, the 0.16 month (dev 0.04) breaks out
    val m = Seq(("a", 1000L, 100L), ("b", 1000L, 100L), ("c", 1000L, 160L))
      .toDF("month", "n", "r")
    val c = m.agg(sum($"n").as("tn"), sum($"r").as("tr"))
    val got = m.crossJoin(c)
      .select($"month",
        (abs($"r".cast("double") / $"n".cast("double") -
          $"tr".cast("double") / $"tn".cast("double")) >
          lit(3.0) * sqrt(($"tr".cast("double") / $"tn".cast("double")) *
            (lit(1.0) - $"tr".cast("double") / $"tn".cast("double")) /
            $"n".cast("double"))).as("ooc"))
      .as[(String, Boolean)].collect().toMap
    assert(!got("a") && !got("b") && got("c"))
  }

  test("lorenz deciles: exact integer cuts sum to the population and shares to ~1e6") {
    val per = (1L to 40L).map(k => (k, k * 100L)).toDF("o_custkey", "cents")
    val ranked = DistributedRank.withRowNumber(
      per, Seq($"cents".asc, $"o_custkey".asc), out = "rk")
    val n = ranked.agg(count(lit(1)).as("n"), sum($"cents").as("tot"))
    val dec = ranked.crossJoin(n)
      .select(expr("((rk - 1) * 10) div n + 1").as("decile"), $"cents", $"tot")
      .groupBy($"decile")
      .agg(count(lit(1)).as("nc"), sum($"cents").as("c"), max($"tot").as("tot"))
      .select($"decile", $"nc", expr("(c * 1000000) div tot").as("share"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(dec.map(_._1).toSeq == (1L to 10L))
    assert(dec.forall(_._2 == 4L)) // 40 customers → 4 per decile exactly
    val total = dec.map(_._3).sum
    assert(total > 999990L && total <= 1000000L) // div floors, ≤ 10 ulp-of-ppm
    // ascending revenue ⇒ strictly increasing decile shares
    assert(dec.map(_._3).toSeq == dec.map(_._3).toSeq.sorted)
  }

  test("abc classes: division-free boundaries cut exactly at 80/95 cumulative share") {
    // revenue 80, 15, 4, 1 of a 100 total in rank order:
    // cum = 80 (A: 80·5=400 ≤ 4·100=400), 95 (B: 95·20=1900 ≤ 19·100),
    // 99 (C), 100 (C)
    val cls = Seq(80L, 95L, 99L, 100L).map { cum =>
      if (cum * 5 <= 100L * 4) "A" else if (cum * 20 <= 100L * 19) "B" else "C"
    }
    assert(cls == Seq("A", "B", "C", "C"))
  }

  test("rfm quintiles: exact integer cuts assign 5 equal bands") {
    val n = 25L
    val bands = (1L to n).map(rk => ((rk - 1) * 5) / n + 1)
    assert(bands.distinct == Seq(1L, 2L, 3L, 4L, 5L))
    assert(bands.groupBy(identity).values.map(_.size).toSet == Set(5))
  }

  test("spearman: identical rankings give rho 1, reversed give -1, formula matches replica") {
    def rho(pairs: Seq[(Long, Long)]): Double = {
      val n = pairs.size.toDouble
      val sd2 = pairs.map { case (a, b) => (a - b) * (a - b) }.sum.toDouble
      1.0 - 6.0 * sd2 / (n * (n * n - 1.0))
    }
    val ident = (1L to 9L).map(i => (i, i))
    val rev = (1L to 9L).map(i => (i, 10L - i))
    assert(rho(ident) == 1.0)
    assert(rho(rev) == -1.0)
    // engine fold over a mixed fixture equals the replica bit-for-bit
    val mixed = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L), (5L, 5L))
    val got = mixed.toDF("r_rev", "r_vol")
      .select((($"r_rev" - $"r_vol") * ($"r_rev" - $"r_vol")).as("d2"))
      .agg(count(lit(1)).as("n"), sum($"d2").as("sd2"))
      .select((lit(1.0) - lit(6.0) * $"sd2".cast("double") /
        ($"n".cast("double") * ($"n".cast("double") * $"n".cast("double") - lit(1.0))))
        .as("rho"))
      .as[Double].head()
    assert(got == rho(mixed))
  }
}
