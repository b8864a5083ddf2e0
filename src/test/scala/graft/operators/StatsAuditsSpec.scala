package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixture checks for q163 (quantized MI) and q164 (Poisson
  * bootstrap): closed forms, the sign-safety offset, and the pinned
  * CDF's distributional sanity.
  */
class StatsAuditsSpec extends SparkSpec {
  import spark.implicits._

  private def lq(n: Long): Long = {
    require(n >= 1)
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    e * 1048576L + ((n - (1L << e)) * 1048576L) / (1L << e)
  }

  /** Driver replica of the q163 sum. */
  private def miSum(cells: Seq[((String, String), Long)]): Long = {
    val n = cells.map(_._2).sum
    val ca = cells.groupBy(_._1._1).view.mapValues(_.map(_._2).sum)
    val cb = cells.groupBy(_._1._2).view.mapValues(_.map(_._2).sum)
    cells.map { case ((a, b), c) =>
      c * (lq(c) + lq(n) - lq(ca(a)) - lq(cb(b)))
    }.sum
  }

  test("MI: perfectly dependent columns give H(A), independent give ~0") {
    // dependent: b == a, uniform over 4 values ⇒ MI = H = 2 bits
    val dep = Seq(("w", "w"), ("x", "x"), ("y", "y"), ("z", "z"))
      .map(p => (p, 2L))
    assert(miSum(dep) / dep.map(_._2).sum == 2 * 1048576L)
    // independent 2×2 uniform: every term is exactly 0 in fixed point
    // (all counts are powers of two, lq exact)
    val ind = Seq((("a", "x"), 4L), (("a", "y"), 4L),
      (("b", "x"), 4L), (("b", "y"), 4L))
    assert(miSum(ind) == 0L)
  }

  test("MI offset-div: negative quantized sums truncate identically to floor for the shifted numerator") {
    // with the +128·2^20 per-unit offset the numerator is positive, so
    // Spark div (trunc) == DuckDB // (floor) by construction; replicate
    // the arithmetic on a deliberately negative raw sum
    val off = 134217728L
    val n = 7L
    val s = -5L // tiny negative shadow
    val sparkDiv = (s + n * off) / n - off // toward-zero == floor: positive numerator
    assert(sparkDiv == -1L) // floor(-5/7) = -1, the mathematically right answer
  }

  test("poisson draws: pinned CDF yields mean ~1 and preserves total mass") {
    // empirical check over the 20-bit grid: E[k] = Σ (1 - F(k)) ≈ 1
    val th = Seq(385749L, 771499L, 964373L, 1028665L, 1044738L,
      1047952L, 1048488L, 1048565L, 1048574L)
    val grid = 1048576L
    val ek = th.map(t => (grid - t).toDouble / grid).sum
    assert(math.abs(ek - 1.0) < 1e-4)
    // engine draw on a fixture: deterministic, in range, mean near 1
    val ks = spark.range(4000)
      .select(expr(
        "cast(conv(substring(md5(concat(cast(id as string), '#', '0')), 1, 5), 16, 10) as bigint)").as("u"))
      .select(expr(th.zipWithIndex.map { case (t, k) =>
        s"WHEN u < $t THEN $k"
      }.mkString("CASE ", " ", " ELSE 9 END")).as("k"))
      .as[Int].collect()
    assert(ks.forall(k => k >= 0 && k <= 9))
    val mean = ks.sum.toDouble / ks.length
    assert(mean > 0.9 && mean < 1.1, s"bootstrap multiplicity mean drifted: $mean")
  }

  test("bootstrap replicate identity: k=1 everywhere reproduces the plain mean") {
    val cents = Seq(100L, 200L, 300L, 400L).toDF("cents")
      .withColumn("k", lit(1L))
    val got = cents.agg(expr("sum(k * cents) div sum(k)")).as[Long].head()
    assert(got == 250L)
  }
}
