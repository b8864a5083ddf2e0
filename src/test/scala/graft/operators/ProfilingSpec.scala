package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixture checks for the q156–q159 audit/profile family: hand-built
  * frames with answers derivable on paper, plus the exactness
  * properties the scaladocs claim.
  */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def lq(n: Long): Long = {
    require(n >= 1)
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    e * 1048576L + ((n - (1L << e)) * 1048576L) / (1L << e)
  }

  // ---- q156 Benford: digit extraction is string-of-integer based ----

  test("benford digit extraction never consults float log/pow") {
    // boundary amounts around powers of ten (the values log10 would
    // misclassify on ulp drift): digit must come from the cents string
    val amounts = Seq(999.99, 1000.00, 1000.01, 99.99, 100.00, 9.99, 10.00)
    val got = amounts.toDF("x")
      .select(expr(
        "cast(substring(cast(cast(cast(x as decimal(18,2)) * 100 as bigint) as string), 1, 1) as int)").as("d"))
      .as[Int].collect().toSeq
    assert(got == Seq(9, 1, 1, 9, 1, 9, 1))
  }

  test("benford expectations sum to ~1e6 (pinned public constants)") {
    val ppm = Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L,
      57991L, 51152L, 45757L)
    assert(ppm.sum == 999995L) // floor()ed terms: within 9 ulp-of-ppm of 10⁶
    assert(ppm == ppm.sorted.reverse) // monotone decreasing in digit
  }

  // ---- q157 column entropy: quantized-log2 identities ----

  test("entropy_q formula: uniform and constant columns hit the closed forms") {
    // constant column: H = 0 exactly
    val const1 = Seq("a", "a", "a", "a").toDF("v")
      .groupBy($"v").agg(count(lit(1)).as("c"))
      .agg(sum($"c").as("n"), sum(expr(
        "c * ((length(bin(c)) - 1) * 1048576L + (((c) - shiftleft(1L, length(bin(c)) - 1)) * 1048576L div shiftleft(1L, length(bin(c)) - 1)))")).as("clq"))
      .select(expr(
        "((length(bin(n)) - 1) * 1048576L + (((n) - shiftleft(1L, length(bin(n)) - 1)) * 1048576L div shiftleft(1L, length(bin(n)) - 1))) - (clq div n)").as("h"))
      .as[Long].head()
    assert(const1 == 0L)
    // uniform over 4 values of 2 rows each: H = log2(4) = 2 bits exactly
    val unif = Seq("a", "a", "b", "b", "c", "c", "d", "d").toDF("v")
      .groupBy($"v").agg(count(lit(1)).as("c"))
      .agg(sum($"c").as("n"), sum(expr(
        "c * ((length(bin(c)) - 1) * 1048576L + (((c) - shiftleft(1L, length(bin(c)) - 1)) * 1048576L div shiftleft(1L, length(bin(c)) - 1)))")).as("clq"))
      .select(expr(
        "((length(bin(n)) - 1) * 1048576L + (((n) - shiftleft(1L, length(bin(n)) - 1)) * 1048576L div shiftleft(1L, length(bin(n)) - 1))) - (clq div n)").as("h"))
      .as[Long].head()
    assert(unif == 2 * 1048576L) // exactly 2.0 bits in q20 fixed point
    // and the driver-side lq replica hits its closed forms
    assert(lq(8) == 3 * 1048576L && lq(3) == 1048576L + 524288L)
  }

  // ---- q158 MAD: doubled-percentile grid is exact; flags match hand math ----

  test("mad modified-z: hand fixture flags exactly the planted outlier") {
    // cents: 100,102,104,106,1000 → med=104 (odd n, exact), dev=4,2,0,2,896
    // med2=208; dev2=8,4,0,4,1792 → mad4 = 2*median(dev2)=2*4=8
    // z_ppm(1792) = 1349000*1792 div 8 = 302176000 > 3.5e6 → outlier
    // z_ppm(8) = 1349000 → not
    val cents = Seq(100L, 102L, 104L, 106L, 1000L).toDF("c")
      .withColumn("grp", lit("g"))
    val med2 = cents.groupBy($"grp")
      .agg(expr("cast(round(percentile(c, 0.5) * 2) as bigint)").as("med2"))
      .select("med2").as[Long].head()
    assert(med2 == 208L)
    val dev = cents.withColumn("dev2", abs($"c" * 2 - lit(med2)))
    val mad4 = dev.agg(expr("cast(round(percentile(dev2, 0.5) * 2) as bigint)"))
      .as[Long].head()
    assert(mad4 == 8L)
    val flags = dev.select((expr(s"(1349000 * dev2) div $mad4") > 3500000L).as("f"))
      .as[Boolean].collect()
    assert(flags.count(identity) == 1)
  }

  test("mad percentile doubling: even-count interpolated halves stay exact") {
    // 4 values: median of {10,11,13,20} = 12.0; doubled = 24 exactly
    val got = Seq(10L, 11L, 13L, 20L).toDF("c")
      .agg(expr("cast(round(percentile(c, 0.5) * 2) as bigint)")).as[Long].head()
    assert(got == 24L)
    // {10,11} → 10.5 → 21: the half lands exactly on the doubled grid
    val half = Seq(10L, 11L).toDF("c")
      .agg(expr("cast(round(percentile(c, 0.5) * 2) as bigint)")).as[Long].head()
    assert(half == 21L)
  }

  // ---- q159 EWMA: dyadic kernel equals the driver-side convolution ----

  test("ewma dyadic kernel matches a literal convolution replay") {
    val xs = Seq(100L, 200L, 400L, 800L, 50L, 0L, 75L)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
      .toDF("grp", "d", "day_cents")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"grp").orderBy($"d")
    val ewma = (0 until 16)
      .map(i => coalesce(lag($"day_cents", i, 0L).over(w), lit(0L)) *
        lit(1L << (15 - i)))
      .reduce(_ + _)
    val got = df.withColumn("e", ewma).orderBy($"d")
      .select("e").as[Long].collect().toSeq
    val want = xs.indices.map { t =>
      (0 until 16).map { i =>
        if (t - i >= 0) xs(t - i) * (1L << (15 - i)) else 0L
      }.sum
    }
    assert(got == want)
    // α=1/2 sanity: one step of the untruncated recursion agrees while
    // the window is shorter than the taps: s1·2^16 = x1·2^15 + x0·2^14
    assert(got(1) == xs(1) * 32768L + xs(0) * 16384L)
  }
}
