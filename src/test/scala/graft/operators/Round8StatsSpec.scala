package graft.operators

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Closed-form and invariant checks for the round-8 inference/eval
  * operators (q264–q283): each test pins the MATH the registry query
  * ships — the rank-sum AUC identity, the Murphy decomposition
  * identity, KW's k = 2 collapse to Mann-Whitney, the 2-level
  * Cochran-Armitage ≡ 2×2 chi-square collapse, KMV's exact-below-k
  * regime, the MA-12 seasonal recovery — against brute force or hand
  * ledgers, plus value-range invariants of the real queries on
  * sf0.001 (RegistrySpec proves they RUN; these prove the numbers
  * land in the lawful range).
  */
class Round8StatsSpec extends SparkSpec {
  import spark.implicits._

  test("q264 math: rank-sum AUC equals brute-force pair counting with half-credit ties") {
    // score level -> (positives, negatives); heavy ties on purpose
    val lvls = Seq((0, 5L, 20L), (1, 10L, 10L), (2, 15L, 5L))
    // brute force: concordant (pos score > neg score) + 0.5 * tied
    val pairs = for {
      (sp, p, _) <- lvls; (sn, _, n) <- lvls
    } yield
      if (sp > sn) p * n * 2L else if (sp == sn) p * n else 0L
    val n1 = lvls.map(_._2).sum
    val n0 = lvls.map(_._3).sum
    val bruteAuc = pairs.sum.toDouble / (2.0 * n1 * n0)
    // the q264 machinery on a DF of the same ledger
    val v = lvls.toDF("d", "c1", "c0").withColumn("t", $"c1" + $"c0")
    val w = org.apache.spark.sql.expressions.Window.orderBy($"d")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val got = v.withColumn("cumt", coalesce(sum($"t").over(w), lit(0L)))
      .withColumn("rank2", lit(2L) * $"cumt" + $"t" + 1L)
      .agg(sum($"c1").as("n1"), sum($"c0").as("n0"),
        sum($"c1".cast("decimal(38,0)") * $"rank2").as("r1_2"))
      .select(expr(
        "cast(r1_2 - cast(n1 as decimal(38,0)) * (n1 + 1L) as double)" +
          " / (2D * cast(n1 as double) * cast(n0 as double))"))
      .as[Double].head()
    assert(math.abs(got - bruteAuc) < 1e-12, s"rank-sum $got vs brute $bruteAuc")
  }

  test("q265 math: Murphy decomposition recomposes the direct Brier score exactly") {
    // bins: (forecast p as a/b, eval n, eval positives)
    val bins = Seq((1L, 4L, 100L, 30L), (3L, 4L, 50L, 35L), (1L, 2L, 50L, 20L))
    val n = bins.map(_._3).sum.toDouble
    val o = bins.map(_._4).sum.toDouble
    val obar = o / n
    val rel = bins.map { case (a, b, nk, ok) =>
      val p = a.toDouble / b; val okr = ok.toDouble / nk
      nk * (p - okr) * (p - okr)
    }.sum / n
    val res = bins.map { case (_, _, nk, ok) =>
      val okr = ok.toDouble / nk; nk * (okr - obar) * (okr - obar)
    }.sum / n
    val unc = obar * (1 - obar)
    // direct Brier: mean over units of (p - y)^2
    val direct = bins.map { case (a, b, nk, ok) =>
      val p = a.toDouble / b
      ok * (p - 1) * (p - 1) + (nk - ok) * p * p
    }.sum / n
    assert(math.abs((rel - res + unc) - direct) < 1e-12)
  }

  test("q268 math: Kruskal-Wallis at k=2 equals the squared Mann-Whitney z (tie-corrected)") {
    // two groups over a tied 3-value domain: counts (v -> c1, c2)
    val cells = Seq((1, 4L, 2L), (2, 3L, 3L), (3, 1L, 5L))
    val n1 = cells.map(_._2).sum; val n2 = cells.map(_._3).sum; val n = n1 + n2
    // shared 2x-rank ladder
    var cum = 0L
    val rank2 = cells.map { case (v, c1, c2) =>
      val t = c1 + c2; val r2 = 2 * cum + t + 1; cum += t; (v, c1, c2, t, r2)
    }
    val r2g1 = rank2.map { case (_, c1, _, _, r2) => c1 * r2 }.sum
    val r2g2 = rank2.map { case (_, _, c2, _, r2) => c2 * r2 }.sum
    val tie3 = rank2.map { case (_, _, _, t, _) => t.toDouble * t * t - t }.sum
    val nd = n.toDouble
    // KW with tie correction
    val sterms = r2g1.toDouble * r2g1 / (4.0 * n1) + r2g2.toDouble * r2g2 / (4.0 * n2)
    val h = 12.0 * sterms / (nd * (nd + 1)) - 3.0 * (nd + 1)
    val hAdj = h / (1.0 - tie3 / (nd * nd * nd - nd))
    // MWU z with the same tie correction (q200's closed form):
    // U = R1 - n1(n1+1)/2, E[U] = n1*n2/2,
    // Var[U] = n1*n2/12 * ((n+1) - tie3/(n(n-1)))
    val mu = n1.toDouble * n2 / 2.0
    val varU = n1.toDouble * n2 / 12.0 *
      ((nd + 1) - tie3 / (nd * (nd - 1)))
    val u = r2g1.toDouble / 2.0 - n1.toDouble * (n1 + 1) / 2.0
    val z2 = (u - mu) / math.sqrt(varU)
    assert(math.abs(hAdj - z2 * z2) < 1e-9, s"H_adj $hAdj vs z^2 ${z2 * z2}")
  }

  test("q271 math: 2-level Cochran-Armitage chi2 equals the uncorrected 2x2 chi-square") {
    // doses 0/1 with outcome counts: (n_i, pos_i)
    val (n0v, p0) = (200L, 30L); val (n1v, p1) = (100L, 25L)
    val n = n0v + n1v; val pos = p0 + p1
    val swn = 1L * n1v; val sw2n = 1L * n1v; val swp = 1L * p1
    val num = (BigInt(n) * swp - BigInt(pos) * swn).toDouble
    val vinner = (BigInt(n) * sw2n - BigInt(swn) * swn).toDouble
    val vcore = pos.toDouble * (n - pos).toDouble * vinner
    val zca = num / math.sqrt(vcore / n)
    // textbook 2x2 chi-square (uncorrected)
    val a = p1.toDouble; val b = (n1v - p1).toDouble
    val c = p0.toDouble; val d = (n0v - p0).toDouble
    val chi2 = n.toDouble * math.pow(a * d - b * c, 2) /
      ((a + b) * (c + d) * (a + c) * (b + d))
    assert(math.abs(zca * zca - chi2) < 1e-9, s"CA ${zca * zca} vs chi2 $chi2")
  }

  test("q275 math: KMV reports the exact NDV when distinct hashes fall below k") {
    val ndv = 500
    val est = spark.range(0, 5000)
      .select(expr(s"cast(conv(substring(md5(concat('kmv|', cast(id % $ndv as string))), 1, 15), 16, 10) as bigint)").as("h"))
      .distinct().orderBy($"h").limit(1024)
      .agg(count(lit(1)).as("kk"), max($"h").as("hk"))
      .select(expr("case when kk < 1024 then cast(kk as double)" +
        " else (cast(1024 as double) - 1D) * 1152921504606846976D / cast(hk as double) end"))
      .as[Double].head()
    assert(est == ndv.toDouble)
  }

  test("q273 math: MA-12 detrending recovers a planted zero-sum seasonal exactly") {
    // y_t = 1000*t + s[month(t)] with a zero-sum integer seasonal:
    // the centered MA-12 numerator over a linear+zero-sum-seasonal
    // series is EXACTLY the linear part x24, so d24 = 24*s[month].
    val s12 = Array(6L, -2L, 4L, -6L, 2L, 0L, 8L, -8L, 3L, -3L, 1L, -5L)
    assert(s12.sum == 0)
    val ys = (1 to 48).map(t => (t.toLong, 1000L * t + s12((t - 1) % 12)))
    val got = ys.sliding(13).map { w13 =>
      val mid = w13(6)
      val num24 = w13.head._2 + w13.last._2 + 2L * w13.slice(1, 12).map(_._2).sum
      (mid._1, 24L * mid._2 - num24)
    }.toSeq
    got.foreach { case (t, d24) =>
      assert(d24 == 24L * s12(((t - 1) % 12).toInt),
        s"t=$t d24=$d24 expected ${24L * s12(((t - 1) % 12).toInt)}")
    }
  }

  test("q277/q282/q270/q264 invariants hold on sf0.001") {
    val rmst = SparkEntry.queries("q277_rmst")(spark, SparkSpec.Sf0001)
      .select($"s_tau", $"rmst_days").as[(Double, Double)].head()
    assert(rmst._1 >= 0.0 && rmst._1 <= 1.0)
    assert(rmst._2 > 0.0 && rmst._2 <= 365.0)
    val gw = SparkEntry.queries("q282_greenwood_ci")(spark, SparkSpec.Sf0001)
      .select($"s_t", $"greenwood_var").as[(Double, Double)].collect()
    gw.foreach { case (st, v) =>
      assert(st >= 0.0 && st <= 1.0 && v >= 0.0)
    }
    // survival can only fall with the horizon
    val sts = SparkEntry.queries("q282_greenwood_ci")(spark, SparkSpec.Sf0001)
      .orderBy($"horizon_days").select($"s_t").as[Double].collect().toSeq
    assert(sts == sts.sorted.reverse)
    val fk = SparkEntry.queries("q270_fleiss_kappa")(spark, SparkSpec.Sf0001)
      .select($"p_bar", $"p_e", $"fleiss_kappa").as[(Double, Double, Double)].head()
    assert(fk._1 >= 1.0 / 3.0 - 1e-12 && fk._1 <= 1.0) // 3 raters, 2 cats
    assert(fk._2 > 0.0 && fk._2 <= 1.0 && fk._3 <= 1.0)
    val auc = SparkEntry.queries("q264_roc_auc")(spark, SparkSpec.Sf0001)
      .select($"auc").as[Double].head()
    assert(auc >= 0.0 && auc <= 1.0)
  }
}
