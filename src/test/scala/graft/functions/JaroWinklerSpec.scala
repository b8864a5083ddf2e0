package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** [[JaroWinklerAlgo]] / [[JaroWinklerSim]]: DuckDB-parity constants
  * (captured from `jaro_winkler_similarity` — the oracle's exact
  * variant: floored transpositions, window max(⌊max/2⌋−1, 0), boost
  * only past 0.7, empty→0), plus codegen-vs-interpreted agreement and
  * metric sanity properties.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  /** (a, b, DuckDB jaro_winkler_similarity(a, b)) — values captured
    * verbatim from DuckDB; the driver compare prints doubles at %.17g,
    * so equality here must be BIT equality, not approximate.
    */
  private val duckPinned = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("dwayne", "duane", 0.8400000000000001),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("crate", "trace", 0.7333333333333334),
    ("abcd", "badc", 0.8333333333333334),
    ("cold widget", "cold gadget", 0.905050505050505),
    ("spring chocolate", "string chocolate", 0.9625),
    ("a", "a", 1.0),
    ("a", "b", 0.0),
    ("ab", "ba", 0.0), // window 0: only diagonal matches exist
    ("", "", 0.0),     // DuckDB convention: empty side → 0, even both
    ("x", "", 0.0),
    ("eadcaad", "bdbdcaddd", 0.5886243386243386),   // floored-t case
    ("adbeabbb", "deaeacee", 0.5833333333333334))   // floored-t case

  private def algo(a: String, b: String): Double =
    JaroWinklerAlgo.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("bit-identical to the pinned DuckDB values") {
    duckPinned.foreach { case (a, b, want) =>
      val got = algo(a, b)
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want),
        s"jw($a, $b): got $got want $want")
    }
  }

  test("codegen path agrees with the direct kernel") {
    val df = duckPinned.map(p => (p._1, p._2)).toDF("a", "b")
    val got = df.select(JaroWinklerSim.jaroWinkler($"a", $"b"))
      .as[Double].collect().toSeq
    assert(got == duckPinned.map(p => algo(p._1, p._2)))
  }

  test("metric sanity: symmetry, identity, bounds") {
    val words = Seq("alpha", "alpaca", "beta", "bean", "gamma", "gamme",
      "delta", "dleta", "epsilon", "")
    for (a <- words; b <- words) {
      val ab = algo(a, b)
      assert(ab == algo(b, a), s"asymmetric on ($a, $b)")
      assert(ab >= 0.0 && ab <= 1.0)
      if (a == b && a.nonEmpty) assert(ab == 1.0)
    }
  }

  test("winkler boost rewards shared prefixes above the threshold only") {
    // same jaro skeleton, prefix vs suffix typo
    val pre = algo("abcdefgh", "abcdefgx") // typo at tail: full boost
    val suf = algo("xbcdefgh", "abcdefgh") // typo at head: no prefix
    assert(pre > suf)
    // below the 0.7 gate a shared prefix must NOT boost: jaro(ab…, ab…)
    val low = algo("abqqqqqq", "abzzzz")
    val m = 2.0
    val rawJaro = (m / 8 + m / 6 + m / m) / 3.0
    assert(low == rawJaro) // unboosted despite the 2-char prefix
  }

  test("sql registration resolves via GraftExtensions-equivalent registry") {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_winkler"))) {
      reg.createOrReplaceTempFunction("jaro_winkler",
        exprs => JaroWinklerSim(exprs(0), exprs(1)), "scala_udf")
    }
    val got = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS s").as[Double].head()
    assert(got == 0.9611111111111111)
  }
}
