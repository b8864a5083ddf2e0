package graft.operators

import graft.SparkSpec
import graft.graph.Triangles
import org.apache.spark.sql.functions._

/** Fixture checks for q166 (assortativity) and q167 (Gini): known
  * closed-form graph shapes and hand-computable concentration
  * ledgers.
  */
class GiniAssortSpec extends SparkSpec {
  import spark.implicits._

  private def assortOf(edges: Seq[(Long, Long)]): Double = {
    val e = edges.toDF("a", "b")
    val deg = e.select($"a".as("v")).unionAll(e.select($"b".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("deg"))
    val de = e.select($"a".as("src"), $"b".as("dst"))
      .unionAll(e.select($"b".as("src"), $"a".as("dst")))
    de.join(deg.select($"v".as("src"), $"deg".as("x")), "src")
      .join(deg.select($"v".as("dst"), $"deg".as("y")), "dst")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"))
      .select(((($"n" * $"sxy" - $"sx" * $"sy").cast("double")) /
        (sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double")) *
         sqrt(($"n" * $"syy" - $"sy" * $"sy").cast("double")))).as("r"))
      .as[Double].head()
  }

  test("star graph is maximally disassortative (r = -1)") {
    val star = (2L to 7L).map(v => (1L, v))
    assert(math.abs(assortOf(star) - (-1.0)) < 1e-12)
  }

  test("two separate cliques of different sizes are perfectly assortative (r = 1)") {
    // within a clique every endpoint has the same degree; two sizes
    // give the moment spread that makes r defined, and r = 1 exactly
    val k3 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val k4 = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    assert(math.abs(assortOf(k3 ++ k4) - 1.0) < 1e-12)
  }

  test("gini: equal values give 0, total concentration approaches 1") {
    def gini(xs: Seq[Long]): Double = {
      val sorted = xs.sorted.zipWithIndex
      val n = xs.size.toLong
      val s = xs.sum
      val r = sorted.map { case (x, i) => (i + 1) * x }.sum
      (2.0 * r - (n + 1) * s).toDouble / (n.toDouble * s)
    }
    assert(gini(Seq(5L, 5L, 5L, 5L)) == 0.0)
    assert(gini(Seq(0L, 0L, 0L, 100L)) == 0.75) // (n-1)/n
    // engine fold matches the driver replica on a mixed ledger
    val xs = Seq(10L, 40L, 250L, 700L)
    val ranked = DistributedRank.withRowNumber(
      xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("k", "cents"),
      Seq($"cents".asc, $"k".asc), out = "rk")
    val got = ranked.agg(count(lit(1)).as("n"), sum($"cents").as("s"),
        sum($"rk" * $"cents").as("r"))
      .select((((lit(2L) * $"r" - ($"n" + 1L) * $"s").cast("double")) /
        (($"n" * $"s").cast("double"))).as("g"))
      .as[Double].head()
    assert(got == gini(xs))
  }
}
