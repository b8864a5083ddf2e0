package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Goodman-Kruskal λ — proportional-reduction-in-error dependency
  * strength between categorical columns (Goodman & Kruskal 1954):
  * λ(A→B) = how much knowing A improves the best guess of B, from 0
  * (useless) to 1 (B is a function of A). q178 mines EXACT functional
  * dependencies (λ = 1); q163's MI is symmetric bits — λ is the
  * DIRECTED, interpretable middle: "knowing priority removes x% of
  * status-prediction errors". Profiled over the directed pairs of
  * (priority, status, order month), the shape a schema profiler
  * emits.
  *
  * Exactness: λ = (Σ_a max_b n_ab − max_b n_b) / (N − max_b n_b) —
  * every piece an exact integer from one contingency aggregate per
  * column pair; the division is one mirrored IEEE op.
  *
  * Scale shape: each pair costs one map-side-combinable cell
  * aggregate bounded by its domain product (≤ 5·3·12 cells); maxima
  * and sums act on those cell frames. Six pairs = six cheap scans of
  * the same cached projection (a multi-pair profiler would share one
  * grouping-sets pass; kept separate here for per-pair clarity).
  */
object GkLambda {

  private val Cols = Seq(
    ("pri", "st"), ("st", "pri"),
    ("mo", "st"), ("st", "mo"),
    ("pri", "mo"), ("mo", "pri"))

  private def lambdaFor(base: DataFrame, a: String, b: String): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    val cells = base.groupBy(col(a).as("av"), col(b).as("bv"))
      .agg(count(lit(1)).as("n"))
    val perA = cells.groupBy($"av").agg(max($"n").as("mx"))
      .agg(sum($"mx").as("sum_max_a"))
    val marg = cells.groupBy($"bv").agg(sum($"n").as("nb"))
      .agg(max($"nb").as("max_b"), sum($"nb").as("nn"))
    perA.crossJoin(marg)
      .select(lit(a).as("from_col"), lit(b).as("to_col"),
        $"nn".as("n"), $"sum_max_a", $"max_b",
        (($"sum_max_a" - $"max_b").cast("double")
          / ($"nn" - $"max_b").cast("double")).as("lambda"))
  }

  val q226 = Q(
    "q226_gk_lambda",
    (s, dir) => {
      import s.implicits._
      val base = graft.Barrier(Tables.load(s, dir, "orders")
        .select($"o_orderpriority".as("pri"), $"o_orderstatus".as("st"),
          month($"o_orderdate").as("mo")))
      Cols.map { case (a, b) => lambdaFor(base, a, b) }
        .reduce(_.unionByName(_))
        .orderBy($"from_col", $"to_col")
    },
    Some {
      def one(a: String, b: String): String =
        s"""SELECT '$a' AS from_col, '$b' AS to_col,
           |  (SELECT CAST(SUM(n) AS BIGINT) FROM cells_${a}_$b) AS n,
           |  (SELECT CAST(SUM(mx) AS BIGINT) FROM
           |     (SELECT MAX(n) AS mx FROM cells_${a}_$b GROUP BY av)) AS sum_max_a,
           |  (SELECT CAST(MAX(nb) AS BIGINT) FROM
           |     (SELECT SUM(n) AS nb FROM cells_${a}_$b GROUP BY bv)) AS max_b,
           |  CAST((SELECT SUM(mx) FROM
           |     (SELECT MAX(n) AS mx FROM cells_${a}_$b GROUP BY av))
           |    - (SELECT MAX(nb) FROM
           |       (SELECT SUM(n) AS nb FROM cells_${a}_$b GROUP BY bv)) AS DOUBLE)
           |  / CAST((SELECT SUM(n) FROM cells_${a}_$b)
           |    - (SELECT MAX(nb) FROM
           |       (SELECT SUM(n) AS nb FROM cells_${a}_$b GROUP BY bv)) AS DOUBLE)
           |    AS lambda""".stripMargin
      val cellCtes = Cols.map { case (a, b) =>
        s"""cells_${a}_$b AS MATERIALIZED (
           |  SELECT $a AS av, $b AS bv, COUNT(*) AS n FROM base GROUP BY 1, 2)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH base AS MATERIALIZED (
         |  SELECT o_orderpriority AS pri, o_orderstatus AS st,
         |         CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo
         |  FROM orders),
         |$cellCtes
         |${Cols.map { case (a, b) => one(a, b) }.mkString("\nUNION ALL\n")}
         |ORDER BY from_col, to_col""".stripMargin
    },
    doc = "profile: Goodman-Kruskal lambda dependency strength over six directed column pairs (priority/status/month) — exact contingency integers, one IEEE division each")

  val all: Seq[Q] = Seq(q226)
}
