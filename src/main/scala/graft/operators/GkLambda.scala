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
  * Scale shape (reworked r12 — the sweep's 36-exchange outlier): ONE
  * map-side-combinable contingency-cube aggregate over the corpus —
  * groupBy(pri, st, mo) — whose result is bounded by the DOMAIN
  * PRODUCT (≤ 5·3·12 cells at any corpus size), then all six directed
  * λs are exact integer folds of that bounded frame on the driver
  * (the q137-nv driver-literal discipline: bounded aggregate →
  * literal arithmetic, no per-pair re-scan). The former shape ran six
  * independent cells/max/marginal pipelines — 6 corpus aggregates and
  * 36 exchanges where one suffices; the fused pass is the
  * grouping-sets fusion the old doc said a profiler "would" do.
  */
object GkLambda {

  private val Cols = Seq(
    ("pri", "st"), ("st", "pri"),
    ("mo", "st"), ("st", "mo"),
    ("pri", "mo"), ("mo", "pri"))

  val q226 = Q(
    "q226_gk_lambda",
    (s, dir) => {
      import s.implicits._
      // one distributed pass; the collect is domain-bounded, not
      // corpus-bounded (≤ |priority|·|status|·|month| rows)
      val cells = Tables.load(s, dir, "orders")
        .select($"o_orderpriority".as("pri"), $"o_orderstatus".as("st"),
          month($"o_orderdate").as("mo"))
        .groupBy($"pri", $"st", $"mo").agg(count(lit(1)).as("n"))
        .collect()
      def pick(r: org.apache.spark.sql.Row, c: String): Any =
        c match { case "pri" => r.get(0); case "st" => r.get(1)
                  case _ => r.get(2) }
      val rows = Cols.map { case (a, b) =>
        if (cells.isEmpty)
          // empty corpus: the old global-agg crossJoin emitted one
          // all-NULL row per pair — preserve that
          (a, b, None: Option[Long], None: Option[Long],
            None: Option[Long], None: Option[Double])
        else {
          // n_ab: pair cells summed over the third column; all exact longs
          val ab: Map[(Any, Any), Long] =
            cells.groupBy(r => (pick(r, a), pick(r, b)))
              .map { case (k, rs) => k -> rs.map(_.getLong(3)).sum }
          val sumMaxA = ab.groupBy(_._1._1)
            .map { case (_, m) => m.values.max }.sum
          val maxB = ab.groupBy(_._1._2)
            .map { case (_, m) => m.values.sum }.max
          val nn = ab.values.sum
          // one IEEE division, same operands the SQL form divided
          (a, b, Some(nn), Some(sumMaxA), Some(maxB),
            Some((sumMaxA - maxB).toDouble / (nn - maxB).toDouble))
        }
      }
      rows.toDF("from_col", "to_col", "n", "sum_max_a", "max_b", "lambda")
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
