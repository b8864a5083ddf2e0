package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** CUBE multi-dimensional aggregate — the all-margins completion of
  * the OLAP set-op family (q58 ROLLUP gives the hierarchy prefix
  * margins; CUBE gives every subset): revenue and volume by
  * (returnflag, linestatus) with all four grouping levels in one
  * pass, labeled by an explicit grouping id.
  *
  * Exactness: sums ride the decimal money convention; the grouping id
  * is computed the same way on both engines (Spark `grouping_id()` ==
  * bit i set ⟺ column i aggregated; DuckDB `GROUPING(a, b)` matches),
  * and NULL group labels are coalesced to 'ALL' so label sorting
  * cannot differ across engines' NULL orderings.
  *
  * Scale shape: Spark expands CUBE in ONE Expand+aggregate pass
  * (each input row feeds all 4 grouping sets map-side) — no
  * per-margin rescans; the result is |A|·|B| + |A| + |B| + 1 rows.
  */
object CubeAgg {

  /** q165 — full CUBE of lineitem revenue/volume. */
  val q165 = Q(
    "q165_cube_margins",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .cube($"l_returnflag", $"l_linestatus")
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n"),
          graft.Q.sumMoney($"l_extendedprice").as("revenue"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
          coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
          $"gid", $"n", $"revenue")
        .orderBy($"gid", $"returnflag", $"linestatus")
    },
    Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |       COALESCE(l_linestatus, 'ALL') AS linestatus,
      |       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
      |       COUNT(*) AS n,
      |       ${graft.Q.oSum("l_extendedprice")} AS revenue
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, returnflag, linestatus""".stripMargin),
    doc = "OLAP: CUBE all-margins aggregate with engine-matched grouping ids (completes ROLLUP/PIVOT/UNPIVOT)")

  val all: Seq[Q] = Seq(q165)
}
