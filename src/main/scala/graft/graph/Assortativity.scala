package graft.graph

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Degree assortativity of the co-purchase backbone (Newman 2002) —
  * do popular items link to popular items (r > 0, social-network
  * shape) or to the periphery (r < 0, hub-and-spoke shape)? The third
  * structural statistic beside q137's centrality and q152's closure,
  * and the input to whether degree-targeted sampling will bias a
  * graph cut.
  *
  * Exactness: r is the Pearson correlation of (deg(u), deg(v)) over
  * DIRECTED edge endpoints (both orientations, the standard
  * symmetric-graph convention). All five moment sums are EXACT longs;
  * the single float expression (nΣxy − SxSy)/(√(nΣx²−Sx²)·√(nΣy²−Sy²))
  * runs on those identical integers with the identical shape in both
  * engines — bit-identical doubles, the q151 stance, no rounding
  * negotiation.
  *
  * Scale shape: degrees are one aggregate over the (already bounded)
  * backbone edge list; the moment fold is one map-side-combinable
  * aggregate over 2|E| narrow rows with two broadcast-joined degree
  * lookups. Long ceiling: n·Σxy < 2⁶³ holds past 10¹² edge-degree²
  * products — beyond any backbone this prune emits.
  */
object Assortativity {

  /** q166 — backbone degree assortativity. */
  val q166 = Q(
    "q166_degree_assortativity",
    (s, dir) => {
      import s.implicits._
      val lp = Tables.load(s, dir, "lineitem")
        .select($"l_orderkey".as("o"), $"l_partkey".as("p")) // raw: basketPairs dedups per basket
      val e = graft.Barrier(Triangles.backbone(lp))
      val deg = e.select($"a".as("v")).unionAll(e.select($"b".as("v")))
        .groupBy($"v").agg(count(lit(1)).as("deg"))
      val dirEdges = e.select($"a".as("src"), $"b".as("dst"))
        .unionAll(e.select($"b".as("src"), $"a".as("dst")))
      dirEdges
        .join(broadcast(deg.select($"v".as("src"), $"deg".as("x"))), "src")
        .join(broadcast(deg.select($"v".as("dst"), $"deg".as("y"))), "dst")
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"y").as("sxy"),
          sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"))
        .select($"n", $"sxy",
          ((($"n" * $"sxy" - $"sx" * $"sy").cast("double")) /
            (sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double")) *
             sqrt(($"n" * $"syy" - $"sy" * $"sy").cast("double"))))
            .as("assortativity"))
    },
    Some("""WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |e0 AS (
      |  SELECT x.p AS a, y.p AS b, COUNT(*) AS cw
      |  FROM lp x JOIN lp y ON x.o = y.o AND x.p < y.p
      |  GROUP BY 1, 2),
      |e AS (SELECT a, b FROM e0 WHERE cw >= 2),
      |deg AS (
      |  SELECT v, COUNT(*) AS deg
      |  FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
      |de AS (
      |  SELECT a AS src, b AS dst FROM e
      |  UNION ALL SELECT b, a FROM e),
      |m AS (
      |  SELECT COUNT(*) AS n,
      |         CAST(SUM(dx.deg) AS BIGINT) AS sx,
      |         CAST(SUM(dy.deg) AS BIGINT) AS sy,
      |         CAST(SUM(dx.deg * dy.deg) AS BIGINT) AS sxy,
      |         CAST(SUM(dx.deg * dx.deg) AS BIGINT) AS sxx,
      |         CAST(SUM(dy.deg * dy.deg) AS BIGINT) AS syy
      |  FROM de JOIN deg dx ON dx.v = de.src JOIN deg dy ON dy.v = de.dst)
      |SELECT n, sxy,
      |       CAST(n * sxy - sx * sy AS DOUBLE) /
      |         (SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |          SQRT(CAST(n * syy - sy * sy AS DOUBLE))) AS assortativity
      |FROM m""".stripMargin),
    doc = "graph: Newman degree assortativity of the backbone — exact-integer moments, one IEEE expression")

  val all: Seq[Q] = Seq(q166)
}
