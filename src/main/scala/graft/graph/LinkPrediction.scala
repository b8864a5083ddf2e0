package graft.graph

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction (Liben-Nowell & Kleinberg 2003) on
  * the co-purchase graph: score every NON-adjacent part pair at
  * distance 2 by neighborhood Jaccard |Γa∩Γb| / |Γa∪Γb| — the
  * classical "products bought together with the same things but never
  * yet together" recommendation candidate list. The graph family so
  * far describes structure (q137/q152/q166/q182/q185/q207); this one
  * PREDICTS the missing edges.
  *
  * Exactness: common-neighbor counts come from the wedge join, degrees
  * from one aggregate, |Γa∪Γb| = da + db − cn — all exact longs; the
  * Jaccard is one mirrored IEEE division; top-20 orders by (jaccard
  * DESC, a, b) on bit-identical doubles.
  *
  * Scale shape: the wedge pass joins the edge list with itself on the
  * shared endpoint — Σ deg² work, the standard link-prediction cost,
  * with hot hubs split by AQE on the equi-join key (never a window);
  * candidate pairs compress map-side to (a, b, cn); adjacency removal
  * is one anti-join against the edge list; degrees broadcast
  * (vertex-bounded). Nothing larger than the wedge stream ever
  * exists, and it never materializes per-pair neighbor SETS.
  */
object LinkPrediction {

  val MinWeight = 2
  val TopK = 20

  val q216 = Q(
    "q216_link_prediction",
    (s, dir) => {
      import s.implicits._
      val lp = Tables.load(s, dir, "lineitem")
        .select($"l_orderkey".as("o"), $"l_partkey".as("p")) // raw: basketPairs dedups per basket
      val e = graft.Barrier(GraphQueries.coEdges(lp, bySrc = true)
        .filter($"w" >= MinWeight).select($"src", $"dst"))
      val deg = e.groupBy($"src".as("node")).agg(count(lit(1)).as("d"))
      val cn = e.as("x").join(e.as("y"),
          $"x.dst" === $"y.src" && $"x.src" < $"y.dst")
        .groupBy($"x.src".as("a"), $"y.dst".as("b"))
        .agg(count(lit(1)).as("cn"))
      val cand = cn.join(e.select($"src".as("a"), $"dst".as("b")),
          Seq("a", "b"), "left_anti")
      cand
        .join(broadcast(deg.select($"node".as("a"), $"d".as("da"))), "a")
        .join(broadcast(deg.select($"node".as("b"), $"d".as("db"))), "b")
        .select($"a".as("part_a"), $"b".as("part_b"), $"cn",
          ($"da" + $"db" - $"cn").as("uni"),
          ($"cn".cast("double") / ($"da" + $"db" - $"cn").cast("double"))
            .as("jaccard"))
        .orderBy($"jaccard".desc, $"part_a", $"part_b")
        .limit(TopK)
    },
    Some(s"""WITH lp AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |e AS MATERIALIZED (
      |  SELECT a.p AS src, b.p AS dst
      |  FROM lp a JOIN lp b ON a.o = b.o AND a.p <> b.p
      |  GROUP BY 1, 2 HAVING COUNT(*) >= $MinWeight),
      |deg AS (SELECT src AS node, COUNT(*) AS d FROM e GROUP BY 1),
      |cn AS (
      |  SELECT x.src AS a, y.dst AS b, COUNT(*) AS cn
      |  FROM e x JOIN e y ON x.dst = y.src AND x.src < y.dst
      |  GROUP BY 1, 2),
      |cand AS (
      |  SELECT c.* FROM cn c
      |  WHERE NOT EXISTS (SELECT 1 FROM e
      |                    WHERE e.src = c.a AND e.dst = c.b))
      |SELECT c.a AS part_a, c.b AS part_b, c.cn,
      |       da.d + db.d - c.cn AS uni,
      |       CAST(c.cn AS DOUBLE) / CAST(da.d + db.d - c.cn AS DOUBLE)
      |         AS jaccard
      |FROM cand c
      |JOIN deg da ON da.node = c.a JOIN deg db ON db.node = c.b
      |ORDER BY jaccard DESC, part_a, part_b LIMIT $TopK""".stripMargin),
    doc = s"graph: common-neighbor Jaccard link prediction — top-$TopK non-adjacent co-purchase part pairs via the wedge join (no neighbor-set materialization)")

  val all: Seq[Q] = Seq(q216)
}
