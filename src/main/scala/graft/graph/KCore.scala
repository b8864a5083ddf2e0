package graft.graph

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peel ladder (Seidman 1983; the degeneracy-ordering prefix) —
  * the subgraph-density profile of the co-purchase graph: round r
  * removes every vertex whose CURRENT degree is < k, so the ladder
  * reports how fast the periphery strips away and how large the
  * dense residue is. The ladder stance makes the operator exact
  * WITHOUT a convergence loop: a FIXED number of peel rounds is
  * reported (round, removed, remaining vertices, remaining edges) —
  * deterministic whether or not the peel has stabilized, unlike a
  * "peel until fixpoint" whose round count is data-dependent and
  * whose oracle would have to guess it. (q137 PageRank / q182 HITS
  * take the same fixed-iteration stance for the same reason.)
  *
  * Exactness: pure integer set algebra — degrees, semi-joins,
  * counts; no floats anywhere.
  *
  * Scale shape: edges build once behind a Barrier (the q185 w ≥ 2
  * co-purchase graph: distinct basket membership, pair aggregate —
  * never the raw lineitem fanout); each round is one degree
  * aggregate + one anti/semi-join wave, and the frame PER ROUND
  * never exceeds the edge list. Both the survivor set and the edge
  * frame are lineage-CUT per round ([[graft.Barrier.cut]] —
  * localCheckpoint, or a fault-tolerant checkpoint under
  * `spark.graft.barrierStorage=RELIABLE_CHECKPOINT`), the q182
  * discipline that keeps Catalyst's re-analysis cost flat in the
  * round count.
  */
object KCore {

  val CoreK = 3
  val Rounds = 6
  val MinWeight = 2

  val q207 = Q(
    "q207_kcore_peel",
    (s, dir) => {
      import s.implicits._
      val lp = Tables.load(s, dir, "lineitem")
        .select($"l_orderkey".as("o"), $"l_partkey".as("p")) // raw: basketPairs dedups per basket
      var e = graft.Barrier(GraphQueries.coEdges(lp, bySrc = true)
        .filter($"w" >= MinWeight).select($"src", $"dst"))
      // Survivors derive DIRECTLY from the degree aggregate: the
      // degree frame's domain is exactly the still-active vertex set
      // (the edge frame only ever connects survivors, and a survivor
      // that lost its last edge has degree 0 < k, i.e. is absent),
      // so the former active⟕deg join + flagged filter per round were
      // two redundant operators; removal counts are successive
      // survivor-count differences (|active(r−1)| − |active(r)|).
      var prevN = e.select($"src").distinct()
        .agg(count(lit(1)).as("n_prev"))
      val rounds = (1 to Rounds).map { r =>
        val kept = graft.Barrier.cut(
          e.groupBy($"src".as("node")).agg(count(lit(1)).as("d"))
            .filter($"d" >= CoreK).select($"node"))
        e = graft.Barrier.cut(
          e.join(kept, e("src") === kept("node"), "left_semi")
            .join(kept, e("dst") === kept("node"), "left_semi"))
        val nAct = kept.agg(count(lit(1)).as("n_active"))
        val row = prevN.crossJoin(nAct)
          .crossJoin(e.agg(count(lit(1)).as("n_edges")))
          .select(lit(r).as("round"),
            ($"n_prev" - $"n_active").as("n_removed"),
            $"n_active", $"n_edges")
        prevN = nAct.select($"n_active".as("n_prev"))
        row
      }
      rounds.reduce(_.unionByName(_)).orderBy($"round")
    },
    Some {
      // Unroll ceiling (the Bpe.roundsCte / q182 guard): 4 MATERIALIZED
      // CTEs per peel round; a careless Rounds bump must fail at build
      // time, not time DuckDB out.
      require(Rounds <= 8,
        s"q207 oracle unrolls $Rounds peel rounds as MATERIALIZED CTEs; " +
          "ceiling is 8 — re-measure DuckDB wall time before raising")
      val sb = new StringBuilder
      sb ++= s"""WITH lp AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS MATERIALIZED (
        |  SELECT a.p AS src, b.p AS dst
        |  FROM lp a JOIN lp b ON a.o = b.o AND a.p <> b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= $MinWeight),
        |a0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e0)""".stripMargin
      for (r <- 1 to Rounds) {
        val (ep, ap) = (s"e${r - 1}", s"a${r - 1}")
        sb ++= s""",
          |deg$r AS (SELECT src AS node, COUNT(*) AS d FROM $ep GROUP BY 1),
          |rem$r AS MATERIALIZED (
          |  SELECT a.node FROM $ap a LEFT JOIN deg$r g USING (node)
          |  WHERE COALESCE(g.d, 0) < $CoreK),
          |a$r AS MATERIALIZED (
          |  SELECT node FROM $ap
          |  EXCEPT SELECT node FROM rem$r),
          |e$r AS MATERIALIZED (
          |  SELECT e.src, e.dst FROM $ep e
          |  JOIN a$r s ON s.node = e.src JOIN a$r t ON t.node = e.dst)"""
          .stripMargin
      }
      sb ++= "\n"
      sb ++= (1 to Rounds).map { r =>
        s"""SELECT $r AS round,
           |  (SELECT COUNT(*) FROM rem$r) AS n_removed,
           |  (SELECT COUNT(*) FROM a$r) AS n_active,
           |  (SELECT COUNT(*) FROM e$r) AS n_edges""".stripMargin
      }.mkString("\nUNION ALL\n")
      sb ++= "\nORDER BY round"
      sb.toString
    },
    doc = s"graph: fixed-$Rounds-round k-core (k=$CoreK) peel ladder on the co-purchase graph — per-round removed/remaining counts, lineage-cut per round")

  val all: Seq[Q] = Seq(q207)
}
