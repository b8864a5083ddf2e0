package graft.graph

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Personalized PageRank / random-walk-with-restart (Haveliwala 2002)
  * from the busiest part: q137's global PageRank answers "what is
  * important overall"; seeding the teleport at ONE vertex answers
  * "what is important NEAR this item" — the similarity ranking
  * item-to-item recommenders actually serve. Seed = the
  * highest-degree part (deterministic argmax, the q185 convention);
  * α = 0.15 restarts.
  *
  * Exactness: the walk runs in integer ppb — per-edge contribution
  * c = p(t)·w div W(t) (truncating div ≡ flooring //, positive
  * operands), received mass Σc is bounded by the total 10⁹ so the
  * sum never overflows int64 at ANY corpus scale; damping is
  * (Σc·850) div 1000 + 1.5·10⁸ at the seed. K = 8 fixed rounds (the
  * q137/q182/q211 fixed-iteration stance), each lineage-cut.
  *
  * Scale shape: the co-purchase edge frame builds once behind a
  * Barrier with window out-weights (q137's one-exchange shape); each
  * round is one equi-join + map-side aggregate on vertex-sized
  * frames; top-10 via TakeOrdered.
  */
object Ppr {

  val K = 8
  val MinWeight = 2

  val q230 = Q(
    "q230_personalized_pagerank",
    (s, dir) => {
      import s.implicits._
      val lp = Tables.load(s, dir, "lineitem")
        .select($"l_orderkey".as("o"), $"l_partkey".as("p")) // raw: basketPairs dedups per basket
      val e = graft.Barrier(GraphQueries.coEdges(lp, bySrc = true)
        .filter($"w" >= MinWeight)
        .withColumn("wout", sum($"w").over(Window.partitionBy($"src"))))
      // The seed is ONE long off a deterministic argmax (LIMIT 1 —
      // bounded at any corpus size): take it on the driver and fold
      // it into every round as a literal. The former
      // crossJoin(broadcast(seed)) re-submitted a broadcast-exchange
      // job in p0 AND in each of the K rounds — 9 scheduling-constant
      // jobs that carried one long each (the q137 nv lesson).
      // headOption: an empty graph yields no seed; the walk frame is
      // empty then too, so any literal works — use 0 to keep the plan
      // well-formed.
      val seedId = e.groupBy($"src").agg(count(lit(1)).as("d"))
        .orderBy($"d".desc, $"src").limit(1)
        .select($"src".as("seed"))
        .collect().headOption.map(_.getLong(0)).getOrElse(0L)
      // K rounds on the co-partitioned RDD loop (see
      // GraphQueries.messageRounds — one narrow join + one reduceByKey
      // per round, zero per-round Catalyst/AQE planning; the DataFrame
      // cut-per-round form paid ~0.2 s of driver planning per round).
      // Same truncating positive-long arithmetic as the SQL `div`
      // form; multiplyExact makes the (p·w) product LOUD on overflow
      // (the decimal cast it replaces was silent-proof to 10³⁸; a
      // long is exact to w ≤ 2⁶³/10⁹ ≈ 9·10⁹ co-purchases per pair,
      // and past that the walk fails fast instead of wrapping).
      val p = GraphQueries.messageRounds(e, K,
        init = n => if (n == seedId) 1000000000L else 0L,
        msg = (pr, w, wout) => Math.multiplyExact(pr, w) / wout,
        fold = (v, m) => Math.multiplyExact(m, 850L) / 1000L +
          (if (v == seedId) 150000000L else 0L))
        .select($"p".as("node"), $"r".as("p"))
      p.orderBy($"p".desc, $"node").limit(10)
        .withColumn("rank",
          row_number().over(Window.orderBy($"p".desc, $"node")))
        .select($"rank", $"node".as("part"), $"p".as("ppr_ppb"))
        .orderBy($"rank")
    },
    Some {
      require(K <= 10,
        s"q230 oracle unrolls $K walk rounds as MATERIALIZED CTEs; " +
          "ceiling is 10 — re-measure DuckDB wall time before raising")
      val sb = new StringBuilder
      sb ++= s"""WITH lp AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS MATERIALIZED (
        |  SELECT src, dst, w,
        |         CAST(SUM(w) OVER (PARTITION BY src) AS BIGINT) AS wout
        |  FROM (SELECT a.p AS src, b.p AS dst, COUNT(*) AS w
        |        FROM lp a JOIN lp b ON a.o = b.o AND a.p <> b.p
        |        GROUP BY 1, 2 HAVING COUNT(*) >= $MinWeight)),
        |seed AS MATERIALIZED (
        |  SELECT src AS seed FROM (
        |    SELECT src, COUNT(*) AS d FROM e GROUP BY 1)
        |  ORDER BY d DESC, src LIMIT 1),
        |p0 AS MATERIALIZED (
        |  SELECT src AS node,
        |         CASE WHEN src = (SELECT seed FROM seed)
        |              THEN CAST(1000000000 AS BIGINT)
        |              ELSE CAST(0 AS BIGINT) END AS p
        |  FROM (SELECT DISTINCT src FROM e))""".stripMargin
      for (k <- 1 to K) {
        sb ++= s""",
          |p$k AS MATERIALIZED (
          |  SELECT e.dst AS node,
          |         CAST(SUM(CAST(q.p AS HUGEINT) * e.w // e.wout)
          |                * 850 // 1000
          |              + CASE WHEN e.dst = (SELECT seed FROM seed)
          |                     THEN 150000000 ELSE 0 END AS BIGINT) AS p
          |  FROM e JOIN p${k - 1} q ON q.node = e.src
          |  GROUP BY e.dst)""".stripMargin
      }
      sb ++= s"""
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY p DESC, node) AS INT) AS rank,
        |       node AS part, p AS ppr_ppb
        |FROM p$K ORDER BY p DESC, node LIMIT 10""".stripMargin
      sb.toString
    },
    doc = s"graph: personalized PageRank (RWR, alpha=0.15, $K integer-ppb rounds) from the busiest part — the item-to-item proximity ranking, top-10")

  val all: Seq[Q] = Seq(q230)
}
