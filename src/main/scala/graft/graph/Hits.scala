package graft.graph

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities (Kleinberg 1999) over the BIPARTITE
  * customer→part purchase graph — the dual-score complement to
  * q137's PageRank: a part is authoritative when bought by strong
  * hub customers, a customer is a hub when buying authoritative
  * parts. On a bipartite graph the two scores are genuinely
  * different ledgers (on q137's symmetric co-purchase graph they
  * would collapse into one).
  *
  * Exactness: integer mutual recursion with SUM-normalization once
  * per FULL round (r13 — it was once per half-step): hub scores are
  * rescaled to Σ = 10¹² via `div` against the 1-row total (folded in
  * as a driver literal), authority scores stay raw inside the loop
  * and are normalized once at output. Every value is an exact
  * integer in both engines; truncation mass loss is deterministic
  * and identical (the oracle SQL moved with the algorithm — the
  * truncation points are part of the query's definition, the q63
  * integer-exact discipline).
  *
  * Overflow bounds (mass conservation, maxw = heaviest single (c,p)
  * pair weight): with hubs normalized to Σh = 10¹², raw authority
  * values and their per-part long sums are ≤ maxw·10¹², safe in
  * int64 while maxw < 9·10⁶; the next hub half-step multiplies
  * again (≤ maxw²·10¹²), so that aggregate runs in decimal(38)
  * (DuckDB: HUGEINT), where even the rescale product
  * maxw²·10¹²·Scale stays inside 10³⁸ while maxw < 10⁷ — two
  * decades above any measured pair weight (zipf-sf1's hottest pair
  * is O(10³)).
  *
  * Scale shape: the edge list (distinct customer–part purchase
  * pairs, weighted by order count) builds ONCE, then is lineage-cut
  * TWICE — pre-hashed by each join key (`c`, then `p` derived from
  * the first copy, never recomputing the base aggregate). This is
  * the GraphX routing-table trade: edge storage ×2 so NO half-step
  * ever moves the corpus-sized edge frame again — the LogicalRDD a
  * cut produces carries its hash partitioning, so each half-step
  * join exchanges only the tiny score frame, and the one remaining
  * corpus-sized shuffle per half-step is the score aggregation
  * itself. At 100 TB that is k edge shuffles instead of 2·k+2.
  *
  * Barrier economics (r13 — the VERDICT r12 item-1 fix): the old
  * per-half-step normalize cost SEVEN serial cut + 1-row-aggregate
  * driver round trips for 3 rounds (q182 profiled 18 s / 44 jobs at
  * sf1 — scheduling barriers, not compute). Normalizing once per
  * round fuses each round into ONE materializing action (the Σ
  * aggregate that also freezes the round's lazy cuts: the a-frame
  * cut rides the h-aggregate's job), so 3 rounds cost 4 corpus
  * barriers + one block-cached re-read for the output ledger.
  * Top-10s are TakeOrdered; row numbering is post-limit.
  */
object Hits {

  private val Scale = 1000000000000L
  private val Iters = 3

  /** Weighted bipartite purchase edges (c, p, w), hash-partitioned by
    * `c` — the layout [[hits]] requires. The explicit repartition runs
    * BEFORE the pair aggregate: HashPartitioning(c) satisfies the
    * aggregate's ClusteredDistribution(c, p) (same-c rows are
    * co-located, a fortiori same-(c,p)), so the groupBy adds NO
    * exchange and its output keeps the c-partitioning — one corpus
    * shuffle where agg-then-repartition paid two (r13; the map-side
    * combine the early shuffle forgoes is negligible here, the join
    * fanout is ≈ the distinct pair count).
    */
  private[graph] def purchaseEdges(s: org.apache.spark.sql.SparkSession,
                                   dir: String): DataFrame = {
    import s.implicits._
    // Deliberately NOT a broadcast join (r13, measured): hinting the
    // orders (key, custkey) projection broadcast removes the two
    // o_orderkey exchanges — and made q182 3× SLOWER at sf1 (14 → 42 s
    // interleaved), because that first exchange is ALSO what spreads
    // the few-row-group lineitem scan across the session's cores; with
    // it gone the scan→probe→partial-aggregate pipeline runs at file
    // parallelism (the Tables.load "facts are left alone — their first
    // shuffle comes fast" contract). The SMJ's sort is the price of
    // corpus-wide parallelism here, and at 100 TB orders is
    // corpus-sized anyway, so the shuffled join is also the only
    // correct asymptotic shape.
    Tables.load(s, dir, "orders").select($"o_orderkey", $"o_custkey")
      .join(Tables.load(s, dir, "lineitem")
        .select($"l_orderkey".as("o_orderkey"), $"l_partkey"), "o_orderkey")
      .select($"o_custkey".as("c"), $"l_partkey".as("p"))
      .repartition($"c")
      .groupBy($"c", $"p").agg(count(lit(1)).as("w"))
  }

  /** (hubs(c, h), auths(p, a)) after `iters` rounds, hubs normalized
    * per round and auths once at output — the testable core.
    * `edges0` SHOULD arrive hash-partitioned by `c`
    * ([[purchaseEdges]] guarantees it): the cut's LogicalRDD
    * preserves that partitioning, so no half-step join ever exchanges
    * the edge side. An unpartitioned caller (spec fixtures) is merely
    * slower — each h-side join re-exchanges the edge frame.
    */
  private[graph] def hits(edges0: DataFrame, iters: Int = Iters,
                          checkFrom: Int = GraphQueries.ConvergenceCheckFrom)
      : (DataFrame, DataFrame) = {
    val s = edges0.sparkSession
    import s.implicits._
    // Two key-partitioned lineage cuts of the edge list (class doc):
    // the second copy derives from the first — one extra shuffle,
    // zero recomputation of the base join+aggregate.
    val e = graft.Barrier.cut(edges0)
    val eByP = graft.Barrier.cut(e.repartition($"p"))
    // Barrier.cut (lazy localCheckpoint by default, reliable
    // checkpoint on a cluster) — iteration must CUT the logical plan:
    // a cache leaves the full round-deep tree for Catalyst/AQE to
    // re-analyze per action, and planning cost compounds across
    // rounds (measured 103 s uncut / 21 s cached / 2.9 s checkpointed
    // at sf0.1). The frames are score-entity-sized, so cuts are cheap.
    // The normalization total is ONE decimal off a 1-row aggregate
    // (bounded at any corpus size): take it on the driver and fold it
    // into the rescale as a typed literal — the same job materializes
    // the cut's blocks, so a normalize is exactly one driver round
    // trip. cast('…' as decimal(38,0)) reconstructs the identical
    // operand type, so IntegralDivide emits bit-identical longs. An
    // all-zero or empty frame sums to NULL/0 → keep t=1: every score
    // is 0 and 0 div 1 = 0 (zero mass normalizes to zero share; the
    // pre-literal crossJoin form would have propagated NULL — the 0
    // reading is deliberate, recorded here).
    def normalize(df0: DataFrame, col: String): DataFrame = {
      val df = graft.Barrier.cut(df0)
      val t = Option(df.agg(
        sum(org.apache.spark.sql.functions.col(col).cast("decimal(38,0)")))
        .head().getDecimal(0))
        .filter(_.signum != 0).map(_.toPlainString).getOrElse("1")
      df.select(df.columns.filter(_ != col).map(org.apache.spark.sql.functions.col) :+
        expr(s"(cast($col as decimal(38,0)) * $Scale) div " +
          s"cast('$t' as decimal(38,0))").as(col): _*)
    }
    var hubs = normalize(
      e.groupBy($"c").agg(sum($"w").as("h")), "h")
    var authsRaw: DataFrame = null
    // fixed-point early exit (GraphQueries.messageRounds rationale):
    // hubs_{t+1} is a pure function of hubs_t, so exact long equality
    // of consecutive hub frames means every later round repeats both
    // ledgers — and `authsRaw` already holds the fixed point's
    // companion (it was computed from the unchanged hubs). Never
    // armed below ConvergenceCheckFrom, so the default 3-round q182
    // pays no check.
    var round = 1
    var converged = false
    while (round <= iters && !converged) {
      // raw authority half-step: long arithmetic (bound in class
      // doc). Cut so the output-ledger normalize re-reads blocks
      // instead of re-running the corpus join; the cut is lazy and
      // materializes inside the SAME job as the round's h-aggregate.
      authsRaw = graft.Barrier.cut(
        e.join(hubs, "c").groupBy($"p").agg(sum($"w" * $"h").as("a")))
      // hub half-step in decimal(38): w·a products exceed int64 at
      // adversarial pair weights (class doc); normalize's div returns
      // the frame to exact longs.
      val next = normalize(
        eByP.join(authsRaw, "p").groupBy($"c")
          .agg(sum($"w".cast("decimal(38,0)") * $"a").as("h")), "h")
      if (round >= checkFrom && round < iters)
        converged = GraphQueries.roundsEqual(hubs, next, "c", "h")
      hubs = next
      round += 1
    }
    (hubs, normalize(authsRaw, "a"))
  }

  /** q182 — top-10 authorities and hubs, one stacked ledger. */
  val q182 = Q(
    "q182_hits_scores",
    (s, dir) => {
      import s.implicits._
      val (hubs, auths) = hits(purchaseEdges(s, dir))
      def top(df: DataFrame, kind: String, key: String, score: String) = {
        val t = df.orderBy(col(score).desc, col(key)).limit(10)
        t.withColumn("pos",
            row_number().over(Window.orderBy(col(score).desc, col(key))))
          .select(lit(kind).as("kind"), col(key).cast("long").as("node_key"),
            col(score).as("score"), $"pos")
      }
      top(auths, "authority", "p", "a")
        .unionByName(top(hubs, "hub", "c", "h"))
        .orderBy($"kind", $"pos")
    },
    Some {
      // Unroll ceiling (the Bpe.roundsCte guard, same rationale): the
      // oracle chains 3 MATERIALIZED CTEs per HITS round; a careless
      // Iters bump must fail at build time, not time DuckDB out.
      require(Iters <= 8,
        s"q182 oracle unrolls $Iters HITS rounds as MATERIALIZED CTEs; " +
          "ceiling is 8 — re-measure DuckDB wall time before raising")
      def norm(src: String, col: String): String =
        s"SELECT * REPLACE (CAST((CAST($col AS HUGEINT) * $Scale) // " +
          s"(SELECT CAST(SUM($col) AS HUGEINT) FROM $src) AS BIGINT) AS $col) FROM $src"
      val sb = new StringBuilder
      sb ++= s"""WITH e AS MATERIALIZED (
        |  SELECT o.o_custkey AS c, l.l_partkey AS p, COUNT(*) AS w
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |h0r AS MATERIALIZED (SELECT c, CAST(SUM(w) AS BIGINT) AS h FROM e GROUP BY 1),
        |h0 AS MATERIALIZED (${norm("h0r", "h")})""".stripMargin
      for (i <- 1 to Iters) {
        // raw authority half-step (BIGINT — bound in the Scala doc),
        // hub half-step in HUGEINT, hubs normalized once per round
        sb ++= s""",
        |a$i AS MATERIALIZED (
        |  SELECT e.p, CAST(SUM(e.w * h.h) AS BIGINT) AS a
        |  FROM e JOIN h${i - 1} h ON h.c = e.c GROUP BY 1),
        |h${i}r AS MATERIALIZED (
        |  SELECT e.c, SUM(CAST(e.w AS HUGEINT) * a.a) AS h
        |  FROM e JOIN a$i a ON a.p = e.p GROUP BY 1),
        |h$i AS MATERIALIZED (${norm(s"h${i}r", "h")})""".stripMargin
      }
      sb ++= s"""
        |, an AS MATERIALIZED (${norm(s"a$Iters", "a")}),
        |ta AS (SELECT * FROM an ORDER BY a DESC, p LIMIT 10),
        |th AS (SELECT * FROM h$Iters ORDER BY h DESC, c LIMIT 10)
        |SELECT * FROM (
        |  SELECT 'authority' AS kind, p AS node_key, a AS score,
        |         CAST(ROW_NUMBER() OVER (ORDER BY a DESC, p) AS INT) AS pos
        |  FROM ta
        |  UNION ALL
        |  SELECT 'hub', c, h,
        |         CAST(ROW_NUMBER() OVER (ORDER BY h DESC, c) AS INT)
        |  FROM th)
        |ORDER BY kind, pos""".stripMargin
      sb.toString
    },
    doc = "graph: HITS hubs/authorities over the bipartite purchase graph — integer mutual recursion, hubs sum-normalized once per round, auths at output")

  val all: Seq[Q] = Seq(q182)
}
