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
  * Exactness: integer mutual-recursion with SUM-normalization each
  * half-step — scores are rescaled to Σ = 10¹² via `div` against the
  * 1-row total (folded in as a driver literal), so every value is an
  * exact long in both
  * engines (the q137 discipline; float HITS would need a norm the
  * engines round differently). Truncation mass loss is deterministic
  * and identical.
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
  * (Locally it is also the difference between 321 and 109 tasks —
  * q182 profiled 6.2→3.7 s, JobProfile receipts in PLANS.md.)
  * Each half-step remains: one shuffle join + one map-side
  * combinable aggregate; the 1-row normalization total folds in as a
  * driver-taken literal (bounded at any scale — see normalize).
  * Top-10s are TakeOrdered; row numbering is post-limit.
  */
object Hits {

  private val Scale = 1000000000000L
  private val Iters = 3

  /** Weighted bipartite purchase edges (c, p, w). */
  private[graph] def purchaseEdges(s: org.apache.spark.sql.SparkSession,
                                   dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "orders").select($"o_orderkey", $"o_custkey")
      .join(Tables.load(s, dir, "lineitem")
        .select($"l_orderkey".as("o_orderkey"), $"l_partkey"), "o_orderkey")
      .groupBy($"o_custkey".as("c"), $"l_partkey".as("p"))
      .agg(count(lit(1)).as("w"))
  }

  /** (hubs(c, h), auths(p, a)) after `iters` normalized rounds — the
    * testable core.
    */
  private[graph] def hits(edges0: DataFrame, iters: Int = Iters,
                          checkFrom: Int = GraphQueries.ConvergenceCheckFrom)
      : (DataFrame, DataFrame) = {
    val s = edges0.sparkSession
    import s.implicits._
    // Two key-partitioned lineage cuts of the edge list (class doc):
    // `repartition($"c")` with no explicit count lets AQE size the
    // partitions, and the cut's LogicalRDD preserves that hash
    // partitioning, so the per-round joins never exchange the edge
    // side. The second copy derives from the first — one extra
    // shuffle, zero recomputation of the base join+aggregate.
    val e = graft.Barrier.cut(edges0.repartition($"c"))
    val eByP = graft.Barrier.cut(e.repartition($"p"))
    // rescale via decimal: raw half-step scores reach ~10¹⁵, and a
    // long product with the 10¹² scale would overflow; IntegralDivide
    // on decimals returns an exact long (positive ⇒ trunc ≡ floor).
    // Barrier.cut (checkpoint, NOT cache) per half-step: iteration
    // must CUT the logical plan (the componentLabels stance) — a cache
    // leaves the full round-deep tree for Catalyst/AQE to re-analyze
    // per action, and planning cost compounds across rounds (measured
    // 103 s uncut / 21 s cached / 2.9 s checkpointed at sf0.1). The
    // frame is score-entity-sized, so the checkpoint is cheap — and
    // under RELIABLE_CHECKPOINT it survives executor loss on a
    // multi-hour cluster run.
    // The normalization total is ONE decimal off a 1-row aggregate
    // (bounded at any corpus size): take it on the driver and fold it
    // into the rescale as a typed literal. The former
    // crossJoin(broadcast(t)) re-submitted a broadcast-exchange job
    // per half-step — 7 scheduling-constant jobs each carrying one
    // decimal (the q137 nv lesson). The aggregate job itself still
    // runs (it forced the cut's materialization under broadcast too);
    // only the broadcast build + BroadcastNestedLoopJoin disappear.
    // cast('…' as decimal(38,0)) reconstructs the identical operand
    // type, so IntegralDivide emits bit-identical longs. An all-zero
    // or empty frame sums to NULL/0 → keep t=1: every score is 0 and
    // 0 div 1 = 0. NOTE this DIFFERS from the pre-literal form, which
    // propagated NULL scores on an all-zero non-empty frame (x div
    // NULL = NULL); unreachable today (w >= 1, so round-0 sums are
    // positive), but a future caller feeding zero-weight edges gets 0
    // rather than NULL here — 0 is the defensible reading (zero mass
    // normalizes to zero share), recorded so the change is deliberate.
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
    var auths: DataFrame = null
    // fixed-point early exit (GraphQueries.messageRounds rationale):
    // hubs_{t+1} is a pure function of hubs_t, so exact long equality
    // of consecutive hub frames means every later round repeats both
    // ledgers — and `auths` already holds the fixed point's companion
    // (it was computed from the unchanged hubs). Never armed below
    // ConvergenceCheckFrom, so the default 3-round q182 is unchanged.
    var round = 1
    var converged = false
    while (round <= iters && !converged) {
      auths = normalize(
        e.join(hubs, "c").groupBy($"p").agg(sum($"w" * $"h").as("a")), "a")
      val next = normalize(
        eByP.join(auths, "p").groupBy($"c").agg(sum($"w" * $"a").as("h")), "h")
      if (round >= checkFrom && round < iters)
        converged = GraphQueries.roundsEqual(hubs, next, "c", "h")
      hubs = next
      round += 1
    }
    (hubs, auths)
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
      // oracle chains 4 MATERIALIZED CTEs per HITS round; a careless
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
        sb ++= s""",
        |a${i}r AS MATERIALIZED (
        |  SELECT e.p, CAST(SUM(e.w * h.h) AS BIGINT) AS a
        |  FROM e JOIN h${i - 1} h ON h.c = e.c GROUP BY 1),
        |a$i AS MATERIALIZED (${norm(s"a${i}r", "a")}),
        |h${i}r AS MATERIALIZED (
        |  SELECT e.c, CAST(SUM(e.w * a.a) AS BIGINT) AS h
        |  FROM e JOIN a$i a ON a.p = e.p GROUP BY 1),
        |h$i AS MATERIALIZED (${norm(s"h${i}r", "h")})""".stripMargin
      }
      sb ++= s"""
        |, ta AS (SELECT * FROM a$Iters ORDER BY a DESC, p LIMIT 10),
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
    doc = "graph: HITS hubs/authorities over the bipartite purchase graph — integer sum-normalized mutual recursion")

  val all: Seq[Q] = Seq(q182)
}
