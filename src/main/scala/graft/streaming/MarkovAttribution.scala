package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov removal-effect attribution (Anderl et al. 2016) — the
  * data-driven upgrade of q192's last-touch rule: model each user's
  * event path as a first-order Markov chain over channels
  * (START → {click, view, signup, error}* → CONV | DROP), then credit
  * each channel by its REMOVAL EFFECT — how much the chain's
  * conversion probability falls when that channel is deleted (its
  * inbound edges diverted to DROP, its outbound edges removed). A
  * channel that merely sits on busy paths earns little; one whose
  * removal severs the routes to CONV earns much — exactly the
  * counterfactual question last-touch cannot ask. q160 reports the
  * transition matrix itself; this SOLVES it.
  *
  * Semantics pinned for determinism: paths order by (ts, event_id)
  * and truncate at the FIRST purchase (→ CONV); pathless-end → DROP;
  * conversion probabilities are the K = 12-step truncated-horizon
  * absorption values in exact ppb — p₀ = [CONV → 10⁹, else 0],
  * p_{k+1}(s) = (Σ_t w(s,t)·p_k(t)) div W(s) — integer value
  * iteration both engines compute bit-identically (positive operands:
  * truncating div ≡ flooring //). Truncation is stated, not hidden:
  * K bounds the credited path length, the standard practice for
  * acyclic-ish funnels. The attribution share is one IEEE division
  * of exact effect integers.
  *
  * Scale shape: the corpus is touched ONCE — a per-user window pass
  * emits transitions, compressed map-side to a ≤|channels+2|²-row
  * edge frame. Everything after (the 5-variant edge expansion, 12
  * value-iteration rounds, the report) runs on frames of a few dozen
  * rows, each round lineage-CUT ([[graft.Barrier.cut]]) per the q182
  * discipline. Edge weights ride decimal(38,0)/HUGEINT in the w·p
  * products, exact past 10¹⁰ users.
  */
object MarkovAttribution {

  val K = 12
  val Ppb = 1000000000L
  val Channels = Seq("click", "error", "signup", "view")

  val q211 = Q(
    "q211_markov_attribution",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val ev = Tables.load(s, dir, "events")
        .select($"user_id", $"ts", $"event_id", $"event_type".as("et"))
        .withColumn("rn", row_number().over(w))
        .withColumn("nxt", lead($"et", 1).over(w))
      val minp = ev.filter($"et" === "purchase")
        .groupBy($"user_id").agg(min($"rn").as("minp"))
      val flagged = ev.join(minp, Seq("user_id"), "left_outer")
        .withColumn("mp", coalesce($"minp", lit(Long.MaxValue)))
      // channel-touch transitions + START edges, truncated at first CONV
      val mids = flagged.filter($"rn" < $"mp")
        .select($"et".as("src"),
          when($"nxt" === "purchase", "CONV")
            .otherwise(coalesce($"nxt", lit("DROP"))).as("dst"))
      val starts = flagged.filter($"rn" === 1)
        .select(lit("START").as("src"),
          when($"et" === "purchase", "CONV").otherwise($"et").as("dst"))
      val edges = graft.Barrier(mids.unionByName(starts)
        .groupBy($"src", $"dst").agg(count(lit(1)).as("w")))
      // 5 variants: base + one per removed channel
      val vedges = graft.Barrier(
        Channels.foldLeft(edges.select(lit("base").as("variant"),
            $"src", $"dst", $"w")) { (acc, c) =>
          acc.unionByName(edges.filter($"src" =!= c)
            .select(lit(c).as("variant"), $"src",
              when($"dst" === c, "DROP").otherwise($"dst").as("dst"), $"w"))
        }.groupBy($"variant", $"src", $"dst").agg(sum($"w").as("w")))
      val absorbing = vedges.select($"variant").distinct()
        .select($"variant", explode(array(
          struct(lit("CONV").as("state"), lit(Ppb).as("p")),
          struct(lit("DROP").as("state"), lit(0L).as("p")))).as("a"))
        .select($"variant", $"a.state", $"a.p")
      var p: DataFrame = vedges.select($"variant", $"src".as("state"))
        .distinct().withColumn("p", lit(0L))
        .unionByName(absorbing)
      val rounds = graft.Barrier.chain() // single-frame chain: rotate
      for (_ <- 1 to K) {
        val nxt = vedges
          .join(p.select($"variant", $"state".as("dst"), $"p"),
            Seq("variant", "dst"))
          .groupBy($"variant", $"src".as("state"))
          .agg(expr("cast(sum(cast(w as decimal(38,0)) * p) div sum(w)" +
            " as bigint)").as("p"))
        p = rounds.cut(nxt.unionByName(absorbing))
      }
      val starts2 = p.filter($"state" === "START")
        .select($"variant", $"p".as("conv_ppb"))
      val base = starts2.filter($"variant" === "base")
        .select($"conv_ppb".as("base_ppb"))
      val eff = starts2.filter($"variant" =!= "base")
        .crossJoin(broadcast(base))
        .select($"variant".as("channel"), $"base_ppb",
          $"conv_ppb".as("removal_ppb"),
          ($"base_ppb" - $"conv_ppb").as("effect_ppb"))
      val tot = eff.agg(sum($"effect_ppb").as("tot"))
      eff.crossJoin(broadcast(tot))
        .select($"channel", $"base_ppb", $"removal_ppb", $"effect_ppb",
          ($"effect_ppb".cast("double") / $"tot".cast("double"))
            .as("attribution_share"))
        .orderBy($"channel")
    },
    Some {
      require(K <= 16,
        s"q211 oracle unrolls $K value-iteration rounds as MATERIALIZED " +
          "CTEs; ceiling is 16 — re-measure DuckDB wall time before raising")
      val variantsSql = ("base" +: Channels).map(v => s"('$v')").mkString(", ")
      val sb = new StringBuilder
      sb ++= s"""WITH ev AS (
        |  SELECT user_id, event_type AS et,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS rn,
        |         LEAD(event_type, 1) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |minp AS (
        |  SELECT user_id, MIN(rn) AS minp FROM ev
        |  WHERE et = 'purchase' GROUP BY 1),
        |flagged AS (
        |  SELECT e.*, COALESCE(m.minp, 9223372036854775807) AS mp
        |  FROM ev e LEFT JOIN minp m USING (user_id)),
        |trans AS (
        |  SELECT et AS src,
        |         CASE WHEN nxt = 'purchase' THEN 'CONV'
        |              ELSE COALESCE(nxt, 'DROP') END AS dst
        |  FROM flagged WHERE rn < mp
        |  UNION ALL
        |  SELECT 'START',
        |         CASE WHEN et = 'purchase' THEN 'CONV' ELSE et END
        |  FROM flagged WHERE rn = 1),
        |edges AS MATERIALIZED (
        |  SELECT src, dst, COUNT(*) AS w FROM trans GROUP BY 1, 2),
        |variants(v) AS (VALUES $variantsSql),
        |vedges AS MATERIALIZED (
        |  SELECT v AS variant, src,
        |         CASE WHEN v <> 'base' AND dst = v THEN 'DROP' ELSE dst
        |         END AS dst,
        |         CAST(SUM(w) AS BIGINT) AS w
        |  FROM edges CROSS JOIN variants
        |  WHERE NOT (v <> 'base' AND src = v)
        |  GROUP BY 1, 2, 3),
        |absorbing AS (
        |  SELECT DISTINCT variant, a.state, a.p
        |  FROM vedges, (VALUES ('CONV', $Ppb), ('DROP', 0)) a(state, p)),
        |p0 AS MATERIALIZED (
        |  SELECT DISTINCT variant, src AS state, CAST(0 AS BIGINT) AS p
        |  FROM vedges
        |  UNION ALL SELECT variant, state, CAST(p AS BIGINT) FROM absorbing)"""
        .stripMargin
      for (k <- 1 to K) {
        sb ++= s""",
          |p$k AS MATERIALIZED (
          |  SELECT e.variant, e.src AS state,
          |         CAST(SUM(CAST(e.w AS HUGEINT) * q.p) // SUM(e.w) AS BIGINT) AS p
          |  FROM vedges e JOIN p${k - 1} q
          |    ON q.variant = e.variant AND q.state = e.dst
          |  GROUP BY 1, 2
          |  UNION ALL SELECT variant, state, CAST(p AS BIGINT) FROM absorbing)"""
          .stripMargin
      }
      sb ++= s"""
        |, conv AS (
        |  SELECT variant, p AS conv_ppb FROM p$K WHERE state = 'START'),
        |eff AS (
        |  SELECT c.variant AS channel,
        |         b.conv_ppb AS base_ppb, c.conv_ppb AS removal_ppb,
        |         b.conv_ppb - c.conv_ppb AS effect_ppb
        |  FROM conv c, (SELECT conv_ppb FROM conv WHERE variant = 'base') b
        |  WHERE c.variant <> 'base')
        |SELECT channel, base_ppb, removal_ppb, effect_ppb,
        |       CAST(effect_ppb AS DOUBLE)
        |         / CAST((SELECT SUM(effect_ppb) FROM eff) AS DOUBLE)
        |         AS attribution_share
        |FROM eff ORDER BY channel""".stripMargin
      sb.toString
    },
    doc = s"attribution: Markov removal-effect channel credit ($K-step integer value iteration over the START/CONV/DROP chain, 5 variants, counterfactual shares)")

  val all: Seq[Q] = Seq(q211)
}
