package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bradley–Terry strength ranking (Bradley & Terry 1952) of market
  * segments from monthly pairwise revenue wins — the
  * preference-learning operator the eval side of a training-data
  * pipeline runs constantly (pairwise A/B judgments → a global
  * strength scale): q237's Friedman test answers "is SOME segment
  * consistently stronger"; Bradley–Terry answers "by HOW MUCH, on a
  * ratio scale", from exactly the same monthly win/loss record.
  *
  * Algorithm: the classic MM iteration (Hunter 2004)
  * p'ᵢ = Wᵢ / Σ_{j≠i} nᵢⱼ/(pᵢ+pⱼ), normalized to Σp = 1, K = 8 fixed
  * rounds (the q137/q230 fixed-iteration stance), each round's 5-row
  * frame lineage-cut.
  *
  * Exactness: wins/comparisons are exact integers (cent-exact monthly
  * sums make ties measure-zero; a tie counts as a loss for both, the
  * standard convention); every per-round float reduction — the
  * pairwise denominator Σⱼ and the normalizer Σᵢ — runs as an ordered
  * LEFT-FOLD (by opponent j, by segment name) so both engines
  * associate identically (the q228 discipline); all other arithmetic
  * is mirrored IEEE division on 5-row frames.
  *
  * Scale shape: one broadcast dim join + map-side aggregate to
  * |months|×k cells; the pairwise record is a within-block self-join
  * on k-row frames; all K rounds run on k-row frames — corpus-sized
  * work happens exactly once, in the first aggregate.
  */
object BradleyTerry {

  val K = 8

  val q241 = Q(
    "q241_bradley_terry",
    (s, dir) => {
      import s.implicits._
      val cells = Tables.maybeBroadcast(Tables.load(s, dir, "customer"))
        .join(Tables.load(s, dir, "orders"), $"c_custkey" === $"o_custkey")
        .groupBy((year($"o_orderdate") * 12 + month($"o_orderdate")).as("blk"),
          $"c_mktsegment".as("seg"))
        .agg(sum(expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"))
          .as("y"))
      val full = cells
        .withColumn("kcnt", count(lit(1)).over(Window.partitionBy($"blk")))
        .filter($"kcnt" === 5)
      val pw = graft.Barrier(full.as("a")
        .join(full.as("b"), $"a.blk" === $"b.blk" && $"a.seg" =!= $"b.seg")
        .groupBy($"a.seg".as("i"), $"b.seg".as("j"))
        .agg(count(lit(1)).as("nij"), count_if($"a.y" > $"b.y").as("wij")))
      val wins = graft.Barrier(pw.groupBy($"i")
        .agg(sum($"wij").as("wi"), sum($"nij").as("ncmp")))
      var p: DataFrame = pw.select($"i".as("seg")).distinct()
        .withColumn("p", lit(0.2d))
      val rounds = graft.Barrier.chain() // single-frame chain: rotate
      for (_ <- 1 to K) {
        val den = pw
          .join(p.select($"seg".as("i"), $"p".as("pi")), "i")
          .join(p.select($"seg".as("j"), $"p".as("pj")), "j")
          .select($"i", $"j", ($"nij".cast("double") / ($"pi" + $"pj")).as("term"))
          .groupBy($"i")
          .agg(expr("aggregate(sort_array(collect_list(named_struct('j', j, 't', term))), 0D, (acc, s) -> acc + s.t)")
            .as("sden"))
        val raw = den.join(wins, "i")
          .select($"i".as("seg"), ($"wi".cast("double") / $"sden").as("praw"))
        val tot = raw.agg(
          expr("aggregate(sort_array(collect_list(named_struct('seg', seg, 't', praw))), 0D, (acc, s) -> acc + s.t)")
            .as("tot"))
        p = rounds.cut(raw.crossJoin(broadcast(tot))
          .select($"seg", ($"praw" / $"tot").as("p")))
      }
      p.join(wins.select($"i".as("seg"), $"wi", $"ncmp"), "seg")
        .withColumn("pos",
          row_number().over(Window.orderBy($"p".desc, $"seg")))
        .select($"pos".as("rank"), $"seg".as("c_mktsegment"),
          $"wi".as("wins"), $"ncmp".as("n_comparisons"), $"p".as("strength"))
        .orderBy($"rank")
    },
    Some {
      require(K <= 12,
        s"q241 oracle unrolls $K MM rounds as MATERIALIZED CTEs; " +
          "ceiling is 12 — re-measure DuckDB wall time before raising")
      val sb = new StringBuilder
      sb ++= """WITH cells AS (
        |  SELECT EXTRACT(year FROM o_orderdate) * 12
        |           + EXTRACT(month FROM o_orderdate) AS blk,
        |         c_mktsegment AS seg,
        |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS y
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1, 2),
        |full_blocks AS (
        |  SELECT * FROM (
        |    SELECT blk, seg, y, COUNT(*) OVER (PARTITION BY blk) AS kcnt
        |    FROM cells)
        |  WHERE kcnt = 5),
        |pw AS MATERIALIZED (
        |  SELECT a.seg AS i, b.seg AS j, COUNT(*) AS nij,
        |         CAST(COUNT(CASE WHEN a.y > b.y THEN 1 END) AS BIGINT) AS wij
        |  FROM full_blocks a JOIN full_blocks b
        |    ON a.blk = b.blk AND a.seg <> b.seg
        |  GROUP BY 1, 2),
        |wins AS MATERIALIZED (
        |  SELECT i, CAST(SUM(wij) AS BIGINT) AS wi,
        |         CAST(SUM(nij) AS BIGINT) AS ncmp
        |  FROM pw GROUP BY 1),
        |p0 AS MATERIALIZED (
        |  SELECT DISTINCT i AS seg, 0.2e0 AS p FROM pw)""".stripMargin
      for (k <- 1 to K) {
        sb ++= s""",
          |raw$k AS MATERIALIZED (
          |  SELECT w.i AS seg, CAST(w.wi AS DOUBLE) / d.sden AS praw
          |  FROM wins w JOIN (
          |    SELECT pw.i,
          |           list_reduce(list(CAST(pw.nij AS DOUBLE) / (pi.p + pj.p)
          |                            ORDER BY pw.j), (a, b) -> a + b) AS sden
          |    FROM pw JOIN p${k - 1} pi ON pi.seg = pw.i
          |            JOIN p${k - 1} pj ON pj.seg = pw.j
          |    GROUP BY pw.i) d ON d.i = w.i),
          |p$k AS MATERIALIZED (
          |  SELECT seg, praw / (SELECT list_reduce(list(praw ORDER BY seg),
          |                                         (a, b) -> a + b)
          |                      FROM raw$k) AS p
          |  FROM raw$k)""".stripMargin
      }
      sb ++= s"""
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY p DESC, seg) AS INT) AS rank,
        |       seg AS c_mktsegment, wi AS wins, ncmp AS n_comparisons,
        |       p AS strength
        |FROM p$K JOIN wins ON wins.i = p$K.seg
        |ORDER BY rank""".stripMargin
      sb.toString
    },
    doc = s"stats: Bradley-Terry segment strengths from monthly pairwise revenue wins ($K MM rounds, ordered-fold reductions) — preference ranking on a ratio scale")

  val all: Seq[Q] = Seq(q241)
}
