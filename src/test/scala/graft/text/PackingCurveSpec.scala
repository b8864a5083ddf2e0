package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixture checks for the q171 packing ledger and q173 burstiness
  * cores (q172 rides the q72-spec'd componentLabels machinery and its
  * own 3-SF oracle).
  */
class PackingCurveSpec extends SparkSpec {
  import spark.implicits._

  test("packing ledger: hand corpus at L=4 — straddle, concat and pad sequences") {
    // docs in stream order with nt = 3, 3, 2 → cum = 3, 6, 8 at L=4:
    //  doc1 occupies [0,3) — no straddle
    //  doc2 occupies [3,6) — crosses the 4-boundary → straddle
    //  doc3 occupies [6,8) — inside the second sequence
    // concat sequences = ceil(8/4) = 2; pad sequences = 1+1+1 = 3
    // pad waste = (3·4 − 8)/(3·4) = 1/3
    val c = Seq((1L, 3L, 3L), (2L, 3L, 6L), (3L, 2L, 8L))
      .toDF("doc_id", "nt", "cum")
    val got = c.withColumn("context_len", lit(4L))
      .withColumn("straddle",
        expr("(cum - nt) div context_len != (cum - 1) div context_len"))
      .withColumn("pad_seqs", expr("(nt + context_len - 1) div context_len"))
      .groupBy($"context_len")
      .agg(count(lit(1)).as("n_docs"), sum($"nt").as("tt"), max($"cum").as("mc"),
        count_if($"straddle").as("n_straddle"), sum($"pad_seqs").as("pad"))
      .select(expr("(mc + context_len - 1) div context_len").as("concat_seqs"),
        $"n_straddle", $"pad",
        expr("((pad * context_len - tt) * 1000000) div (pad * context_len)").as("waste"))
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((2L, 1L, 3L, 333333L)))
  }

  test("packing ledger: waste shrinks as docs fill the context exactly") {
    // nt = 4 docs at L=4: pad waste 0; at L=8 each wastes half
    def waste(l: Long): Long = {
      Seq((1L, 4L, 4L), (2L, 4L, 8L)).toDF("doc_id", "nt", "cum")
        .withColumn("context_len", lit(l))
        .withColumn("pad_seqs", expr("(nt + context_len - 1) div context_len"))
        .agg(sum($"pad_seqs").as("pad"), sum($"nt").as("tt"))
        .select(expr(s"((pad * $l - tt) * 1000000) div (pad * $l)"))
        .as[Long].head()
    }
    assert(waste(4L) == 0L && waste(8L) == 500000L)
  }

  test("burstiness closed forms: regular ticks go negative, a heavy tail goes positive") {
    def b(gaps: Seq[Long]): Double = {
      val n = gaps.size.toDouble
      val sg = gaps.sum.toDouble
      val sg2 = gaps.map(g => g * g).sum.toDouble
      val mu = sg / n
      val sigma = math.sqrt(sg2 / n - mu * mu)
      (sigma - mu) / (sigma + mu)
    }
    assert(b(Seq(10L, 10L, 10L, 10L)) == -1.0) // perfect pacemaker
    assert(b(Seq(1L, 1L, 1L, 997L)) > 0.2)     // bursty tail (n=4 caps B at ~0.27)
    // engine decimal-moment fold equals the replica on the same gaps
    val gaps = Seq(1L, 5L, 2L, 992L)
    val got = gaps.toDF("g")
      .agg(count(lit(1)).as("n"),
        sum($"g".cast("decimal(19,0)")).cast("decimal(38,0)").as("sg"),
        sum($"g".cast("decimal(19,0)") * $"g".cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("sg2"))
      .select(
        (sqrt($"sg2".cast("double") / $"n".cast("double") -
          ($"sg".cast("double") / $"n".cast("double")) *
          ($"sg".cast("double") / $"n".cast("double"))).as("sigma")),
        ($"sg".cast("double") / $"n".cast("double")).as("mu"))
      .withColumn("b", ($"sigma" - $"mu") / ($"sigma" + $"mu"))
      .select("b").as[Double].head()
    assert(got == b(gaps))
  }
}
