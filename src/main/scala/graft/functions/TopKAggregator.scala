package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row for the bounded top-k aggregate: the ranked value plus a
  * unique tiebreak key (determinism requires a TOTAL order — doubles
  * alone would make ties engine-dependent).
  */
final case class TopIn(value: Double, key: Long)

/** Buffer/output: at most k items, sorted (value desc, key asc). */
final case class TopBuf(items: Seq[TopIn])

/** Bounded top-k-per-group aggregate (A14/W2 at scale). The window
  * formulation (`row_number` ≤ k) shuffles and sorts EVERY row of every
  * group; this aggregate's partial buffers carry at most k rows per
  * map-side partition — at 100 TB that's the difference between
  * shuffling the fact table and shuffling k·partitions rows. Buffer ops
  * are insert-into-sorted-k (O(k) per row) and merge-two-sorted-k; the
  * aggregate is associative + commutative, so shuffle order can't
  * change the result (ties resolved by the total order).
  *
  * Exposed via `functions.udaf` — see q71, whose DuckDB oracle is the
  * window formulation, proving the two semantics identical.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[TopIn, TopBuf, TopBuf] {
  require(k >= 1, s"k must be >= 1, got $k")

  private implicit val ord: Ordering[TopIn] =
    Ordering.by((r: TopIn) => (-r.value, r.key))

  override def zero: TopBuf = TopBuf(Nil)

  override def reduce(b: TopBuf, r: TopIn): TopBuf =
    if (b.items.lengthCompare(k) >= 0 && ord.lteq(b.items.last, r)) b
    else TopBuf(insertSorted(b.items, r))

  override def merge(a: TopBuf, b: TopBuf): TopBuf = {
    // merge of two sorted runs, truncated at k
    val out = Seq.newBuilder[TopIn]
    var (x, y) = (a.items, b.items)
    var n = 0
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && ord.lteq(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    TopBuf(out.result())
  }

  override def finish(b: TopBuf): TopBuf = b

  private def insertSorted(xs: Seq[TopIn], r: TopIn): Seq[TopIn] = {
    val (lo, hi) = xs.span(ord.lt(_, r))
    (lo ++ (r +: hi)).take(k)
  }

  override def bufferEncoder: Encoder[TopBuf] = Encoders.product
  override def outputEncoder: Encoder[TopBuf] = Encoders.product
}

/** Input row for the term-payload top-k: integer score (exact ordering,
  * no double ties), the term as the lexicographic tiebreak (unique
  * within a group → total order), and carried stats (tf, df) that ride
  * along without participating in the order.
  */
final case class TopTermIn(score: Long, term: String, tf: Long, df: Long)

/** Buffer/output: at most k items, sorted (score desc, term asc). */
final case class TopTermBuf(items: Seq[TopTermIn])

/** Bounded top-k terms per group — the vocabulary-window killer for
  * q94: `row_number().over(partitionBy(source).orderBy(score desc))`
  * sorts every (source, term) row of a group in one task, and on a
  * noisy 100 TB corpus distinct terms reach billions, so a single
  * source's vocabulary slice is again a one-task sort. This aggregate's
  * partial buffers carry ≤ k rows per map-side partition; only
  * k·partitions rows ever shuffle. Same insert/merge discipline as
  * [[TopKAggregator]] (associative + commutative, total order).
  */
final class TopTermKAggregator(k: Int)
    extends Aggregator[TopTermIn, TopTermBuf, TopTermBuf] {
  require(k >= 1, s"k must be >= 1, got $k")

  // score is a product of positive integers in every caller (tf ≥ 1,
  // idf_q ≥ 10⁶), so the -score negation cannot overflow
  private implicit val ord: Ordering[TopTermIn] =
    Ordering.by((r: TopTermIn) => (-r.score, r.term))

  override def zero: TopTermBuf = TopTermBuf(Nil)

  override def reduce(b: TopTermBuf, r: TopTermIn): TopTermBuf =
    if (b.items.lengthCompare(k) >= 0 && ord.lteq(b.items.last, r)) b
    else TopTermBuf(insertSorted(b.items, r))

  override def merge(a: TopTermBuf, b: TopTermBuf): TopTermBuf = {
    val out = Seq.newBuilder[TopTermIn]
    var (x, y) = (a.items, b.items)
    var n = 0
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && ord.lteq(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    TopTermBuf(out.result())
  }

  override def finish(b: TopTermBuf): TopTermBuf = b

  private def insertSorted(xs: Seq[TopTermIn],
                           r: TopTermIn): Seq[TopTermIn] = {
    val (lo, hi) = xs.span(ord.lt(_, r))
    (lo ++ (r +: hi)).take(k)
  }

  override def bufferEncoder: Encoder[TopTermBuf] = Encoders.product
  override def outputEncoder: Encoder[TopTermBuf] = Encoders.product
}
