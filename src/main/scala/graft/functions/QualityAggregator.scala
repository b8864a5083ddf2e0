package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input projection for the one-pass profile: the three audited measures
  * (reference: completeness over all columns + IQR validity on numerics,
  * healthcare-data-pipeline-main.py:233-258).
  */
final case class QualityIn(qty: Option[Double], disc: Option[Double],
                           tax: Option[Double])

/** Fixed-width count-only buffer: associative, map-side combinable, and
  * shuffle-order-insensitive (no float accumulation), so the aggregate
  * is bit-deterministic at any parallelism.
  */
final case class QualityBuf(n: Long, qtyF: Long, discF: Long, taxF: Long,
                            qtyValid: Long)

final case class QualityOut(n_rows: Long, completeness: Double,
                            validity: Double, overall_quality: Double)

/** One-pass data-quality profile — the typed `Aggregator` form of q26's
  * composed aggregates (SURVEY.md §2.4 A13, §7.2 "custom
  * Aggregator[Row,Buf,Out]"): completeness (NULLIF-style fill counts)
  * and IQR validity in a SINGLE scan given precomputed bounds — the
  * production shape, where bounds come from a profiling job and the
  * audited table is the 100 TB one you only want to read once.
  * Registrable for SQL via `functions.udaf` (QualityAggSpec).
  */
final class QualityAggregator(lo: Double, hi: Double)
    extends Aggregator[QualityIn, QualityBuf, QualityOut] {

  override def zero: QualityBuf = QualityBuf(0L, 0L, 0L, 0L, 0L)

  override def reduce(b: QualityBuf, r: QualityIn): QualityBuf = QualityBuf(
    b.n + 1,
    b.qtyF + (if (r.qty.isDefined) 1L else 0L),
    // NULLIF(x, 0) fill semantics: zero counts as missing
    b.discF + (if (r.disc.exists(_ != 0.0)) 1L else 0L),
    b.taxF + (if (r.tax.exists(_ != 0.0)) 1L else 0L),
    b.qtyValid + (if (r.qty.exists(q => q >= lo && q <= hi)) 1L else 0L))

  override def merge(a: QualityBuf, b: QualityBuf): QualityBuf = QualityBuf(
    a.n + b.n, a.qtyF + b.qtyF, a.discF + b.discF, a.taxF + b.taxF,
    a.qtyValid + b.qtyValid)

  override def finish(b: QualityBuf): QualityOut = {
    val completeness = (b.qtyF + b.discF + b.taxF) * 1.0 / (b.n * 3)
    val validity = b.qtyValid * 1.0 / b.n
    QualityOut(b.n, completeness, validity, (completeness + validity) / 2.0)
  }

  override def bufferEncoder: Encoder[QualityBuf] = Encoders.product
  override def outputEncoder: Encoder[QualityOut] = Encoders.product
}
