package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Data-quality scoring (reference: ETLPipeline._calculate_quality_metrics,
  * healthcare-data-pipeline-main.py:233-258): completeness = non-null
  * cells / total cells; validity = numeric cells within IQR fences
  * (q1 − k·IQR, q3 + k·IQR) plus non-null non-numeric cells; overall =
  * mean of the two. Thresholds :205-209 (min quality 0.9 → warn :228-230).
  *
  * Unlike the reference's per-column pandas passes, this computes every
  * per-column statistic in ONE aggregate job (all counts + percentiles
  * in a single agg), then one validity pass — two scans total regardless
  * of column count.
  */
object QualityScore {

  final case class QualityReport(
      completeness: Double, validity: Double, overall: Double, nRows: Long)

  val MinQualityThreshold = 0.9

  def score(df: DataFrame, iqrK: Double = 1.5): QualityReport = {
    val cols = df.schema.fields
    val numeric = cols.filter(_.dataType.isInstanceOf[NumericType]).map(_.name)
    val others = cols.map(_.name).diff(numeric)

    // Pass 1: row count, per-column non-null counts, numeric quartiles.
    val countAggs = cols.map(f => count(col(f.name)).as(s"cnt_${f.name}"))
    val pctAggs = numeric.flatMap { c =>
      Seq(expr(s"percentile($c, 0.25)").as(s"q1_$c"),
          expr(s"percentile($c, 0.75)").as(s"q3_$c"))
    }
    val stats = df.agg(count(lit(1)).as("n_rows"), (countAggs ++ pctAggs): _*)
      .collect()(0)
    val nRows = stats.getAs[Long]("n_rows")
    if (nRows == 0) return QualityReport(1.0, 1.0, 1.0, 0L)

    val filled = cols.map(f => stats.getAs[Long](s"cnt_${f.name}")).sum
    val completeness = filled.toDouble / (nRows * cols.length)

    // Pass 2: validity — numeric values inside IQR fences; non-numeric
    // columns count their non-null cells as valid (reference :252-255).
    val validAggs = numeric.map { c =>
      val q1 = stats.getAs[Double](s"q1_$c")
      val q3 = stats.getAs[Double](s"q3_$c")
      val (lo, hi) = (q1 - iqrK * (q3 - q1), q3 + iqrK * (q3 - q1))
      count_if(col(c).between(lo, hi)).as(s"valid_$c")
    }
    val validNumeric =
      if (numeric.isEmpty) 0L
      else {
        val row = df.agg(validAggs.head, validAggs.tail: _*).collect()(0)
        numeric.map(c => row.getAs[Long](s"valid_$c")).sum
      }
    val validOther = others.map(c => stats.getAs[Long](s"cnt_$c")).sum
    val validity = (validNumeric + validOther).toDouble / (nRows * cols.length)

    QualityReport(completeness, validity, (completeness + validity) / 2.0, nRows)
  }
}
