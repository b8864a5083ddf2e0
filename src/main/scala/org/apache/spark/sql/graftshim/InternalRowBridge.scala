package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Narrow bridge into Spark's `private[sql]` internal-row plumbing,
  * placed under `org.apache.spark.sql` for access. Used by
  * [[graft.operators.DistributedRank]] so its two ranking passes stay
  * on the Tungsten binary row format (`RDD[InternalRow]` of
  * UnsafeRows) instead of round-tripping every row through external
  * `Row` boxing via `df.rdd` / `createDataFrame`.
  *
  * Scope is deliberately minimal — exactly the two conversions, no
  * other internals — so a Spark upgrade breaks loudly here or not at
  * all.
  */
object InternalRowBridge {

  /** The frame's rows in internal (Tungsten) format. Each call
    * re-executes the frame's plan, so callers needing a FROZEN layout
    * across passes must localCheckpoint first and reuse ONE returned
    * RDD for all passes.
    */
  def toInternalRdd(df: DataFrame): RDD[InternalRow] =
    df.queryExecution.toRdd

  /** Wrap an internal-row RDD back into a DataFrame of `schema`. Rows
    * must be UnsafeRow (or otherwise safe to buffer) — producers that
    * reuse row objects must copy before emitting.
    */
  def fromInternalRdd(like: DataFrame, rdd: RDD[InternalRow],
                      schema: StructType): DataFrame =
    like.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Wrap a raw Catalyst expression as a user-facing Column and back —
    * `classic.ExpressionUtils` is `private[sql]` in 4.x. Used by
    * [[graft.text.BloomPrune]] to plant `BloomFilterAggregate` /
    * `BloomFilterMightContain` (the expressions behind Spark's own
    * runtime bloom-filter join) into DataFrame plans explicitly.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Wrap an analyzed logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`). Used by [[graft.operators.ExplainAdvisor]] to
    * run a narrow key-count aggregation over a JOIN SIDE'S OWN logical
    * subtree — the sketch input for a join-site cardinality estimate
    * must see the side as the join sees it (filters and upstream joins
    * applied), not the raw base table.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
