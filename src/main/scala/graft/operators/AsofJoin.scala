package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic AS-OF JOIN: for each left row, carry the designated columns
  * of the latest right row with the same key at-or-before the left
  * row's time (inclusive). Left rows with no prior right row keep NULL
  * carries (left-outer semantics).
  *
  * Reference shape: the correlated "most recent result" subquery family
  * (`ORDER BY t.full_date DESC LIMIT 1`,
  * healthcare-sql-analytics.sql:592-598) generalized to two inputs —
  * e.g. latest lab value before each encounter.
  *
  * Scale design: Spark has no native as-of join, and the common
  * encoding — equi-join on key + `r.t <= l.t` range filter + rank —
  * materializes every (left × earlier-right) pair before ranking,
  * quadratic per key at 100 TB. This implementation UNIONs both sides
  * and sorts once by (key, t, side); a running `last(_, ignoreNulls)`
  * window carries the latest right values into each left row. ONE
  * shuffle, O(n log n) per key, zero pair explosion. Skewed keys cost
  * what their row count costs — no quadratic amplification to salt
  * away. Equivalence to the naive encoding is property-tested in
  * `PropertySpec` ("asof join equals naive join+rank").
  */
object AsofJoin {

  /** All `carry` columns travel inside ONE struct through a single
    * running `last(ignoreNulls)`, so the latest right row wins
    * atomically: if that row has a NULL in a carry column, the NULL is
    * carried (exactly what the naive join+rank returns) instead of an
    * older row's non-null value leaking through per-column.
    *
    * Precondition: right-side (key, rightTime) pairs should be unique —
    * ties between right rows at the same timestamp resolve
    * nondeterministically (the same is true of the naive encoding
    * without a tiebreak). Add a tiebreak column to `rightTime` upstream
    * if the source has same-instant rows.
    *
    * @param key      equi-join key column (same name on both sides)
    * @param leftTime  left timestamp/ordering column name
    * @param rightTime right timestamp/ordering column name
    * @param carry    right columns to carry onto left rows; names must
    *                 not collide with left columns (rename beforehand)
    */
  def latestBefore(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   carry: Seq[String]): DataFrame = {
    require(carry.nonEmpty, "carry must name at least one right column")
    val collisions = carry.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"carry collides with left columns: $collisions")

    val carryType = org.apache.spark.sql.types.StructType(
      carry.map(c => right.schema(c).copy(name = c)))
    // Right rows sort BEFORE left rows at equal time (side 0 < 1) so
    // "at-or-before" is inclusive.
    val sideR = right.select(
      col(key), col(rightTime).cast("timestamp").as("_t"),
      lit(0).as("_side"), struct(carry.map(col): _*).as("_carry"))
    val sideL = left.select(
      col(key) +: col(leftTime).cast("timestamp").as("_t") +:
      lit(1).as("_side") +: lit(null).cast(carryType).as("_carry") +:
      left.columns.filterNot(_ == key).map(col): _*)

    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = sideR.unionByName(sideL, allowMissingColumns = true)
      .withColumn("_carry", last(col("_carry"), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(left.columns.map(col) ++
        carry.map(c => col("_carry").getField(c).as(c)): _*)
  }
}
