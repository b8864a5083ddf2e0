package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §4.3: healthcare
  * encounter counts are power-law-ish — a handful of patients dominate
  * the fact table, and at 100 TB one hot key pins an entire shuffle
  * partition to a single task for hours).
  *
  * The standard remedies, in preference order: broadcast the small side
  * (no shuffle at all); AQE skew-join splitting (runtime re-plan,
  * `spark.sql.adaptive.skewJoin.enabled`); and — when the small side is
  * too big to broadcast and the skew is known ahead of time — SALTING,
  * implemented here as a reusable operator:
  *
  *   - the big side gets a deterministic salt in [0, salts) hashed from
  *     a high-cardinality column (NOT the join key — the whole point is
  *     to split one key's rows across salts);
  *   - the small side is replicated `salts`× via an inline explode;
  *   - the join runs on (key, salt), spreading each hot key over
  *     `salts` shuffle partitions.
  *
  * Salting is pure execution parallelism: the joined row set is
  * identical to the plain equi-join (property-tested in SkewJoinSpec,
  * oracle-verified in q60 against an unsalted DuckDB join).
  */
object SkewJoin {

  /** Inner equi-join of `big` ⋈ `small` on `key`, salted `salts` ways.
    *
    * @param bigSaltSource high-cardinality expression over `big`'s
    *                      columns used to derive the salt (e.g. a row id;
    *                      must not be the join key). Deterministic —
    *                      xxhash64, not rand() — so retried/speculative
    *                      tasks salt identically and verified queries
    *                      stay reproducible.
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
                      salts: Int, bigSaltSource: Column): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(bigSaltSource), lit(salts)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
