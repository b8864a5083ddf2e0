package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the training-data
  * extensions) is registered here as a named query with, where
  * SQL-expressible, a DuckDB oracle equivalent. Registries live in the
  * per-domain modules:
  *   - operators.CoreQueries   q01–q16, q56  filters/predicates/joins (§2.2-2.3, as-of)
  *   - operators.AggQueries    q17–q30  aggregates/windows/set ops (§2.4-2.7)
  *   - functions.ScalarQueries q31–q35  scalar fns + synthetic gen (§2.8, S3)
  *   - streaming.EventQueries  q36–q39  event windows (§2.10 batch-equivalents)
  *   - text.TextQueries        q40–q46  text analysis + dedup (extensions)
  *   - similarity.VectorQueries q47–q49 embedding similarity (extensions)
  *   - multimodal.MultimodalQueries q50 binary-column plumbing (extensions)
  */
object SparkEntry {

  val registry: Seq[Q] =
    operators.CoreQueries.all ++
    operators.AggQueries.all ++
    functions.ScalarQueries.all ++
    streaming.EventQueries.all ++
    text.TextQueries.all ++
    similarity.VectorQueries.all ++
    multimodal.MultimodalQueries.all ++
    operators.Search.all ++
    security.SecurityQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q01: window-based 30-day readmission rate (SURVEY.md §7.1 M1).
    */
  def entry(spark: SparkSession): DataFrame =
    operators.CoreQueries.q01.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
