package graft.operators

import org.apache.spark.sql.DataFrame

/** Key-based batch upsert (S4: the reference's warehouse load is a
  * row-at-a-time ORM `session.merge`,
  * healthcare-data-pipeline-main.py:606-670 — upsert semantics at
  * ~278 rec/s). The immutable-file equivalent is set algebra over the
  * whole partition: survivors (base keys untouched by the delta) union
  * the delta itself — one anti-join + union, fully distributed, then
  * written back with `Formats.writeParquetPartitioned` (rewrite only
  * the partitions the delta touches on a real lake).
  *
  * `updates` must be unique per key (enforce upstream with
  * latest-per-key, q14's idiom); with duplicates the result would keep
  * them all — MERGE engines reject that case too.
  */
object Upsert {

  def mergeByKey(base: DataFrame, updates: DataFrame,
                 keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "mergeByKey needs at least one key column")
    base.join(updates, keys, "left_anti").unionByName(updates)
  }
}
