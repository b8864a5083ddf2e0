package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** SCD Type-2 merge — dimension history with validity intervals (the
    * patient-dimension pattern a clinical warehouse needs: an address
    * or coverage change must not rewrite history the way
    * [[mergeByKey]]'s SCD1 semantics do).
    *
    * `base` carries `valid_from`/`valid_to` (DateType; open rows have
    * `valid_to` NULL) plus the key and attribute columns; `updates`
    * carries the key + attributes + an `effective` date. Semantics:
    *
    *   - closed history rows pass through untouched;
    *   - an open row whose key gets an update with DIFFERENT attribute
    *     values closes at the update's effective date, and a new open
    *     row starts there;
    *   - an unchanged update (identical attributes) is a no-op — no
    *     spurious version churn;
    *   - brand-new keys open their first row at their effective date.
    *
    * Scale design: one shuffle on the key (the open⋈updates equi-join
    * decides changed / unchanged / new), history passes through with
    * no join at all, and the output is a union of narrow projections —
    * the same immutable-file set-algebra shape as [[mergeByKey]],
    * distributed end-to-end. `updates` must be unique per key (one
    * batch = one snapshot; fold intra-batch sequences upstream with
    * latest-per-key, q14's idiom).
    */
  def scd2Merge(base: DataFrame, updates: DataFrame, keys: Seq[String],
                effectiveCol: String = "effective"): DataFrame = {
    require(keys.nonEmpty, "scd2Merge needs at least one key column")
    val attrs = base.columns.toSeq
      .filterNot(keys.contains).filterNot(Seq("valid_from", "valid_to").contains)
    require(attrs.nonEmpty, "scd2Merge needs at least one attribute column")
    val closed = base.filter(col("valid_to").isNotNull)
    val open = base.filter(col("valid_to").isNull)
    val u = updates.select(
      (keys.map(col) :+ col(effectiveCol).as("__eff")) ++
        attrs.map(a => col(a).as(s"__u_$a")): _*)
    val joined = open.join(u, keys, "left_outer")
    val changed = attrs.map(a => !(col(a) <=> col(s"__u_$a"))) // null-safe
      .reduce(_ || _)
    // open rows: untouched (no update or identical attributes) pass
    // through; changed ones close at the update's effective date
    val stillOpen = joined.filter(col("__eff").isNull || !changed)
      .select(base.columns.map(col): _*)
    val nowClosed = joined.filter(col("__eff").isNotNull && changed)
      .withColumn("valid_to", col("__eff"))
      .select(base.columns.map(col): _*)
    // new versions: one fresh open row per changed key; plus first rows
    // for keys the base has never seen
    val newVersions = joined.filter(col("__eff").isNotNull && changed)
      .select(keys.map(col) ++ attrs.map(a => col(s"__u_$a").as(a)) ++
        Seq(col("__eff").as("valid_from"),
            lit(null).cast("date").as("valid_to")): _*)
    val firstRows = u.join(base.select(keys.map(col): _*).distinct(),
        keys, "left_anti")
      .select(keys.map(col) ++ attrs.map(a => col(s"__u_$a").as(a)) ++
        Seq(col("__eff").as("valid_from"),
            lit(null).cast("date").as("valid_to")): _*)
    closed.unionByName(stillOpen).unionByName(nowClosed)
      .unionByName(newVersions.select(base.columns.map(col): _*))
      .unionByName(firstRows.select(base.columns.map(col): _*))
  }
}
