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
    *   - brand-new keys open their first row at their effective date;
    *   - a key whose history is fully CLOSED re-activates: the update
    *     opens a fresh row (its effective date is trusted — callers
    *     replaying deep history out of order should validate against
    *     closed intervals upstream);
    *   - malformed updates FAIL the job rather than half-apply — the
    *     load-gate philosophy of [[graft.sources.Formats]]: a NULL
    *     effective date; an effective date ON OR BEFORE a changed open
    *     row's valid_from (strictly before would write an inverted
    *     interval; equal would write a zero-length closed version that
    *     `valid_from <= d AND d < valid_to` lookups can never see —
    *     fold same-day corrections upstream, they are SCD1 fixes, not
    *     new versions); and duplicate keys within one batch (the
    *     open⋈updates join would multiply the open row into several
    *     closed + several open rows — "unique per key" is enforced
    *     here, not just documented).
    *
    * Scale design: one shuffle on the key (the open⋈updates equi-join
    * decides changed / unchanged / new), history passes through with
    * no join at all, and the output is a union of narrow projections —
    * the same immutable-file set-algebra shape as [[mergeByKey]],
    * distributed end-to-end. The duplicate-key guard is a count window
    * partitioned by the key over the batch-sized updates frame — high
    * cardinality key, delta-sized input, no single-task risk. Fold
    * intra-batch sequences upstream with latest-per-key (q14's idiom).
    */
  def scd2Merge(base: DataFrame, updates: DataFrame, keys: Seq[String],
                effectiveCol: String = "effective"): DataFrame = {
    require(keys.nonEmpty, "scd2Merge needs at least one key column")
    val attrs = base.columns.toSeq
      .filterNot(keys.contains).filterNot(Seq("valid_from", "valid_to").contains)
    require(attrs.nonEmpty, "scd2Merge needs at least one attribute column")
    val closed = base.filter(col("valid_to").isNotNull)
    val open = base.filter(col("valid_to").isNull)
    // malformed input FAILS the job (the Formats load-gate philosophy):
    // a NULL effective date would half-apply (no-op for existing keys,
    // a corrupt NULL-valid_from row for new ones); duplicate keys would
    // multiply the open row through the join. Both guards live inside
    // __eff, which every output branch evaluates — they cannot be
    // pruned away.
    val kw = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    val u = updates.select(
      (keys.map(col) :+ col(effectiveCol) :+
        count(lit(1)).over(kw).as("__kcnt")) ++
        attrs.map(a => col(a).as(s"__u_$a")): _*)
      .select(
        (keys.map(col) :+
          when(col(effectiveCol).isNull,
            raise_error(lit("scd2Merge: NULL effective date")))
          .when(col("__kcnt") > 1,
            raise_error(concat(
              lit("scd2Merge: duplicate update rows for key "),
              concat_ws("/", keys.map(k => col(k).cast("string")): _*))))
          .otherwise(col(effectiveCol)).as("__eff")) ++
          attrs.map(a => col(s"__u_$a")): _*)
      // two consumers (the open-row join AND firstRows' anti-join):
      // without this the updates scan + guard window would execute
      // twice per merge. Same availability tradeoff as below.
      .transform(graft.Barrier.freeze)
    // localCheckpoint: three union branches read this join — without it
    // the key shuffle + scan would execute once per branch (the doc's
    // "one shuffle" claim would be false); checkpoint blocks are
    // ContextCleaner-freed. Availability tradeoff: the blocks are
    // executor-local and NON-replicated — lineage is truncated, so an
    // executor loss mid-job (spot nodes, dynamic allocation downscale)
    // fails the job instead of recomputing; rerun the load. Use
    // reliable checkpointing if a checkpoint dir + at-most-once-rerun
    // matters more than the write amplification.
    val joined = open.join(u, keys, "left_outer").transform(graft.Barrier.freeze)
    val changed = attrs.map(a => !(col(a) <=> col(s"__u_$a"))) // null-safe
      .reduce(_ || _)
    // out-of-order effective dates would write an inverted interval
    // (strictly before) or an invisible zero-length version (equal) —
    // corruption either way, not a merge: FAILFAST (class doc)
    val effChecked = when(col("__eff") <= col("valid_from"),
      raise_error(concat(lit("scd2Merge: effective date on or before open row for key "),
        concat_ws("/", keys.map(k => col(k).cast("string")): _*))))
      .otherwise(col("__eff"))
    def asNewOpenRow(df: DataFrame): DataFrame = df
      .select(keys.map(col) ++ attrs.map(a => col(s"__u_$a").as(a)) ++
        Seq(col("__eff").as("valid_from"),
            lit(null).cast("date").as("valid_to")): _*)
      .select(base.columns.map(col): _*)
    // open rows: untouched (no update or identical attributes) pass
    // through; changed ones close at the update's effective date
    val stillOpen = joined.filter(col("__eff").isNull || !changed)
      .select(base.columns.map(col): _*)
    val nowClosed = joined.filter(col("__eff").isNotNull && changed)
      .withColumn("valid_to", effChecked)
      .select(base.columns.map(col): _*)
    // new versions: one fresh open row per changed key; plus first rows
    // for keys with NO OPEN ROW — brand-new keys and re-activated ones
    // (a key whose history is fully closed must accept new versions,
    // not silently swallow them)
    val newVersions = asNewOpenRow(
      joined.filter(col("__eff").isNotNull && changed))
    val firstRows = asNewOpenRow(
      u.join(open.select(keys.map(col): _*).distinct(), keys, "left_anti"))
    closed.unionByName(stillOpen).unionByName(nowClosed)
      .unionByName(newVersions).unionByName(firstRows)
  }
}
