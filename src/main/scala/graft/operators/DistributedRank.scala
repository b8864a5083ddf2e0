package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.graftshim.InternalRowBridge
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{Column, DataFrame}

/** Exact global ranking WITHOUT the single-task window.
  *
  * `Window.orderBy(...)` (no partitionBy) funnels the whole frame
  * through ONE task — fine on aggregated/limited frames, a scale
  * killer on row-cardinality ones (a billion customers at 100 TB).
  * This operator produces the identical row_number/NTILE values from:
  *
  *   1. a DISTRIBUTED range sort (`orderBy` → RangePartitioning: every
  *      partition holds a contiguous key range, sorted within);
  *   2. per-partition counts/sums + prefix offsets (one lightweight
  *      pass — the driver sees P integers, never rows), then a
  *      streaming numbering pass that starts each partition at its
  *      offset.
  *
  * The sort order must be TOTAL (include a tiebreak column) or indices
  * within ties are partition-placement-dependent — same caveat a
  * window row_number has.
  *
  * Both passes run on the Tungsten binary row format: rows come off
  * `queryExecution.toRdd` as UnsafeRows and the appended column is
  * written by an `UnsafeProjection` over a `JoinedRow` — one packed
  * byte-copy per output row, no per-column boxing into external
  * `Row`s (the old `df.rdd` round-trip deserialized and re-encoded
  * every column of every row). The passes still execute outside
  * whole-stage codegen; that is the documented cost of exact global
  * ranking at scale (the alternative — approximate quantile cutoffs —
  * changes semantics).
  */
object DistributedRank {

  /** Append one computed long column via a per-partition streaming
    * function, entirely in internal-row format. `makeStep` is invoked
    * once per partition and may close over mutable per-partition state;
    * it must be deterministic given the partition's row stream (the
    * frame is layout-frozen by the caller's localCheckpoint).
    */
  private def appendStreamedLong(sorted: DataFrame, out: String)
      (makeStep: Int => InternalRow => Long): DataFrame = {
    val outSchema = sorted.schema.add(out, LongType, nullable = false)
    val rdd = InternalRowBridge.toInternalRdd(sorted)
      .mapPartitionsWithIndex { (pid, it) =>
        val proj = UnsafeProjection.create(outSchema)
        val joined = new JoinedRow
        val extra = new GenericInternalRow(1)
        val step = makeStep(pid)
        it.map[InternalRow] { r =>
          extra.update(0, step(r))
          // copy: the projection reuses its result buffer, and
          // downstream operators may hold rows across iterator steps
          proj(joined(r, extra)).copy()
        }
      }
    InternalRowBridge.fromInternalRdd(sorted, rdd, outSchema)
  }

  /** Per-partition totals of `fold` over the frozen layout, ordered by
    * partition id — the driver-side input for prefix offsets (P longs,
    * never rows).
    */
  private def partitionTotals(sorted: DataFrame)
      (fold: (Long, InternalRow) => Long): Array[Long] =
    InternalRowBridge.toInternalRdd(sorted)
      .mapPartitionsWithIndex { (pid, it) =>
        Iterator.single((pid, it.foldLeft(0L)(fold)))
      }.collect().sortBy(_._1).map(_._2)

  /** Append 1-based global row numbers in `sortCols` order. */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column],
                    out: String = "rn"): DataFrame = {
    // localCheckpoint: both passes must see one frozen partition
    // layout (see withPrefixSum for the full rationale)
    val sorted = df.orderBy(sortCols: _*).transform(graft.Barrier.freeze)
    val counts = partitionTotals(sorted)((n, _) => n + 1L)
    val offsets = counts.scanLeft(0L)(_ + _)
    appendStreamedLong(sorted, out) { pid =>
      var acc = offsets(pid)
      _ => { acc += 1L; acc }
    }
  }

  /** Append 1-based row numbers per key group in `sortCols` order —
    * the distributed form of
    * `row_number().over(Window.partitionBy(keys).orderBy(sortCols))`
    * that never funnels one key's rows through a single task.
    *
    * A partitionBy window hashes each key's ENTIRE group to one task;
    * when the key is low-cardinality over a row-cardinality frame
    * (documents per source at 100 TB, a handful of sources) that is
    * terabytes through one task. Here the frame is RANGE sorted on
    * (keys ++ sortCols) — one key's rows span many partitions, each a
    * contiguous sorted slice — then a count pass ships only
    * (partition, key, run-length) triples to the driver (≈ P + K
    * entries; K small is the premise, and with contiguous runs the
    * count can never exceed P + K − 1 entries total), and the
    * numbering pass starts each partition's slice at its key's global
    * offset. `keys` are column NAMES (they must be locatable in the
    * schema to extract group identity per row); `sortCols` must
    * total-order rows WITHIN a key, same caveat as [[withRowNumber]].
    */
  def withRowNumberPerKey(df: DataFrame, keys: Seq[String],
                          sortCols: Seq[Column],
                          out: String = "rn"): DataFrame = {
    require(keys.nonEmpty, "keys empty — use withRowNumber for the global form")
    import org.apache.spark.sql.functions.col
    // localCheckpoint: both passes must see one frozen partition layout
    // (see withPrefixSum). Range boundaries sample the composite key, so
    // a big source splits across many partitions by its sort columns.
    val sorted = df.orderBy(keys.map(col) ++ sortCols: _*).transform(graft.Barrier.freeze)
    val keyFields = keys.map(k =>
      sorted.schema.fieldIndex(k) -> sorted.schema(k).dataType)
    // group identity off the internal row: values are copied out of the
    // (possibly buffer-reused) row — copyValue handles UTF8String et al.
    def keyOf(r: InternalRow): Vector[Any] =
      keyFields.iterator.map { case (i, dt) =>
        InternalRow.copyValue(r.get(i, dt))
      }.toVector
    // Runs of consecutive equal keys per partition (globally sorted by
    // key first, so each key is one run per partition).
    val runs = InternalRowBridge.toInternalRdd(sorted)
      .mapPartitionsWithIndex { (pid, it) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Vector[Any], Long)]
        var cur: Vector[Any] = null
        var n = 0L
        it.foreach { r =>
          val k = keyOf(r)
          if (!(k == cur)) {
            if (cur != null) buf += ((cur, n))
            cur = k; n = 0L
          }
          n += 1L
        }
        if (cur != null) buf += ((cur, n))
        Iterator.single((pid, buf.toArray))
      }.collect().sortBy(_._1)
    // Global start offset for each (partition, key): rows of that key
    // in earlier partitions. Driver-side scan over the tiny run list.
    val seen = scala.collection.mutable.HashMap.empty[Vector[Any], Long]
    val offsets: Map[(Int, Vector[Any]), Long] =
      runs.iterator.flatMap { case (pid, rs) =>
        rs.map { case (k, n) =>
          val start = seen.getOrElse(k, 0L)
          seen(k) = start + n
          ((pid, k), start)
        }
      }.toMap
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    appendStreamedLong(sorted, out) { pid =>
      var cur: Vector[Any] = null
      var acc = 0L
      r => {
        val k = keyOf(r)
        if (!(k == cur)) { cur = k; acc = bc.value((pid, k)) }
        acc += 1L
        acc
      }
    }
  }

  /** Append the inclusive running sum of `value` in `sortCols` order —
    * the distributed prefix sum: range sort, one lightweight pass for
    * per-partition totals (driver sees P longs), then a streaming
    * second pass adds each partition's offset. Same single-task-window
    * avoidance as [[withRowNumber]], same total-order requirement.
    */
  def withPrefixSum(df: DataFrame, sortCols: Seq[Column], value: Column,
                    out: String = "psum"): DataFrame = {
    // null values contribute 0 (SQL SUM semantics) — getLong on a null
    // cell would otherwise NPE mid-stage with an opaque executor error.
    // localCheckpoint, NOT .cache(): both passes must see the SAME
    // partition layout (range-partitioner boundaries are re-sampled on
    // recompute), but a CacheManager entry lives until the session ends
    // or an explicit unpersist — repeated calls would pile sorted copies
    // of row-cardinality frames into executor storage. Checkpoint blocks
    // are RDD-level and the ContextCleaner frees them when the frame is
    // garbage-collected. Availability tradeoff (applies to every
    // localCheckpoint in this object): blocks are executor-local and
    // non-replicated with lineage truncated, so losing an executor
    // mid-job (spot nodes, dynamic allocation) fails the job instead
    // of recomputing — rerun it, or switch to reliable checkpointing
    // when a checkpoint dir is configured and reruns are expensive.
    val sorted = df
      .withColumn("__v", org.apache.spark.sql.functions
        .coalesce(value.cast("long"),
          org.apache.spark.sql.functions.lit(0L)))
      .orderBy(sortCols: _*).transform(graft.Barrier.freeze)
    val vIdx = sorted.schema.fieldIndex("__v")
    val partSums = partitionTotals(sorted)((s, r) => s + r.getLong(vIdx))
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive prefix of partition totals
    appendStreamedLong(sorted, out) { pid =>
      var acc = offsets(pid)
      r => { acc += r.getLong(vIdx); acc }
    }.drop("__v")
  }

  /** Append NTILE(n) over the whole frame in `sortCols` order — SQL
    * semantics: the first (N mod n) tiles get one extra row.
    */
  def withNtile(df: DataFrame, n: Int, sortCols: Seq[Column],
                out: String = "tile"): DataFrame = {
    require(n > 0, s"ntile buckets must be positive, got $n")
    // localCheckpoint for the same reason as withPrefixSum: materialize
    // the ranked frame once for the count + downstream read without
    // leaving a session-lifetime CacheManager entry behind
    val ranked = withRowNumber(df, sortCols, "__rn").transform(graft.Barrier.freeze)
    val total = ranked.count() // checkpoint blocks already materialized
    val q = total / n
    val r = total % n
    val cut = r * (q + 1) // rows 1..cut live in the (q+1)-sized tiles
    import org.apache.spark.sql.functions._
    // integer `div`, never Column `/`: double division loses integer
    // exactness past 2^53 rows (the q66-class trap)
    val tile =
      if (q == 0) col("__rn") // fewer rows than tiles: tile i = row i
      else when(col("__rn") <= cut,
          expr(s"(__rn - 1) div ${q + 1} + 1"))
        .otherwise(expr(s"$r + (__rn - $cut - 1) div $q + 1"))
    ranked.withColumn(out, tile.cast("int")).drop("__rn")
  }
}
