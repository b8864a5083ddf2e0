package graft.streaming

import graft.{SparkSpec, Tables}
import java.nio.file.Files

/** Exactly-once across restarts: the hourly aggregation runs to
  * completion, the source grows, and a SECOND query start from the SAME
  * checkpoint must process only the new file and never re-emit a window
  * the first run already finalized — the recovery contract a 100 TB
  * backfill relies on (a restarted job that double-counts is worse than
  * one that crashes).
  */
class CheckpointRestartSpec extends SparkSpec {
  import spark.implicits._

  test("hourly agg restarts from checkpoint without duplicate windows") {
    val srcDir = Files.createTempDirectory("graft-ckpt-src").toString
    val outDir = Files.createTempDirectory("graft-ckpt-out").toString
    val ckptDir = Files.createTempDirectory("graft-ckpt-meta").toString

    // Split the raw events by event time: early half arrives first, the
    // late half after the restart (monotone event time, so the second
    // run's rows are not late data).
    val raw = spark.read.schema(Tables.schemas("events"))
      .parquet(s"${SparkSpec.Sf0001}/events.parquet")
    val cut = raw.selectExpr("percentile(ts, 0.5)").first().getDouble(0).toLong
    raw.filter($"ts" <= cut).write.parquet(s"$srcDir/early.parquet")

    // append-mode sink schema (may legitimately be EMPTY after run 1: a
    // single-file run advances the watermark only at batch end, so its
    // windows finalize during the NEXT run — exactly the cross-restart
    // state this test exercises)
    val sinkSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "hour_start STRING, event_type STRING, n BIGINT, " +
      "avg_value DOUBLE, total_value DOUBLE")
    def sink = spark.read.schema(sinkSchema).parquet(outDir)

    val q1 = EventStreamJob.runHourlyAgg(spark, srcDir, outDir, ckptDir)
    q1.awaitTermination()
    val afterFirst = sink.count()

    raw.filter($"ts" > cut).write.mode("append").parquet(srcDir)
    val q2 = EventStreamJob.runHourlyAgg(spark, srcDir, outDir, ckptDir)
    q2.awaitTermination()

    val out = sink
    assert(out.count() > afterFirst, "restart emitted no newly-closed windows")
    // exactly-once: every (window, event_type) appears at most once
    assert(out.groupBy($"hour_start", $"event_type").count()
      .filter($"count" > 1).count() === 0)
    // and every emitted row matches the batch computation over ALL data
    val batch = EventQueries.q36.build(spark, SparkSpec.Sf0001)
      .collect().map(_.toSeq).toSet
    val stray = out.collect().map(_.toSeq).filterNot(batch.contains)
    assert(stray.isEmpty, s"rows not in batch result: ${stray.take(3)}")
  }
}
