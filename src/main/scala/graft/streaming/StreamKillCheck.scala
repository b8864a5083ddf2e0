package graft.streaming

import graft.{ClusterCheck, ContentHash}
import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Executor-loss survival for STREAMING state (the axis ClusterCheck
  * proves for batch): each stateful operator replays the same staged
  * micro-batch sequence twice on a real multi-process cluster
  * (`local-cluster[N,cores,memMB]`) — once undisturbed (reference),
  * once with one executor JVM `kill -9`'d mid-stream — and the two
  * parquet sinks must be content-identical.
  *
  * What a kill exercises that no single-JVM test can: the lost
  * executor held live HDFSBackedStateStore instances (window
  * aggregation state, dedup key set, open flatMapGroupsWithState
  * session buffers) and unflushed shuffle blocks. Recovery is the
  * documented contract — tasks retry on the surviving executor,
  * state reloads from the checkpoint's delta/snapshot files, the
  * standalone master relaunches the dead executor, and the parquet
  * sink's manifest commit protocol makes a retried batch invisible —
  * so the gate is exact equality, not "mostly recovered":
  * order-independent [[graft.ContentHash]] match per operator, plus
  * per-key exactly-once assertions on the killed run's sink.
  *
  * A kill that lands after the run finished proves nothing; each
  * killed run's receipt carries `executors_removed`/`tasks_failed`
  * so the artifact shows the loss landed mid-query (lower
  * SPARK_GRAFT_KILL if a run outruns the delay).
  *
  * Usage: runMain graft.streaming.StreamKillCheck <sfDir> <out.json>
  *          [nBatches=40]
  * Env: SPARK_GRAFT_MASTER (default local-cluster[2,6,10240]),
  *      SPARK_GRAFT_CPUS (shuffle partitions, default 24),
  *      SPARK_GRAFT_KILL (seconds into each killed run; default 10).
  */
object StreamKillCheck {

  private final case class RunStats(rows: Long, hash: String,
                                    wallSec: Double, removed: Int,
                                    failedTasks: Int, err: String,
                                    outDir: String,
                                    curve: StreamSoak.SoakCurve)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args(1)
    val nBatches = if (args.length > 2) args(2).toInt else 40
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER",
      "local-cluster[2,6,10240]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val killAtSec = sys.env.getOrElse("SPARK_GRAFT_KILL", "10").toDouble

    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraClassPath",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_CLASSPATH",
          new java.io.File("target/scala-2.13/classes").getAbsolutePath))
      .config("spark.task.maxFailures", "4")
      .config("spark.stage.maxConsecutiveAttempts", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val removed = new java.util.concurrent.atomic.AtomicInteger(0)
    val failedTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit = {
        removed.incrementAndGet(); ()
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.reason != org.apache.spark.Success) {
          failedTasks.incrementAndGet(); ()
        }
    })

    def awaitExecutors(n: Int): Unit = {
      val deadline = System.currentTimeMillis() + 120000
      while (ClusterCheck.executorPids().size < n &&
             System.currentTimeMillis() < deadline) Thread.sleep(500)
      require(ClusterCheck.executorPids().size >= n,
        s"cluster did not (re)launch $n executors")
    }
    if (master.startsWith("local-cluster")) awaitExecutors(2)

    // one staged drop sequence shared by every run: identical file
    // order (sequential writes) => identical micro-batch boundaries
    // and watermark march in reference and killed runs alike
    val glob = StreamSoak.stageDrops(spark, sfDir, nBatches)

    def runOnce(op: String, kill: Boolean)
               (build: DataFrame => org.apache.spark.sql.Dataset[_]): RunStats = {
      if (master.startsWith("local-cluster")) awaitExecutors(2)
      removed.set(0); failedTasks.set(0)
      val out = java.nio.file.Files
        .createTempDirectory(s"graft-skc-out-$op").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft-skc-ckpt-$op").toString
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      if (kill) {
        val t = new Thread(() => {
          Thread.sleep((killAtSec * 1000).toLong)
          if (!done.get()) {
            ClusterCheck.executorPids().headOption.foreach { pid =>
              new ProcessBuilder("kill", "-9", pid.toString)
                .start().waitFor()
              ()
            }
          }
        }, s"graft-stream-killer-$op")
        t.setDaemon(true); t.start()
      }
      // per-batch state-store rows (the StreamSoak observable): the
      // KILLED run's curve proves state not only recovers
      // content-correct but keeps PLATEAUING after the executor loss —
      // a recovery that reloaded state into an unbounded shape would
      // pass the hash gate and still die at hour N on a cluster
      val points = scala.collection.mutable.ArrayBuffer
        .empty[StreamSoak.BatchPoint]
      val qname = s"skc_$op" + (if (kill) "_kill" else "_ref")
      val slistener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          if (p.name == qname) points.synchronized {
            points += StreamSoak.BatchPoint(p.batchId, p.numInputRows,
              p.stateOperators.map(_.numRowsTotal).sum,
              Option(p.eventTime.get("watermark")).getOrElse(""))
            ()
          }
        }
      }
      spark.streams.addListener(slistener)
      val t0 = System.nanoTime()
      try {
        val q = build(EventStreamJob.readEventStream(spark, glob))
          .toDF()
          .writeStream
          .queryName(qname)
          .outputMode("append")
          .format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        done.set(true)
        // the listener bus is async: a removal event can post seconds
        // after awaitTermination under load — a fixed sleep under-counts
        // and spuriously fails the kill-landed gate. Poll until the
        // expected removal arrives (bounded), instead.
        if (kill) {
          val deadline = System.currentTimeMillis() + 15000
          while (removed.get() < 1 &&
                 System.currentTimeMillis() < deadline) Thread.sleep(200)
        } else Thread.sleep(500)
        // The soak curve reads `points`, fed by the SAME async listener
        // bus: progress events for the last batch(es) can land after
        // awaitTermination, truncating the plateau window on gated
        // (>=100-batch) runs (ADVICE r11). `q.lastProgress` is updated
        // synchronously by the query handle, so poll (bounded) until the
        // listener has caught up to that batchId.
        val lastBatch = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
        if (lastBatch >= 0) {
          val pDeadline = System.currentTimeMillis() + 10000
          def maxSeen() = points.synchronized {
            if (points.isEmpty) -1L else points.map(_.batchId).max
          }
          while (maxSeen() < lastBatch &&
                 System.currentTimeMillis() < pDeadline) Thread.sleep(100)
        }
        val sink = spark.read.parquet(out)
        val (n, h) = ContentHash.rowsAndHash(sink)
        RunStats(n, h, (System.nanoTime() - t0) / 1e9,
          removed.get, failedTasks.get, "", out,
          StreamSoak.curveOf(op, points.toSeq))
      } catch {
        case e: Throwable =>
          done.set(true)
          RunStats(-1, "null", (System.nanoTime() - t0) / 1e9,
            removed.get, failedTasks.get, e.toString.take(300), out,
            StreamSoak.curveOf(op, points.toSeq))
      } finally spark.streams.removeListener(slistener)
    }

    // exactly-once key sets per operator, asserted on the KILLED sink
    val ops: Seq[(String, DataFrame => org.apache.spark.sql.Dataset[_],
                  Seq[String])] = Seq(
      ("hourly_agg", EventStreamJob.hourlyAgg(_), Seq("hour_start", "event_type")),
      ("dedup", EventStreamJob.dedupEvents(_), Seq("event_id")),
      ("sessionize", EventStreamJob.sessionize(_, streaming = true),
        Seq("user_id", "session_start")))

    val results = ops.map { case (op, build, keys) =>
      val ref = runOnce(op, kill = false)(build)
      val killed = runOnce(op, kill = true)(build)
      val hashMatch = ref.err.isEmpty && killed.err.isEmpty &&
        ref.hash == killed.hash && ref.rows == killed.rows
      // exactly-once on the KILLED sink: a retried batch that slipped
      // past the manifest commit would double its keys — the hash
      // match vs the reference would also flip, but the per-key audit
      // localizes the failure to "duplicate emission" vs "lost rows"
      val dupKeys =
        if (killed.err.nonEmpty) -1L
        else spark.read.parquet(killed.outDir)
          .groupBy(keys.map(org.apache.spark.sql.functions.col): _*)
          .count().filter(org.apache.spark.sql.functions.col("count") > 1)
          .count()
      op -> (ref, killed, hashMatch, dupKeys)
    }

    import graft.JsonOut.{jnum, jstr}
    // The plateau criterion is quartile-windowed (StreamSoak): with
    // fewer than ~100 batches the windows are too short to separate
    // "horizon still filling" from "unbounded growth", so short runs
    // report the curve as advisory and only soak-length runs gate on it
    val gateState = nBatches >= 100
    val allOk = results.forall { case (_, (_, killed, m, dups)) =>
      m && killed.removed >= 1 && dups == 0L &&
        (!gateState || killed.curve.plateaued)
    }
    val json = results.map { case (op, (ref, killed, m, dups)) =>
      val kc = killed.curve
      jstr(op) + ":{" +
        s""""rows":${ref.rows},"hash":${jstr(ref.hash)},""" +
        s""""ref_wall_sec":${jnum(ref.wallSec, 1)},""" +
        s""""killed_rows":${killed.rows},"killed_hash":${jstr(killed.hash)},""" +
        s""""killed_wall_sec":${jnum(killed.wallSec, 1)},""" +
        s""""executors_removed":${killed.removed},""" +
        s""""tasks_failed":${killed.failedTasks},""" +
        s""""hash_match":$m,"dup_keys":$dups,""" +
        s""""killed_state_plateaued":${kc.plateaued},""" +
        s""""killed_state_gated":$gateState,""" +
        s""""killed_final_state":${kc.finalState},""" +
        s""""killed_q2_max_state":${kc.q2MaxState},""" +
        s""""killed_q4_max_state":${kc.q4MaxState},""" +
        s""""killed_state_curve":${kc.batches.map(_.stateRows)
             .mkString("[", ",", "]")},""" +
        s""""ref_err":${jstr(ref.err)},"killed_err":${jstr(killed.err)}}"""
    }.mkString(
      "{\"master\":" + jstr(master) +
        ",\"kill_at_sec\":" + killAtSec +
        ",\"n_batches\":" + nBatches +
        ",\"sf\":" + jstr(sfDir) + ",\"ops\":{", ",",
      "},\"all_ok\":" + allOk + "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    require(allOk, "stream kill check failed — see artifact")
    spark.stop()
  }
}
