package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[TransitionMonitorJob]] — the streaming form of q160: per
  * micro-batch directly-follows shares scored against a matrix pinned
  * at job start. Receipts: the scoring core IS the oracle-verified
  * q160 algebra (batch-twin identity), a shape-matching batch stays
  * calm, a novel transition and an eroded share raise their flags in
  * the batch that causes them.
  */
class TransitionMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1700000000000000L // µs, well inside the µs band

  /** events-schema rows: one user walking the given type sequence. */
  private def walk(userId: Long, startEid: Long,
                   types: Seq[String]): Seq[(Long, Long, Long, String, Double, String)] =
    types.zipWithIndex.map { case (t, i) =>
      (startEid + i, T0 + i * 1000000L, userId, t, 0.0, "{}")
    }

  private def eventsDf(rows: Seq[(Long, Long, Long, String, Double, String)]): DataFrame =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("batch-twin: transitionShares over the testdata equals the q160 query head") {
    val viaQuery = SparkEntry.queries("q160_markov_transitions")(
        spark, graft.SparkSpec.Sf0001)
      .select("from_type", "to_type", "n", "p_ppm")
      .collect().map(_.toSeq).toSet
    val viaCore = MarkovTransitions.transitionShares(
        graft.Tables.load(spark, graft.SparkSpec.Sf0001, "events"))
      .orderBy($"n".desc, $"from_type", $"to_type").limit(20)
      .collect().map(_.toSeq).toSet
    assert(viaQuery == viaCore,
      "the monitor's scoring core diverged from the oracle-verified query")
  }

  test("calm batch stays calm; novel and eroded transitions flag in their own batch") {
    val root = java.nio.file.Files.createTempDirectory("graft-trans")
    val (srcDir, refDir, outDir, ckpt) = (root.resolve("src"),
      root.resolve("ref"), root.resolve("out"), root.resolve("ckpt"))
    java.nio.file.Files.createDirectories(srcDir)
    // reference process: login → browse → buy, plus a browse → browse
    // self-loop so browse has a split outflow (800000 / 200000 ppm)
    val ref = walk(1L, 0L, Seq("login", "browse", "buy")) ++
      walk(2L, 10L, Seq("login", "browse", "browse", "buy")) ++
      walk(3L, 20L, Seq("login", "browse", "buy")) ++
      walk(4L, 30L, Seq("login", "browse", "buy"))
    eventsDf(ref).coalesce(1).write.parquet(s"$refDir/events.parquet")
    // batch 0 mirrors the reference shape exactly (same share split)
    val calm = walk(10L, 100L, Seq("login", "browse", "buy")) ++
      walk(11L, 110L, Seq("login", "browse", "browse", "buy")) ++
      walk(12L, 120L, Seq("login", "browse", "buy")) ++
      walk(13L, 130L, Seq("login", "browse", "buy"))
    eventsDf(calm).coalesce(1).write.parquet(s"$srcDir/b0")
    // batch 1: a NOVEL login → buy skip and browse outflow eroded to
    // all-self-loop
    val hot = walk(20L, 200L, Seq("login", "buy")) ++
      walk(21L, 210L, Seq("login", "browse", "browse", "browse"))
    eventsDf(hot).coalesce(1).write.parquet(s"$srcDir/b1")

    TransitionMonitorJob.run(spark, s"$srcDir/*", refDir.toString,
      outDir.toString, ckpt.toString).awaitTermination()

    val out = spark.read.parquet(outDir.toString)
      .select($"batch_id".cast("long"), $"from_type", $"to_type",
        $"p_ppm", $"ref_ppm", $"novel", $"anomalous")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
    val calmRows = out.filter(_._1 == 0L)
    val hotRows = out.filter(_._1 == 1L)
    assert(calmRows.nonEmpty && calmRows.forall(r => !r._6 && !r._7),
      s"shape-matching batch must stay calm: ${calmRows.toSeq}")
    val novel = hotRows.filter(r => r._2 == "login" && r._3 == "buy")
    assert(novel.length == 1 && novel.head._6 && novel.head._7 &&
      novel.head._5 == 0L, s"login→buy skip must flag novel: ${hotRows.toSeq}")
    val eroded = hotRows.filter(r => r._2 == "browse" && r._3 == "browse")
    assert(eroded.length == 1 && !eroded.head._6 && eroded.head._7 &&
      eroded.head._4 == 1000000L && eroded.head._5 == 200000L,
      s"browse self-loop share must flag anomalous: ${hotRows.toSeq}")
  }
}
