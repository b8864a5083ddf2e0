package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream interval join ([[EventStreamJob.clickAttribution]]):
  * the same function over readStream inputs must emit exactly the rows
  * the batch range join produces — inner interval joins emit matches
  * eagerly, so with AvailableNow draining the source the outputs are
  * identical, not merely a subset.
  */
class StreamJoinSpec extends SparkSpec {

  private def streamDir: String = {
    val dir = Files.createTempDirectory("graft-sjoin-src")
    Files.copy(
      Paths.get(s"${SparkSpec.Sf0001}/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  private def sortedRows(rows: Array[Row]): Seq[Seq[Any]] =
    rows.map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("streaming click attribution ≡ batch range join") {
    val batchEvents = graft.Tables.load(spark, SparkSpec.Sf0001, "events")
    val batch = EventStreamJob.clickAttribution(batchEvents, batchEvents).collect()
    assert(batch.nonEmpty) // fixture sanity: joins actually match

    val dir = streamDir
    val s1 = EventStreamJob.readEventStream(spark, dir)
    val s2 = EventStreamJob.readEventStream(spark, dir)
    val q = EventStreamJob.clickAttribution(s1, s2)
      .writeStream
      .queryName("stream_attrib")
      .outputMode("append")
      .format("memory")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.sql("SELECT * FROM stream_attrib").collect()
    assert(streamed.length == batch.length)
    assert(sortedRows(streamed) == sortedRows(batch))
  }

  test("stream-static broadcast enrichment ≡ batch left join") {
    val events = graft.Tables.load(spark, SparkSpec.Sf0001, "events")
    val users = graft.Tables.load(spark, SparkSpec.Sf0001, "customer")
    val batch = EventStreamJob.enrichWithUsers(events, users).collect()

    val q = EventStreamJob.enrichWithUsers(
        EventStreamJob.readEventStream(spark, streamDir), users)
      .writeStream
      .queryName("stream_enrich")
      .outputMode("append")
      .format("memory")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.sql("SELECT * FROM stream_enrich").collect()
    assert(streamed.length == batch.length)
    assert(sortedRows(streamed) == sortedRows(batch))
  }
}
