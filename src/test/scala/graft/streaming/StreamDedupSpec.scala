package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.streaming.Trigger

/** [[EventStreamJob.dedupEvents]]: replaying the whole events file as a
  * second micro-batch (an at-least-once redelivery) must not duplicate
  * any event_id in the output — within-watermark replays hit dedup
  * state, older ones are late data — so the streamed distinct count
  * equals the batch distinct count.
  */
class StreamDedupSpec extends SparkSpec {

  test("redelivered micro-batch emits no duplicate event_ids") {
    val dir = Files.createTempDirectory("graft-dedup-src")
    val src = Paths.get(s"${SparkSpec.Sf0001}/events.parquet")
    Files.copy(src, dir.resolve("events_a.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.copy(src, dir.resolve("events_b.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val nDistinct = graft.Tables.load(spark, SparkSpec.Sf0001, "events")
      .select("event_id").distinct().count()

    val q = EventStreamJob.dedupEvents(
        EventStreamJob.readEventStream(spark, dir.toString, maxFilesPerTrigger = 1))
      .writeStream
      .queryName("stream_dedup")
      .outputMode("append")
      .format("memory")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val out = spark.sql("SELECT event_id FROM stream_dedup").collect()
    assert(out.length === out.map(_.getLong(0)).distinct.length) // no dup ids
    assert(out.length <= nDistinct)
    // every surviving id came from the source exactly once; with the
    // full file in batch one, the first delivery emits all ids
    assert(out.length === nDistinct)
  }
}
