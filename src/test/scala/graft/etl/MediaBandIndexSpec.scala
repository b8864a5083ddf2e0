package graft.etl

import graft.SparkSpec
import graft.multimodal.ImageDedup
import org.apache.spark.sql.DataFrame

/** [[MediaBandIndex]] — q179's banded dHash dedup as a persisted
  * incremental index. Load-bearing properties: a jittered twin of an
  * INDEXED image classifies `dup` (near, not exact), cross-batch
  * ordering holds (batch N+1 rejects a twin of batch N's kept image),
  * undecodable payloads quarantine instead of poisoning the index,
  * and a replayed batch is idempotent (every already-appended image
  * flags dup-of-itself, so the retried append adds nothing).
  */
class MediaBandIndexSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDf(rows: (Long, Array[Byte])*): DataFrame =
    rows.toSeq.toDF("doc_id", "payload")
      .withColumn("source", org.apache.spark.sql.functions.lit("crawl"))
      .select("doc_id", "source", "payload")

  private def freshIndex(name: String): String = {
    Seq(MediaBandIndex.docsTable(name), MediaBandIndex.bandsTable(name))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    java.nio.file.Files.createTempDirectory("graft-midx").toString
  }

  test("ingest flags exact dups, jittered twins, fresh and corrupt payloads") {
    val name = "midx_flags"
    val path = freshIndex(name)
    // seed: images 1..4
    MediaBandIndex.create(spark,
      mediaDf((1L to 4L).map(i => i -> ImageDedup.patternPng(i)): _*),
      name, path, buckets = 4)

    val batch = mediaDf(
      10L -> ImageDedup.patternPng(1), // exact re-render of indexed 1
      11L -> ImageDedup.patternPng(2, flip = 1), // jittered twin of 2
      12L -> ImageDedup.patternPng(99), // fresh
      13L -> Array[Byte](1, 2, 3)) // corrupt
    val flags = MediaBandIndex.ingest(spark, batch, name, path, buckets = 4)
      .as[(Long, String)].collect().toMap
    assert(flags === Map(10L -> "dup", 11L -> "dup",
      12L -> "kept", 13L -> "undecodable"))
    // index grew by exactly the kept image; the corrupt one never landed
    spark.catalog.refreshTable(MediaBandIndex.docsTable(name))
    assert(spark.table(MediaBandIndex.docsTable(name))
      .select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 3L, 4L, 12L))
  }

  test("cross-batch: a twin of a batch-1 KEPT image is rejected in batch 2") {
    val name = "midx_cross"
    val path = freshIndex(name)
    MediaBandIndex.create(spark,
      mediaDf(1L -> ImageDedup.patternPng(1)), name, path, buckets = 4)
    // batch 1 keeps seed-50
    val f1 = MediaBandIndex.ingest(spark,
      mediaDf(20L -> ImageDedup.patternPng(50)), name, path, buckets = 4)
      .as[(Long, String)].collect().toMap
    assert(f1 === Map(20L -> "kept"))
    // batch 2: twin of seed-50 (indexed only via batch 1's append) +
    // a genuinely new image
    val f2 = MediaBandIndex.ingest(spark,
      mediaDf(30L -> ImageDedup.patternPng(50, flip = 1),
              31L -> ImageDedup.patternPng(60)), name, path, buckets = 4)
      .as[(Long, String)].collect().toMap
    assert(f2 === Map(30L -> "dup", 31L -> "kept"))
  }

  test("replayed batch is idempotent: every image dups itself, append adds nothing") {
    val name = "midx_replay"
    val path = freshIndex(name)
    MediaBandIndex.create(spark,
      mediaDf(1L -> ImageDedup.patternPng(1)), name, path, buckets = 4)
    val batch = mediaDf(40L -> ImageDedup.patternPng(70),
                        41L -> ImageDedup.patternPng(71))
    assert(MediaBandIndex.ingest(spark, batch, name, path, buckets = 4)
      .as[(Long, String)].collect().toMap
      === Map(40L -> "kept", 41L -> "kept"))
    val before = spark.table(MediaBandIndex.docsTable(name)).count()
    // the crash-window-(c) replay: batch re-runs after its append
    assert(MediaBandIndex.ingest(spark, batch, name, path, buckets = 4)
      .as[(Long, String)].collect().toMap
      === Map(40L -> "dup", 41L -> "dup"))
    spark.catalog.refreshTable(MediaBandIndex.docsTable(name))
    assert(spark.table(MediaBandIndex.docsTable(name)).count() === before)
  }
}
