package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Erasure]] — end-to-end takedown: the erased docs vanish from the
  * partitioned corpus sink (only affected partitions rewritten; a
  * fully-emptied partition's directory is deleted) and from the band
  * index (their text classifies as kept again).
  */
class ErasureSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(batch: Long, rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("crawl"))
      .withColumn("n_chars", length($"text").cast("long"))
      .withColumn("ingest_batch", lit(batch))
      .select("doc_id", "text", "lang", "source", "n_chars", "ingest_batch")

  test("erase rewrites only affected partitions and cleanses the index") {
    val name = "ers_idx"
    Seq(BandIndex.docsTable(name), BandIndex.bandsTable(name),
        BandIndex.toksTable(name))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    val root = java.nio.file.Files.createTempDirectory("graft-erase")
    val corpusDir = root.resolve("corpus").toString

    val all = Seq(
      docsDf(0L, 1L -> "alpha beta gamma delta", 2L -> "sensitive takedown text"),
      docsDf(1L, 3L -> "untouched partition words", 4L -> "more stable content"),
      docsDf(2L, 5L -> "whole batch to erase"))
    all.foreach(_.write.mode("append")
      .partitionBy("ingest_batch").parquet(corpusDir))
    BandIndex.create(spark,
      all.reduce(_ unionByName _).drop("ingest_batch"),
      name, root.resolve("idx").toString, buckets = 4)

    def partFiles(b: Long): Set[String] = {
      val d = new java.io.File(s"$corpusDir/ingest_batch=$b")
      if (!d.exists()) Set.empty
      else d.listFiles().map(_.getName).filterNot(_.startsWith("_")).toSet
    }
    val untouchedBefore = partFiles(1L)

    val n = Erasure.erase(spark, corpusDir, name,
      root.resolve("idx").toString, Seq(2L, 5L).toDF("doc_id"), buckets = 4)
    assert(n === 2)

    // corpus: doc 2 gone from partition 0, partition 2 deleted outright,
    // partition 1 byte-untouched (same file set)
    val left = spark.read.schema(
        graft.Tables.schemas("documents").add("ingest_batch", "long"))
      .parquet(corpusDir)
    assert(left.select($"doc_id").as[Long].collect().toSet === Set(1L, 3L, 4L))
    assert(!new java.io.File(s"$corpusDir/ingest_batch=2").exists())
    assert(partFiles(1L) === untouchedBefore)

    // index: the erased texts classify as kept again; others still hit
    val flags = BandIndex.dedupBatch(spark, Seq(
        (20L, "sensitive takedown text"),
        (21L, "whole batch to erase"),
        (22L, "untouched partition words")).toDF("doc_id", "text"), name)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(flags === Map(20L -> "kept", 21L -> "kept", 22L -> "exact"))

    // idempotent: nothing left to erase
    assert(Erasure.erase(spark, corpusDir, name,
      root.resolve("idx").toString, Seq(2L, 5L).toDF("doc_id"), buckets = 4) === 0)
  }
}
