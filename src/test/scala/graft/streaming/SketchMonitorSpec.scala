package graft.streaming

import graft.{SparkSpec, Tables}
import graft.text.Cms
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Receipts for [[SketchMonitorJob]]: the merged per-batch sketch is
  * IDENTICAL to the batch sketch over the union corpus (linearity —
  * the property that makes a streaming CMS trustworthy), restarts from
  * the checkpoint add exactly the new data, and merged estimates keep
  * the one-sided bound against exact union counts.
  */
class SketchMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def asCells(df: org.apache.spark.sql.DataFrame): Set[(Int, Long, Long)] =
    df.selectExpr("cast(r0 as int) r0", "cast(b as long) b", "cast(c as long) c")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet

  test("merged per-batch grids ≡ the batch sketch of the union corpus") {
    val srcDir = Files.createTempDirectory("graft-cms-src").toString
    val outDir = Files.createTempDirectory("graft-cms-out").toString
    val ckpt = Files.createTempDirectory("graft-cms-ckpt").toString
    val docs = Tables.load(spark, SparkSpec.Sf0001, "documents")

    // two files → two micro-batches (maxFilesPerTrigger = 1)
    docs.filter($"doc_id" % 2 === 0).coalesce(1)
      .write.parquet(s"$srcDir/even.parquet")
    docs.filter($"doc_id" % 2 === 1).coalesce(1)
      .write.parquet(s"$srcDir/odd.parquet")

    val q = SketchMonitorJob.run(spark, s"$srcDir/*", outDir, ckpt)
    q.awaitTermination()
    assert(spark.read.parquet(outDir).select($"batch_id").distinct().count() == 2)

    val merged = SketchMonitorJob.mergedSketch(spark, outDir)
    assert(asCells(merged) === asCells(Cms.cells(docs)))

    // restart from the same checkpoint with one more file: the new
    // batch adds exactly its own grid — nothing re-ingested
    val extra = docs.filter($"doc_id" % 7 === 0)
      .withColumn("doc_id", $"doc_id" + 100000L)
    extra.coalesce(1).write.parquet(s"$srcDir/extra.parquet")
    val q2 = SketchMonitorJob.run(spark, s"$srcDir/*", outDir, ckpt)
    q2.awaitTermination()
    val mergedAfter = SketchMonitorJob.mergedSketch(spark, outDir)
    assert(asCells(mergedAfter) === asCells(Cms.cells(docs.unionByName(extra))))
  }

  test("merged estimates are one-sided against exact union counts") {
    val srcDir = Files.createTempDirectory("graft-cms2-src").toString
    val outDir = Files.createTempDirectory("graft-cms2-out").toString
    val ckpt = Files.createTempDirectory("graft-cms2-ckpt").toString
    val docs = Tables.load(spark, SparkSpec.Sf0001, "documents")
    docs.filter($"doc_id" % 2 === 0).coalesce(1)
      .write.parquet(s"$srcDir/a.parquet")
    docs.filter($"doc_id" % 2 === 1).coalesce(1)
      .write.parquet(s"$srcDir/b.parquet")
    SketchMonitorJob.run(spark, s"$srcDir/*", outDir, ckpt).awaitTermination()

    val exact = docs.select(explode(split($"text", " ")).as("t"))
      .groupBy($"t").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"t").limit(50)
    val est = Cms.estimates(SketchMonitorJob.mergedSketch(spark, outDir),
      exact.select($"t"))
    val joined = exact.join(est, Seq("t")).collect()
    // (the sf0.001 vocabulary is smaller than 50 — every token is a
    // heavy hitter; the point is the bound, not the count)
    assert(joined.length == exact.count())
    assert(joined.nonEmpty)
    joined.foreach(r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("cnt"),
        s"undercount for ${r.getString(0)}"))

    // a never-ingested token must estimate 0 (empty cells count as 0
    // in the min — an inner join would drop or inflate it)
    val ghost = Cms.estimates(SketchMonitorJob.mergedSketch(spark, outDir),
      Seq("zzz_never_ingested").toDF("t")).collect()
    assert(ghost.length == 1)
    assert(ghost(0).getAs[Long]("est") == 0L)

    // a mismatched geometry must fail fast, not silently undercount
    val e = intercept[IllegalArgumentException] {
      SketchMonitorJob.mergedSketch(spark, outDir, d = 2, w = 16)
    }
    assert(e.getMessage.contains("geometry"))
  }

  test("takedown: rebuildFromCorpus forgets an erased doc's unique tokens") {
    val srcDir = Files.createTempDirectory("graft-cms4-src").toString
    val outDir = Files.createTempDirectory("graft-cms4-out").toString
    val ckpt = Files.createTempDirectory("graft-cms4-ckpt").toString
    val corpusDir = Files.createTempDirectory("graft-cms4-corpus").toString

    val batch1 = Seq(
      (1L, "shared words live here", "s1", 22L, "und"),
      (99L, "qqq_unique_tok zzz_solo_tok shared words", "s1", 40L, "und"))
      .toDF("doc_id", "text", "source", "n_chars", "lang")
      .select(Tables.schemas("documents").fieldNames.map(col): _*)
    val batch2 = Seq(
      (2L, "shared words again and again", "s2", 28L, "und"))
      .toDF("doc_id", "text", "source", "n_chars", "lang")
      .select(Tables.schemas("documents").fieldNames.map(col): _*)
    batch1.coalesce(1).write.parquet(s"$srcDir/b1.parquet")
    batch2.coalesce(1).write.parquet(s"$srcDir/b2.parquet")
    SketchMonitorJob.run(spark, s"$srcDir/*", outDir, ckpt).awaitTermination()

    // the corpus sink in the CorpusIngestJob layout
    batch1.withColumn("ingest_batch", lit(0L))
      .unionByName(batch2.withColumn("ingest_batch", lit(1L)))
      .write.mode("overwrite").partitionBy("ingest_batch").parquet(corpusDir)

    def est(t: String): Long =
      Cms.estimates(SketchMonitorJob.mergedSketch(spark, outDir),
        Seq(t).toDF("t")).head().getAs[Long]("est")
    assert(est("qqq_unique_tok") >= 1L && est("zzz_solo_tok") >= 1L)

    // takedown doc 99, then rebuild the derived sketch state
    val erased = graft.etl.Erasure.eraseFromCorpus(spark, corpusDir,
      Seq(99L).toDF("doc_id"))
    assert(erased === 1L)
    SketchMonitorJob.rebuildFromCorpus(spark, corpusDir, outDir)

    assert(est("qqq_unique_tok") === 0L, "erased doc's token still estimated")
    assert(est("zzz_solo_tok") === 0L)
    assert(est("shared") >= 2L, "surviving docs' counts must remain")
    // the rebuilt store IS the batch sketch of the post-erasure corpus
    val survivors = spark.read
      .schema(Tables.schemas("documents").add("ingest_batch", "long"))
      .parquet(corpusDir)
      .drop("ingest_batch")
    assert(asCells(SketchMonitorJob.mergedSketch(spark, outDir)) ===
      asCells(Cms.cells(survivors)))
    // geometry is discoverable programmatically (ADVICE round 5)
    assert(SketchMonitorJob.storedGeometry(spark, outDir) ===
      Seq((Cms.DefaultD, Cms.DefaultW)))
  }

  test("a from-scratch monitor (empty drop dir) yields an empty merged sketch") {
    val srcDir = Files.createTempDirectory("graft-cms3-src").toString
    val outDir = Files.createTempDirectory("graft-cms3-out").toString + "/sub"
    val ckpt = Files.createTempDirectory("graft-cms3-ckpt").toString
    SketchMonitorJob.run(spark, s"$srcDir/*", outDir, ckpt).awaitTermination()
    assert(SketchMonitorJob.mergedSketch(spark, outDir).count() == 0L)
  }
}
