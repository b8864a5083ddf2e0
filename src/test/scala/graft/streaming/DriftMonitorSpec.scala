package graft.streaming

import graft.{SparkEntry, SparkSpec}
import graft.text.Psi
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[DriftMonitorJob]] — the streaming form of q117: per micro-batch
  * PSI against a reference pinned at job start. Receipts: the scoring
  * IS the oracle-verified q117 algebra (batch-twin identity), a
  * profile-matching batch scores calm, a piled-up batch raises
  * `drifted` within its own batch, and the sink is per-batch keyed.
  */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(src: String, startId: Long,
                     lens: Seq[Int]): DataFrame =
    lens.zipWithIndex.map { case (n, i) =>
      (startId + i, Seq.fill(n)("w").mkString(" "), src)
    }.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text").cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")

  // one doc in each of buckets 1..4, repeated `rep` times
  private def uniform(rep: Int): Seq[Int] =
    (0 until rep).flatMap(_ => Seq(1, 2, 4, 8))

  test("batch-twin: Psi stages composed over one frame equal the q117 query") {
    val root = java.nio.file.Files.createTempDirectory("graft-drift-twin")
    val d = docsDf("a", 0L, uniform(3)) unionByName
      docsDf("b", 100L, Seq(8, 8, 8, 8))
    d.coalesce(1).write.parquet(s"$root/documents.parquet")
    val viaQuery = SparkEntry.queries("q117_source_drift_psi")(
        spark, root.toString)
      .collect().map(_.toSeq).toSet
    val viaStages = Psi.score(
        Psi.bucketCounts(d.select($"source", $"text")),
        Psi.reference(d.select($"source", $"text")))
      .collect().map(_.toSeq).toSet
    assert(viaQuery == viaStages,
      "the monitor's staged scoring diverged from the oracle-verified query")
  }

  test("a matching batch scores calm; a piled-up batch raises drifted in its own batch") {
    val root = java.nio.file.Files.createTempDirectory("graft-drift")
    val (srcDir, refDir, outDir, ckpt) = (root.resolve("src"),
      root.resolve("ref"), root.resolve("out"), root.resolve("ckpt"))
    java.nio.file.Files.createDirectories(srcDir)
    // reference: 16 docs, uniform across buckets 1..4
    docsDf("web", 0L, uniform(4))
      .coalesce(1).write.parquet(refDir.toString)
    // batch 0 matches the reference profile exactly; batch 1 piles
    // every doc into bucket 4
    docsDf("web", 100L, uniform(1))
      .coalesce(1).write.parquet(s"$srcDir/b0")
    docsDf("web", 200L, Seq(8, 8, 8, 8))
      .coalesce(1).write.parquet(s"$srcDir/b1")

    DriftMonitorJob.run(spark, s"$srcDir/*", refDir.toString,
      outDir.toString, ckpt.toString).awaitTermination()

    val out = spark.read.parquet(outDir.toString)
      // partition-column inference reads batch_id back as int
      .select($"batch_id".cast("long"), $"source", $"psi", $"top_bucket",
        $"drifted")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1)
    assert(out.length == 2, s"one monitor row per batch expected: ${out.toSeq}")
    val Seq(calm, hot) = out.toSeq.sortBy { case (_, _, psi, _, _) => psi }
    assert(!calm._5 && calm._3 < 0.05,
      s"profile-matching batch should score calm: $calm")
    assert(hot._5 && hot._3 > 0.2 && hot._4 == 4L,
      s"piled-up batch should drift on bucket 4: $hot")
    assert(calm._1 != hot._1, "both rows came from the same batch")
  }
}
