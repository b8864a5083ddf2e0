package graft.etl

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Round-8 stretch receipts: the curation lineage ledger
  * ([[Lineage]]) answers "why is/isn't this doc in the corpus" with
  * one partition-pruned lookup, stays consistent with the pipeline's
  * gate accounting, and keeps takedown receipts through erasure.
  */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) = {
    rows.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", when($"doc_id" % 2 === 0, "web").otherwise("books"))
      .withColumn("n_chars", length($"text").cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
  }

  test("pipeline writes a complete ledger: every crawled doc reaches one terminal state") {
    val name = "lin_idx"
    Seq(BandIndex.docsTable(name), BandIndex.bandsTable(name),
        BandIndex.toksTable(name))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val root = Files.createTempDirectory("graft-lineage")
    val srcDir = root.resolve("src"); Files.createDirectories(srcDir)

    val batchA = docsDf(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "spam spam spam spam spam spam spam spam spam spam",
      3L -> "distributed systems require careful coordination of state")
    val batchB = docsDf(
      10L -> "the quick brown fox jumps over the lazy dog tonight", // dup of 1
      11L -> "novel second batch content with many distinct useful words",
      12L -> "data data data data data data data data data data")
    batchA.coalesce(1).write.parquet(s"$srcDir/a")
    batchB.coalesce(1).write.parquet(s"$srcDir/b")

    val work = root.resolve("work").toString
    val ldir = root.resolve("lineage").toString
    val r = CurationPipeline.run(spark, s"$srcDir/*", name,
      root.resolve("idx").toString, work, buckets = 4, block = 16L,
      lineageDir = Some(ldir), lineageRound = 1L)

    // every crawled doc has exactly one terminal state
    val terminal = Lineage.terminalStates(spark, ldir)
      .select($"doc_id", $"stage", $"verdict").as[(Long, String, String)]
      .collect().toSeq
    assert(terminal.map(_._1).sorted === Seq(1L, 2L, 3L, 10L, 11L, 12L),
      s"terminal coverage: $terminal")
    assert(terminal.map(_._1).distinct.size === terminal.size)

    // the cross-batch duplicate is explained by ONE indexed lookup,
    // with its survivor's id in the receipt
    val why10 = Lineage.explain(spark, ldir, 10L)
      .select($"stage", $"verdict", $"detail").as[(String, String, String)]
      .collect().toSeq
    assert(why10 === Seq(("ingest_dedup", "dropped", "exact_dup_of=1")),
      s"explain(10): $why10")

    // ledger selected-count equals the report's selected-count, and
    // selected + over_budget equals kept
    val byVerdict = spark.read.parquet(ldir)
      .groupBy($"verdict").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(byVerdict.getOrElse("selected", 0L) === r.selected)
    assert(byVerdict.getOrElse("selected", 0L) +
           byVerdict.getOrElse("over_budget", 0L) === r.kept)
  }

  test("gate drops ledger rows that reconcile with gateAccounting; erasure appends a takedown receipt") {
    val name = "lin_gate_idx"
    Seq(BandIndex.docsTable(name), BandIndex.bandsTable(name),
        BandIndex.toksTable(name))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val root = Files.createTempDirectory("graft-lineage-gate")
    val srcDir = root.resolve("src"); Files.createDirectories(srcDir)
    docsDf(
      1L -> "the quick brown fox jumps of the lazy dog and the cat in a box tonight again",
      2L -> "spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam",
      3L -> "the reliable consensus of distributed actors depends on the order and the timing of a quorum in practice")
      .coalesce(1).write.parquet(s"$srcDir/a")

    val work = root.resolve("work").toString
    val ldir = root.resolve("lineage").toString
    // rule battery tuned so doc 2 (one token dominates, no stopwords)
    // fails and 1/3 pass
    val gate = graft.text.QualityRules.Params(
      minWords = 10, minMeanLen = 1, maxMeanLen = 10,
      minStop = 2, topTokenPctMax = 30)
    val r = CurationPipeline.run(spark, s"$srcDir/*", name,
      root.resolve("idx").toString, work, buckets = 4, block = 16L,
      qualityGate = Some(gate),
      lineageDir = Some(ldir), lineageRound = 1L)

    // the rules gate's ledger drops equal its accounting drops
    val ruleDropsLedger = spark.read.parquet(ldir)
      .filter($"stage" === "rules" && $"verdict" === "dropped").count()
    val ruleDropsAccounting = r.gateAccounting
      .filter(_.gate == "rules").map(_.dropped).sum
    assert(ruleDropsLedger === ruleDropsAccounting && ruleDropsLedger === 1L)
    assert(Lineage.explain(spark, ldir, 2L)
      .select($"verdict").as[String].collect().toSeq === Seq("dropped"))

    // erase a selected doc: the ledger keeps the takedown receipt and
    // the terminal state flips to erased
    val victim = spark.read.parquet(s"$work/manifest")
      .select($"doc_id").as[Long].head()
    Erasure.erase(spark, s"$work/corpus", name,
      root.resolve("idx").toString, Seq(victim).toDF("doc_id"),
      buckets = 4, manifestDir = Some(s"$work/manifest"),
      lineageDir = Some(ldir), lineageRound = 2L)

    val history = Lineage.explain(spark, ldir, victim)
      .select($"stage", $"verdict").as[(String, String)].collect().toSeq
    assert(history.last === (("erasure", "erased")), s"history: $history")
    assert(history.contains(("select", "selected")))
    val term = Lineage.terminalStates(spark, ldir)
      .filter($"doc_id" === victim)
      .select($"verdict").as[String].collect().toSeq
    assert(term === Seq("erased"))
  }
}
