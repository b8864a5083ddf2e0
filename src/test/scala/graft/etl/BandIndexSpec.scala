package graft.etl

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** [[BandIndex]] — the persisted incremental-dedup index: build once,
  * classify batches against it WITHOUT re-tokenizing the corpus, append
  * kept docs. The classifications must agree with the verified q88
  * inline form, and the plan must show the corpus side arriving
  * pre-partitioned off the bucketed tables (zero corpus-side Exchange).
  */
class BandIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-bidx").toString

  /** 200-token doc; `change` swaps one token → Jaccard 199/201 ≈ 0.9900. */
  private def bigDoc(change: Boolean): String =
    (0 until 200).map(i =>
      if (change && i == 7) "changed" else s"tok$i").mkString(" ")

  private def dropTables(name: String): Unit =
    Seq(BandIndex.docsTable(name), BandIndex.bandsTable(name))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("classifies exact / near / kept against a persisted index") {
    val name = "bidx_fix"
    dropTables(name)
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, bigDoc(change = false)),
      (3L, "solo words here")).toDF("doc_id", "text")
    BandIndex.create(spark, corpus, name, tmp(), buckets = 4)
    val batch = Seq(
      (10L, "alpha beta gamma delta"), // exact dup of 1
      (11L, bigDoc(change = true)),    // near dup of 2 (j = 199/201)
      (12L, "entirely fresh content")).toDF("doc_id", "text")
    val flags = BandIndex.dedupBatch(spark, batch, name)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(flags === Map(10L -> "exact", 11L -> "near", 12L -> "kept"))
  }

  test("agrees with the verified inline q88 classification at sf0.001") {
    val name = "bidx_q88"
    dropTables(name)
    val docs = Tables.load(spark, SparkSpec.Sf0001, "documents")
      .withColumn("bucket", pmod(expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"),
        lit(100L)))
    val old = docs.filter($"bucket" < 70).select("doc_id", "text")
    val batch = docs.filter($"bucket" >= 70).select("doc_id", "text", "source")
    BandIndex.create(spark, old, name, tmp(), buckets = 4)
    val mine = BandIndex.dedupBatch(spark, batch, name)
      .join(batch.select("doc_id", "source"), Seq("doc_id"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_incoming"),
           count_if($"flag" === "exact").as("n_exact_dup"),
           count_if($"flag" === "near").as("n_near_dup"),
           count_if($"flag" === "kept").as("n_kept"))
      .orderBy($"source")
      .collect().map(_.toSeq).toSeq
    val q88 = graft.SparkEntry
      .queries("q88_incremental_dedup")(spark, SparkSpec.Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(mine === q88)
  }

  test("batch dedup reads only the index; corpus band side has no Exchange") {
    val name = "bidx_plan"
    dropTables(name)
    val path = tmp()
    val corpus = Seq((1L, "alpha beta gamma"), (2L, bigDoc(false)))
      .toDF("doc_id", "text")
    BandIndex.create(spark, corpus, name, path, buckets = 4)
    val batch = Seq((10L, "alpha beta gamma"), (11L, "other stuff"))
      .toDF("doc_id", "text")
    // static plan: AQE off so the shape is data-independent, broadcast
    // off so the bucketed-join claim is actually exercised
    val confs = Map("spark.sql.adaptive.enabled" -> "false",
                    "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.get(k)).toMap
    val plan = try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      BandIndex.dedupBatch(spark, batch, name).queryExecution.executedPlan
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
    // 1. no file scan outside the index directory: the corpus raw text
    //    is never re-read (the batch is an in-memory frame)
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      val loc = s.relation.location.rootPaths.mkString(",")
      assert(loc.contains(path), s"scan outside the index: $loc")
    }
    // 2. the band join's index side arrives pre-partitioned from the
    //    bucketed table: no ShuffleExchange anywhere in that subtree
    val bandJoins = plan.collect {
      case j: BaseJoinExec
        if j.leftKeys.exists(_.references.exists(_.name == "band_val")) => j
    }
    assert(bandJoins.nonEmpty, plan.toString.take(3000))
    bandJoins.foreach { j =>
      val indexSide = Seq(j.left, j.right).find(side =>
        side.collect { case s: FileSourceScanExec => s }.exists(
          _.relation.location.rootPaths.mkString(",")
            .contains(BandIndex.bandsTable(name))))
      assert(indexSide.isDefined, j.toString.take(2000))
      val shuffles = indexSide.get.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"corpus band side shuffles despite bucketing:\n${indexSide.get}")
    }
  }

  test("ingest appends kept docs: re-running the same batch yields no new keeps") {
    val name = "bidx_app"
    dropTables(name)
    val path = tmp()
    val corpus = Seq((1L, "alpha beta gamma delta"), (2L, bigDoc(false)))
      .toDF("doc_id", "text")
    BandIndex.create(spark, corpus, name, path, buckets = 4)
    val batch = Seq(
      (10L, "alpha beta gamma delta"),
      (11L, bigDoc(true)),
      (12L, "entirely fresh content")).toDF("doc_id", "text")
    val first = BandIndex.ingest(spark, batch, name, path, buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(first === Map(10L -> "exact", 11L -> "near", 12L -> "kept"))
    // the kept doc is now IN the index (appended, not rebuilt): a
    // replay of the same batch finds 12 as an exact dup of itself;
    // the near dup was dropped, so it still classifies near
    val second = BandIndex.dedupBatch(spark, batch, name)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(second === Map(10L -> "exact", 11L -> "near", 12L -> "exact"))
    // and the docs table grew by exactly the kept slice
    assert(spark.table(BandIndex.docsTable(name)).count() === 3)
  }
}
