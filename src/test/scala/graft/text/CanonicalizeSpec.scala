package graft.text

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The canonicalization transform's contract: survivors are a subset
  * with the caller's schema, the output is actually near-dup-free at
  * the same threshold (the property that makes it a dedup), the
  * survivor count agrees with the q100 audit, and each policy elects
  * the member it promises.
  */
class CanonicalizeSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, SparkSpec.Sf0001, "documents")

  test("survivors are a schema-preserving subset and the output is near-dup-free") {
    val out = Canonicalize.survivors(docs).cache()
    assert(out.columns.toSeq === docs.columns.toSeq)
    assert(out.join(docs, Seq("doc_id"), "left_anti").count() === 0)
    assert(out.count() < docs.count(), "sf0.001 has near-dups; some must drop")
    // the defining property: re-running pair detection on the output
    // finds nothing — the survivors ARE a deduplicated corpus
    assert(Canonicalize.pairsOf(out, t = 0.8).count() === 0)
    out.unpersist()
  }

  test("survivor count agrees with the q100 audit") {
    val audited = SparkEntry.queries("q100_cluster_canonical")(
        spark, SparkSpec.Sf0001)
      .agg(sum($"n_survivors")).head().getLong(0)
    assert(Canonicalize.survivors(docs).count() === audited)
  }

  test("KeepLongest elects the longest member of every cluster") {
    val out = Canonicalize.survivors(docs, policy = Canonicalize.KeepLongest)
    val edges = Canonicalize.pairsOf(docs, t = 0.8)
      .select($"doc_a", $"doc_b")
    // every dropped doc has some direct neighbor chain to its cluster's
    // survivor; the cheap checkable slice: for each EDGE, at most one
    // endpoint survives, and if exactly one does, it is at least as
    // long as the other (ties may promote a transitively-connected
    // third doc, so equality is allowed, strict loss is not)
    val lens = docs.select($"doc_id", $"n_chars")
    val surv = out.select($"doc_id").withColumn("s", lit(1))
    val checked = edges
      .join(lens.select($"doc_id".as("doc_a"), $"n_chars".as("la")), Seq("doc_a"))
      .join(lens.select($"doc_id".as("doc_b"), $"n_chars".as("lb")), Seq("doc_b"))
      .join(surv.select($"doc_id".as("doc_a"), $"s".as("sa")), Seq("doc_a"), "left_outer")
      .join(surv.select($"doc_id".as("doc_b"), $"s".as("sb")), Seq("doc_b"), "left_outer")
    assert(checked.filter($"sa" === 1 && $"sb" === 1).count() === 0,
      "two adjacent near-dups both survived")
    assert(checked.filter($"sa" === 1 && $"la" < $"lb").count() === 0,
      "a survivor is strictly shorter than its dropped neighbor")
    assert(checked.filter($"sb" === 1 && $"lb" < $"la").count() === 0,
      "a survivor is strictly shorter than its dropped neighbor")
  }

  test("MinhashLsh pair source dedups by token-set Jaccard (the 100 TB path)") {
    val out = Canonicalize.survivors(docs,
      pairs = Canonicalize.MinhashLsh()).cache()
    assert(out.columns.toSeq === docs.columns.toSeq)
    assert(out.count() < docs.count(),
      "sf0.001 has >=0.99 token-Jaccard dups; some must drop")
    // deterministic self-consistency: LSH banding is a pure function of
    // the text, so any pair among the survivors would also have been a
    // pair in the full corpus — the survivor set must re-classify clean
    assert(TextQueries.minhashNearDupPairsOf(out, LshParams()).count() === 0)
    out.unpersist()
  }

  test("KeepFirst works without n_chars and keeps each cluster's smallest id") {
    val noLen = docs.drop("n_chars")
    val out = Canonicalize.survivors(noLen, policy = Canonicalize.KeepFirst)
    assert(out.columns.toSeq === noLen.columns.toSeq)
    val edges = Canonicalize.pairsOf(docs, t = 0.8)
    val surv = out.select($"doc_id").withColumn("s", lit(1))
    // on any edge, a surviving endpoint is never the LARGER id (the
    // smaller one — or a transitively smaller cluster member — wins)
    val checked = edges
      .join(surv.select($"doc_id".as("doc_a"), $"s".as("sa")), Seq("doc_a"), "left_outer")
      .join(surv.select($"doc_id".as("doc_b"), $"s".as("sb")), Seq("doc_b"), "left_outer")
    assert(checked.filter($"sb" === 1 && $"doc_a" < $"doc_b").count() === 0,
      "a survivor has a smaller-id near-dup neighbor")
  }
}
