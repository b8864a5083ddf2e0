package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again", "web"),
    (2L, "completely unrelated text with no benchmark overlap at all here", "web"),
    (3L, "the quick brown fox jumps over the lazy dog tonight my friend", "books"),
    (40L, "the quick brown fox jumps over the lazy dog again and more", "bench"),
    (80L, "another benchmark document that shares nothing with training", "bench")
  ).toDF("doc_id", "text", "source")

  test("bloom-pruned decontamination ≡ unpruned exact join (well-sized filter)") {
    // doc_ids 40 and 80 hash-split into the benchmark bucket only by
    // luck of md5 — instead force determinism by using buckets=1? No:
    // buckets=1 makes EVERY doc benchmark. Use the real split but
    // compare pruned-vs-unpruned, which must agree REGARDLESS of which
    // docs land in the benchmark bucket.
    val unpruned = BloomPrune.decontaminate(fixture, n = 5, buckets = 3L,
      expectedItems = 1 << 12, bloomBits = 0L).collect().map(_.toSeq)
    val pruned = BloomPrune.decontaminate(fixture, n = 5, buckets = 3L,
      expectedItems = 1 << 12, bloomBits = 1L << 16).collect().map(_.toSeq)
    assert(pruned.toSeq === unpruned.toSeq)
  }

  test("an UNDERSIZED filter still yields the exact result (no false negatives)") {
    // 64 bits for hundreds of shingles: the filter saturates and most
    // probes come back might-contain — pure overhead, zero wrongness.
    // Bloom false positives die in the exact join; false negatives
    // cannot exist, so equality must hold even here.
    val unpruned = BloomPrune.decontaminate(fixture, n = 3, buckets = 3L,
      expectedItems = 1 << 12, bloomBits = 0L).collect().map(_.toSeq)
    val strangled = BloomPrune.decontaminate(fixture, n = 3, buckets = 3L,
      expectedItems = 8, bloomBits = 64L).collect().map(_.toSeq)
    assert(strangled.toSeq === unpruned.toSeq)
  }

  test("mightContain prunes true negatives and never true positives") {
    val keys = Seq("alpha", "beta", "gamma").toDF("k")
    val bloom = BloomPrune.buildBloom(keys, col("k"), 1 << 10, 1L << 14)
    val probes = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa").toDF("k")
    val passed = probes.filter(BloomPrune.mightContain(bloom, col("k")))
      .as[String].collect().toSet
    // every member passes (no false negatives)…
    assert(Set("alpha", "beta", "gamma").subsetOf(passed))
    // …and a well-sized filter prunes at least some of the 7 non-members
    assert(passed.size < 10, "filter pruned nothing — probe is not wired")
  }

  test("empty build side prunes everything (null filter → constant false)") {
    val bloom = BloomPrune.buildBloom(
      Seq.empty[String].toDF("k"), col("k"), 1 << 10, 1L << 14)
    assert(bloom == null)
    val n = Seq("a", "b").toDF("k")
      .filter(BloomPrune.mightContain(bloom, col("k"))).count()
    assert(n === 0L)
  }

  test("q129 on driver testdata: pruned plan ≡ bloomBits=0 plan, rows present") {
    val q = BloomPrune.q129.build(spark, SparkSpec.Sf0001)
    val got = q.collect().map(_.toSeq)
    val plain = BloomPrune.decontaminate(
      graft.Tables.load(spark, SparkSpec.Sf0001, "documents"),
      n = 7, buckets = 40L, expectedItems = 1 << 18, bloomBits = 0L)
      .collect().map(_.toSeq)
    assert(got.toSeq === plain.toSeq)
    assert(got.nonEmpty)
  }
}
