package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** [[Bpe]] vs a plain-Scala reference implementation of the Sennrich
  * trainer/encoder (independent algorithm: in-memory maps and
  * recursion, no Spark) — plus the structural contracts: token counts
  * are monotone non-increasing per merge, and encoding round-trips
  * (concatenating a word's subwords reproduces the word).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference trainer: greedy left-to-right merge, most-frequent pair
    * first, ties lexicographic — the published algorithm, driver-side.
    */
  private def refMergeOnce(syms: List[String], a: String,
                           b: String): List[String] = syms match {
    case x :: y :: rest if x == a && y == b =>
      (a + b) :: refMergeOnce(rest, a, b)
    case x :: rest => x :: refMergeOnce(rest, a, b)
    case Nil => Nil
  }

  private def refTrain(words: Seq[String], k: Int)
      : (Seq[(String, String)], Map[List[String], Long]) = {
    var vocab: Map[List[String], Long] = words.groupBy(identity)
      .map { case (w, ws) => w.map(_.toString).toList -> ws.size.toLong }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    for (_ <- 1 to k) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- vocab; p <- syms.zip(syms.drop(1)))
        counts(p) = counts.getOrElse(p, 0L) + c
      if (counts.nonEmpty) {
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        vocab = vocab.groupMapReduce(
          { case (syms, _) => refMergeOnce(syms, best._1, best._2) })(
          _._2)(_ + _)
      }
    }
    (merges.toSeq, vocab)
  }

  private val corpus = Seq(
    "the cat sat on the mat", "the cats ate the rats",
    "a rat sat on a cat", "mats and cats and rats",
    "the the the band banned bands", "ratatat drums in the attic",
    "low lower lowest newer newest", "wide wider widest older oldest")

  test("train matches the reference trainer: pairs, counts, and token totals") {
    val docsDf = corpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val steps = Bpe.train(Bpe.vocabOf(docsDf), 12)
    val (refMerges, refVocab) = refTrain(corpus.flatMap(_.split(" ")), 12)
    assert(steps.map(s => (s.lhs, s.rhs)) === refMerges)
    // per-rank token totals: recompute reference vocab after each rank
    val words = corpus.flatMap(_.split(" "))
    for (s <- steps) {
      val (_, v) = refTrain(words, s.rank)
      val refTokens = v.map { case (syms, c) => syms.length * c }.sum
      assert(s.corpusTokens === refTokens, s"token total at rank ${s.rank}")
    }
    // final vocab symbol state agrees too
    val sparkVocab = Bpe.encodedDict(
        Bpe.vocabOf(docsDf), steps)
      .select($"w", $"bpe").as[(String, Seq[String])].collect()
    for ((w, bpe) <- sparkVocab)
      assert(refVocab.contains(bpe.toList) || w.isEmpty,
        s"word '$w' encoded as $bpe, absent from reference vocab")
  }

  test("greedy overlap semantics: aaaa under (a,a) merges to [aa, aa]") {
    val df = Seq(("aaaa", 1L), ("aaa", 1L), ("baab", 1L)).toDF("w", "c")
    val out = df.select($"w",
        Bpe.mergeOnce(transform(sequence(lit(1), length($"w")),
          i => substr($"w", i, lit(1))), "a", "a").as("m"))
      .as[(String, Seq[String])].collect().toMap
    assert(out("aaaa") === Seq("aa", "aa"))
    assert(out("aaa") === Seq("aa", "a"))
    assert(out("baab") === Seq("b", "aa", "b"))
  }

  test("encodeDocs round-trips text and counts subwords consistently") {
    val docsDf = corpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val steps = Bpe.train(Bpe.vocabOf(docsDf), 10)
    val enc = Bpe.encodeDocs(docsDf, steps)
      .select($"text", $"bpe_tokens", $"n_bpe_tokens")
      .as[(String, Seq[String], Long)].collect()
    assert(enc.length === corpus.size)
    for ((text, bpe, n) <- enc) {
      assert(n === bpe.size.toLong)
      // concatenating subwords rebuilds the original words in order
      assert(bpe.mkString === text.replace(" ", ""),
        s"round-trip failed for '$text': $bpe")
      assert(n <= text.count(_ != ' ').toLong, "more tokens than chars")
    }
    // with 10 merges learned, frequent words must compress below chars
    val totalBpe = enc.map(_._3).sum
    val totalChars = corpus.map(_.count(_ != ' ').toLong).sum
    assert(totalBpe < totalChars, "no compression from 10 merges")
  }

  test("token totals are monotone non-increasing across ranks") {
    val docsDf = Tables.load(spark, SparkSpec.Sf0001, "documents")
    val steps = Bpe.train(Bpe.vocabOf(docsDf), 6)
    assert(steps.size === 6)
    val totals = steps.map(_.corpusTokens)
    assert(totals.zip(totals.drop(1)).forall { case (x, y) => y <= x },
      s"token totals increased: $totals")
    // each merge reduces tokens by exactly its application count ≤ pair_n
    for (s <- steps) assert(s.pairN > 0)
  }

  test("fertility ledger (q162 core): per-source ppm ratios match a dict replay") {
    // source A repeats one word (compresses hard); source B is unique chars
    val docsDf = Seq(
      (1L, "A", "abab abab abab"), (2L, "A", "abab abab"),
      (3L, "B", "xq zw vy")).toDF("doc_id", "source", "text")
    val vocab = Bpe.vocabOf(docsDf)
    // 2 merges: (a,b) then (ab,ab) — 'abab' fully fuses, B never merges
    val steps = Bpe.train(vocab, 2)
    val dict = Bpe.encodedDict(vocab, steps)
      .select($"w", $"n_bpe").as[(String, Long)].collect().toMap
    // driver replay of the per-source ledger
    val rows = Seq(("A", "abab", 5L), ("B", "xq", 1L), ("B", "zw", 1L), ("B", "vy", 1L))
    def ledger(src: String) = {
      val ws = rows.filter(_._1 == src)
      val n = ws.map(_._3).sum
      val bpe = ws.map(r => dict(r._2) * r._3).sum
      val chars = ws.map(r => r._2.length * r._3).sum
      (n, bpe, chars * 1000000L / bpe, bpe * 1000000L / n)
    }
    val got = docsDf.select($"source", explode(split($"text", " ")).as("w"))
      .join(Bpe.encodedDict(vocab, steps).select($"w", $"n_bpe"), Seq("w"))
      .groupBy($"source")
      .agg(count(lit(1)).as("ws"), sum($"n_bpe").as("bpe"),
        sum(length($"w")).cast("long").as("chars"))
      .select($"source", $"ws", $"bpe",
        expr("(chars * 1000000) div bpe").as("fert"),
        expr("(bpe * 1000000) div ws").as("comp"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got("A") == ledger("A") && got("B") == ledger("B"))
    // 2 merges fully fuse 'abab': source A fertility = 4 chars/token
    assert(dict("abab") == 1L && got("A")._3 == 4000000L)
    // source B never merges (all pairs unique): fertility = 1 char/token
    assert(got("B")._3 == 1000000L)
  }
}
