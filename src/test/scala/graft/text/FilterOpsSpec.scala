package graft.text

import graft.{SparkEntry, SparkSpec, Tables}

/** Receipts for the filtering/retrieval operator family (q112+):
  * independent driver-side formulations over collected text — plain
  * Scala splits and counts, none of the Spark expressions under test.
  */
class FilterOpsSpec extends SparkSpec {

  private val Blocklist = Set("dup", "stale")

  test("q112 matches a driver-side token-exact gate") {
    for (dir <- Seq(SparkSpec.Sf0001, SparkSpec.Sf001)) {
      val expected = Tables.load(spark, dir, "documents")
        .select("source", "text").collect()
        .map(r => (r.getString(0),
          r.getString(1).split(" ", -1).count(Blocklist.contains)))
        .groupBy(_._1).map { case (src, xs) =>
          val hits = xs.map(_._2)
          (src, hits.length.toLong, hits.count(_ > 0).toLong,
            hits.map(_.toLong).sum)
        }.toSeq.sortBy(_._1)
      val got = SparkEntry.queries("q112_blocklist_gate")(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == expected, s"mismatch at $dir")
      // the stand-in lexicon must exercise both member paths: a token
      // that gates real docs and one that never fires
      val gated = got.map(_._3).sum
      assert(gated > 0 && gated < got.map(_._2).sum,
        "blocklist gates nothing (or everything) — stand-in lexicon drifted from the testdata")
    }
  }

  test("q112 gate is token-exact, not substring") {
    // The corpus has no blocklist-superstring tokens, so the C4
    // "class/ass" semantics need a constructed certificate — run the
    // SAME gate expression (TextQueries.blocklistHits, the q112
    // definition) on frames where the distinction bites.
    import spark.implicits._
    val rows = Seq(
      ("dedup wildup dups", 0L), // superstrings only: must NOT fire
      ("dup dedup dup", 2L),     // exact tokens among superstrings
      ("stale-ish", 0L),         // punctuation-joined: still one token
      ("dup", 1L))
      .toDF("text", "expected")
      .withColumn("hits", TextQueries.blocklistHits.cast("long"))
      .collect()
    for (r <- rows)
      assert(r.getAs[Long]("hits") == r.getAs[Long]("expected"),
        s"'${r.getAs[String]("text")}' gated ${r.getAs[Long]("hits")} times")
  }

  // --- q113 winnowing -------------------------------------------------

  /** The gram + winnow pipeline re-derived in plain Scala: md5-prefix
    * longs over sliding 8-grams, then sliding-window-of-4 minima,
    * distinct. Exactly the definition, none of the Spark expressions.
    */
  private def scalaFps(text: String, w: Int = 4): (Long, Set[Long]) = {
    val tk = text.split(" ", -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val grams = tk.sliding(8).map { g =>
      val hex = md.digest(g.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }.toVector
    (grams.length.toLong, grams.sliding(w).map(_.min).toSet)
  }

  test("q113 matches a driver-side winnow re-derivation") {
    val perDoc = Tables.load(spark, SparkSpec.Sf001, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._3.split(" ", -1).length >= 11)
      .map { case (id, src, text) =>
        val (m, fps) = scalaFps(text); (id, src, m, fps)
      }
    val df = perDoc.flatMap { case (id, _, _, fps) => fps.map((_, id)) }
      .groupBy(_._1).map { case (fp, xs) => fp -> xs.length }
    val expected = perDoc.groupBy(_._2).map { case (src, ds) =>
      val shared = ds.map { case (_, _, _, fps) => fps.count(df(_) >= 2) }
      (src, ds.length.toLong, ds.map(_._3).sum, ds.map(_._4.size.toLong).sum,
        shared.map(_.toLong).sum, shared.count(_ > 0).toLong)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q113_winnow_fingerprints")(spark, SparkSpec.Sf001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
  }

  test("winnowing carries the Schleimer guarantee and the 2/(w+1) density") {
    import spark.implicits._
    // Planted certificate: two docs of unrelated token soup sharing one
    // 11-token run (= w + k - 1 at w=4, k=8, the guarantee threshold)
    val rnd = new scala.util.Random(42)
    def soup(n: Int): Seq[String] = Seq.fill(n)("t" + rnd.nextInt(5000))
    val run = soup(11).map(_ + "r")
    for (trial <- 1 to 5) {
      val a = soup(20) ++ run ++ soup(15)
      val b = soup(9) ++ run ++ soup(28)
      val fps = Winnow.fingerprints(
        Seq((1L, "s", a.mkString(" ")), (2L, "s", b.mkString(" ")))
          .toDF("doc_id", "source", "text"))
        .select("doc_id", "fps").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      assert(fps(1L).intersect(fps(2L)).nonEmpty,
        s"trial $trial: shared 11-token run produced no shared fingerprint")
    }
    // Density: fingerprints per gram ≈ 2/(w+1) = 0.4 on random text
    // (loose band — the corpus is tiny and distinct() collapses repeats)
    val big = (1 to 50).map(i => (i.toLong, "s", soup(120).mkString(" ")))
      .toDF("doc_id", "source", "text")
    val stats = Winnow.fingerprints(big)
      .agg(org.apache.spark.sql.functions.expr(
        "sum(size(fps)) / sum(m)").as("d")).head().getDouble(0)
    assert(stats > 0.25 && stats < 0.55, s"winnow density $stats far from 2/(w+1)")
  }

  // --- q114 BM25 ------------------------------------------------------

  /** Fixed-point log2 re-derived with plain bit arithmetic. */
  private def lq(n: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    e * 1048576L + (n - (1L << e)) * 1048576L / (1L << e)
  }

  /** BM25 re-derived driver-side: exact-integer cores, none of the
    * Spark/SQL expressions under test.
    */
  private def scalaBm25(docsTf: Seq[(Long, String, Seq[String])],
                        terms: Seq[String]): Seq[(Long, String, Long, Long)] = {
    val n = docsTf.length.toLong
    val t = docsTf.map(_._3.length.toLong).sum
    val dfs = terms.map(q => docsTf.count(_._3.contains(q)).toLong)
    docsTf.map { case (id, src, tk) =>
      val dl = tk.length.toLong
      val score = terms.zip(dfs).map { case (q, df) =>
        val tf = tk.count(_ == q).toLong
        val idfq = lq(2 * n + 2) - lq(2 * df + 1)
        (idfq * 22 * t * tf) / (10 * t * tf + 3 * t + 9 * n * dl)
      }.sum
      (id, src, dl, score)
    }
  }

  test("q114 matches a driver-side exact-integer BM25") {
    val terms = Seq("hash", "join", "dup", "scan")
    for (dir <- Seq(SparkSpec.Sf0001, SparkSpec.Sf001)) {
      val corpus = Tables.load(spark, dir, "documents")
        .select("doc_id", "source", "text").collect()
        .map(r => (r.getLong(0), r.getString(1),
          r.getString(2).split(" ", -1).toSeq)).toSeq
      val expected = scalaBm25(corpus, terms)
        .sortBy { case (id, _, _, s) => (-s, id) }.take(10)
        .zipWithIndex
        .map { case ((id, src, dl, s), i) => (i + 1, id, src, dl, s) }
      val got = SparkEntry.queries("q114_bm25_search")(spark, dir)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3),
          r.getLong(4))).toSeq
      assert(got == expected, s"mismatch at $dir")
    }
  }

  test("BM25 honors tf saturation direction and length normalization") {
    import spark.implicits._
    // Same dl, rising tf of one term → strictly rising score; same tf,
    // longer doc → strictly lower score (the b-weighted dl penalty).
    val pad = (1 to 40).map("p" + _)
    val rows = Seq(
      (1L, "s", (Seq("dup") ++ pad.take(39)).mkString(" ")),
      (2L, "s", (Seq("dup", "dup") ++ pad.take(38)).mkString(" ")),
      (3L, "s", (Seq("dup", "dup", "dup") ++ pad.take(37)).mkString(" ")),
      (4L, "s", (Seq("dup") ++ pad ++ pad.map(_ + "x")).mkString(" ")))
      .toDF("doc_id", "source", "text")
    val scores = Bm25.score(rows, Seq("dup"))
      .select("doc_id", "score_q").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(1L) < scores(2L) && scores(2L) < scores(3L),
      s"score not increasing in tf: $scores")
    assert(scores(4L) < scores(1L),
      s"longer doc with equal tf not penalized: $scores")
    // zero-match doc scores exactly 0
    val z = Bm25.score(Seq((9L, "s", "a b c")).toDF("doc_id", "source", "text"),
      Seq("dup")).select("score_q").head().getLong(0)
    assert(z == 0L)
  }

  // --- q115 substring trim --------------------------------------------

  /** The trim re-derived in plain Scala: gram hashes, corpus df,
    * per-doc consecutive-dup-position islands, interval cut. */
  private def scalaTrim(corpus: Seq[(Long, String)],
                        minRun: Int = 16): Map[Long, String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def gh(g: Seq[String]): Long = {
      val hex = md.digest(g.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val grams = corpus.map { case (id, text) =>
      id -> text.split(" ", -1).toSeq.sliding(8).toVector.map(gh)
    }.toMap
    val df = grams.toSeq.flatMap { case (id, gs) => gs.distinct.map((_, id)) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.length }
    corpus.map { case (id, text) =>
      val tk = text.split(" ", -1)
      val gs = if (tk.length >= 8) grams(id) else Vector.empty
      val dupPos = gs.zipWithIndex.collect {
        case (g, i) if df.getOrElse(g, 0) >= 2 => i + 1
      }
      // islands of consecutive positions
      val ivs = dupPos.foldLeft(Vector.empty[(Int, Int)]) {
        case (acc :+ ((s0, e0)), p) if p == e0 + 1 => acc :+ (s0, p)
        case (acc, p) => acc :+ (p, p)
      }.map { case (s0, e0) => (s0, e0 + 7) }
        .filter { case (s0, e0) => e0 - s0 + 1 >= minRun }
      val kept = tk.zipWithIndex.collect {
        case (t, i) if !ivs.exists { case (s0, e0) => i + 1 >= s0 && i + 1 <= e0 } => t
      }
      id -> kept.mkString(" ")
    }.toMap
  }

  test("q115's cut matches a driver-side re-derivation, doc by doc") {
    val corpus = Tables.load(spark, SparkSpec.Sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = scalaTrim(corpus)
    val got = SubstringTrim.trim(
        Tables.load(spark, SparkSpec.Sf001, "documents"))
      .select("doc_id", "text_trimmed").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == corpus.size)
    val diffs = corpus.map(_._1).filter(id => got(id) != expected(id))
    assert(diffs.isEmpty, s"trim differs on docs $diffs")
    // the corpus must actually exercise the cut, or this is vacuous
    assert(corpus.exists { case (id, text) => got(id) != text },
      "no doc was trimmed at sf0.01 — planted dup runs missing from testdata?")
  }

  test("trim scrubs planted runs above threshold and spares those below") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def soup(n: Int): Seq[String] = Seq.fill(n)("w" + rnd.nextInt(100000))
    val big = soup(20)  // 20-token run: every copy cut
    val small = soup(10) // 10-token run: 3 dup grams cover 10 < 16 — spared
    val a = soup(12) ++ big ++ soup(9) ++ small
    val b = small ++ soup(14) ++ big ++ soup(7)
    val c = soup(30) // untouched control
    val out = SubstringTrim.trim(
        Seq((1L, a), (2L, b), (3L, c)).map { case (i, t) => (i, "s", t.mkString(" ")) }
          .toDF("doc_id", "source", "text"))
      .select("doc_id", "text_trimmed", "n_tokens_before", "n_tokens_after")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    for (id <- Seq(1L, 2L)) {
      val t = out(id)._1
      assert(!t.contains(big.mkString(" ")), s"doc $id kept the 20-token dup run")
      assert(t.contains(small.mkString(" ")),
        s"doc $id lost the below-threshold 10-token run")
    }
    assert(out(3L)._1 == c.mkString(" ") && out(3L)._2 == out(3L)._3,
      "control doc was modified")
  }

  // --- q116 bigram perplexity -----------------------------------------

  /** The q116 scoring re-derived in plain Scala over raw strings (no
    * hashing, none of the Spark expressions): +1-smoothed bigram LM,
    * surp_q = (c(w1·)+V)·10⁶ div (c(w1w2)+1), exact-integer floors
    * throughout. Returns (source → (n_docs, n_bigrams, mean_surprisal,
    * top_doc, top_doc_mean_q)).
    */
  private def scalaBigramLm(corpus: Seq[(Long, String, String)])
      : Map[String, (Long, Long, Double, Long, Long)] = {
    val toks = corpus.map { case (id, src, t) => (id, src, t.split(" ", -1).toSeq) }
    val v = toks.flatMap(_._3).distinct.size.toLong
    val pos = toks.flatMap { case (id, src, tk) =>
      tk.sliding(2).filter(_.size == 2).map(p => (id, src, p.head, p.mkString(" ")))
    }
    val cb = pos.groupBy(_._4).map { case (bg, xs) => bg -> xs.size.toLong }
    val cu = pos.groupBy(_._3).map { case (w1, xs) => w1 -> xs.size.toLong }
    val perDoc = pos.groupBy(p => (p._1, p._2)).map { case ((id, src), xs) =>
      val ssum = xs.map { case (_, _, w1, bg) =>
        (cu(w1) + v) * 1000000L / (cb(bg) + 1) }.sum
      val nBg = xs.size.toLong
      (id, src, ssum, nBg, ssum / nBg)
    }.toSeq
    perDoc.groupBy(_._2).map { case (src, xs) =>
      val top = xs.map(d => (d._5, d._1)).max
      src -> (xs.size.toLong, xs.map(_._4).sum,
        xs.map(_._3).sum.toDouble / xs.map(_._4).sum, top._2, top._1)
    }
  }

  test("q116 matches a driver-side exact-integer bigram LM") {
    for (dir <- Seq(SparkSpec.Sf0001, SparkSpec.Sf001)) {
      val corpus = Tables.load(spark, dir, "documents")
        .select("doc_id", "source", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      val expected = scalaBigramLm(corpus)
      val got = SparkEntry.queries("q116_bigram_perplexity")(spark, dir)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getLong(4), r.getLong(5))).toMap
      assert(got == expected, s"mismatch at $dir")
    }
  }

  test("q116 sees token ORDER where unigram surprisal (q99) cannot") {
    // Five docs, all the SAME unigram bag (5×x, 4×y): four follow the
    // corpus-dominant alternation x y x y…, one is scrambled with x→x /
    // y→y transitions the corpus makes rare. A unigram model scores all
    // five identically (q99's tie election falls to the LARGEST id); the
    // bigram model must single out the scrambled doc — which carries the
    // SMALLEST id, so a tie-break cannot fake this receipt.
    import spark.implicits._
    val fluent = "x y x y x y x y x"
    val scrambled = "x x y y x y x x y"
    val root = java.nio.file.Files.createTempDirectory("graft-q116-order")
    Seq((1L, scrambled), (2L, fluent), (3L, fluent), (4L, fluent), (5L, fluent))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$root/documents.parquet")
    val bigramTop = SparkEntry.queries("q116_bigram_perplexity")(
        spark, root.toString)
      .select("top_doc").head().getLong(0)
    assert(bigramTop == 1L,
      s"bigram LM elected doc $bigramTop, not the scrambled doc 1")
    val unigramTop = SparkEntry.queries("q99_doc_surprisal")(
        spark, root.toString)
      .select("top_doc").head().getLong(0)
    assert(unigramTop == 5L,
      "unigram surprisal distinguished docs with identical bags — fixture broken")
  }

  test("BigramLm reference-model scoring penalizes unseen bigrams at the backoff ceiling") {
    import spark.implicits._
    val model = Seq((100L, "a b a b a b a b")).toDF("doc_id", "text")
    // model: c(ab)=4, c(ba)=3, cu(a)=4, cu(b)=3, V=2; backoff ceiling
    // sq0 = (max cu + V)·10⁶ = 6·10⁶
    val docs = Seq(
      (1L, "a b"),     // the one known bigram — mean = sq(ab) exactly
      (2L, "a b c d"), // ab known; bc, cd unseen
      (3L, "c d c d"), // all unseen — mean = sq0 exactly
      (4L, "a"))       // no bigram — un-scorable
      .toDF("doc_id", "text")
    val got = graft.text.BigramLm.withPerplexity(docs, model)
      .select($"doc_id", $"ppx_q").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val sq0 = 6L * 1000000L
    val sqAb = (4L + 2L) * 1000000L / (4L + 1L) // known-bigram score
    assert(got(3L).contains(sq0), s"all-unseen doc should sit at sq0: $got")
    assert(got(1L).exists(_ < got(2L).get) && got(2L).exists(_ < sq0),
      s"unseen-bigram count must order the scores: $got")
    assert(got(1L).contains(sqAb), s"known-bigram mean off: $got")
    assert(got(4L).isEmpty, "a bigram-less doc must score NULL")
    // the gate form drops the un-scorable and the at-threshold doc
    val kept = graft.text.BigramLm.passing(docs, sq0, model)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L), s"gate kept $kept")
  }

  // --- q117 PSI drift -------------------------------------------------

  /** The q117 PSI re-derived driver-side (reusing the BM25 tests' `lq`,
    * the one quantized-log2 definition): power-of-2 length buckets,
    * +1 smoothing, BigInt term sums, the same three IEEE ops last.
    */
  private def scalaPsi(corpus: Seq[(String, Int)])
      : Map[String, (Long, Long, Double, Long, Boolean)] = {
    val bucketOf = (n: Long) => 64L - java.lang.Long.numberOfLeadingZeros(n)
    val counts = corpus.groupBy { case (src, n) => (src, bucketOf(n.toLong)) }
      .map { case (k, xs) => k -> xs.size.toLong }
    val buckets = counts.keys.map(_._2).toSeq.distinct.sorted
    val ref = buckets.map(b =>
      b -> counts.collect { case ((_, `b`), c) => c }.sum).toMap
    val nTotal = ref.values.sum
    val nb = buckets.size.toLong
    counts.keys.map(_._1).toSeq.distinct.map { src =>
      val nDocs = counts.collect { case ((`src`, _), c) => c }.sum
      val ns = nDocs + nb; val nr = nTotal + nb
      val terms = buckets.map { b =>
        val cs = counts.getOrElse((src, b), 0L) + 1
        val rs = ref(b) + 1
        val d = cs * nr - rs * ns
        b -> BigInt(d) * (lq(cs * nr) - lq(rs * ns))
      }
      val psiQ = terms.map(_._2).sum
      val top = terms.map { case (b, t) => (t, -b) }.max
      val psi = psiQ.toDouble * 0.6931471805599453 /
        (ns.toDouble * nr.toDouble * 1048576.0)
      src -> (nDocs, counts.count(_._1._1 == src).toLong, psi, -top._2,
        psi >= 0.2)
    }.toMap
  }

  test("q117 matches a driver-side exact-integer PSI, and PSI is never negative") {
    for (dir <- Seq(SparkSpec.Sf0001, SparkSpec.Sf001)) {
      val corpus = Tables.load(spark, dir, "documents")
        .select("source", "text").collect()
        .map(r => (r.getString(0), r.getString(1).split(" ", -1).length)).toSeq
      val expected = scalaPsi(corpus)
      val got = SparkEntry.queries("q117_source_drift_psi")(spark, dir)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getLong(4), r.getBoolean(5))).toMap
      assert(got == expected, s"mismatch at $dir")
      assert(got.values.forall(_._3 >= 0.0), "PSI went negative")
    }
  }

  test("q117 scores a source matching the corpus profile exactly zero and flags a pile-up") {
    import spark.implicits._
    def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val lens = Seq(1, 2, 4, 8) // buckets 1,2,3,4
    def write(rows: Seq[(Long, String, String)]): String = {
      val root = java.nio.file.Files.createTempDirectory("graft-q117-drift")
      rows.toDF("doc_id", "text", "source")
        .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
        .withColumn("n_chars",
          org.apache.spark.sql.functions.length($"text").cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$root/documents.parquet")
      root.toString
    }
    def run(dir: String) =
      SparkEntry.queries("q117_source_drift_psi")(spark, dir)
        .collect()
        .map(r => r.getString(0) -> (r.getDouble(3), r.getLong(4),
          r.getBoolean(5))).toMap
    // Fixture 1: two sources with IDENTICAL uniform profiles — each
    // matches the corpus distribution, the smoothed cross terms cancel
    // exactly (cs·Nr == rs·Ns bucket by bucket), psi == 0 precisely.
    val calm = run(write(
      lens.zipWithIndex.map { case (n, i) => (i.toLong, doc(n), "a") } ++
      lens.zipWithIndex.map { case (n, i) => (10L + i, doc(n), "b") }))
    assert(calm("a")._1 == 0.0 && calm("b")._1 == 0.0,
      s"corpus-matching sources scored nonzero: $calm")
    assert(!calm("a")._3 && !calm("b")._3)
    // Fixture 2: source z piles every doc into the largest bucket. z is
    // kept SMALL relative to a/b (4 docs vs 2×16) so the corpus
    // reference stays near the uniform profile — a big-enough pile
    // would bend the reference toward itself and dilute its own score.
    // z must out-drift a/b, clear the 0.2 threshold, and name bucket 4;
    // a and b stay symmetric (identical profiles → identical psi).
    val uniform16 = for (rep <- 0 until 4; (n, i) <- lens.zipWithIndex)
      yield (rep, n, i)
    val hot = run(write(
      uniform16.map { case (rep, n, i) => (10L * rep + i, doc(n), "a") } ++
      uniform16.map { case (rep, n, i) => (100L + 10L * rep + i, doc(n), "b") } ++
      (0 until 4).map(i => (200L + i, doc(8), "z"))))
    assert(hot("a")._1 == hot("b")._1, "identical sources scored differently")
    assert(hot("z")._1 > hot("a")._1, "pile-up did not out-drift")
    assert(hot("z")._1 > 0.2 && hot("z")._3,
      s"piled-up source not flagged: ${hot("z")}")
    assert(hot("z")._2 == 4L,
      s"worst bucket should be 4 (the pile), got ${hot("z")._2}")
  }
}
