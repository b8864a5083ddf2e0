package graft.text

import graft.{SparkEntry, SparkSpec, Tables}

/** Receipts for q109 (BPE merge candidates) and q110 (context-window
  * chunking): both re-derived with plain driver-side Scala over the raw
  * text — no Spark expressions shared with the production pipelines —
  * plus the structural invariants each operator exists to guarantee.
  */
class TokenizerOpsSpec extends SparkSpec {

  private def texts(dir: String): Seq[(Long, String, String)] =
    Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("q109 matches a driver-side pair count over the raw corpus") {
    for (dir <- Seq(SparkSpec.Sf0001, SparkSpec.Sf001)) {
      // independent form: count pairs straight off the token stream,
      // never building the vocab dict the production query pivots on
      val counts = scala.collection.mutable.Map.empty[String, Long]
      for ((_, _, text) <- texts(dir); w <- text.split(" ", -1); i <- 0 until w.length - 1)
        counts(w.substring(i, i + 2)) = counts.getOrElse(w.substring(i, i + 2), 0L) + 1L
      val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
        .zipWithIndex.map { case ((p, n), i) => (i + 1, p, n) }
      val got = SparkEntry.queries("q109_bpe_merge")(spark, dir)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      assert(got == want, s"mismatch at $dir")
    }
  }

  private val W = 64
  private val S = 48

  test("q110 matches a driver-side chunker, md5 content included") {
    val dir = SparkSpec.Sf001
    val want = texts(dir).flatMap { case (docId, source, text) =>
      val tk = text.split(" ", -1)
      val n = tk.length
      val nChunks = if (n <= W) 1 else 1 + (n - W + S - 1) / S
      (0 until nChunks).map { i =>
        val start = if (i == nChunks - 1 && n > W) n - W + 1 else 1 + S * i
        val len = math.min(W, n)
        val content = tk.slice(start - 1, start - 1 + len).mkString(" ")
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(content.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (docId, i, start, len, md5, source)
      }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q110_context_chunks")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4), r.getString(5))).toSeq
    assert(got == want)
  }

  test("q110 chunks cover every token position with no gaps") {
    val got = SparkEntry.queries("q110_context_chunks")(spark, SparkSpec.Sf0001)
      .select("doc_id", "start_pos", "chunk_len").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val nTokens = texts(SparkSpec.Sf0001)
      .map { case (id, _, t) => id -> t.split(" ", -1).length }.toMap
    got.groupBy(_._1).foreach { case (docId, chunks) =>
      val covered = chunks.flatMap { case (_, st, ln) => st until (st + ln) }.toSet
      assert(covered == (1 to nTokens(docId)).toSet,
        s"doc $docId coverage hole: ${(1 to nTokens(docId)).toSet -- covered}")
    }
  }
}
