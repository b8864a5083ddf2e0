package graft.text

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Receipts for q120 (temperature-scaled mixture) and q121 (CDC chunk
  * dedup): each is pinned against a LITERAL driver-side re-derivation —
  * plain-Scala Hamilton apportionment over collected per-source counts
  * for q120, and a serial tokenize→cut→chunk→hash→first-holder replay
  * for q121 — formulations that share no Spark operator shape with the
  * queries they certify.
  */
class MixtureChunkSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, SparkSpec.Sf0001, "documents")

  /** First 15 hex digits of md5 as a long — the production 60-bit key
    * (re-derived here from MessageDigest, not from gramHashArr).
    */
  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("q120 matches a driver-side Hamilton apportionment at alpha=0.5") {
    val N = 200L
    val counts = docs.groupBy($"source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val ws = counts.map { case (s, n) =>
      (s, n, math.floor(math.sqrt(n.toDouble) * 1048576.0).toLong)
    }
    val nTot = ws.map(_._2).sum
    val wTot = ws.map(_._3).sum
    def hamilton(shares: Seq[(String, Long)], tot: Long): Map[String, Long] = {
      val fl = shares.map { case (s, x) => (s, N * x / tot, N * x % tot) }
      val deficit = (N - fl.map(_._2).sum).toInt
      val bumped = fl.sortBy { case (s, _, rem) => (-rem, s) }
        .zipWithIndex
        .map { case ((s, q, _), i) => (s, if (i < deficit) q + 1 else q) }
      bumped.toMap
    }
    val raw = hamilton(ws.map(t => (t._1, t._2)), nTot)
    val temp = hamilton(ws.map(t => (t._1, t._3)), wTot)
    val want = ws.map { case (s, n, _) =>
      Seq[Any](s, n, raw(s), temp(s), temp(s) * 1000000L / n)
    }.toSeq
    val got = SparkEntry.queries("q120_temperature_mixture")(
      spark, SparkSpec.Sf0001).collect().map(_.toSeq).toSeq
    assert(got === want)
    // exact-N: both allocations spend the whole budget by construction
    assert(raw.values.sum === N && temp.values.sum === N)
  }

  test("q121 matches a serial chunk-and-elect replay") {
    val rows = docs.select($"doc_id", $"source", coalesce($"text", lit("")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // (doc_id, source, chunk_idx, clen, chash) — the literal definition:
    // cut after token p (1-based, p <= n-1) iff the 8-gram ending at p
    // hashes to 0 mod 64
    val chunks = rows.flatMap { case (doc, src, text) =>
      val tk = text.split(" ", -1)
      val n = tk.length
      val cuts = (8 to n - 1).filter { p =>
        md5Long(tk.slice(p - 8, p).mkString(" ")) % 64 == 0
      }
      val starts = 1 +: cuts.map(_ + 1)
      val ends = cuts :+ n
      starts.indices.map { k =>
        val st = starts(k); val en = ends(k)
        (doc, src, k, (en - st + 1).toLong,
          md5Long(tk.slice(st - 1, en).mkString(" ")))
      }
    }
    val totals = chunks.groupBy(_._2).map { case (src, cs) =>
      val nTok = cs.map(_._4).sum
      (src, cs.size.toLong, nTok, nTok.toDouble / cs.size)
    }
    val firstHeld = chunks.groupBy(_._5).map { case (_, cs) =>
      cs.minBy(c => (c._1, c._3))._2 // first holder = min (doc_id, idx)
    }.groupBy(identity).map { case (src, hs) => (src, hs.size.toLong) }
    val want = totals.toSeq.sortBy(_._1).map { case (src, nc, nt, mean) =>
      val fh = firstHeld.getOrElse(src, 0L)
      Seq[Any](src, nc, nt, mean, fh, fh * 1000000L / nc)
    }
    val got = SparkEntry.queries("q121_cdc_chunk_dedup")(
      spark, SparkSpec.Sf0001).collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("q121 boundaries are content-local: an edit re-aligns downstream chunks") {
    // the CDC property the operator exists for: append a prefix token
    // to a doc and all chunk hashes after the first boundary are
    // UNCHANGED (fixed-window chunking shifts every window instead)
    // deterministic synthetic doc (the property holds for any content;
    // the fixture corpus docs are too short to yield several chunks)
    val text = (0 until 2000)
      .map(i => s"tok${(i * 2654435761L) % 997}").mkString(" ")
    def chunkHashes(tk: Array[String]): Seq[Long] = {
      val n = tk.length
      val cuts = (8 to n - 1).filter { p =>
        md5Long(tk.slice(p - 8, p).mkString(" ")) % 64 == 0
      }
      val starts = 1 +: cuts.map(_ + 1)
      val ends = cuts :+ n
      starts.indices.map(k =>
        md5Long(tk.slice(starts(k) - 1, ends(k)).mkString(" ")))
    }
    val tk = text.split(" ", -1)
    val orig = chunkHashes(tk)
    val edited = chunkHashes("EDIT" +: tk)
    assume(orig.size >= 3, "fixture doc long enough to chunk")
    // every chunk after the edit's neighborhood re-aligns: the tail of
    // the edited chunk stream equals the tail of the original
    assert(edited.takeRight(orig.size - 1) === orig.takeRight(orig.size - 1))
    // and the head (containing the edit) differs
    assert(edited.head !== orig.head)
  }
}
