package graft.multimodal

import graft.SparkSpec

class AudioDecodeSpec extends SparkSpec {
  import MultimodalQueries._

  private def closedForm(id: Long): (Long, Long, Long) = {
    val k = 1 + (id % 7)
    val n = 800 + id % 800
    var sumAbs = 0L
    var peak = 0L
    var i = 0L
    while (i < n) {
      val a = math.abs((i * k) % 32768L - 16384L)
      sumAbs += a
      if (a > peak) peak = a
      i += 1
    }
    (n, sumAbs, peak)
  }

  test("WAV write → JDK decode roundtrip recovers the exact sample stats") {
    for (id <- Seq(0L, 1L, 7L, 41L, 799L, 12345L)) {
      val Some((sr, ch, n, sumAbs, peak)) = decodeWav(syntheticWav(id))
      val (en, esum, epeak) = closedForm(id)
      assert(sr === 8000)
      assert(ch === 1)
      assert(n === en, s"id=$id sample count")
      assert(sumAbs === esum, s"id=$id sum_abs")
      assert(peak === epeak, s"id=$id peak")
    }
  }

  test("corrupt, truncated and non-audio payloads stub instead of failing") {
    assert(decodeWav(null).isEmpty)
    assert(decodeWav(Array[Byte](1, 2, 3)).isEmpty)
    assert(decodeWav("not a wav at all, just text".getBytes("UTF-8")).isEmpty)
    // valid RIFF magic, garbage body
    val junk = "RIFF".getBytes("US-ASCII") ++ Array.fill[Byte](60)(0x5a)
    assert(decodeWav(junk).isEmpty)
    // a PNG payload routed into the audio decoder stubs too
    assert(decodeWav(syntheticPng(5L, 8, 8)).isEmpty)
  }

  test("audioFeatures falls back to stub features for undecodable payloads") {
    import spark.implicits._
    val media = Seq(
      MediaRecord(1L, "a", syntheticWav(1L)),
      MediaRecord(2L, "a", "plain text payload".getBytes("UTF-8"))
    ).toDF()
    val rows = audioFeatures(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("decoded")).toMap
    assert(rows === Map(1L -> true, 2L -> false))
  }

  test("q133 executes on driver data: every sampled clip decodes") {
    val rows = q133.build(spark, SparkSpec.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_decoded") === r.getAs[Long]("n_clips"))
      assert(r.getAs[Long]("max_peak") <= 16384L)
    }
  }
}
