package graft.sources

import graft.SparkSpec
import org.apache.spark.SparkException

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

/** [[Warc]] — the ISO 28500 framing rules must hold: records are
  * framed by Content-Length BYTES (never by scanning for the next
  * version line), gzip member-concatenation decodes, header folding
  * and case-insensitivity work, non-selected types are skipped, and
  * the strict stance fails tasks on truncation or undecodable bytes.
  */
class WarcSpec extends SparkSpec {

  /** Byte-exact record builder: CRLF line endings, Content-Length
    * computed from the payload's UTF-8 byte length, two trailing CRLFs.
    */
  private def record(warcType: String, id: String, uri: String,
                     date: String, payload: Array[Byte],
                     extraHeaders: Seq[String] = Nil): Array[Byte] = {
    val head = (Seq(
      "WARC/1.0",
      s"WARC-Type: $warcType",
      s"WARC-Record-ID: <urn:uuid:$id>",
      s"WARC-Date: $date") ++
      (if (uri.nonEmpty) Seq(s"WARC-Target-URI: $uri") else Nil) ++
      extraHeaders ++ Seq(
      "Content-Type: text/plain",
      s"Content-Length: ${payload.length}",
      "", "")).mkString("\r\n")
    val out = new ByteArrayOutputStream()
    out.write(head.getBytes(UTF_8))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  private def wetFixture: Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(record("warcinfo", "00000000-0000-0000-0000-000000000000", "",
      "2024-03-01T00:00:00Z", "software: graft-test".getBytes(UTF_8)))
    out.write(record("conversion", "11111111-1111-1111-1111-111111111111",
      "https://example.com/a", "2024-03-01T01:02:03Z",
      "alpha beta gamma".getBytes(UTF_8)))
    out.write(record("conversion", "22222222-2222-2222-2222-222222222222",
      "https://docs.example.org/b?q=1", "2024-03-01T04:05:06Z",
      // multibyte payload: Content-Length is BYTES, not chars
      "héllo wörld déjà".getBytes(UTF_8)))
    out.toByteArray
  }

  private def writeFile(name: String, bytes: Array[Byte]): Path = {
    val dir = Files.createTempDirectory("graft-warc")
    val p = dir.resolve(name)
    Files.write(p, bytes)
    p
  }

  test("plain WET reads conversion records with all fields, skipping warcinfo") {
    val p = writeFile("crawl.wet", wetFixture)
    val rows = Warc.readWarc(spark, p.toString).collect()
      .sortBy(_.getAs[String]("record_id"))
    assert(rows.length == 2, "warcinfo leaked through the type filter")
    val r1 = rows.head
    assert(r1.getAs[String]("warc_type") == "conversion")
    assert(r1.getAs[String]("record_id") ==
      "urn:uuid:11111111-1111-1111-1111-111111111111") // angles stripped
    assert(r1.getAs[String]("target_uri") == "https://example.com/a")
    assert(r1.getAs[java.sql.Timestamp]("warc_date").toInstant ==
      java.time.Instant.parse("2024-03-01T01:02:03Z"))
    assert(r1.getAs[String]("text") == "alpha beta gamma")
    assert(r1.getAs[Long]("content_length") == 16L)
    val r2 = rows(1)
    assert(r2.getAs[String]("text") == "héllo wörld déjà")
    assert(r2.getAs[Long]("content_length") ==
      "héllo wörld déjà".getBytes(UTF_8).length.toLong,
      "Content-Length must count bytes, not chars")
  }

  test("gzip member-concatenated WET decodes identically, sniffed by magic bytes") {
    val out = new ByteArrayOutputStream()
    // one gzip MEMBER per record — the Common Crawl layout
    for (rec <- Seq(
        record("conversion", "11111111-1111-1111-1111-111111111111",
          "https://example.com/a", "2024-03-01T01:02:03Z",
          "alpha beta gamma".getBytes(UTF_8)),
        record("conversion", "22222222-2222-2222-2222-222222222222",
          "https://example.com/b", "2024-03-01T04:05:06Z",
          "delta epsilon".getBytes(UTF_8)))) {
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(rec); gz.finish()
    }
    // deliberately NOT named .gz: detection must be by content
    val p = writeFile("crawl.wet", out.toByteArray)
    val texts = Warc.readWarc(spark, p.toString).collect()
      .map(_.getAs[String]("text")).sorted.toSeq
    assert(texts == Seq("alpha beta gamma", "delta epsilon"))
  }

  test("framing is Content-Length bytes — payloads containing WARC version lines survive") {
    val trap = "WARC/1.0\r\nWARC-Type: conversion\r\n\r\nnot a record"
    val p = writeFile("crawl.wet", record("conversion",
      "33333333-3333-3333-3333-333333333333", "https://example.com/t",
      "2024-03-01T00:00:00Z", trap.getBytes(UTF_8)))
    val rows = Warc.readWarc(spark, p.toString).collect()
    assert(rows.length == 1, "payload was mis-framed into extra records")
    assert(rows.head.getAs[String]("text") == trap)
  }

  test("folded headers and case-insensitive names parse per RFC-822") {
    val bytes = new String(record("conversion",
        "44444444-4444-4444-4444-444444444444", "PLACEHOLDER",
        "2024-03-01T00:00:00Z", "x".getBytes(UTF_8)), UTF_8)
      .replace("WARC-Target-URI: PLACEHOLDER",
        "warc-target-uri: https://example.com/very/\r\n long/path")
      .getBytes(UTF_8)
    val rows = Warc.readWarc(spark, writeFile("crawl.wet", bytes).toString)
      .collect()
    assert(rows.head.getAs[String]("target_uri") ==
      "https://example.com/very/ long/path")
  }

  test("a truncated payload fails the task instead of yielding a partial record") {
    val full = record("conversion", "55555555-5555-5555-5555-555555555555",
      "https://example.com/x", "2024-03-01T00:00:00Z",
      "this payload will be cut".getBytes(UTF_8))
    val p = writeFile("crawl.wet", full.dropRight(12))
    val e = intercept[SparkException] {
      Warc.readWarc(spark, p.toString).collect()
    }
    assert(e.getMessage.contains("truncated") ||
      Option(e.getCause).exists(_.getMessage.contains("truncated")))
  }

  test("undecodable payload bytes fail the task (strict charset stance)") {
    val p = writeFile("crawl.wet", record("conversion",
      "66666666-6666-6666-6666-666666666666", "https://example.com/y",
      "2024-03-01T00:00:00Z", Array[Byte](0x66, 0xFF.toByte, 0xFE.toByte)))
    val e = intercept[SparkException] {
      Warc.readWarc(spark, p.toString).collect()
    }
    assert(e.getMessage.contains("not valid UTF-8") ||
      Option(e.getCause).exists(_.getMessage.contains("not valid UTF-8")))
  }

  /** Full HTTP response bytes: status line + headers + CRLFCRLF + body. */
  private def httpResponse(body: Array[Byte],
                           headers: Seq[String]): Array[Byte] = {
    val head = (Seq("HTTP/1.1 200 OK") ++ headers ++ Seq("", ""))
      .mkString("\r\n")
    val out = new ByteArrayOutputStream()
    out.write(head.getBytes(UTF_8))
    out.write(body)
    out.toByteArray
  }

  private val mainPara = "This is the real article paragraph with plenty " +
    "of prose to clear the minimum block threshold."
  private val htmlPage =
    ("<html><head><script>var x = '<p>fake</p>';</script></head><body>" +
     "<nav><a href=/>Home</a> <a href=/a>About us here</a></nav>" +
     s"<p>$mainPara</p>" +
     "<footer>Copyright 2024 Example Corp, all rights reserved.</footer>" +
     "</body></html>")

  test("responseDocuments extracts main text from raw-WARC HTML responses") {
    val resp = httpResponse(htmlPage.getBytes(UTF_8),
      Seq("Content-Type: text/html; charset=utf-8"))
    val png = httpResponse(Array[Byte](0x89.toByte, 'P', 'N', 'G'),
      Seq("Content-Type: image/png"))
    val out = new ByteArrayOutputStream()
    out.write(record("response", "aaaaaaaa-0000-0000-0000-000000000001",
      "https://news.example.com/story", "2024-03-02T10:00:00Z", resp,
      extraHeaders = Seq("Content-Type: application/http; msgtype=response")))
    out.write(record("response", "aaaaaaaa-0000-0000-0000-000000000002",
      "https://news.example.com/logo.png", "2024-03-02T10:00:01Z", png,
      extraHeaders = Seq("Content-Type: application/http; msgtype=response")))
    val p = writeFile("crawl.warc", out.toByteArray)
    val rows = Warc.responseDocuments(spark, p.toString).collect()
    assert(rows.length == 1, "non-HTML response must filter, not error")
    val r = rows.head
    assert(r.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "source", "n_chars", "url", "fetched_at"))
    assert(r.getAs[String]("text") == mainPara,
      s"boilerplate survived extraction: '${r.getAs[String]("text")}'")
    assert(r.getAs[String]("source") == "news.example.com")
    assert(r.getAs[Long]("n_chars") == mainPara.length.toLong)
  }

  test("chunked transfer coding and gzip content coding are undone before extraction") {
    // gzip the HTML, then chunk the gzipped bytes in two chunks
    val gz = {
      val bos = new ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(htmlPage.getBytes(UTF_8)); g.finish()
      bos.toByteArray
    }
    val cut = gz.length / 2
    val chunked = new ByteArrayOutputStream()
    chunked.write(s"${cut.toHexString}\r\n".getBytes(UTF_8))
    chunked.write(gz, 0, cut)
    chunked.write("\r\n".getBytes(UTF_8))
    chunked.write(s"${(gz.length - cut).toHexString}\r\n".getBytes(UTF_8))
    chunked.write(gz, cut, gz.length - cut)
    chunked.write("\r\n0\r\n\r\n".getBytes(UTF_8))
    val resp = httpResponse(chunked.toByteArray,
      Seq("Content-Type: text/html; charset=utf-8",
          "Transfer-Encoding: chunked", "Content-Encoding: gzip"))
    val p = writeFile("crawl.warc", record("response",
      "aaaaaaaa-0000-0000-0000-000000000003",
      "https://z.example.org/x", "2024-03-02T11:00:00Z", resp,
      extraHeaders = Seq("Content-Type: application/http; msgtype=response")))
    val rows = Warc.responseDocuments(spark, p.toString).collect()
    assert(rows.length == 1 && rows.head.getAs[String]("text") == mainPara)
  }

  test("meta-charset prescan decodes legacy pages; declared-charset violations fail") {
    // ISO-8859-1 page whose charset is only declared in a meta tag
    val latinPara = "Ce paragraphe décrit l'article en détail avec assez " +
      "de texte pour dépasser le seuil minimal très facilement."
    val latinHtml = ("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=iso-8859-1\"></head><body>" +
      s"<p>$latinPara</p></body></html>")
    val latinResp = httpResponse(latinHtml.getBytes("ISO-8859-1"),
      Seq("Content-Type: text/html"))
    val p1 = writeFile("crawl.warc", record("response",
      "aaaaaaaa-0000-0000-0000-000000000004",
      "https://fr.example.org/a", "2024-03-02T12:00:00Z", latinResp,
      extraHeaders = Seq("Content-Type: application/http; msgtype=response")))
    val rows = Warc.responseDocuments(spark, p1.toString).collect()
    assert(rows.length == 1 && rows.head.getAs[String]("text") == latinPara)

    // the same latin-1 bytes under a UTF-8 claim must FAIL the task
    val lying = httpResponse(latinHtml.getBytes("ISO-8859-1"),
      Seq("Content-Type: text/html; charset=utf-8"))
    val p2 = writeFile("crawl.warc", record("response",
      "aaaaaaaa-0000-0000-0000-000000000005",
      "https://fr.example.org/b", "2024-03-02T12:00:01Z", lying,
      extraHeaders = Seq("Content-Type: application/http; msgtype=response")))
    val e = intercept[SparkException] {
      Warc.responseDocuments(spark, p2.toString).collect()
    }
    assert(e.getMessage.contains("not valid") ||
      Option(e.getCause).exists(_.getMessage.contains("not valid")))
  }

  test("wetDocuments yields the documents-table contract with deterministic ids") {
    val p = writeFile("crawl.wet", wetFixture)
    val rows = Warc.wetDocuments(spark, p.toString).collect()
      .sortBy(_.getAs[String]("url"))
    assert(rows.head.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "source", "n_chars", "url", "fetched_at"))
    // url sort: docs.example.org/b?q=1 < example.com/a
    assert(rows.head.getAs[String]("source") == "docs.example.org")
    val r1 = rows(1)
    assert(r1.getAs[String]("source") == "example.com")
    assert(r1.getAs[Long]("n_chars") == "alpha beta gamma".length.toLong)
    // doc_id re-derived driver-side: md5-prefix long of the record id
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("urn:uuid:11111111-1111-1111-1111-111111111111".getBytes(UTF_8))
    val expected = java.lang.Long.parseLong(
      md.take(8).map("%02x".format(_)).mkString.take(15), 16)
    assert(r1.getAs[Long]("doc_id") == expected)
  }
}
