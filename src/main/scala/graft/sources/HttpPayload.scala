package graft.sources

import java.nio.charset.StandardCharsets.ISO_8859_1

/** HTTP response payload handling for raw-WARC `response` records —
  * the wire bytes between the WARC framing and the HTML: status line +
  * headers, optional chunked transfer framing, optional gzip/deflate
  * content coding, then the charset hunt (Content-Type param → BOM →
  * `<meta charset>` prescan → UTF-8), all against the PUBLIC RFC 9110
  * / 9112 and WHATWG encoding-sniffing rules.
  *
  * Selection vs strictness: a record that is not an HTTP response or
  * not HTML returns None — skipping non-HTML crawl records is
  * FILTERING, the reader's job. But once a record claims to be HTML,
  * malformed chunk framing, an unsupported content coding, or body
  * bytes that do not decode in the declared charset THROW (the repo's
  * strict-ingestion stance: re-fetch the segment, don't mangle it).
  */
object HttpPayload {

  /** Decoded HTML body of an HTTP response payload, or None if the
    * payload is not an HTTP response / not HTML.
    */
  def htmlBody(payload: Array[Byte], uri: String): Option[String] = {
    val bodyStart = headerEnd(payload)
    if (bodyStart < 0) return None
    val head = new String(payload, 0, bodyStart, ISO_8859_1)
    val lines = head.split("\r?\n").filter(_.nonEmpty)
    if (lines.isEmpty || !lines(0).regionMatches(true, 0, "HTTP/", 0, 5))
      return None
    val headers: Map[String, String] = lines.drop(1).flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None
      else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
    }.toMap
    val ct = headers.getOrElse("content-type", "").toLowerCase
    if (!ct.contains("text/html") && !ct.contains("application/xhtml"))
      return None

    var body = java.util.Arrays.copyOfRange(payload, bodyStart, payload.length)
    if (headers.get("transfer-encoding").exists(_.toLowerCase.contains("chunked")))
      body = dechunk(body, uri)
    headers.get("content-encoding").map(_.trim.toLowerCase).filter(_.nonEmpty)
      .foreach {
        case "gzip" | "x-gzip" => body = gunzip(body, uri)
        case "deflate" => body = inflate(body, uri)
        case "identity" => ()
        case other => throw new IllegalArgumentException(
          s"HTTP response $uri: unsupported Content-Encoding '$other'")
      }

    // Charset precedence: UTF-8 BOM (authoritative about the bytes
    // actually present) → Content-Type charset param → meta prescan of
    // the first 1024 bytes (the WHATWG sniffing window) → UTF-8.
    val decoded =
      if (body.length >= 3 && (body(0) & 0xff) == 0xef &&
          (body(1) & 0xff) == 0xbb && (body(2) & 0xff) == 0xbf)
        decodeStrict(java.util.Arrays.copyOfRange(body, 3, body.length),
          "UTF-8", uri)
      else {
        val cs = charsetParam(ct).orElse(metaCharset(body)).getOrElse("UTF-8")
        decodeStrict(body, cs, uri)
      }
    Some(decoded)
  }

  /** Index of the first byte after the blank line ending the header
    * section (CRLFCRLF per RFC 9112; lone LFLF tolerated — robustness
    * the RFC itself recommends), or -1 if no header terminator exists.
    */
  private def headerEnd(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
          b(i + 3) == '\n') return i + 4
      if (b(i) == '\n' && b(i + 1) == '\n') return i + 2
      i += 1
    }
    -1
  }

  private val CharsetParam =
    """(?i)charset\s*=\s*"?([A-Za-z0-9][A-Za-z0-9_.:\-]*)""".r

  private def charsetParam(contentType: String): Option[String] =
    CharsetParam.findFirstMatchIn(contentType).map(_.group(1))

  /** `<meta charset=...>` / `<meta http-equiv=Content-Type ...>` scan
    * of the first 1024 body bytes (ASCII-compatible prefix assumption,
    * as the WHATWG prescan makes).
    */
  private def metaCharset(body: Array[Byte]): Option[String] = {
    val window = new String(body, 0, math.min(1024, body.length), ISO_8859_1)
    val MetaTag = """(?is)<meta[^>]*>""".r
    MetaTag.findAllIn(window)
      .flatMap(m => CharsetParam.findFirstMatchIn(m).map(_.group(1)))
      .toSeq.headOption
  }

  /** Undo chunked transfer coding: hex-size line, that many bytes,
    * CRLF, repeat; a 0-size chunk ends the body (trailers ignored).
    * Malformed framing throws — a half-dechunked page is corruption.
    */
  private[sources] def dechunk(b: Array[Byte], uri: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    def fail(msg: String) = throw new IllegalArgumentException(
      s"HTTP response $uri: malformed chunked body ($msg)")
    while (true) {
      val lineEnd = {
        var j = i
        while (j < b.length && b(j) != '\n') j += 1
        if (j >= b.length) fail("missing chunk-size line")
        j
      }
      val sizeLine = new String(b, i, lineEnd - i, ISO_8859_1).trim
      val size = try
        java.lang.Long.parseLong(sizeLine.takeWhile(c =>
          Character.digit(c, 16) >= 0), 16)
      catch { case _: NumberFormatException =>
        fail(s"bad chunk size '$sizeLine'") }
      i = lineEnd + 1
      if (size == 0) return out.toByteArray
      if (i + size > b.length) fail("chunk runs past end of body")
      out.write(b, i, size.toInt)
      i += size.toInt
      // chunk data is followed by CRLF (tolerate lone LF)
      if (i < b.length && b(i) == '\r') i += 1
      if (i < b.length && b(i) == '\n') i += 1
    }
    out.toByteArray // unreachable
  }

  private def gunzip(b: Array[Byte], uri: String): Array[Byte] =
    drain(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b)), uri, "gzip")

  private def inflate(b: Array[Byte], uri: String): Array[Byte] =
    try drain(new java.util.zip.InflaterInputStream(
      new java.io.ByteArrayInputStream(b)), uri, "deflate")
    catch {
      // Some servers ship raw-deflate under the "deflate" token
      // (missing zlib header) — the well-known interop wart; retry raw.
      case _: java.util.zip.ZipException | _: IllegalArgumentException =>
        drain(new java.util.zip.InflaterInputStream(
          new java.io.ByteArrayInputStream(b),
          new java.util.zip.Inflater(true)), uri, "raw-deflate")
    }

  private def drain(in: java.io.InputStream, uri: String,
                    coding: String): Array[Byte] =
    try {
      val out = new java.io.ByteArrayOutputStream(1 << 14)
      val buf = new Array[Byte](1 << 14)
      var r = in.read(buf)
      while (r != -1) { out.write(buf, 0, r); r = in.read(buf) }
      out.toByteArray
    } catch {
      case e: java.io.IOException => throw new IllegalArgumentException(
        s"HTTP response $uri: corrupt $coding body: ${e.getMessage}", e)
    } finally in.close()

  /** Strict decode (the Warc/HL7 no-silent-U+FFFD stance). */
  private def decodeStrict(bytes: Array[Byte], charset: String,
                           uri: String): String = {
    val dec = java.nio.charset.Charset.forName(charset).newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch {
      case e: java.nio.charset.CharacterCodingException =>
        throw new IllegalArgumentException(
          s"HTTP response $uri: body is not valid $charset", e)
    }
  }
}
