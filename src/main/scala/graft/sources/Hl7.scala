package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import java.util.regex.Pattern

/** HL7 v2.x ingestion — the last declared-but-unimplemented reference
  * connector (`hl7` in healthcare-pipeline-requirements.txt:24 and the
  * format list at healthcare-data-pipeline-main.py:139; the reference
  * ships no parsing code). Implemented dependency-free against the
  * PUBLIC v2 encoding rules: a message is CR-separated segments, a
  * segment is field-separated with component / repetition /
  * subcomponent / escape delimiters, and the delimiters themselves are
  * DECLARED BY THE MESSAGE — MSH-1 is the field separator character,
  * MSH-2 the four encoding characters (the spec's famous off-by-one,
  * honored here) — so a feed that redefines `^~\&` still parses
  * correctly.
  *
  * Declared-schema extraction, per the [[Formats]] contract: callers
  * name the columns they want as terser-style paths (`"PID-5.1"` =
  * segment PID, field 5, component 1), a missing segment/field/
  * component is NULL (HL7 fields are positionally optional), and a
  * value that cannot convert to the declared type fails the task
  * (FAILFAST — load-gate semantics). `repeatSegment` emits one row per
  * occurrence of a repeating segment (e.g. one row per OBX lab result)
  * with message-level paths repeated onto each row — the relational
  * shape a lab feed needs; a message with ZERO occurrences still emits
  * one row with NULL repeat-segment columns (an outer join, not a
  * silent drop of the message's identifiers). `repeatField` does the
  * same one level down for a `~`-repeating FIELD (e.g. `"PID-3"` for
  * multiple patient identifiers, NK1 contacts, OBX-5 multi-part
  * results): one row per repetition, with every requested column under
  * that same SEG-F reading from the current repetition; composable
  * with `repeatSegment` (explode OBX segments, then each OBX-5
  * repetition). Other fields keep first-repetition semantics.
  *
  * Charset: feeds declare their encoding in MSH-18, and 8-bit charsets
  * (ISO-8859-1, Windows-1252) are common in the wild; callers pass the
  * feed's charset explicitly (default UTF-8). Decoding is STRICT —
  * undecodable bytes fail the task rather than silently becoming
  * U+FFFD, the same no-mangled-clinical-data stance as the type gate.
  * (MSH-18 itself can't drive the decode: reading it requires decoding
  * first. A mixed-charset directory should be read per-charset.)
  *
  * DTM semantics: `yyyyMMdd[HHmm[ss[.f+]]][±zzzz]` honors a declared
  * UTC offset; values without one are taken as UTC (the engine's
  * session convention) — instants never depend on the executor JVM's
  * default timezone. Fractional seconds are preserved (to Spark's µs),
  * and a value with ANY unconsumed trailing characters after the
  * digits/fraction/offset is rejected, not truncated.
  *
  * Scale design: like xlsx (and gzip), an HL7 batch file is not
  * splittable mid-message, so the unit of parallelism is the FILE —
  * `binaryFiles` hands one file per task and a directory of feed files
  * parallelizes across the cluster; parsing is executor-side (each
  * segment line split ONCE per message, however many columns read from
  * it), the driver never sees a message. Batch framing segments
  * (FHS/BHS/BTS/FTS) are skipped; each MSH starts a new message.
  */
object Hl7 {

  /** One requested output column: `path` is `SEG-F[.C[.S]]`. */
  final case class Hl7Field(name: String, path: String, dataType: DataType)

  /** Per-message delimiter set, declared in MSH-1/MSH-2. */
  private[sources] final case class Delims(
      field: Char, comp: Char, rep: Char, esc: Char, sub: Char)

  private val PathRe = "^([A-Z][A-Z0-9]{2})-([0-9]+)(?:\\.([0-9]+))?(?:\\.([0-9]+))?$".r

  /** Read a file/directory/glob of HL7 v2 batch files into a DataFrame
    * of the requested fields, one row per message (or per
    * `repeatSegment` occurrence).
    */
  def readHl7(spark: SparkSession, path: String, fields: Seq[Hl7Field],
              repeatSegment: Option[String] = None,
              repeatField: Option[String] = None,
              charset: String = "UTF-8"): DataFrame = {
    val schema = StructType(fields.map(f => StructField(f.name, f.dataType)))
    val specs = fields.map(f => (f.name, parsePath(f.path), f.dataType))
    // eager validation, driver-side: a bad charset name or repeatField
    // path should fail at call time, not per-task
    java.nio.charset.Charset.forName(charset)
    val repFieldKey: Option[(String, Int)] = repeatField.map { p =>
      val (seg, f, c, s) = parsePath(p)
      require(c == 0 && s == 0,
        s"repeatField must be a whole field SEG-F (got '$p'): repetition " +
        "splits above components")
      (seg, f)
    }
    val rows = spark.sparkContext
      .binaryFiles(path, spark.sparkContext.defaultParallelism)
      .flatMap { case (file, stream) =>
        val text = decodeStrict(stream.toArray(), charset, file)
        splitMessages(text).flatMap { segs =>
          val d = delimsOf(segs.head)
          val fieldRe = Pattern.quote(d.field.toString)
          // each segment line is split exactly once per message; the
          // first occurrence wins for message-level paths
          val bySeg = segs.groupBy(_.takeWhile(_ != d.field))
          val partsBySeg = bySeg.map { case (name, lines) =>
            name -> lines.head.split(fieldRe, -1)
          }
          val repeats: Seq[Option[Array[String]]] = repeatSegment match {
            case Some(seg) => bySeg.get(seg) match {
              case Some(lines) => lines.map(l => Some(l.split(fieldRe, -1)))
              // zero occurrences: one row with NULL repeat columns, the
              // message's identifying fields survive (no silent drop)
              case None => Seq(None)
            }
            case None => Seq(None)
          }
          repeats.flatMap { rep =>
            def partsFor(seg: String): Option[Array[String]] =
              if (repeatSegment.contains(seg)) rep else partsBySeg.get(seg)
            // field-repetition explode: count the target field's `~`
            // chunks in THIS row's segment instance; absent/empty field
            // keeps one NULL-valued row (same outer-join stance as
            // repeatSegment)
            val nReps = repFieldKey match {
              case Some((seg, f)) =>
                partsFor(seg).flatMap(rawField(_, d, f)).filter(_.nonEmpty)
                  .map(v => v.count(_ == d.rep) + 1).getOrElse(1)
              case None => 1
            }
            (0 until nReps).map { repIdx =>
              Row.fromSeq(specs.map { case (name, (seg, f, c, s), dt) =>
                val i = if (repFieldKey.contains((seg, f))) repIdx else 0
                partsFor(seg).flatMap(extract(_, d, f, c, s, i))
                  .map(v => convert(name, v, dt)).orNull
              })
            }
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Strict decode: undecodable byte sequences FAIL the task (clinical
    * data must never be silently mangled to U+FFFD).
    */
  private def decodeStrict(bytes: Array[Byte], charset: String,
                           file: String): String = {
    val dec = java.nio.charset.Charset.forName(charset).newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch {
      case e: java.nio.charset.CharacterCodingException =>
        throw new IllegalArgumentException(
          s"HL7 feed $file is not valid $charset: $e", e)
    }
  }

  /** Normalize line endings, drop batch-framing segments, group the
    * remaining segment lines into messages at each MSH.
    */
  private[sources] def splitMessages(text: String): Seq[Seq[String]] = {
    val lines = text.split("[\\r\\n]+").toSeq
      .map(_.trim).filter(_.nonEmpty)
      .filterNot(l => Seq("FHS", "BHS", "BTS", "FTS").exists(p =>
        l.startsWith(p) && (l.length == 3 || !l.charAt(3).isLetterOrDigit)))
    val out = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    var cur = scala.collection.mutable.ArrayBuffer[String]()
    lines.foreach { l =>
      if (l.startsWith("MSH") && l.length > 3 && !l.charAt(3).isLetterOrDigit) {
        if (cur.nonEmpty) out += cur.toSeq
        cur = scala.collection.mutable.ArrayBuffer(l)
      } else if (cur.nonEmpty) cur += l
      // segments before any MSH: malformed stream — fail the task, not
      // silently drop clinical data (FAILFAST contract)
      else throw new IllegalArgumentException(
        s"HL7 segment before first MSH: ${l.take(40)}")
    }
    if (cur.nonEmpty) out += cur.toSeq
    out.toSeq
  }

  /** MSH-1 is the character at offset 3; MSH-2 (the first field) holds
    * component, repetition, escape, subcomponent in that order.
    */
  private[sources] def delimsOf(msh: String): Delims = {
    require(msh.length > 3, s"MSH segment too short: '$msh'")
    val f = msh.charAt(3)
    val enc = msh.drop(4).takeWhile(_ != f)
    Delims(f,
      comp = if (enc.length > 0) enc.charAt(0) else '^',
      rep = if (enc.length > 1) enc.charAt(1) else '~',
      esc = if (enc.length > 2) enc.charAt(2) else '\\',
      sub = if (enc.length > 3) enc.charAt(3) else '&')
  }

  private[sources] def parsePath(path: String): (String, Int, Int, Int) =
    path match {
      case PathRe(seg, f, c, s) =>
        (seg, f.toInt,
         Option(c).map(_.toInt).getOrElse(0),
         Option(s).map(_.toInt).getOrElse(0))
      case _ => throw new IllegalArgumentException(
        s"bad HL7 path '$path' (want SEG-F[.C[.S]], e.g. PID-5.1)")
    }

  /** The Nth chunk of `v` split on the single character `c` (0-based;
    * None past the end). indexOf-based: no regex compilation, no array
    * allocation for chunks we don't want — `extract` runs once per
    * column per row on a feed, so this is the hot path.
    */
  private def chunk(v: String, c: Char, n: Int): Option[String] = {
    var start = 0
    var i = 0
    while (i < n) {
      val next = v.indexOf(c, start)
      if (next < 0) return None
      start = next + 1
      i += 1
    }
    val end = v.indexOf(c, start)
    Some(if (end < 0) v.substring(start) else v.substring(start, end))
  }

  /** The raw (un-split, un-escaped) field `f`, 1-based with the MSH
    * off-by-one honored. MSH-1/MSH-2 ARE the delimiter characters —
    * returned verbatim, never split or unescaped (they'd split on
    * themselves).
    */
  private[sources] def rawField(parts: Array[String], d: Delims,
                                f: Int): Option[String] = {
    val isMsh = parts(0) == "MSH"
    if (isMsh && f == 1) Some(d.field.toString)
    else if (isMsh && f == 2) parts.lift(1).filter(_.nonEmpty)
    else if (isMsh) parts.lift(f - 1)
    else parts.lift(f)
  }

  /** Pull field `f` (1-based, MSH off-by-one honored) from pre-split
    * parts, repetition `rep` (0-based; callers pass 0 except under a
    * `repeatField` explode), component `c`, subcomponent `s` (0 =
    * whole). Absent positions are None; escape decoding happens last.
    */
  private[sources] def extract(parts: Array[String], d: Delims,
                               f: Int, c: Int, s: Int,
                               rep: Int = 0): Option[String] = {
    val isMsh = parts(0) == "MSH"
    if (isMsh && (f == 1 || f == 2)) return rawField(parts, d, f)
    rawField(parts, d, f)
      .flatMap(chunk(_, d.rep, rep))
      .flatMap(v => if (c == 0) Some(v) else chunk(v, d.comp, c - 1))
      .flatMap(v => if (s == 0) Some(v) else chunk(v, d.sub, s - 1))
      .filter(_.nonEmpty)
      .map(unescape(_, d))
  }

  /** Single-pass decode of the v2 escape sequences (`\F\ \S\ \T\ \R\
    * \E\` for the five delimiters). Sequential String.replace would
    * corrupt adjacent sequences — the encoded form of a literal `\F\`
    * is `\E\F\E\`, whose middle `\F\` a naive field-separator replace
    * consumes first; a left-to-right scan cannot. Unknown sequences
    * (`\Xdd..\`, `\Zxx\`) pass through verbatim.
    */
  private[sources] def unescape(v: String, d: Delims): String = {
    if (v.indexOf(d.esc) < 0) return v
    val sb = new StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      if (v.charAt(i) == d.esc) {
        val j = v.indexOf(d.esc, i + 1)
        if (j < 0) { sb.append(v.substring(i)); i = v.length } // dangling: keep
        else {
          v.substring(i + 1, j) match {
            case "F" => sb.append(d.field)
            case "S" => sb.append(d.comp)
            case "T" => sb.append(d.sub)
            case "R" => sb.append(d.rep)
            case "E" => sb.append(d.esc)
            case other => sb.append(d.esc).append(other).append(d.esc)
          }
          i = j + 1
        }
      } else { sb.append(v.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** The full DTM grammar, anchored: digits at a legal precision,
    * optional fraction (only after whole seconds), optional ±offset —
    * and NOTHING after. A partial match is corruption: truncating
    * `20240101120000garbage` to the digits would silently accept a
    * mangled feed.
    */
  private val DtmRe =
    "^([0-9]{8}|[0-9]{10}|[0-9]{12}|[0-9]{14})(?:\\.([0-9]{1,9}))?([+-][0-9]{2}:?[0-9]{2})?$".r

  private def parseDtm(name: String, v: String): java.time.Instant =
    v match {
      case DtmRe(digits, frac, off) =>
        // DTM precision is only legal at whole components (date, +hhmm,
        // +ss): an odd digit count is corruption, and zero-padding it
        // would FABRICATE a time (9 digits '202401011' → 10:00:00) —
        // the regex alternation enforces this. Fractions only follow
        // whole seconds.
        require(frac == null || digits.length == 14,
          s"HL7 timestamp has fractional seconds without whole seconds in $name: '$v'")
        // honor a declared ±zzzz offset; no offset → UTC. Never the JVM
        // default zone: the same message must mean the same instant on
        // every executor
        val offset = Option(off).map(java.time.ZoneOffset.of)
          .getOrElse(java.time.ZoneOffset.UTC)
        val ldt = java.time.LocalDateTime.parse(
          digits.padTo(14, '0'),
          java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))
        val nanos = Option(frac).map(_.padTo(9, '0').toLong).getOrElse(0L)
        ldt.plusNanos(nanos).toInstant(offset)
      case _ => throw new IllegalArgumentException(
        s"malformed HL7 DTM in $name: '$v' (want yyyyMMdd[HHmm[ss[.f+]]][±zzzz])")
    }

  /** HL7 TS/DTM: `yyyyMMdd[HHmm[ss[.f+]]][±zzzz]`. Fractional seconds
    * survive to Spark's µs precision; trailing garbage is rejected.
    */
  private def convert(name: String, v: String, dt: DataType): Any = dt match {
    case StringType => v
    case IntegerType => v.toInt
    case LongType => v.toLong
    case DoubleType => v.toDouble
    case DateType =>
      // a date column accepts any valid DTM (PID-7 may carry a full
      // timestamp) and keeps its calendar date — but the WHOLE value
      // must be a valid DTM, not just a leading-8-digit prefix
      parseDtm(name, v)
      java.sql.Date.valueOf(java.time.LocalDate.parse(
        v.take(8), java.time.format.DateTimeFormatter.BASIC_ISO_DATE))
    case TimestampType =>
      java.sql.Timestamp.from(parseDtm(name, v))
    case other => throw new IllegalArgumentException(
      s"unsupported HL7 column type $other for field $name")
  }
}
