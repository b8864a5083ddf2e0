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
  * silent drop of the message's identifiers).
  *
  * DTM semantics: `yyyyMMdd[HHmmss[.f+]][±zzzz]` honors a declared
  * UTC offset; values without one are taken as UTC (the engine's
  * session convention) — instants never depend on the executor JVM's
  * default timezone.
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
              repeatSegment: Option[String] = None): DataFrame = {
    val schema = StructType(fields.map(f => StructField(f.name, f.dataType)))
    val specs = fields.map(f => (f.name, parsePath(f.path), f.dataType))
    val rows = spark.sparkContext
      .binaryFiles(path, spark.sparkContext.defaultParallelism)
      .flatMap { case (_, stream) =>
        val text = new String(stream.toArray(), "UTF-8")
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
          repeats.map { rep =>
            Row.fromSeq(specs.map { case (name, (seg, f, c, s), dt) =>
              val parts =
                if (repeatSegment.contains(seg)) rep
                else partsBySeg.get(seg)
              parts.flatMap(extract(_, d, f, c, s))
                .map(v => convert(name, v, dt)).orNull
            })
          }
        }
      }
    spark.createDataFrame(rows, schema)
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

  /** Pull field `f` (1-based, MSH off-by-one honored) from pre-split
    * parts, first repetition, component `c`, subcomponent `s` (0 =
    * whole). Absent positions are None; escape decoding happens last.
    */
  private[sources] def extract(parts: Array[String], d: Delims,
                               f: Int, c: Int, s: Int): Option[String] = {
    val isMsh = parts(0) == "MSH"
    // MSH-1/MSH-2 ARE the delimiter characters — return them verbatim,
    // never split or unescape them (they'd split on themselves)
    if (isMsh && f == 1) return Some(d.field.toString)
    if (isMsh && f == 2) return parts.lift(1).filter(_.nonEmpty)
    val fieldOpt = if (isMsh) parts.lift(f - 1) else parts.lift(f)
    fieldOpt
      .flatMap(chunk(_, d.rep, 0)) // first repetition
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

  /** HL7 TS/DTM: `yyyyMMdd[HHmm[ss[.f+]]][±zzzz]`. */
  private def convert(name: String, v: String, dt: DataType): Any = dt match {
    case StringType => v
    case IntegerType => v.toInt
    case LongType => v.toLong
    case DoubleType => v.toDouble
    case DateType =>
      require(v.length >= 8, s"HL7 date too short in $name: '$v'")
      java.sql.Date.valueOf(java.time.LocalDate.parse(
        v.take(8), java.time.format.DateTimeFormatter.BASIC_ISO_DATE))
    case TimestampType =>
      // honor a declared ±zzzz offset; no offset → UTC. Never the JVM
      // default zone: the same message must mean the same instant on
      // every executor
      val digits = v.takeWhile(_.isDigit)
      // DTM precision is only legal at whole components (date, +hhmm,
      // +ss; fractional seconds arrive after a '.'): an odd digit count
      // is corruption, and zero-padding it would FABRICATE a time
      // (e.g. 9 digits '202401011' → 10:00:00) — FAILFAST instead
      require(Set(8, 10, 12, 14).contains(digits.length),
        s"HL7 timestamp has invalid precision in $name: '$v'")
      val offset = "([+-][0-9]{2}:?[0-9]{2})$".r.findFirstIn(v)
        .map(java.time.ZoneOffset.of).getOrElse(java.time.ZoneOffset.UTC)
      val ldt = java.time.LocalDateTime.parse(
        digits.padTo(14, '0'),
        java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))
      java.sql.Timestamp.from(ldt.toInstant(offset))
    case other => throw new IllegalArgumentException(
      s"unsupported HL7 column type $other for field $name")
  }
}
