package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** HL7 v2.x ingestion — the last declared-but-unimplemented reference
  * connector (`hl7` in healthcare-pipeline-requirements.txt:24 and the
  * format list at healthcare-data-pipeline-main.py:139; the reference
  * ships no parsing code). Implemented dependency-free against the
  * PUBLIC v2 encoding rules: a message is CR-separated segments, a
  * segment is `|`-separated fields, with `^` components, `~`
  * repetitions, `&` subcomponents and `\`-escapes; MSH-1 is the field
  * separator character itself and MSH-2 the encoding characters (the
  * spec's famous off-by-one, honored here).
  *
  * Declared-schema extraction, per the [[Formats]] contract: callers
  * name the columns they want as terser-style paths (`"PID-5.1"` =
  * segment PID, field 5, component 1), a missing segment/field/
  * component is NULL (HL7 fields are positionally optional), and a
  * value that cannot convert to the declared type fails the task
  * (FAILFAST — load-gate semantics). `repeatSegment` emits one row per
  * occurrence of a repeating segment (e.g. one row per OBX lab result)
  * with message-level paths repeated onto each row — the relational
  * shape a lab feed needs.
  *
  * Scale design: like xlsx (and gzip), an HL7 batch file is not
  * splittable mid-message, so the unit of parallelism is the FILE —
  * `binaryFiles` hands one file per task and a directory of feed files
  * parallelizes across the cluster; parsing is executor-side, the
  * driver never sees a message. Batch framing segments (FHS/BHS/BTS/
  * FTS) are skipped; each `MSH` starts a new message.
  */
object Hl7 {

  /** One requested output column: `path` is `SEG-F[.C[.S]]`. */
  final case class Hl7Field(name: String, path: String, dataType: DataType)

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
          val bySeg = segs.groupBy(segName)
          val repeats = repeatSegment match {
            case Some(s) => bySeg.getOrElse(s, Seq.empty).map(Some(_))
            case None => Seq(None)
          }
          repeats.map { rep =>
            Row.fromSeq(specs.map { case (name, (seg, f, c, s), dt) =>
              val line =
                if (repeatSegment.contains(seg)) rep
                else bySeg.get(seg).flatMap(_.headOption)
              line.flatMap(extract(_, f, c, s))
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
      .filterNot(l => Seq("FHS|", "BHS|", "BTS|", "FTS|").exists(l.startsWith))
    val out = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    var cur = scala.collection.mutable.ArrayBuffer[String]()
    lines.foreach { l =>
      if (l.startsWith("MSH|")) {
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

  private def segName(line: String): String = line.takeWhile(_ != '|')

  private[sources] def parsePath(path: String): (String, Int, Int, Int) =
    path match {
      case PathRe(seg, f, c, s) =>
        (seg, f.toInt,
         Option(c).map(_.toInt).getOrElse(0),
         Option(s).map(_.toInt).getOrElse(0))
      case _ => throw new IllegalArgumentException(
        s"bad HL7 path '$path' (want SEG-F[.C[.S]], e.g. PID-5.1)")
    }

  /** Pull field `f` (1-based, MSH off-by-one honored), first
    * repetition, component `c`, subcomponent `s` (0 = whole). Absent
    * positions are None; decoding of `\`-escapes happens last.
    */
  private[sources] def extract(line: String, f: Int, c: Int, s: Int): Option[String] = {
    val parts = line.split("\\|", -1)
    val isMsh = parts(0) == "MSH"
    // MSH-1/MSH-2 ARE the delimiter characters — return them verbatim,
    // never split or unescape them (they'd split on themselves)
    if (isMsh && f == 1) return Some("|")
    if (isMsh && f == 2) return parts.lift(1).filter(_.nonEmpty)
    val fieldOpt = if (isMsh) parts.lift(f - 1) else parts.lift(f)
    fieldOpt
      .map(_.split("~", -1).head) // scalar columns: first repetition
      .flatMap(v => if (c == 0) Some(v) else v.split("\\^", -1).lift(c - 1))
      .flatMap(v => if (s == 0) Some(v) else v.split("&", -1).lift(s - 1))
      .filter(_.nonEmpty)
      .map(unescape)
  }

  /** The v2 escape sequences for the delimiter characters. */
  private[sources] def unescape(v: String): String =
    if (!v.contains('\\')) v
    else v.replace("\\F\\", "|").replace("\\S\\", "^").replace("\\T\\", "&")
      .replace("\\R\\", "~").replace("\\E\\", "\\")

  /** HL7 TS/DTM values are `yyyyMMdd[HHmmss[.ffff]][±zzzz]`. */
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
      require(v.length >= 8, s"HL7 timestamp too short in $name: '$v'")
      val digits = v.takeWhile(ch => ch.isDigit).padTo(14, '0').take(14)
      java.sql.Timestamp.valueOf(java.time.LocalDateTime.parse(
        digits, java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")))
    case other => throw new IllegalArgumentException(
      s"unsupported HL7 column type $other for field $name")
  }
}
