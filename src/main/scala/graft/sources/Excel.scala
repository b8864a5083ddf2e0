package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import java.io.InputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Excel (.xlsx) ingestion — the reference declares the connector
  * (openpyxl/xlrd, healthcare-pipeline-requirements.txt:20-21) but
  * never implements it; here it is real and dependency-free: an .xlsx
  * file is a zip of XML parts (sharedStrings + per-sheet cell XML), and
  * the JDK ships both the zip codec and a StAX pull parser.
  *
  * Scale design: xlsx is NOT splittable (like gzip), so the unit of
  * parallelism is the FILE — `binaryFiles` distributes one workbook per
  * task and a directory of workbooks parallelizes across the cluster;
  * parsing is streaming (StAX, constant memory in rows) and happens
  * executor-side, never on the driver. Schema is declared, not
  * inferred, per the Formats contract: values are converted straight
  * off the shared-strings/number text, and a cell that cannot convert
  * fails the task (FAILFAST — the load-gate semantics of readCsv).
  *
  * Supported cell types: shared strings (t="s"), inline strings
  * (t="inlineStr"/"str"), numbers (default), booleans (t="b"). Dates
  * are numbers in xlsx (serial days since 1899-12-30) — expose them as
  * Double/Long and convert downstream, or declare DateType to get the
  * serial-day conversion applied here.
  */
object Excel {

  /** Read a single .xlsx path or a directory/glob of them. The first
    * sheet part (xl/worksheets/sheet1.xml) is read; `header=true` skips
    * the first row of every file.
    */
  def readXlsx(spark: SparkSession, path: String, schema: StructType,
               header: Boolean = true): DataFrame = {
    val rows = spark.sparkContext
      .binaryFiles(path, spark.sparkContext.defaultParallelism)
      .flatMap { case (_, stream) =>
        val raw = parseWorkbook(stream.open())
        val data = if (header) raw.drop(1) else raw
        data.map(cells => convert(cells, schema))
      }
    spark.createDataFrame(rows, schema)
  }

  /** Parse the first worksheet into raw string cells (None = empty). */
  private[sources] def parseWorkbook(in: InputStream): Seq[Array[Option[String]]] = {
    val zin = new ZipInputStream(in)
    var shared: IndexedSeq[String] = IndexedSeq.empty
    var sheetRows: Seq[Array[Option[(String, String)]]] = Seq.empty
    try {
      var entry = zin.getNextEntry
      // entry order is not guaranteed: buffer the sheet bytes if they
      // arrive before sharedStrings
      var sheetBytes: Array[Byte] = null
      while (entry != null) {
        entry.getName match {
          case "xl/sharedStrings.xml" => shared = parseSharedStrings(zin)
          case "xl/worksheets/sheet1.xml" => sheetBytes = readAll(zin)
          case _ => ()
        }
        entry = zin.getNextEntry
      }
      require(sheetBytes != null, "no xl/worksheets/sheet1.xml in workbook")
      sheetRows = parseSheet(new java.io.ByteArrayInputStream(sheetBytes))
    } finally zin.close()
    sheetRows.map(_.map(_.map {
      case ("s", v) => shared(v.toInt)
      case (_, v) => v
    }))
  }

  private def readAll(in: InputStream): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    var n = in.read(tmp)
    while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
    buf.toByteArray
  }

  private def xmlReader(in: InputStream) = {
    val f = XMLInputFactory.newInstance()
    // no DTDs / external entities in data files (hardening)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(in, "UTF-8")
  }

  private def parseSharedStrings(in: InputStream): IndexedSeq[String] = {
    val r = xmlReader(in)
    val out = mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    var phonetic = 0 // <rPh>/<phoneticPr> depth — their text is NOT the value
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "si" => inSi = true; cur.clear()
          case "rPh" | "phoneticPr" => phonetic += 1
          case "t" if inSi && phonetic == 0 => inT = true
          case _ => ()
        }
        // only <t> content counts: rich-text runs concatenate, phonetic
        // hints and pretty-print whitespace between elements do not
        case XMLStreamConstants.CHARACTERS if inT =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "si" => inSi = false; out += cur.toString
          case "rPh" | "phoneticPr" => phonetic -= 1
          case "t" => inT = false
          case _ => ()
        }
        case _ => ()
      }
    }
    out.toIndexedSeq
  }

  /** Cell ref "BC23" → 0-based column index (54). */
  private[sources] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  /** Each row → dense array of (type, rawValue) by column index. Text
    * accumulates PER CELL across `<v>`/`<t>` children, so rich-text
    * inline strings with several runs concatenate instead of the last
    * run overwriting the rest; phonetic `<rPh>` runs are skipped.
    */
  private def parseSheet(in: InputStream): Seq[Array[Option[(String, String)]]] = {
    val r = xmlReader(in)
    val rows = mutable.ArrayBuffer[Array[Option[(String, String)]]]()
    var row: mutable.ArrayBuffer[(Int, String, String)] = null
    var cellCol = -1
    var cellType = "n"
    var inV = false
    var hasVal = false
    var phonetic = 0
    val v = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => row = mutable.ArrayBuffer()
          case "c" =>
            cellCol = Option(r.getAttributeValue(null, "r"))
              .map(colIndex).getOrElse(cellCol + 1)
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
            v.clear(); hasVal = false
          case "rPh" | "phoneticPr" => phonetic += 1
          case "v" | "t" if phonetic == 0 => inV = true
          case _ => ()
        }
        case XMLStreamConstants.CHARACTERS if inV => v.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" | "t" =>
            if (inV) hasVal = true
            inV = false
          case "rPh" | "phoneticPr" => phonetic -= 1
          case "c" =>
            if (hasVal && cellCol >= 0 && row != null)
              row += ((cellCol, cellType, v.toString))
          case "row" =>
            val width = if (row.isEmpty) 0 else row.map(_._1).max + 1
            val dense = Array.fill[Option[(String, String)]](width)(None)
            row.foreach { case (i, t, raw) => dense(i) = Some((t, raw)) }
            rows += dense
            row = null; cellCol = -1
          case _ => ()
        }
        case _ => ()
      }
    }
    rows.toSeq
  }

  /** 1899-12-30-based Excel serial day → java LocalDate. */
  private def serialToDate(d: Double): java.sql.Date =
    java.sql.Date.valueOf(
      java.time.LocalDate.of(1899, 12, 30).plusDays(d.toLong))

  private def convert(cells: Array[Option[String]], schema: StructType): Row = {
    val vals = schema.fields.zipWithIndex.map { case (f, i) =>
      val raw = if (i < cells.length) cells(i) else None
      raw match {
        case None | Some("") => null
        case Some(sv) => f.dataType match {
          case StringType => sv
          case IntegerType => java.lang.Integer.valueOf(sv.toDouble.toInt)
          case LongType => java.lang.Long.valueOf(sv.toDouble.toLong)
          case DoubleType => java.lang.Double.valueOf(sv.toDouble)
          case BooleanType =>
            java.lang.Boolean.valueOf(sv == "1" || sv.equalsIgnoreCase("true"))
          case DateType => serialToDate(sv.toDouble)
          case dt => throw new IllegalArgumentException(
            s"unsupported xlsx column type $dt for field ${f.name}")
        }
      }
    }
    Row.fromSeq(vals.toIndexedSeq)
  }
}
