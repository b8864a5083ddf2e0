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
  * parsing happens executor-side, never on the driver, in TWO passes
  * over the zip: pass 1 loads the shared-strings dictionary (held in
  * memory by nature — it is the string table sheet cells point into),
  * pass 2 streams sheet rows off the StAX pull parser one row at a
  * time, so per-file memory is the dictionary plus ONE row — a
  * million-row workbook never materializes as a Seq. Schema is
  * declared, not inferred, per the Formats contract: values are
  * converted straight off the shared-strings/number text, and a cell
  * that cannot convert fails the task (FAILFAST — the load-gate
  * semantics of readCsv).
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
        val raw = parseWorkbook(() => stream.open())
        val data = if (header) raw.drop(1) else raw
        data.map(cells => convert(cells, schema))
      }
    spark.createDataFrame(rows, schema)
  }

  /** Parse the first worksheet into raw string cells (None = empty),
    * streamed one row at a time. `open` must yield a fresh stream per
    * call (PortableDataStream.open does): pass 1 reads sharedStrings,
    * pass 2 positions on the sheet entry and hands back a row iterator
    * — zip entry order never forces buffering a whole part.
    */
  private[sources] def parseWorkbook(
      open: () => InputStream): Iterator[Array[Option[String]]] = {
    val shared: IndexedSeq[String] = {
      val zin = new ZipInputStream(open())
      try {
        Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
          .find(_.getName == "xl/sharedStrings.xml")
          .map(_ => parseSharedStrings(zin))
          .getOrElse(IndexedSeq.empty)
      } finally zin.close()
    }
    val zin = new ZipInputStream(open())
    val sheetEntry = Iterator.continually(zin.getNextEntry)
      .takeWhile(_ != null).find(_.getName == "xl/worksheets/sheet1.xml")
    if (sheetEntry.isEmpty) {
      zin.close()
      throw new IllegalArgumentException("no xl/worksheets/sheet1.xml in workbook")
    }
    // close with the task (limit/take may abandon the iterator early);
    // outside a task (unit tests), exhaustion closes it below
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => zin.close()))
    sheetRows(zin, onExhausted = () => zin.close()).map(_.map(_.map {
      case ("s", v) => shared(v.toInt)
      case (_, v) => v
    }))
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

  /** Streaming row iterator over a positioned sheet stream: each row →
    * dense array of (type, rawValue) by column index, produced on
    * demand from the StAX pull parser — only the current row is ever
    * in memory. Text accumulates PER CELL across `<v>`/`<t>` children,
    * so rich-text inline strings with several runs concatenate instead
    * of the last run overwriting the rest; phonetic `<rPh>` runs are
    * skipped.
    */
  private def sheetRows(in: InputStream, onExhausted: () => Unit)
      : Iterator[Array[Option[(String, String)]]] =
    new scala.collection.AbstractIterator[Array[Option[(String, String)]]] {
      private val r = xmlReader(in)
      private var nextRow: Array[Option[(String, String)]] = _
      private var finished = false
      private var row: mutable.ArrayBuffer[(Int, String, String)] = null
      private var cellCol = -1
      private var cellType = "n"
      private var inV = false
      private var hasVal = false
      private var phonetic = 0
      private val v = new StringBuilder

      private def advance(): Unit = {
        while (nextRow == null && r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
              case "row" => row = mutable.ArrayBuffer(); cellCol = -1
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
                row = null
                nextRow = dense
              case _ => ()
            }
            case _ => ()
          }
        }
        if (nextRow == null && !finished) { finished = true; onExhausted() }
      }

      def hasNext: Boolean = {
        if (nextRow == null && !finished) advance()
        nextRow != null
      }

      def next(): Array[Option[(String, String)]] = {
        if (!hasNext) throw new NoSuchElementException("sheet exhausted")
        val out = nextRow
        nextRow = null
        out
      }
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
