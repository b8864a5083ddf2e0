package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** [[Excel.readXlsx]] — minimal spec-conformant workbooks built from
  * raw zip+XML (the same format openpyxl writes) must round-trip
  * through the declared schema, including shared strings, inline
  * numbers, booleans, serial dates, sparse cells, and
  * one-task-per-file parallelism over a directory.
  */
class ExcelSpec extends SparkSpec {

  private def writeXlsx(path: String, sharedStrings: Seq[String],
                        sheetXml: String): Unit = {
    val z = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/sharedStrings.xml",
      s"""<?xml version="1.0"?><sst>${
        sharedStrings.map(s => s"<si><t>$s</t></si>").mkString}</sst>""")
    put("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet><sheetData>$sheetXml</sheetData></worksheet>""")
    z.close()
  }

  private val schema = StructType(Seq(
    StructField("name", StringType),
    StructField("age", IntegerType),
    StructField("score", DoubleType),
    StructField("active", BooleanType),
    StructField("visit", DateType)))

  // 45658 = 2025-01-01 in Excel serial days (epoch 1899-12-30)
  private def sheet(rowsFrom: Int, names: (Int, Int)): String = {
    val (n1, n2) = names
    s"""<row r="${rowsFrom}"><c r="A$rowsFrom" t="s"><v>0</v></c><c r="B$rowsFrom" t="s"><v>1</v></c></row>
       |<row r="${rowsFrom + 1}"><c r="A${rowsFrom + 1}" t="s"><v>$n1</v></c><c r="B${rowsFrom + 1}"><v>41</v></c><c r="C${rowsFrom + 1}"><v>93.5</v></c><c r="D${rowsFrom + 1}" t="b"><v>1</v></c><c r="E${rowsFrom + 1}"><v>45658</v></c></row>
       |<row r="${rowsFrom + 2}"><c r="A${rowsFrom + 2}" t="s"><v>$n2</v></c><c r="B${rowsFrom + 2}"><v>7</v></c><c r="D${rowsFrom + 2}" t="b"><v>0</v></c></row>""".stripMargin
  }

  test("single workbook: shared strings, numbers, booleans, dates, sparse cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx").toString
    writeXlsx(s"$dir/one.xlsx", Seq("name", "age", "alice", "bob"), sheet(1, (2, 3)))
    val df = Excel.readXlsx(spark, s"$dir/one.xlsx", schema)
    val rows = df.orderBy("name").collect()
    assert(rows.length === 2)
    assert(rows(0).getString(0) === "alice")
    assert(rows(0).getInt(1) === 41)
    assert(rows(0).getDouble(2) === 93.5)
    assert(rows(0).getBoolean(3) === true)
    assert(rows(0).getDate(4).toString === "2025-01-01")
    // bob's sparse row: missing score + visit come back NULL
    assert(rows(1).getString(0) === "bob")
    assert(rows(1).isNullAt(2) && rows(1).isNullAt(4))
    assert(rows(1).getBoolean(3) === false)
  }

  test("directory of workbooks: one task per file, all rows read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx-many").toString
    for (i <- 0 until 3)
      writeXlsx(s"$dir/part$i.xlsx", Seq("name", "age", s"u${i}a", s"u${i}b"),
        sheet(1, (2, 3)))
    val df = Excel.readXlsx(spark, s"$dir/*.xlsx", schema)
    assert(df.count() === 6)
    // parallelism is file-granular: tiny files may coalesce into one
    // task (desired at scale), but the read must span every file
    assert(df.rdd.getNumPartitions >= 1)
    assert(df.select("name").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSet === Set("u0a", "u0b", "u1a", "u1b", "u2a", "u2b"))
  }

  test("header=false keeps the first row as data") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx-nh").toString
    writeXlsx(s"$dir/nh.xlsx", Seq("x"),
      """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>1</v></c></row>""")
    val df = Excel.readXlsx(spark, s"$dir/nh.xlsx",
      StructType(Seq(StructField("a", StringType), StructField("b", LongType))),
      header = false)
    val r = df.collect().head
    assert(r.getString(0) === "x" && r.getLong(1) === 1L)
  }

  test("column reference arithmetic (A, Z, AA, BC)") {
    assert(Excel.colIndex("A1") === 0)
    assert(Excel.colIndex("Z9") === 25)
    assert(Excel.colIndex("AA3") === 26)
    assert(Excel.colIndex("BC23") === 54)
  }

  test("rich-text runs concatenate; phonetic runs and whitespace are ignored") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx-rich").toString
    val z = new ZipOutputStream(new FileOutputStream(s"$dir/rich.xlsx"))
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name)); z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    // shared string 0: two <r> runs + an <rPh> phonetic hint + pretty-print whitespace
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst>
        |  <si>
        |    <r><t>Hello </t></r>
        |    <r><t>World</t></r>
        |    <rPh sb="0" eb="5"><t>ファントム</t></rPh>
        |  </si>
        |</sst>""".stripMargin)
    // inline rich-text cell with two runs in the sheet itself
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="inlineStr"><is><r><t>foo</t></r><r><t>bar</t></r></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
    val df = Excel.readXlsx(spark, s"$dir/rich.xlsx",
      StructType(Seq(StructField("a", StringType), StructField("b", StringType))),
      header = false)
    val r = df.collect().head
    assert(r.getString(0) === "Hello World") // runs joined, no rPh, no indentation
    assert(r.getString(1) === "foobar")      // inline runs concatenated, not overwritten
  }

  test("sheet rows stream as a lazy iterator (large sheet, partial consumption)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx-big").toString
    val body = (1 to 5000)
      .map(i => s"""<row r="$i"><c r="A$i"><v>$i</v></c></row>""").mkString
    val z = new ZipOutputStream(new FileOutputStream(s"$dir/big.xlsx"))
    z.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    z.write(s"""<?xml version="1.0"?><worksheet><sheetData>$body</sheetData></worksheet>"""
      .getBytes("UTF-8"))
    z.closeEntry(); z.close()
    // direct parse: an Iterator whose partial consumption reads only the
    // head of the sheet — the materializing form would have built all
    // 5000 rows before returning
    val it = Excel.parseWorkbook(
      () => new java.io.FileInputStream(s"$dir/big.xlsx"))
    val head = it.take(3).toSeq
    assert(head.map(_.apply(0).get) === Seq("1", "2", "3"))
    // and the full DataFrame path streams through every row
    val df = Excel.readXlsx(spark, s"$dir/big.xlsx",
      StructType(Seq(StructField("a", IntegerType))), header = false)
    assert(df.count() === 5000)
    assert(df.agg(org.apache.spark.sql.functions.sum("a")).collect()
      .head.getLong(0) === 5000L * 5001 / 2)
  }

  test("workbook without a sheet fails fast") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx-bad").toString
    val z = new ZipOutputStream(new FileOutputStream(s"$dir/bad.xlsx"))
    z.putNextEntry(new ZipEntry("xl/sharedStrings.xml"))
    z.write("""<?xml version="1.0"?><sst/>""".getBytes("UTF-8"))
    z.closeEntry(); z.close()
    intercept[Exception] {
      Excel.readXlsx(spark, s"$dir/bad.xlsx", schema).collect()
    }
  }
}
