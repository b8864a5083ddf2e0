package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

/** [[FixedWidth]] — layout slicing, COBOL-style trimming, the strict
  * load gate (short lines and bad numerics fail the task), and the
  * lenient quarantine mode.
  */
class FixedWidthSpec extends SparkSpec {

  private val layout = Seq(
    FixedWidth.Col("mrn", 1, 8),
    FixedWidth.Col("name", 9, 12),
    FixedWidth.Col("age", 21, 3, IntegerType),
    FixedWidth.Col("charge", 24, 10, DoubleType))

  private def write(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-fw")
    java.nio.file.Files.write(dir.resolve("feed.txt"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    dir.toString
  }

  /** Compose a layout-aligned record: left-justified strings,
    * right-justified numerics (the zoned convention).
    */
  private def rec(mrn: String, name: String, age: String,
                  charge: String): String = {
    def lj(s: String, w: Int) = s.padTo(w, ' ')
    def rj(s: String, w: Int) = (" " * (w - s.length)) + s
    lj(mrn, 8) + lj(name, 12) + rj(age, 3) + rj(charge, 10)
  }

  test("slices columns, rtrims strings, parses right-justified numerics") {
    val d = write(Seq(
      rec("MRN00001", "Smith, Jo", "42", "1234.50"),
      rec("MRN00002", "Ng", "07", "99.99")))
    val got = FixedWidth.read(spark, d, layout)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getInt(2), r.getDouble(3))).toSet
    assert(got == Set(
      ("MRN00001", "Smith, Jo", 42, 1234.50),
      ("MRN00002", "Ng", 7, 99.99)))
  }

  test("blank numeric field is NULL, not a parse error") {
    val d = write(Seq(rec("MRN00003", "Blank", "42", "")))
    val row = FixedWidth.read(spark, d, layout).collect().head
    assert(row.getString(0) == "MRN00003" && row.getInt(2) == 42 &&
      row.isNullAt(3))
  }

  test("strict mode: a short line fails the load, not silently truncates") {
    val d = write(Seq("MRN00004TooShort"))
    val e = intercept[Exception] {
      FixedWidth.read(spark, d, layout).collect()
    }
    assert(e.getMessage != null)
  }

  test("strict mode: a non-numeric numeric field fails the load") {
    val d = write(Seq(rec("MRN00005", "BadAge", "4x", "1234.50")))
    intercept[Exception] {
      FixedWidth.read(spark, d, layout).collect()
    }
  }

  test("lenient mode quarantines instead: short lines and bad fields go NULL") {
    val d = write(Seq(
      rec("MRN00006", "Good", "42", "1234.50"),
      "MRN00007Short",
      rec("MRN00008", "BadAge", "4x", "10.00")))
    val got = FixedWidth.read(spark, d, layout, lenient = true)
      .collect().map(r => (r.getString(0), r.isNullAt(2), r.isNullAt(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      ("MRN00006", false, false),
      ("MRN00007", true, true),
      ("MRN00008", true, false)))
  }
}
