package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._
import org.apache.spark.SparkException

/** [[Hl7]] — the v2 pipe-and-hat encoding rules must hold: MSH's
  * off-by-one field numbering, components/repetitions/subcomponents,
  * delimiter escapes, NULL for absent positions, FAILFAST on values
  * that don't convert, one row per repeating segment when asked.
  */
class Hl7Spec extends SparkSpec {

  private val Msg1 =
    "MSH|^~\\&|LAB|FAC|EHR|HOSP|20240101120000||ORU^R01|MSG0001|P|2.5.1\r" +
    "PID|1||12345~67890||Smith^John^Q||19800115|M\r" +
    "OBX|1|NM|GLU^Glucose||98.5|mg/dL|70-110|N|||F\r" +
    "OBX|2|NM|HGB^Hemoglobin||13.2|g/dL|12-16|N|||F\r"

  private val Msg2 =
    "MSH|^~\\&|LAB|FAC|EHR|HOSP|20240102080000||ORU^R01|MSG0002|P|2.5.1\r" +
    "PID|1||55555||Doe^Jane|||F\r" +
    "OBX|1|NM|GLU^Glucose||101.25|mg/dL|70-110|H|||F\r"

  private def writeFeed(msgs: String*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-hl7")
    msgs.zipWithIndex.foreach { case (m, i) =>
      java.nio.file.Files.writeString(dir.resolve(s"feed$i.hl7"), m)
    }
    dir.toString
  }

  private val labFields = Seq(
    Hl7.Hl7Field("msg_id", "MSH-10", StringType),
    Hl7.Hl7Field("msg_type", "MSH-9.1", StringType),
    Hl7.Hl7Field("msg_ts", "MSH-7", TimestampType),
    Hl7.Hl7Field("patient_id", "PID-3", StringType),
    Hl7.Hl7Field("family_name", "PID-5.1", StringType),
    Hl7.Hl7Field("given_name", "PID-5.2", StringType),
    Hl7.Hl7Field("birth_date", "PID-7", DateType),
    Hl7.Hl7Field("test_code", "OBX-3.1", StringType),
    Hl7.Hl7Field("value", "OBX-5", DoubleType),
    Hl7.Hl7Field("abnormal", "OBX-8", StringType))

  test("one row per OBX with message-level fields repeated; typed values") {
    val df = Hl7.readHl7(spark, writeFeed(Msg1, Msg2), labFields,
      repeatSegment = Some("OBX"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(7), r.getDouble(8))).toSet
    assert(rows === Set(
      ("MSG0001", "GLU", 98.5), ("MSG0001", "HGB", 13.2), ("MSG0002", "GLU", 101.25)))
    val m1 = df.filter(df("msg_id") === "MSG0001").collect().head
    assert(m1.getAs[String]("msg_type") === "ORU")
    assert(m1.getAs[java.sql.Timestamp]("msg_ts").toString === "2024-01-01 12:00:00.0")
    assert(m1.getAs[String]("patient_id") === "12345") // first repetition of 12345~67890
    assert(m1.getAs[String]("family_name") === "Smith")
    assert(m1.getAs[String]("given_name") === "John")
    assert(m1.getAs[java.sql.Date]("birth_date").toString === "1980-01-15")
  }

  test("absent positions are NULL (positional optionality)") {
    val df = Hl7.readHl7(spark, writeFeed(Msg2), labFields,
      repeatSegment = Some("OBX"))
    val r = df.collect().head
    assert(r.isNullAt(r.fieldIndex("birth_date"))) // PID-7 empty
    assert(r.getAs[String]("family_name") === "Doe")
  }

  test("MSH off-by-one: MSH-1 is the separator, MSH-2 the encoding chars") {
    val df = Hl7.readHl7(spark, writeFeed(Msg1), Seq(
      Hl7.Hl7Field("sep", "MSH-1", StringType),
      Hl7.Hl7Field("enc", "MSH-2", StringType),
      Hl7.Hl7Field("app", "MSH-3", StringType)))
    val r = df.collect().head
    assert((r.getString(0), r.getString(1), r.getString(2)) === ("|", "^~\\&", "LAB"))
  }

  test("delimiter escapes decode last") {
    val msg =
      "MSH|^~\\&|A|B|C|D|20240101000000||ADT^A01|M1|P|2.5.1\r" +
      "PID|1||X||Left\\F\\Right\\S\\Up\\T\\Amp\\R\\Tilde\\E\\Back\r"
    val df = Hl7.readHl7(spark, writeFeed(msg), Seq(
      Hl7.Hl7Field("name", "PID-5", StringType)))
    assert(df.collect().head.getString(0) === "Left|Right^Up&Amp~Tilde\\Back")
  }

  test("escaped-escape adjacency decodes correctly (\\E\\F\\E\\ is a literal \\F\\)") {
    val msg =
      "MSH|^~\\&|A|B|C|D|20240101000000||ADT^A01|M1|P|2.5.1\r" +
      "PID|1||X||a\\E\\F\\E\\b\r"
    val df = Hl7.readHl7(spark, writeFeed(msg), Seq(
      Hl7.Hl7Field("name", "PID-5", StringType)))
    assert(df.collect().head.getString(0) === "a\\F\\b")
  }

  test("message-declared delimiters override ^~\\& (MSH-2 is authoritative)") {
    // components on '@', repetitions on '%', escape '!', subcomponents '#'
    val msg =
      "MSH|@%!#|A|B|C|D|20240101000000||ADT@A01|M1|P|2.5.1\r" +
      "PID|1||one%two||Smith@John!F!Jr\r"
    val df = Hl7.readHl7(spark, writeFeed(msg), Seq(
      Hl7.Hl7Field("msg_type", "MSH-9.1", StringType),
      Hl7.Hl7Field("pid", "PID-3", StringType),
      Hl7.Hl7Field("family", "PID-5.1", StringType),
      Hl7.Hl7Field("given", "PID-5.2", StringType)))
    val r = df.collect().head
    assert(r.getString(0) === "ADT")
    assert(r.getString(1) === "one") // first '%' repetition
    assert(r.getString(2) === "Smith")
    assert(r.getString(3) === "John|Jr") // '!F!' decodes to the field sep
  }

  test("DTM offsets shift to the true instant; bare values are UTC") {
    val msg =
      "MSH|^~\\&|A|B|C|D|20240101120000+0500||ORU^R01|M1|P|2.5.1\r" +
      "PID|1||X\r"
    val df = Hl7.readHl7(spark, writeFeed(msg), Seq(
      Hl7.Hl7Field("ts", "MSH-7", TimestampType)))
    val got = df.collect().head.getAs[java.sql.Timestamp]("ts")
    // 12:00 at +05:00 is 07:00Z — compare instants, not rendered strings
    assert(got.toInstant === java.time.Instant.parse("2024-01-01T07:00:00Z"))
  }

  test("a message with zero repeat-segment occurrences keeps its row (NULL repeats)") {
    val noObx =
      "MSH|^~\\&|LAB|FAC|EHR|HOSP|20240103090000||ORU^R01|MSG0003|P|2.5.1\r" +
      "PID|1||77777||Poe^Edgar\r"
    val df = Hl7.readHl7(spark, writeFeed(Msg1, noObx), labFields,
      repeatSegment = Some("OBX"))
    assert(df.count() === 3) // 2 OBX rows from Msg1 + 1 NULL-repeat row
    val r = df.filter(df("msg_id") === "MSG0003").collect().head
    assert(r.getAs[String]("family_name") === "Poe")
    assert(r.isNullAt(r.fieldIndex("test_code")))
    assert(r.isNullAt(r.fieldIndex("value")))
  }

  test("DTM with invalid precision fails instead of fabricating a time") {
    // 9 digits: padding would invent 10:00:00 — must FAILFAST
    val bad =
      "MSH|^~\\&|A|B|C|D|202401011||ORU^R01|M1|P|2.5.1\r" +
      "PID|1||X\r"
    intercept[SparkException] {
      Hl7.readHl7(spark, writeFeed(bad), Seq(
        Hl7.Hl7Field("ts", "MSH-7", TimestampType))).collect()
    }
    // 10 digits (yyyyMMddHH) is legal precision
    val ok =
      "MSH|^~\\&|A|B|C|D|2024010112||ORU^R01|M1|P|2.5.1\r" +
      "PID|1||X\r"
    val got = Hl7.readHl7(spark, writeFeed(ok), Seq(
      Hl7.Hl7Field("ts", "MSH-7", TimestampType))).collect().head
      .getAs[java.sql.Timestamp]("ts")
    assert(got.toInstant === java.time.Instant.parse("2024-01-01T12:00:00Z"))
  }

  test("FAILFAST: unconvertible value and pre-MSH garbage fail the read") {
    val bad =
      "MSH|^~\\&|A|B|C|D|20240101000000||ORU^R01|M1|P|2.5.1\r" +
      "OBX|1|NM|GLU^G||not-a-number|mg/dL\r"
    intercept[SparkException] {
      Hl7.readHl7(spark, writeFeed(bad), Seq(
        Hl7.Hl7Field("v", "OBX-5", DoubleType))).collect()
    }
    intercept[SparkException] {
      Hl7.readHl7(spark, writeFeed("PID|1||X\rMSH|^~\\&|A\r"), Seq(
        Hl7.Hl7Field("v", "PID-1", StringType))).collect()
    }
  }

  test("without repeatSegment: one row per message, first OBX wins") {
    val df = Hl7.readHl7(spark, writeFeed(Msg1, Msg2), labFields)
    assert(df.count() === 2)
    val m1 = df.filter(df("msg_id") === "MSG0001").collect().head
    assert(m1.getAs[String]("test_code") === "GLU")
  }

  test("bad path spec is rejected eagerly") {
    intercept[IllegalArgumentException] {
      Hl7.readHl7(spark, "/nonexistent", Seq(
        Hl7.Hl7Field("x", "pid5", StringType)))
    }
  }

  test("repeatField explodes ~-repetitions: one row per patient identifier") {
    val df = Hl7.readHl7(spark, writeFeed(Msg1), Seq(
      Hl7.Hl7Field("msg_id", "MSH-10", StringType),
      Hl7.Hl7Field("patient_id", "PID-3", StringType),
      Hl7.Hl7Field("family_name", "PID-5.1", StringType)),
      repeatField = Some("PID-3"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // PID-3 is 12345~67890: two rows, message-level fields repeated onto each
    assert(rows.toSet === Set(
      ("MSG0001", "12345", "Smith"), ("MSG0001", "67890", "Smith")))
  }

  test("repeatField composes with repeatSegment and reads components per repetition") {
    // two OBX segments; the first has a 2-repetition OBX-5 with components
    val msg =
      "MSH|^~\\&|LAB|FAC|EHR|HOSP|20240101120000||ORU^R01|M1|P|2.5.1\r" +
      "PID|1||X\r" +
      "OBX|1|CE|ORG^Organism||STREP^Streptococcus~STAPH^Staphylococcus|\r" +
      "OBX|2|CE|ORG^Organism||ECOLI^Escherichia|\r"
    val df = Hl7.readHl7(spark, writeFeed(msg), Seq(
      Hl7.Hl7Field("set_id", "OBX-1", IntegerType),
      Hl7.Hl7Field("code", "OBX-5.1", StringType),
      Hl7.Hl7Field("name", "OBX-5.2", StringType)),
      repeatSegment = Some("OBX"), repeatField = Some("OBX-5"))
    val rows = df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(rows.toSet === Set(
      (1, "STREP", "Streptococcus"), (1, "STAPH", "Staphylococcus"),
      (2, "ECOLI", "Escherichia")))
  }

  test("repeatField with an absent field keeps one NULL row; component paths rejected") {
    val df = Hl7.readHl7(spark, writeFeed(Msg2), Seq(
      Hl7.Hl7Field("msg_id", "MSH-10", StringType),
      Hl7.Hl7Field("mother", "PID-21", StringType)), // absent in Msg2
      repeatField = Some("PID-21"))
    val r = df.collect()
    assert(r.length === 1 && r.head.getString(0) === "MSG0002" && r.head.isNullAt(1))
    intercept[IllegalArgumentException] {
      Hl7.readHl7(spark, "/nonexistent", Seq(
        Hl7.Hl7Field("x", "PID-5.1", StringType)), repeatField = Some("PID-5.1"))
    }
  }

  test("strict charset: 8-bit bytes fail UTF-8 but decode with the declared charset") {
    val msg =
      "MSH|^~\\&|A|B|C|D|20240101000000||ADT^A01|M1|P|2.5.1\r" +
      "PID|1||X||André\r"
    val dir = java.nio.file.Files.createTempDirectory("graft-hl7-cs")
    java.nio.file.Files.write(dir.resolve("feed.hl7"),
      msg.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val fields = Seq(Hl7.Hl7Field("name", "PID-5", StringType))
    intercept[SparkException] { // 0xE9 is not valid UTF-8: FAILFAST, not U+FFFD
      Hl7.readHl7(spark, dir.toString, fields).collect()
    }
    val got = Hl7.readHl7(spark, dir.toString, fields, charset = "ISO-8859-1")
      .collect().head.getString(0)
    assert(got === "André")
    intercept[Exception] { // bad charset name fails at call time, driver-side
      Hl7.readHl7(spark, dir.toString, fields, charset = "no-such-charset")
    }
  }

  test("DTM fractional seconds survive; trailing garbage is rejected") {
    val frac =
      "MSH|^~\\&|A|B|C|D|20240101120000.25+0500||ORU^R01|M1|P|2.5.1\r" +
      "PID|1||X\r"
    val got = Hl7.readHl7(spark, writeFeed(frac), Seq(
      Hl7.Hl7Field("ts", "MSH-7", TimestampType))).collect().head
      .getAs[java.sql.Timestamp]("ts")
    assert(got.toInstant === java.time.Instant.parse("2024-01-01T07:00:00.250Z"))
    val garbage =
      "MSH|^~\\&|A|B|C|D|20240101120000Z||ORU^R01|M1|P|2.5.1\r" +
      "PID|1||X\r"
    intercept[SparkException] { // 'Z' is not HL7's ±zzzz: reject, don't truncate
      Hl7.readHl7(spark, writeFeed(garbage), Seq(
        Hl7.Hl7Field("ts", "MSH-7", TimestampType))).collect()
    }
    val badDate = // a DATE column also validates the whole value
      "MSH|^~\\&|A|B|C|D|20240101||ORU^R01|M1|P|2.5.1\r" +
      "PID|1||X||Y||19800115x\r"
    intercept[SparkException] {
      Hl7.readHl7(spark, writeFeed(badDate), Seq(
        Hl7.Hl7Field("dob", "PID-7", DateType))).collect()
    }
  }
}
