package graft.sources

import graft.SparkSpec
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericDatumWriter, GenericRecord, GenericRecordBuilder}
import org.apache.spark.sql.types._

/** [[Avro]] against container files written with avro-core itself:
  * typed roundtrip (including the nullable union and int→long
  * widening) and the strict missing-field contract.
  */
class AvroSpec extends SparkSpec {

  private def writeContainer(dir: java.nio.file.Path, name: String,
                             schema: Schema,
                             recs: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, dir.resolve(name).toFile)
    recs.foreach(w.append)
    w.close()
  }

  test("typed roundtrip with nullable union and int widening") {
    val avroSchema = SchemaBuilder.record("ev").fields()
      .requiredInt("id")
      .requiredString("name")
      .optionalDouble("score")
      .endRecord()
    val dir = java.nio.file.Files.createTempDirectory("avrospec")
    def rec(id: Int, name: String, score: java.lang.Double) = {
      val b = new GenericRecordBuilder(avroSchema)
        .set("id", id).set("name", name)
      (if (score == null) b else b.set("score", score)).build()
    }
    writeContainer(dir, "a.avro", avroSchema,
      Seq(rec(1, "x", 1.5), rec(2, "y", null)))
    writeContainer(dir, "b.avro", avroSchema, Seq(rec(3, "z", -2.0)))

    val got = Avro.readAvro(spark, dir.toString + "/*.avro", StructType(Seq(
        StructField("id", LongType, nullable = false), // int -> long widening
        StructField("name", StringType, nullable = false),
        StructField("score", DoubleType, nullable = true))))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(got == Set((1L, "x", Some(1.5)), (2L, "y", None),
      (3L, "z", Some(-2.0))))
  }

  test("a declared field missing from the container fails loudly") {
    val avroSchema = SchemaBuilder.record("ev").fields()
      .requiredInt("id").endRecord()
    val dir = java.nio.file.Files.createTempDirectory("avrospec2")
    writeContainer(dir, "a.avro", avroSchema,
      Seq(new GenericRecordBuilder(avroSchema).set("id", 1).build()))
    val ex = intercept[org.apache.spark.SparkException] {
      Avro.readAvro(spark, dir.toString + "/*.avro", StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("absent", StringType, nullable = true))))
        .collect()
    }
    assert(ex.getMessage.contains("lacks declared field") ||
      Option(ex.getCause).exists(_.getMessage.contains("lacks declared field")))
  }
}
