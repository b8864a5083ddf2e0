package graft.sources

import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro object-container ingestion (SURVEY §2 S2 family; the row-major
  * interchange format every Kafka/warehouse shop ships alongside the
  * csv/json/parquet the reference declares,
  * healthcare-pipeline-requirements.txt:19-21). The `spark-avro`
  * DataSource module is not on this classpath, but avro-core is — so
  * this is a from-scratch reader over the PUBLIC container spec, in
  * the house source shape ([[Excel]]/[[Warc]]): `binaryFiles` hands
  * one container per task (file-granular parallelism — the shape Avro
  * data lakes ship, many medium files), the avro `DataFileStream`
  * decodes blocks lazily, and rows convert to a DECLARED StructType —
  * schema-on-read never inferred (SURVEY §1.3), with the same strict
  * ingestion contract as the other sources: a missing field or an
  * un-coercible value fails the task loudly rather than nulling.
  *
  * Supported field shapes: boolean/int/long/float/double/string/bytes
  * and the ["null", T] nullable union (the shapes warehouse Avro
  * actually uses). Avro `int` widens to LongType and `float` to
  * DoubleType when the declared schema asks for it.
  */
object Avro {

  def readAvro(spark: SparkSession, path: String,
               schema: StructType): DataFrame = {
    val fields = schema.fields // serialized into the task closure
    val rows = spark.sparkContext
      .binaryFiles(path, spark.sparkContext.defaultParallelism)
      .flatMap { case (file, stream) =>
        val in = stream.open()
        val reader = new DataFileStream[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        // close with the task (limit/take may abandon the iterator
        // early); outside a task (unit tests), exhaustion closes it
        // below — the Excel/Warc closure stance
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => reader.close()))
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = reader.hasNext
            if (!h) reader.close()
            h
          }
          def next(): Row = convert(reader.next(), fields, file)
        }
      }
    spark.createDataFrame(rows, schema)
  }

  private[sources] def convert(rec: GenericRecord, fields: Array[StructField],
                               file: String): Row = {
    val values = fields.map { f =>
      val raw = if (rec.getSchema.getField(f.name) != null) rec.get(f.name)
      else throw new IllegalArgumentException(
        s"avro record in $file lacks declared field '${f.name}'")
      coerce(raw, f, file)
    }
    Row.fromSeq(values.toIndexedSeq)
  }

  private def coerce(raw: AnyRef, f: StructField, file: String): Any =
    (raw, f.dataType) match {
      case (null, _) =>
        if (f.nullable) null
        else throw new IllegalArgumentException(
          s"null in non-nullable field '${f.name}' ($file)")
      case (v: java.lang.Boolean, BooleanType) => v.booleanValue()
      case (v: java.lang.Integer, IntegerType) => v.intValue()
      case (v: java.lang.Integer, LongType) => v.longValue()
      case (v: java.lang.Long, LongType) => v.longValue()
      case (v: java.lang.Float, FloatType) => v.floatValue()
      case (v: java.lang.Float, DoubleType) => v.doubleValue()
      case (v: java.lang.Double, DoubleType) => v.doubleValue()
      case (v: CharSequence, StringType) => v.toString
      case (v: java.nio.ByteBuffer, BinaryType) =>
        val a = new Array[Byte](v.remaining()); v.duplicate().get(a); a
      case (v, t) => throw new IllegalArgumentException(
        s"field '${f.name}': avro ${v.getClass.getSimpleName} does not coerce to $t ($file)")
    }
}
