package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Fixed-width flat-file ingestion — the mainframe/EDI feed shape
  * healthcare clearinghouses still emit (the reference's domain
  * ingests CSV/Excel; a column-position layout is the missing sibling
  * every hospital interface engine eventually meets). A layout is a
  * list of (name, start, width, type) column specs over 1-based
  * character positions; records are newline-delimited lines.
  *
  * Strict by default, like every Formats connector: a line shorter
  * than the layout requires, or a field that does not parse under its
  * declared type, fails the task — a silent partial load is the
  * billing-data failure mode this family refuses. `lenient = true`
  * downgrades short-line/parse failures to NULL fields for
  * explicit-quarantine flows.
  *
  * Scale design: the file is read by Spark's text source (splittable
  * at newline boundaries — unlike xlsx/gzip, fixed-width parallelizes
  * WITHIN a file), and every field is a `substring` + cast COLUMN
  * EXPRESSION — whole-stage codegen, no per-line closure, no Row
  * boxing. Trailing-space trimming is rtrim (the COBOL PIC X
  * convention); numeric fields also ltrim (right-justified zoned
  * numerics).
  */
object FixedWidth {

  /** One column of the layout: 1-based `start`, `width` chars. */
  final case class Col(name: String, start: Int, width: Int,
                       dataType: DataType = StringType)

  /** Read `path` (file/directory/glob of newline-delimited fixed-width
    * text) under `layout`.
    */
  def read(spark: SparkSession, path: String, layout: Seq[Col],
           lenient: Boolean = false): DataFrame = {
    require(layout.nonEmpty, "fixed-width layout is empty")
    layout.foreach { c =>
      require(c.start >= 1 && c.width >= 1,
        s"column ${c.name}: start/width must be positive (1-based)")
    }
    val minLen = layout.map(c => c.start + c.width - 1).max
    val raw = spark.read.textFile(path).toDF("line")
    val checked =
      if (lenient) raw
      else raw.withColumn("line",
        when(length(col("line")) >= minLen, col("line")).otherwise(
          raise_error(concat(lit(s"fixed-width record shorter than layout ($minLen chars): '"),
            col("line"), lit("'")))))
    val fields = layout.map { c =>
      val slice = rtrim(substring(col("line"), c.start, c.width))
      val v: Column = c.dataType match {
        case StringType => slice
        case _ =>
          val t = ltrim(slice)
          // try_cast, not cast: ANSI sessions throw inside cast before
          // the strict/lenient policy here can decide
          val cast = when(t === "", lit(null)).otherwise(t).try_cast(c.dataType)
          if (lenient) cast
          else when(t =!= "" && cast.isNull,
            raise_error(concat(lit(s"fixed-width field ${c.name} failed ${c.dataType.simpleString} parse: '"),
              t, lit("'")))).otherwise(cast)
      }
      v.as(c.name)
    }
    checked.select(fields: _*)
  }
}
