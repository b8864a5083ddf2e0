package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FHIR R4 ingestion — the last format the reference declares but never
  * implements (`fhir` in its format list, healthcare-data-pipeline-main
  * .py:139; `fhir.resources` dep, healthcare-pipeline-requirements
  * .txt:25; no FHIR code exists anywhere in the reference).
  *
  * FHIR R4 resources are plain JSON (the public HL7 FHIR R4 spec), so
  * no new dependency is needed — this is the [[Formats]] declared-schema
  * + quarantine contract specialized to the two shapes FHIR data
  * arrives in:
  *
  *   - **Bundles** ([[readBundles]]): one JSON document per file,
  *     `{"resourceType":"Bundle","entry":[{"resource":{...}},...]}` —
  *     the search-response / transaction export shape. A whole-document
  *     read is NOT line-splittable, so parallelism is per-file; fine
  *     for bundle feeds (thousands of small files), wrong for bulk.
  *   - **NDJSON** ([[readNdjson]]): one resource per line — the FHIR
  *     Bulk Data Access export format and the scale path: splittable,
  *     so a 100 TB export scans with full cluster parallelism.
  *
  * Both take a DECLARED resource schema (production reads never infer —
  * SURVEY.md §1.3) and keep the [[Formats]] malformed-row policy:
  * `failFast=true` aborts on the first malformed document/line or
  * non-Bundle root (load-gate semantics); `failFast=false` quarantines
  * the raw document/line text into [[Formats.CorruptCol]] for auditing
  * — including well-formed documents whose root is not a Bundle, which
  * the audit path must surface rather than silently drop. Entries whose
  * `resource.resourceType` differs from the requested one are FILTERED,
  * not errors — mixed-type bundles are the R4 norm.
  *
  * Two engine subtleties shape the implementation (learned the hard
  * way, kept as contract):
  *
  *   - The failFast non-Bundle gate lives INSIDE the expression that
  *     feeds the explode, not in a separate filter: Spark's JSON scan
  *     pushes inferred `IsNotNull(entry)` filters into the parser
  *     (spark.sql.json.filterPushdown.enabled), which would skip the
  *     offending document before a standalone raise_error filter ever
  *     evaluated it — silently yielding 0 rows instead of failing.
  *   - The quarantine path parses via `from_json` over a text scan
  *     (whole-file for bundles, per-line for NDJSON) rather than the
  *     native JSON reader: the native reader forbids queries that
  *     reference only its internal corrupt column
  *     (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is precisely what an
  *     audit `filter(CorruptCol.isNotNull).count()` does. With
  *     `from_json` the corrupt column is an ordinary derived column and
  *     every audit query works; a corrupt-record field in the parse
  *     schema + `columnNameOfCorruptRecord` reproduces the native
  *     PERMISSIVE semantics exactly.
  *
  * [[patientSchema]] / [[observationSchema]] are convenience subsets of
  * the public R4 resource definitions; callers with richer profiles
  * declare their own StructType and pass it in.
  */
object Fhir {

  /** R4 Patient subset (public spec: Patient.id/gender/birthDate/
    * active/name[]). Extend per profile as needed. */
  val patientSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("active", BooleanType),
    StructField("gender", StringType),
    StructField("birthDate", StringType), // FHIR date: partial dates legal ("1974", "1974-12")
    StructField("name", ArrayType(StructType(Seq(
      StructField("use", StringType),
      StructField("family", StringType),
      StructField("given", ArrayType(StringType))))))))

  /** R4 Observation subset (status/code.coding[]/subject.reference/
    * effectiveDateTime/valueQuantity). */
  val observationSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("status", StringType),
    StructField("code", StructType(Seq(
      StructField("coding", ArrayType(StructType(Seq(
        StructField("system", StringType),
        StructField("code", StringType),
        StructField("display", StringType)))))))),
    StructField("subject", StructType(Seq(
      StructField("reference", StringType)))),
    StructField("effectiveDateTime", StringType),
    StructField("valueQuantity", StructType(Seq(
      StructField("value", DoubleType),
      StructField("unit", StringType))))))

  /** The resource struct with `resourceType` present for filtering —
    * appended only if the caller's schema doesn't already declare it. */
  private def withResourceType(resourceSchema: StructType): StructType =
    if (resourceSchema.fieldNames.contains("resourceType")) resourceSchema
    else resourceSchema.add(StructField("resourceType", StringType))

  /** Bundle wrapper schema around a declared resource schema. */
  def bundleSchema(resourceSchema: StructType): StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("type", StringType),
    StructField("entry", ArrayType(StructType(Seq(
      StructField("fullUrl", StringType),
      StructField("resource", withResourceType(resourceSchema))))))))

  private val permissiveOpts = Map(
    "mode" -> "PERMISSIVE",
    "columnNameOfCorruptRecord" -> Formats.CorruptCol)

  /** Read FHIR R4 bundle files and return one row per entry of the
    * requested `resourceType`, columns = `fullUrl` plus the declared
    * resource schema (plus [[Formats.CorruptCol]] when
    * `failFast=false`). See class doc for the failFast/quarantine
    * policy and parallelism caveats.
    */
  def readBundles(spark: SparkSession, path: String, resourceType: String,
                  resourceSchema: StructType,
                  failFast: Boolean = true): DataFrame = {
    val schema = bundleSchema(resourceSchema)
    val entryType = schema("entry").dataType
    val cols = resourceSchema.fieldNames.toSeq
      .map(f => col(s"e.resource.`$f`").as(f))
    if (failFast) {
      val bundles = spark.read.option("multiLine", "true")
        .option("mode", "FAILFAST").schema(schema).json(path)
      // Load gate folded into the entry expression (see class doc): a
      // well-formed document whose root is not a Bundle fails the read
      // rather than contributing 0 rows. A Bundle with NO entry key is
      // LEGAL (the R4 norm for a zero-match searchset / empty export
      // page, total=0) — explode of the null array emits nothing, so
      // the file contributes zero rows instead of killing the batch.
      val gatedEntries = when(
        not(col("resourceType") <=> lit("Bundle")),
        raise_error(concat(
          lit("FHIR load gate: file root is not a Bundle (resourceType="),
          coalesce(col("resourceType"), lit("null")),
          lit(")"))).cast(entryType))
        .otherwise(col("entry"))
      bundles
        .select(explode(gatedEntries).as("e"))
        .filter(col("e.resource.resourceType") === lit(resourceType))
        .select(col("e.fullUrl").as("fullUrl") +: cols: _*)
    } else {
      // Whole-file text scan + from_json (see class doc). Quarantined
      // rows carry the complete document text; their resource columns
      // are null (explode_outer emits exactly one row for them).
      val parseSchema = StructType(schema.fields :+
        StructField(Formats.CorruptCol, StringType))
      // entry-null is NOT bad: a Bundle without entries is the legal
      // empty searchset/export page — it yields zero rows (the
      // explode_outer row's null resource fails the type filter below)
      val bad =
        col(s"b.`${Formats.CorruptCol}`").isNotNull ||
        not(col("b.resourceType") <=> lit("Bundle"))
      spark.read.option("wholetext", "true").text(path)
        .select(from_json(col("value"), parseSchema, permissiveOpts).as("b"),
          col("value"))
        .select(
          explode_outer(when(bad, lit(null).cast(entryType))
            .otherwise(col("b.entry"))).as("e"),
          when(bad, col("value")).as(Formats.CorruptCol))
        .filter(col(Formats.CorruptCol).isNotNull ||
          col("e.resource.resourceType") === lit(resourceType))
        .select((col("e.fullUrl").as("fullUrl") +: cols) :+
          col(Formats.CorruptCol): _*)
    }
  }

  /** Read a FHIR Bulk Data NDJSON export (one resource per line) of one
    * resource type. Splittable — the 100 TB path. Lines of other
    * resource types are filtered; malformed lines follow the
    * failFast/quarantine policy.
    */
  def readNdjson(spark: SparkSession, path: String, resourceType: String,
                 resourceSchema: StructType,
                 failFast: Boolean = true): DataFrame = {
    val schema = withResourceType(resourceSchema)
    if (failFast)
      spark.read.option("mode", "FAILFAST").schema(schema).json(path)
        .filter(col("resourceType") === lit(resourceType))
        .select(resourceSchema.fieldNames.toSeq.map(f => col(s"`$f`")): _*)
    else {
      val parseSchema = schema.add(StructField(Formats.CorruptCol, StringType))
      spark.read.text(path)
        .select(from_json(col("value"), parseSchema, permissiveOpts).as("r"))
        .filter(col(s"r.`${Formats.CorruptCol}`").isNotNull ||
          col("r.resourceType") === lit(resourceType))
        .select(resourceSchema.fieldNames.toSeq
          .map(f => col(s"r.`$f`").as(f)) :+
          col(s"r.`${Formats.CorruptCol}`").as(Formats.CorruptCol): _*)
    }
  }
}
