package graft.sources

import graft.SparkSpec
import org.apache.spark.SparkException
import java.nio.file.{Files, Path}

/** [[Fhir]]: declared-schema R4 bundle + NDJSON ingestion — typed
  * extraction of the requested resource type from mixed bundles,
  * load-gate failure on malformed/non-Bundle input, and quarantine of
  * bad documents on the audit path (the [[Formats]] contract).
  */
class FhirSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // Hand-built R4 bundle: two Patients + one Observation, the
  // search-response shape from the public FHIR R4 spec.
  private val bundleJson =
    """{
      |  "resourceType": "Bundle",
      |  "type": "searchset",
      |  "entry": [
      |    {"fullUrl": "urn:p1", "resource": {
      |      "resourceType": "Patient", "id": "p1", "active": true,
      |      "gender": "female", "birthDate": "1974-12-25",
      |      "name": [{"use": "official", "family": "Chalmers",
      |                "given": ["Alice", "M"]}]}},
      |    {"fullUrl": "urn:p2", "resource": {
      |      "resourceType": "Patient", "id": "p2", "active": false,
      |      "gender": "male", "birthDate": "1982-03"}},
      |    {"fullUrl": "urn:o1", "resource": {
      |      "resourceType": "Observation", "id": "o1", "status": "final",
      |      "code": {"coding": [{"system": "http://loinc.org",
      |                           "code": "8867-4",
      |                           "display": "Heart rate"}]},
      |      "subject": {"reference": "Patient/p1"},
      |      "effectiveDateTime": "2020-01-01T10:30:00Z",
      |      "valueQuantity": {"value": 72.0, "unit": "beats/minute"}}}
      |  ]
      |}""".stripMargin

  test("bundle read extracts the requested resource type, typed") {
    val dir = tmp("graft-fhir")
    Files.writeString(Path.of(dir, "bundle1.json"), bundleJson)

    val patients = Fhir.readBundles(spark, dir, "Patient", Fhir.patientSchema)
    assert(patients.count() === 2)
    val p1 = patients.filter($"id" === "p1").collect()(0)
    assert(p1.getAs[String]("gender") === "female")
    assert(p1.getAs[String]("birthDate") === "1974-12-25")
    assert(p1.getAs[String]("fullUrl") === "urn:p1")
    val names = p1.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("name")
    assert(names.head.getAs[String]("family") === "Chalmers")
    assert(names.head.getAs[scala.collection.Seq[String]]("given").toSeq
      === Seq("Alice", "M"))
    // partial birthDate (month precision) survives as declared string
    val p2 = patients.filter($"id" === "p2").collect()(0)
    assert(p2.getAs[String]("birthDate") === "1982-03")

    val obs = Fhir.readBundles(spark, dir, "Observation",
      Fhir.observationSchema)
    assert(obs.count() === 1)
    val o1 = obs.collect()(0)
    assert(o1.getAs[String]("status") === "final")
    assert(o1.getAs[org.apache.spark.sql.Row]("valueQuantity")
      .getAs[Double]("value") === 72.0)
    assert(o1.getAs[org.apache.spark.sql.Row]("subject")
      .getAs[String]("reference") === "Patient/p1")
  }

  test("failFast bundle read rejects a non-Bundle root; permissive quarantines it") {
    val dir = tmp("graft-fhir-root")
    Files.writeString(Path.of(dir, "not_a_bundle.json"),
      """{"resourceType": "Patient", "id": "loose"}""")
    val ex = intercept[Exception] {
      Fhir.readBundles(spark, dir, "Patient", Fhir.patientSchema).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("FHIR load gate")))

    // audit path: the same document is surfaced, not silently dropped
    val q = Fhir.readBundles(spark, dir, "Patient", Fhir.patientSchema,
      failFast = false)
    val rows = q.collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String](Formats.CorruptCol).contains("loose"))
  }

  test("a legal empty Bundle (no entry key) yields zero rows, not a failure") {
    // the R4 norm for a zero-match searchset: entry legally omitted
    val dir = tmp("graft-fhir-empty")
    Files.writeString(Path.of(dir, "empty.json"),
      """{"resourceType": "Bundle", "type": "searchset", "total": 0}""")
    assert(Fhir.readBundles(spark, dir, "Patient", Fhir.patientSchema)
      .count() === 0)
    // and in permissive mode it is NOT quarantined — it is a valid doc
    val q = Fhir.readBundles(spark, dir, "Patient", Fhir.patientSchema,
      failFast = false)
    assert(q.count() === 0)
  }

  test("failFast bundle read rejects malformed JSON; permissive quarantines") {
    val dir = tmp("graft-fhir-bad")
    Files.writeString(Path.of(dir, "good.json"), bundleJson)
    val dirBad = tmp("graft-fhir-bad2")
    Files.writeString(Path.of(dirBad, "bad.json"),
      """{"resourceType": "Bundle", "entry": [ {"resource": {""")

    intercept[SparkException] {
      Fhir.readBundles(spark, dirBad, "Patient", Fhir.patientSchema).count()
    }

    // permissive over both files: good entries extracted, the bad
    // document lands as one quarantine row with the raw text attached
    Files.writeString(Path.of(dir, "bad.json"),
      """{"resourceType": "Bundle", "entry": [ {"resource": {""")
    val q = Fhir.readBundles(spark, dir, "Patient", Fhir.patientSchema,
      failFast = false)
    val quarantined = q.filter(org.apache.spark.sql.functions
      .col(Formats.CorruptCol).isNotNull)
    assert(quarantined.count() === 1)
    assert(q.filter($"id".isNotNull).count() === 2)
  }

  test("ndjson bulk export reads typed resources and filters other types") {
    val dir = tmp("graft-fhir-ndjson")
    Files.writeString(Path.of(dir, "export.ndjson"),
      """{"resourceType": "Patient", "id": "p1", "gender": "female", "birthDate": "1974-12-25"}
        |{"resourceType": "Observation", "id": "o1", "status": "final"}
        |{"resourceType": "Patient", "id": "p2", "gender": "male", "birthDate": "1982-03-07"}
        |""".stripMargin)
    val patients = Fhir.readNdjson(spark, dir, "Patient", Fhir.patientSchema)
    assert(patients.count() === 2)
    assert(patients.columns.toSeq === Fhir.patientSchema.fieldNames.toSeq)
    assert(patients.filter($"id" === "p2").collect()(0)
      .getAs[String]("birthDate") === "1982-03-07")
  }

  test("ndjson failFast throws on a malformed line; permissive quarantines it") {
    val dir = tmp("graft-fhir-ndbad")
    Files.writeString(Path.of(dir, "export.ndjson"),
      """{"resourceType": "Patient", "id": "p1"}
        |{not json at all
        |""".stripMargin)
    intercept[SparkException] {
      Fhir.readNdjson(spark, dir, "Patient", Fhir.patientSchema).count()
    }
    val q = Fhir.readNdjson(spark, dir, "Patient", Fhir.patientSchema,
      failFast = false)
    assert(q.filter(org.apache.spark.sql.functions
      .col(Formats.CorruptCol).isNotNull).count() === 1)
    assert(q.filter($"id" === "p1").count() === 1)
  }
}
