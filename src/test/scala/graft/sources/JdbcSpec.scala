package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.DriverManager

/** [[Formats.readJdbc]]/[[Formats.readJdbcPartitioned]] against an
  * in-memory Derby database (the embedded JDBC driver already on
  * Spark's classpath) — closes the reference's literal `pd.read_sql`
  * ingestion surface. The partitioned read must return the same rows
  * as the single-connection read, and filters must be pushed into the
  * generated JDBC query (visible as PushedFilters in the scan).
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE patients (
          |  patient_id INT NOT NULL,
          |  gender VARCHAR(1),
          |  birth_year INT,
          |  acct_bal DOUBLE)""".stripMargin)
      val ins = conn.prepareStatement(
        "INSERT INTO patients VALUES (?, ?, ?, ?)")
      for (i <- 1 to 100) {
        ins.setInt(1, i)
        ins.setString(2, if (i % 2 == 0) "F" else "M")
        ins.setInt(3, 1940 + i % 60)
        ins.setDouble(4, i * 10.5)
        ins.executeUpdate()
      }
      st.close(); ins.close()
    } finally conn.close()
  }

  test("readJdbc round-trips rows and schema from in-memory Derby") {
    seeded
    val df = Formats.readJdbc(spark, url, "patients")
    assert(df.count() === 100)
    assert(df.columns.map(_.toLowerCase).toSet ===
      Set("patient_id", "gender", "birth_year", "acct_bal"))
    val r = df.filter($"PATIENT_ID" === 7)
      .select($"GENDER", $"BIRTH_YEAR").as[(String, Int)].head()
    assert(r === ("M", 1947))
  }

  test("readJdbcPartitioned ≡ single-partition read, with real parallelism") {
    seeded
    val part = Formats.readJdbcPartitioned(
      spark, url, "patients", "PATIENT_ID",
      lower = 1, upper = 100, numPartitions = 4)
    assert(part.rdd.getNumPartitions === 4)
    val single = Formats.readJdbc(spark, url, "patients")
    assert(part.orderBy($"PATIENT_ID").collect().toSeq ===
      single.orderBy($"PATIENT_ID").collect().toSeq)
  }

  test("predicates are pushed into the JDBC scan") {
    seeded
    val df = Formats.readJdbc(spark, url, "patients")
      .filter($"GENDER" === "F" && $"BIRTH_YEAR" >= 1980)
    assert(df.count() === df.collect().length)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PushedFilters") && scan.contains("GENDER"),
      scan.take(1000))
  }
}
