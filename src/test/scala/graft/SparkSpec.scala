package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM: Spark startup
  * dominates suite time otherwise. UTC + small shuffle partitions to
  * match the verified-query conventions (SURVEY.md §7.3).
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001 = "/root/testdata/sf0.01"
}

trait SparkSpec extends AnyFunSuite {
  // lazy val (not def): a stable identifier, so `import spark.implicits._`
  // works at class level in suites.
  lazy val spark: SparkSession = SparkSpec.spark
}
