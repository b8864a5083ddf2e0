package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only (like [[PlanDump]]): materialize an N× scale-up of a
  * testdata `documents` table for empirical scaling runs.
  *
  * Each copy gets disjoint doc_ids AND a per-copy token namespace
  * (every token prefixed `c<i>_`), so copies share no tokens: the
  * near-dup/gram structure of the corpus is replicated per copy
  * instead of creating millions of artificial cross-copy duplicates —
  * the workload's CHARACTER stays fixed while its volume scales,
  * which is what a scaling curve must hold constant.
  *
  * Usage: runMain graft.ScaleGen <srcSfDir> <destDir> <factor>
  * (writes `<destDir>/documents.parquet`; the text-family queries
  * read only the documents table, so the scaled dir serves
  * q40-q46/q51/q55/q61+/q72/q83-q98 via SPARK_GRAFT_SF_DIR.)
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, destDir, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, srcDir, "documents")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val copies = (0 until factor).map { i =>
      docs.select(
        (col("doc_id") + lit(i * maxId)).as("doc_id"),
        // per-copy token namespace: prefix every token
        concat(lit(s"c${i}_"),
          regexp_replace(col("text"), " ", s" c${i}_")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    copies.reduce(_ unionByName _)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$destDir/documents.parquet")
    spark.stop()
  }
}
