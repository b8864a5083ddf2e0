package graft.text

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._

/** q96's scale form: the gram⋈df full join is replaced by a semi-join
  * of the exploded gram stream against the df≥2 key set (per-doc `m`
  * needs no join — it is `size(tk) − 7`). These are the receipts: the
  * plan really is a semi-join, the probe side really drops (most grams
  * are df=1), and the result is identical to the naive full-join
  * formulation the DuckDB oracle still states.
  */
class DupGramSpec extends SparkSpec {
  import spark.implicits._

  private val gramExpr = TextQueries.gramHashArr

  test("q96 reaches the per-doc aggregate through a df>=2 semi-join whose probe side drops") {
    // AQE off: a static plan whose nodes carry metrics we can read back
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val f = SparkEntry.queries("q96_dupgram_coverage")(spark, SparkSpec.Sf0001)
      val plan = f.queryExecution.executedPlan
      val semis = plan.collect {
        case j: BaseJoinExec if j.joinType == LeftSemi &&
          j.leftKeys.exists(_.references.exists(_.name == "gh")) => j
      }
      assert(semis.size === 1, plan.toString.take(3000))
      assert(f.collect().nonEmpty)

      // independent ground truth: total gram positions vs duplicated ones
      val toks = Tables.load(spark, SparkSpec.Sf0001, "documents")
        .select($"doc_id", split($"text", " ").as("tk"))
        .filter(size($"tk") >= 8)
      val grams = toks.select($"doc_id", explode(gramExpr).as("gh")).cache()
      val total = grams.count()
      val dupPositions = grams.join(
          grams.groupBy($"gh").agg(countDistinct($"doc_id").as("df"))
            .filter($"df" >= 2).select($"gh"),
          Seq("gh"), "left_semi")
        .count()
      grams.unpersist()

      // the corpus does contain cross-doc duplication, yet the long
      // tail dominates: the semi filter drops most of the probe side
      assert(dupPositions > 0, "sf0.001 has no duplicated grams — dead receipt")
      assert(dupPositions < total / 2,
        s"probe side did not drop: $dupPositions of $total positions survive")
      // and the join's own metric agrees: exactly the duplicated
      // positions flow on toward the per-doc aggregate
      assert(semis.head.metrics("numOutputRows").value === dupPositions)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q96 degrades to a shuffled semi-join when the key set outgrows broadcast") {
    // the 100 TB story: when the df>=2 key set cannot broadcast, the
    // semi filter must survive as a shuffled (skew-splittable) join
    // with identical results — simulate by disabling broadcast
    val confs = Map("spark.sql.autoBroadcastJoinThreshold" -> "-1",
                    "spark.sql.adaptive.enabled" -> "false")
    val prev = confs.keys.map(k => k -> spark.conf.get(k)).toMap
    val broadcasted = SparkEntry.queries("q96_dupgram_coverage")(
      spark, SparkSpec.Sf0001).collect().map(_.toSeq).toSeq
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      spark.catalog.clearCache()
      val f = SparkEntry.queries("q96_dupgram_coverage")(spark, SparkSpec.Sf0001)
      val plan = f.queryExecution.executedPlan
      val semis = plan.collect {
        case j: BaseJoinExec if j.joinType == LeftSemi &&
          j.leftKeys.exists(_.references.exists(_.name == "gh")) => j
      }
      assert(semis.size === 1, plan.toString.take(2000))
      assert(!semis.head.getClass.getSimpleName.contains("Broadcast"),
        s"still broadcasting: ${semis.head.getClass.getSimpleName}")
      assert(f.collect().map(_.toSeq).toSeq === broadcasted)
    } finally {
      prev.foreach { case (k, v) => spark.conf.set(k, v) }
      spark.catalog.clearCache()
    }
  }

  test("q96 semi-join form equals the naive full-join formulation") {
    val toks = Tables.load(spark, SparkSpec.Sf0001, "documents")
      .select($"doc_id", $"source", split($"text", " ").as("tk"))
      .filter(size($"tk") >= 8)
      .cache()
    val grams = toks
      .select($"doc_id", $"source", explode(gramExpr).as("gh")).cache()
    val dfreq = grams.groupBy($"gh").agg(countDistinct($"doc_id").as("df"))
    val naive = grams.join(dfreq, Seq("gh"))
      .groupBy($"doc_id", $"source")
      .agg(count(lit(1)).as("m"), count_if($"df" >= 2).as("ndup"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        count_if($"ndup" * 5 >= $"m").as("n_contaminated"),
        sum($"ndup").as("n_dup_grams"),
        sum($"m").as("n_grams"))
      .withColumn("dup_rate", $"n_dup_grams" * 1.0 / $"n_grams")
      .orderBy($"source")
      .collect().map(_.toSeq).toSeq
    Seq(toks, grams).foreach(_.unpersist())
    val mine = SparkEntry.queries("q96_dupgram_coverage")(spark, SparkSpec.Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(mine === naive)
  }
}
