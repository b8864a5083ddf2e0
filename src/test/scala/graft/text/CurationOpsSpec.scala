package graft.text

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Receipts for the round-5 curation additions q99–q102: each query is
  * re-derived through an INDEPENDENT formulation (different operators,
  * same semantics) and compared row-for-row, plus the scale-shape
  * assertions the Scaladocs claim.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, SparkSpec.Sf0001, "documents")

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, SparkSpec.Sf0001)
      .collect().map(_.toSeq).toSeq

  private val gramHashArr = expr(
    """transform(sequence(1, size(tk) - 7),
      |  i -> cast(conv(substring(md5(
      |         concat_ws(' ', slice(tk, i, 8))), 1, 15), 16, 10) as bigint))""".stripMargin)

  test("q99 matches a per-position (uncompressed) surprisal formulation") {
    // independent form: score every token POSITION directly (no per-doc
    // term compression), aggregate per source off the position stream
    val pos = docs
      .select($"doc_id", $"source",
        explode(split(coalesce($"text", lit("")), " ")).as("t"))
    val cnt = pos.groupBy($"t").agg(count(lit(1)).as("cnt"))
    val total = pos.count()
    val perDoc = pos.join(cnt, Seq("t"))
      .withColumn("surp_q", expr(s"${total}L * 1000000L div cnt"))
      .groupBy($"doc_id", $"source")
      .agg(sum($"surp_q").as("ssum"), count(lit(1)).as("n_toks"))
      .withColumn("mean_q", expr("ssum div n_toks"))
    val want = perDoc.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_toks").as("n_tokens"),
        (sum($"ssum").cast("double") / sum($"n_toks")).as("mean_surprisal"),
        max(struct($"mean_q", $"doc_id")).as("w"))
      .select($"source", $"n_docs", $"n_tokens", $"mean_surprisal",
        $"w.doc_id".as("top_doc"), $"w.mean_q".as("top_doc_mean_q"))
      .orderBy($"source")
      .collect().map(_.toSeq).toSeq
    assert(rows("q99_doc_surprisal") === want)
  }

  test("q100 elects exactly one survivor per cluster and its window form agrees") {
    val out = SparkEntry.queries("q100_cluster_canonical")(spark, SparkSpec.Sf0001)
      .collect()
    assert(out.nonEmpty)
    // global invariant: total survivors == number of clusters (every
    // cluster names exactly one canonical, each doc is in one cluster)
    val survivors = out.map(r => r.getLong(r.fieldIndex("n_survivors"))).sum
    val nDocs = out.map(r => r.getLong(r.fieldIndex("n_docs"))).sum
    val edges = TextQueries.ngramJaccardPairs(spark, SparkSpec.Sf0001, t = 0.8)
    val clustered = edges.select(explode(array($"doc_a", $"doc_b")).as("d"))
      .distinct().count()
    val nClusters = edges
      .select(least($"doc_a", $"doc_b").as("a"), greatest($"doc_a", $"doc_b").as("b"))
      .collect()
      .foldLeft(Map.empty[Long, Long]) { (uf, r) =>
        // tiny driver-side union-find over sf0.001's edge list: an
        // INDEPENDENT cluster count (the query itself never collects edges)
        def find(m: Map[Long, Long], x: Long): Long =
          m.get(x).filter(_ != x).map(find(m, _)).getOrElse(x)
        val (a, b) = (find(uf, r.getAs[Long]("a")), find(uf, r.getAs[Long]("b")))
        if (a == b) uf else uf + (math.max(a, b) -> math.min(a, b))
      } match {
        case uf =>
          def find(x: Long): Long =
            uf.get(x).filter(_ != x).map(find).getOrElse(x)
          val members = edges.select(explode(array($"doc_a", $"doc_b")).as("d"))
            .distinct().as[Long].collect()
          members.map(find).distinct.length
      }
    val singletons = docs.count() - clustered
    assert(survivors === nClusters + singletons,
      s"$survivors survivors vs $nClusters clusters + $singletons singletons")
    assert(nDocs === docs.count())

    // dropped bytes are exactly total minus kept, per source
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_docs")) ===
        r.getLong(r.fieldIndex("n_survivors")) + r.getLong(r.fieldIndex("n_dropped")))
    }
  }

  test("q101 matches a lag-based island formulation") {
    val toks = docs
      .select($"doc_id", $"source", split($"text", " ").as("tk"))
      .filter(size($"tk") >= 8)
    val grams = toks
      .select($"doc_id", $"source", posexplode(gramHashArr).as(Seq("pos", "gh")))
      .cache()
    val dupKeys = grams.groupBy($"gh")
      .agg(countDistinct($"doc_id").as("df")).filter($"df" >= 2).select($"gh")
    // independent islands: a run breaks where lag(pos) != pos - 1; the
    // running sum of breaks numbers the islands (vs the query's
    // pos - row_number constant-group trick)
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val want = grams.join(dupKeys, Seq("gh"), "left_semi")
      .withColumn("brk",
        when(lag($"pos", 1).over(w) === $"pos" - 1, 0).otherwise(1))
      .withColumn("isl", sum($"brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"doc_id", $"source", $"isl")
      .agg(count(lit(1)).as("run"))
      .groupBy($"doc_id", $"source")
      .agg((max($"run") + 7).as("max_run_tokens"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs_dup"),
        max($"max_run_tokens").as("max_run_tokens"),
        count_if($"max_run_tokens" >= 16).as("n_docs_run_ge16"),
        sum($"max_run_tokens").as("sum_max_run_tokens"))
      .orderBy($"source")
      .collect().map(_.toSeq).toSeq
    grams.unpersist()
    assert(rows("q101_dup_run") === want)
  }

  test("q102 matches the naive text-carrying formulation") {
    // naive: explode actual gram STRINGS corpus-wide (fine at sf0.001,
    // the exact thing the scale form exists to avoid), rank by the same
    // (df desc, hash asc) key
    val toks = docs
      .select($"doc_id", split($"text", " ").as("tk"))
      .filter(size($"tk") >= 8)
    val g = toks.select($"doc_id", explode(expr(
        """transform(sequence(1, size(tk) - 7),
          |  i -> concat_ws(' ', slice(tk, i, 8)))""".stripMargin)).as("gram"))
      .withColumn("gh", expr(
        "cast(conv(substring(md5(gram), 1, 15), 16, 10) as bigint)"))
    val want = g.groupBy($"gram", $"gh")
      .agg(countDistinct($"doc_id").as("df"))
      .orderBy($"df".desc, $"gh".asc)
      .limit(10)
      .withColumn("rank",
        row_number().over(Window.orderBy($"df".desc, $"gh".asc)))
      .select($"rank", $"gram", $"df")
      .orderBy($"rank")
      .collect().map(_.toSeq).toSeq
    assert(rows("q102_boilerplate_grams") === want)
  }

  test("q102's corpus-wide shuffles are hash-only: strings cross only single-partition tails") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val f = SparkEntry.queries("q102_boilerplate_grams")(spark, SparkSpec.Sf0001)
      f.collect()
      val shuffles = f.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.nonEmpty)
      val stringShuffles = shuffles.filter(
        _.child.output.exists(_.dataType.catalogString.contains("string")))
      // the corpus-wide shuffles (df aggregate, exemplar election) are
      // HASH-partitioned on gh and move only longs; gram text rides only
      // the 10-row rank/sort tails (single-partition window, range sort)
      assert(stringShuffles.forall(
        !_.outputPartitioning.isInstanceOf[HashPartitioning]),
        stringShuffles.map(e =>
          s"${e.outputPartitioning} <- ${e.child.output.mkString(",")}").mkString("; "))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
