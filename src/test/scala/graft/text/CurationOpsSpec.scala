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

  // the production gram-key definition itself: the spec's independent
  // ground truths differ in OPERATOR shape (lag islands, naive text
  // explode), not in the key — a drifted copy here would vacuously pass
  private val gramHashArr = TextQueries.gramHashArr

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

  test("q103 draws EXACTLY N and its window formulation agrees") {
    val out = SparkEntry.queries("q103_stratified_sample")(spark, SparkSpec.Sf0001)
      .collect()
    // the defining property: quotas sum to exactly N, and every quota
    // was actually fillable (n_selected ≡ quota — N ≤ corpus size)
    assert(out.map(r => r.getLong(r.fieldIndex("quota"))).sum === 30L)
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_selected")) ===
        r.getLong(r.fieldIndex("quota")))
    }
    // independent selection path: plain per-source window rank (the
    // oracle's formulation) instead of DistributedRank
    val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
    val counts = docs.groupBy($"source").agg(count(lit(1)).as("n_s"))
    val tot = counts.agg(sum($"n_s")).head().getLong(0)
    val fl = counts
      .withColumn("fl", expr(s"30 * n_s div $tot"))
      .withColumn("rem", expr(s"30 * n_s % $tot"))
    val d = 30L - fl.agg(sum($"fl")).head().getLong(0)
    val quota = fl
      .withColumn("rk", row_number().over(Window.orderBy($"rem".desc, $"source".asc)))
      .select($"source", ($"fl" + when($"rk" <= d, 1L).otherwise(0L)).as("quota"))
    val want = docs.select($"doc_id", $"source").withColumn("h", expr(
        "cast(conv(substring(md5(concat('s103_', cast(doc_id as string))), 1, 15), 16, 10) as bigint)"))
      .withColumn("rn", row_number().over(w))
      .join(quota, Seq("source"))
      .filter($"rn" <= $"quota")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_selected"), sum($"doc_id").as("sel_checksum"))
      .orderBy($"source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = out.filter(_.getLong(3) > 0)
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
  }

  test("q104 matches a position-self-join bigram formulation") {
    // independent bigram derivation: join token positions on pos+1
    // instead of the transform-struct explosion
    val pos = docs
      .select($"doc_id", posexplode(split(coalesce($"text", lit("")), " "))
        .as(Seq("pos", "w")))
      .cache()
    val uni = pos.groupBy($"w").agg(count(lit(1)).as("c"))
    val tTok = pos.count()
    val big = pos.select($"doc_id", $"pos", $"w".as("w1"))
      .join(pos.select($"doc_id", ($"pos" - 1).as("pos"), $"w".as("w2")),
        Seq("doc_id", "pos"))
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c_ab"))
      .cache()
    val bBig = big.agg(sum($"c_ab")).head().getLong(0)
    val want = big.filter($"c_ab" >= 5)
      .join(uni.select($"w".as("w1"), $"c".as("c_a")), Seq("w1"))
      .join(uni.select($"w".as("w2"), $"c".as("c_b")), Seq("w2"))
      .withColumn("score", expr(
        s"""cast(cast(c_ab as decimal(38,0)) * ${tTok}L * ${tTok}L as double)
           | / cast(cast(${bBig}L as decimal(38,0)) * c_a * c_b as double)""".stripMargin))
      .orderBy($"score".desc, $"w1", $"w2").limit(20)
      .withColumn("rank", row_number()
        .over(Window.orderBy($"score".desc, $"w1", $"w2")))
      .select($"rank", $"w1", $"w2", $"c_ab", $"score")
      .orderBy($"rank")
      .collect().map(_.toSeq).toSeq
    pos.unpersist(); big.unpersist()
    assert(rows("q104_pmi_collocations") === want)
  }

  test("the quantized-log2 SQL expression matches the bit-arithmetic definition") {
    def lq(n: Long): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
      e * 1048576L + (n - (1L << e)) * 1048576L / (1L << e)
    }
    // power-of-two edges, the q105 operating range, and the documented
    // 2^43 exactness ceiling
    val vals = (1L to 4096L) ++
      Seq(1L << 20, (1L << 20) + 12345L, 987654321L, (1L << 30) - 1,
        (1L << 42) + 99999L, (1L << 43) - 1)
    val got = vals.toDF("x")
      .withColumn("l", expr(TextQueries.lqSql("x")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vals.foreach(v => assert(got(v) === lq(v), s"lq($v)"))
    // monotone: a piecewise-linear log2 must preserve every ranking
    val sortedVals = vals.distinct.sorted
    sortedVals.zip(sortedVals.tail).foreach { case (a, b) =>
      assert(lq(a) < lq(b), s"lq monotone at $a < $b") }
  }

  test("q105 matches a driver-side exact reimplementation of DSIR") {
    // independent form: plain Scala end to end — MessageDigest hashing,
    // bit-arithmetic quantized log2, in-memory count maps — sharing NO
    // Spark expression with the production pipeline
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def feat(t: String): Long = java.lang.Long.parseLong(md5hex(t).take(15), 16) % 1024
    def lq(n: Long): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
      e * 1048576L + (n - (1L << e)) * 1048576L / (1L << e)
    }
    val in = docs.select($"doc_id", $"source", coalesce($"text", lit("")).as("text"))
      .collect()
      // Spark's split keeps trailing empty strings (limit -1): mirror it
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1)))
    val tgtSrc = in.map(_._2).min
    def bucketCounts(side: Array[(Long, String, Array[String])]) = {
      val m = new scala.collection.mutable.HashMap[Long, Long]().withDefaultValue(0L)
      side.foreach(_._3.foreach(t => m(feat(t)) += 1L))
      m
    }
    val tCnt = bucketCounts(in.filter(_._2 == tgtSrc))
    val rCnt = bucketCounts(in.filter(_._2 != tgtSrc))
    val nT = tCnt.values.sum + 1024L
    val nR = rCnt.values.sum + 1024L
    def wq(f: Long): Long =
      lq(tCnt(f) + 1L) - lq(rCnt(f) + 1L) + lq(nR) - lq(nT)
    val want = in.filter(_._2 != tgtSrc)
      .map { case (id, src, tk) =>
        (id, src, tk.length.toLong, tk.map(t => wq(feat(t))).sum) }
      .sortBy { case (id, _, _, sc) => (-sc, id) }
      .take(10).zipWithIndex
      .map { case ((id, src, n, sc), i) => Seq[Any](i + 1, id, src, n, sc) }
      .toSeq
    assert(rows("q105_importance_resample") === want)
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
