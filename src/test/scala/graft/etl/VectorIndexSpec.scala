package graft.etl

import graft.functions.CosineSimilarity
import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[VectorIndex]] — the persisted-IVF lifecycle the registry query
  * (q262) serves from: build ≡ inline IVF, cross-batch append
  * convergence, replay safety, partition-bounded takedown, and the
  * plan shape (pruned scan, one bounded Exchange).
  */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def emb: DataFrame = Tables.load(spark, SparkSpec.Sf0001, "embeddings")

  private def seeds: Seq[(Int, Array[Float])] =
    emb.filter($"vec_id" >= 8 && $"vec_id" < 16)
      .select($"vec_id".cast("int"), $"embedding")
      .as[(Int, Array[Float])].collect().toSeq.sortBy(_._1)

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"vindex-$tag").toString + "/idx"

  private def probes: DataFrame = emb.filter($"vec_id" < 8)
    .select($"vec_id".as("query_id"), $"embedding".as("qvec"))

  /** The inline (q52-style) IVF pipeline with the same knobs — an
    * independent formulation (window ranks, unpruned scan) the
    * index-served path must reproduce exactly.
    */
  private def inlineExpected(nprobe: Int, topK: Int): Seq[Seq[Any]] = {
    CosineSimilarity.register(spark)
    val cents = emb.filter($"vec_id" >= 8 && $"vec_id" < 16)
      .select($"vec_id".cast("int").as("cid"), $"embedding".as("cvec"))
    val assigned = emb.crossJoin(broadcast(cents))
      .withColumn("cscore", round(expr("cosine_sim(embedding, cvec)"), 6))
      .withColumn("r", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"cscore".desc, $"cid")))
    val cells = assigned.filter($"r" === 1)
      .select($"cid", $"vec_id", $"embedding")
    val pr = assigned.filter($"vec_id" < 8 && $"r" <= nprobe)
      .select($"cid", $"vec_id".as("query_id"), $"embedding".as("qvec"))
    cells.join(pr, "cid").filter($"vec_id" =!= $"query_id")
      .withColumn("score", round(expr("cosine_sim(qvec, embedding)"), 4))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"score".desc, $"vec_id")))
      .filter($"rank" <= topK)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"score",
        $"rank".cast("int"))
      .orderBy($"query_id", $"rank")
      .collect().map(_.toSeq).toSeq
  }

  test("index-served search ≡ the inline IVF pipeline") {
    val path = freshPath("eq")
    VectorIndex.build(spark, emb, path, seeds)
    val got = VectorIndex.search(spark, path, probes, 3, 4)
      .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    assert(got === inlineExpected(3, 4))
  }

  test("cross-batch append converges to the one-shot build; replays append zero") {
    val pOne = freshPath("oneshot")
    VectorIndex.build(spark, emb, pOne, seeds)
    val pInc = freshPath("inc")
    VectorIndex.build(spark, emb.filter($"vec_id" % 2 === 0), pInc, seeds)
    val n = VectorIndex.append(spark, pInc,
      emb.filter($"vec_id" % 2 === 1))
    assert(n > 0)
    def members(p: String) = spark.read.parquet(s"$p/postings")
      .select($"cell", $"vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(members(pInc) === members(pOne))
    // replayed batch: row-granular anti-join appends nothing
    assert(VectorIndex.append(spark, pInc,
      emb.filter($"vec_id" % 2 === 1)) === 0L)
    // and the searches agree
    val a = VectorIndex.search(spark, pOne, probes, 2, 5)
      .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
    val b = VectorIndex.search(spark, pInc, probes, 2, 5)
      .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("remove rewrites only affected cells, deletes emptied ones, idempotent") {
    val path = freshPath("rm")
    VectorIndex.build(spark, emb, path, seeds)
    val byCell = spark.read.parquet(s"$path/postings")
      .select($"cell", $"vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSeq }
    val emptyCell = byCell.minBy { case (c, xs) => (xs.size, c) }
    val otherCell = byCell.filter(_._1 != emptyCell._1)
      .maxBy { case (c, xs) => (xs.size, c) }
    val untouched = byCell.keySet - emptyCell._1 - otherCell._1
    val untouchedFiles = untouched.map { c =>
      c -> new java.io.File(s"$path/postings/cell=$c").listFiles().toSeq
    }.toMap
    val ids = emptyCell._2 ++ otherCell._2.take(1)
    assert(VectorIndex.remove(spark, path, ids) === ids.size.toLong)
    // emptied cell directory is gone (dynamic overwrite can't delete it)
    assert(!new java.io.File(s"$path/postings/cell=${emptyCell._1}").exists())
    // unaffected cells untouched on disk, byte-for-byte the same files
    untouched.foreach { c =>
      assert(new java.io.File(s"$path/postings/cell=$c").listFiles().toSeq
        === untouchedFiles(c), s"cell $c was rewritten")
    }
    // removed ids never surface in a search again
    val got = VectorIndex.search(spark, path, probes, 8, 1000)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(got.intersect(ids.toSet).isEmpty)
    // idempotent
    assert(VectorIndex.remove(spark, path, ids) === 0L)
  }

  test("search plan: partition-pruned scan, exactly one shuffle Exchange") {
    val path = freshPath("plan")
    VectorIndex.build(spark, emb, path, seeds)
    // pruning: the pruned read lists only the requested cell dirs
    val some = seeds.map(_._1).take(2)
    val files = VectorIndex.prunedPostings(spark, path, some)
      .select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty)
    assert(files.forall(f => some.exists(c => f.contains(s"cell=$c"))),
      s"scan read unprobed cells: ${files.mkString("\n")}")
    // one Exchange total: the bounded top-k aggregate — candidates
    // reach it as ≤ k-row partial buffers, and the corpus side never
    // shuffles (scan → broadcast join only)
    val out = VectorIndex.search(spark, path, probes, 3, 4)
    out.collect() // finalize AQE
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.finalPhysicalPlan)
      case q: QueryStageExec => q +: allNodes(q.plan)
      case r: ReusedExchangeExec => r +: allNodes(r.child)
      case other => other +: other.children.flatMap(allNodes)
    }
    val shuffles = allNodes(out.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size === 1,
      s"expected the single top-k Exchange, got ${shuffles.size}")
  }
}
