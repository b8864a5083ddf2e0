package graft.similarity

import graft.{SparkSpec, Tables}

/** [[KMeans]] — the IVF centroid trainer must be bit-deterministic
  * under arbitrary partitioning (the decimal-sum guarantee), must not
  * regress its objective across iterations, and must slot into the
  * q52-style assignment.
  */
class KMeansSpec extends SparkSpec {

  private def emb = Tables.load(spark, SparkSpec.Sf0001, "embeddings")

  test("training is bit-identical under different partitionings") {
    val a = KMeans.train(emb.repartition(3), k = 4, iters = 2)
    val b = KMeans.train(emb.repartition(7), k = 4, iters = 2)
    assert(a.map(_.cid) === b.map(_.cid))
    for ((ca, cb) <- a.zip(b)) {
      assert(ca.n === cb.n)
      assert(ca.cvec.toSeq === cb.cvec.toSeq) // float-exact, not approx
    }
  }

  test("objective is non-decreasing over iterations (spherical Lloyd's)") {
    val o1 = KMeans.objective(emb, KMeans.train(emb, k = 4, iters = 1))
    val o3 = KMeans.objective(emb, KMeans.train(emb, k = 4, iters = 3))
    assert(o3 >= o1 - 1e-9, s"objective regressed: $o1 -> $o3")
  }

  test("every vector is assigned to exactly one of k cells") {
    val cents = KMeans.train(emb, k = 4, iters = 2)
    val assigned = KMeans.assign(emb, cents)
    assert(assigned.count() === emb.count())
    import spark.implicits._
    val cells = assigned.select($"cell").distinct().as[Int].collect().toSet
    assert(cells.subsetOf((0 until 4).toSet))
    assert(cells.size >= 2, s"degenerate clustering: $cells")
  }

  test("end-to-end IVF: train -> assign -> nprobe=2 search recalls the true top-1") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.CosineSimilarity.register(spark)
    // the real pipeline: trained centroids (not q52's oracle seeds) feed
    // the exact q52 search shape — broadcast centroid scoring, top-1
    // cell per vector, nprobe=2 cells per probe, search inside cells
    val cents = KMeans.train(emb, k = 8, iters = 3)
    val centsDf = spark.createDataFrame(cents.map(c => (c.cid, c.cvec)))
      .toDF("cid", "cvec")
    val scored = emb.crossJoin(broadcast(centsDf))
      .withColumn("cscore", expr("cosine_sim(embedding, cvec)"))
    val byVec = Window.partitionBy($"vec_id").orderBy($"cscore".desc, $"cid")
    val cells = scored.withColumn("r", row_number().over(byVec))
      .filter($"r" === 1).select($"cid", $"vec_id", $"embedding")
    val probes = scored.filter($"vec_id" < 8)
      .withColumn("r", row_number().over(byVec)).filter($"r" <= 2)
      .select($"cid", $"vec_id".as("query_id"), $"embedding".as("qvec"))
    val wq = Window.partitionBy($"query_id").orderBy($"score".desc, $"vec_id")
    val ivf = cells.join(broadcast(probes), Seq("cid"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("score", expr("cosine_sim(qvec, embedding)"))
      .withColumn("rank", row_number().over(wq)).filter($"rank" === 1)
      .select($"query_id", $"vec_id".as("ivf_nn"))
    val brute = emb.select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      .filter($"query_id" < 8)
      .crossJoin(emb.select($"vec_id", $"embedding"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("score", expr("cosine_sim(qvec, embedding)"))
      .withColumn("rank", row_number().over(wq)).filter($"rank" === 1)
      .select($"query_id", $"vec_id".as("true_nn"))
    val joined = ivf.join(brute, Seq("query_id")).cache()
    assert(joined.count() === 8) // every probe answered
    val recall = joined.filter($"ivf_nn" === $"true_nn").count() / 8.0
    joined.unpersist()
    // nprobe=2 of k=8 is a recall/cost tradeoff, not exactness (the
    // exactness baseline is q47): the deterministic fixture must still
    // find the true nearest neighbor for most probes
    assert(recall >= 0.5, s"IVF top-1 recall $recall below floor")
  }

  test("IVF candidate set is monotone in nprobe (nested cell prefixes)") {
    // the accuracy knob's contract: probing more cells only ever ADDS
    // candidates — r <= nprobe is a prefix of one deterministic cell
    // ranking, so each step's (query, neighbor) set is a superset
    import spark.implicits._
    val sets = (1 to 4).map { p =>
      graft.similarity.VectorQueries
        .ivfCandidates(spark, graft.SparkSpec.Sf0001, nprobe = p)
        .select($"query_id", $"vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    sets.sliding(2).foreach { case Seq(lo, hi) =>
      assert(lo.subsetOf(hi), s"nprobe step lost candidates")
    }
    assert(sets.head.size < sets.last.size,
      "nprobe sweep added nothing — dead receipt")
  }

  test("trained centroids are unit-normalized") {
    val cents = KMeans.train(emb, k = 3, iters = 2)
    for (c <- cents) {
      val nrm = math.sqrt(c.cvec.map(x => x.toDouble * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-5, s"cid=${c.cid} norm=$nrm")
    }
  }
}
