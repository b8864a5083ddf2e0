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

  test("trained centroids are unit-normalized") {
    val cents = KMeans.train(emb, k = 3, iters = 2)
    for (c <- cents) {
      val nrm = math.sqrt(c.cvec.map(x => x.toDouble * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-5, s"cid=${c.cid} norm=$nrm")
    }
  }
}
