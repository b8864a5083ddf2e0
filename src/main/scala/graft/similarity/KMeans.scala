package graft.similarity

import graft.functions.CosineSimilarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed spherical k-means — the production centroid trainer for
  * the IVF index (q52 ships deterministic seed centroids so its DuckDB
  * oracle can reproduce the assignment; this is the real training path
  * its scaladoc promises).
  *
  * Lloyd's iterations, cosine geometry (assign to the max-cosine
  * centroid; recompute as the L2-normalized mean). Design points:
  *
  *   - **Centroids live on the driver** between iterations (k × dims
  *     floats — tiny) and broadcast into each assignment pass; the data
  *     never re-shuffles: assignment is a broadcast join + codegen'd
  *     [[CosineSimilarity]], mean-recompute is one narrow
  *     (cell, dim) aggregation of `posexplode`d components.
  *   - **Bit-deterministic under any partitioning**: component sums
  *     accumulate in DECIMAL(28,10) (exact, associative — shuffle
  *     order cannot perturb them), ties in the argmax break by
  *     centroid id via `min_by` on a (negated-score, cid) struct.
  *     Same data + same k/iters → identical centroids, every run,
  *     every cluster layout.
  *   - **Deterministic init**: the k vectors with the smallest
  *     md5(vec_id) — a data-independent pseudo-random spread, no
  *     `rand()`, reproducible across engines and re-runs.
  *
  * At 100 TB: each iteration is one scan + one 64k-row-bounded
  * aggregate ((cells × dims) groups), so cost is iters × scan — the
  * standard large-scale k-means shape (k-means‖-style smarter init
  * drops in by replacing [[init]] only).
  */
object KMeans {

  /** @return per-cell centroid: (cid 0..k-1, cvec Array[Float], n assigned) */
  final case class Centroid(cid: Int, cvec: Array[Float], n: Long)

  private def normalize(v: Array[Double]): Array[Float] = {
    val nrm = math.sqrt(v.map(x => x * x).sum)
    if (nrm == 0) v.map(_.toFloat)
    else v.map(x => (x / nrm).toFloat)
  }

  /** Deterministic seed pick: k smallest md5(vec_id). */
  def init(emb: DataFrame, k: Int): Seq[Centroid] = {
    import emb.sparkSession.implicits._
    emb.select($"vec_id", $"embedding")
      .withColumn("h", md5($"vec_id".cast("string").cast("binary")))
      .orderBy($"h", $"vec_id")
      .limit(k)
      .select($"embedding").as[Array[Float]].collect()
      .zipWithIndex
      .map { case (v, i) =>
        Centroid(i, normalize(v.map(_.toDouble)), 0L)
      }.toSeq
  }

  /** Assignment column plumbing shared with query-side IVF use: given
    * driver-held centroids, a DataFrame of (vec_id, embedding, cell).
    */
  def assign(emb: DataFrame, cents: Seq[Centroid]): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    CosineSimilarity.register(s)
    val centsDf = s.createDataFrame(
      cents.map(c => (c.cid, c.cvec))).toDF("cid", "cvec")
    emb.crossJoin(broadcast(centsDf))
      .withColumn("score", expr("cosine_sim(embedding, cvec)"))
      .groupBy($"vec_id")
      .agg(
        first($"embedding").as("embedding"),
        min_by($"cid", struct(-$"score", $"cid")).as("cell"))
  }

  /** Train `iters` Lloyd's rounds; returns final centroids (empty cells
    * keep their previous vector, standard practice).
    */
  def train(emb: DataFrame, k: Int, iters: Int): Seq[Centroid] = {
    val s = emb.sparkSession
    import s.implicits._
    var cents = init(emb, k)
    for (_ <- 1 to iters) {
      val sums = assign(emb, cents)
        .select($"cell", posexplode($"embedding").as(Seq("dim", "x")))
        .groupBy($"cell", $"dim")
        .agg(sum($"x".cast("decimal(28,10)")).as("sx"),
             count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(_.getAs[Int]("cell"))
      cents = cents.map { c =>
        byCell.get(c.cid) match {
          case Some(rows) =>
            val dims = rows.map(r => (
              r.getAs[Int]("dim"),
              r.getAs[java.math.BigDecimal]("sx").doubleValue(),
              r.getAs[Long]("n"))).sortBy(_._1)
            val n = dims.head._3
            Centroid(c.cid, normalize(dims.map(d => d._2 / n)), n)
          case None => c // empty cell: keep previous centroid
        }
      }
    }
    cents
  }

  /** Mean within-cluster cosine to the assigned centroid — the
    * (maximized) spherical k-means objective, for convergence checks.
    */
  def objective(emb: DataFrame, cents: Seq[Centroid]): Double = {
    val s = emb.sparkSession
    import s.implicits._
    CosineSimilarity.register(s)
    val centsDf = s.createDataFrame(
      cents.map(c => (c.cid, c.cvec))).toDF("cell", "cvec")
    assign(emb, cents)
      .join(broadcast(centsDf), Seq("cell"))
      .agg(avg(expr("cosine_sim(embedding, cvec)"))).as[Double].head()
  }
}
