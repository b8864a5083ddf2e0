package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, partition-independent pseudo-random column expressions.
  *
  * The reference seeds numpy globally (np.random.seed(42),
  * healthcare-data-pipeline-main.py:550) — a single-process idiom whose
  * stream depends on evaluation order. At cluster scale, the only
  * reproducible source of randomness is a pure function of the row
  * identity: a Knuth multiplicative hash of (id + salt) gives a uniform
  * in (0,1) that is bit-identical across engines, partitionings, and
  * retries (speculative task re-execution included). All distributions
  * below derive from it by inverse-CDF — closed-form, no rejection
  * loops, fully codegen'd integer/float math.
  */
object DetRand {

  /** Uniform in (0,1) from a row id: Knuth multiplicative hash. */
  def u(id: Column, salt: Int): Column =
    ((((id + lit(salt)) * lit(2654435761L) + lit(1013904223L)) % lit(4294967296L)) + lit(1.0)) /
      lit(4294967297.0)

  /** DuckDB-SQL mirror of [[u]] for oracle queries. */
  def uSql(id: String, salt: Int): String =
    s"(((($id + $salt) * 2654435761 + 1013904223) % 4294967296) + 1.0) / 4294967297.0"

  /** Poisson(3) cumulative probabilities (inverse-CDF ladder, matching
    * the reference's np.random.poisson(3) LOS distribution,
    * healthcare-data-pipeline-main.py:577).
    */
  val poissonCum: Seq[Double] = Seq(
    0.049787068367863944, 0.19914827347145583, 0.42319008112684353,
    0.6472318887822313, 0.8152632445237722, 0.9160820579686966,
    0.9664914646911588, 0.9880954818007853, 0.9961969882168952,
    0.9988974903555985, 0.9997076410072095)

  /** Poisson(3) draw from a uniform. */
  def poisson3(uu: Column): Column =
    poissonCum.zipWithIndex.foldRight(lit(poissonCum.size): Column) {
      case ((c, i), acc) => when(uu < c, i).otherwise(acc)
    }

  /** DuckDB-SQL mirror of [[poisson3]]. */
  def poisson3Sql(uu: String): String =
    poissonCum.zipWithIndex
      .map { case (c, i) => s"WHEN $uu < $c THEN $i" }
      .mkString("CASE ", " ", s" ELSE ${poissonCum.size} END")

  /** Gamma(2, θ) draw: the sum of two Exp(θ) inverse-CDF draws
    * −θ·(ln u₁ + ln u₂) — the reference's np.random.gamma(2, 2000)
    * charges distribution (healthcare-data-pipeline-main.py:588).
    */
  def gamma2(theta: Double, u1: Column, u2: Column): Column =
    lit(-theta) * (log(u1) + log(u2))
}
