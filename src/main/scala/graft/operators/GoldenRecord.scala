package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Golden-record entity resolution — the master-data-management (MDM)
  * composition the reference's healthcare domain lives on (patient
  * identity consolidation): blocked fuzzy candidate pairs (the q75
  * prefix-block + Levenshtein verify, never the quadratic all-pairs),
  * transitive closure into identity clusters (match is not transitive;
  * A≈B and B≈C must merge A,C — the
  * [[graft.text.TextQueries.componentLabels]] spine, pointer-doubling
  * safe for chain-shaped match graphs), then one deterministic
  * survivor election per cluster (richest record, key tiebreak) — the
  * "golden" row downstream marts join against.
  *
  * Scale design: candidate generation touches only within-block pairs
  * (bounded blocks; a skewed block key would route through the LSH
  * hot-bucket machinery); the closure is O(log diameter) rounds of
  * narrow (node, lab) joins; the election is a map-side struct-max —
  * no per-cluster window, no sort. Self-loop edges enroll singleton
  * customers so every record lands in exactly one cluster.
  *
  * The oracle recomputes the closure with a recursive CTE — a
  * different algorithm entirely (the q72 proof shape), so hash
  * agreement is strong evidence for both the matching and the merge.
  */
object GoldenRecord {

  val q145 = Q(
    "q145_golden_record",
    (s, dir) => {
      import s.implicits._
      val c = graft.Barrier(Tables.load(s, dir, "customer")
        .select($"c_custkey", $"c_name", $"c_acctbal",
          substring($"c_name", 1, 16).as("blk")))
      // Barrier: componentLabels reads its edge input twice (node
      // universe + symmetric closure) — uncached, the block self-join
      // and its 700k levenshtein evaluations would run twice.
      // Two exact cuts on the verify cost, preserving "same block AND
      // levenshtein(name) <= 1" semantics bit-for-bit:
      //  - prefix stripping: blocked pairs share their 16-char prefix
      //    BY CONSTRUCTION, and ed(p·s, p·t) = ed(s, t) — so the DP
      //    runs on the short suffixes, not the full names;
      //  - the banded (threshold) form: O(len·k) per pair, -1 past the
      //    bound, so "within 1 edit" is >= 0.
      val matches = graft.Barrier(c.as("a").join(c.as("b"),
          $"a.blk" === $"b.blk" && $"a.c_custkey" < $"b.c_custkey")
        .filter(levenshtein(
          expr("substring(a.c_name, 17)"), expr("substring(b.c_name, 17)"), 1) >= 0)
        .select($"a.c_custkey".as("doc_a"), $"b.c_custkey".as("doc_b")))
      // Singletons stay OUT of the propagation (they would ride every
      // round as always-stable nodes) and enroll afterwards: no match
      // row ⇒ the record is its own cluster root.
      val labels = graft.text.TextQueries.componentLabels(matches)
      c.join(labels, c("c_custkey") === labels("node"), "left_outer")
        .withColumn("lab", coalesce($"lab", $"c_custkey"))
        .groupBy($"lab".as("cluster_root"))
        .agg(count(lit(1)).as("n_members"),
          max(struct($"c_acctbal".as("bal"), (-$"c_custkey").as("negk")))
            .as("w"))
        .select($"cluster_root", $"n_members",
          (-$"w.negk").as("canonical_key"), $"w.bal".as("canonical_acctbal"))
        .orderBy($"cluster_root")
    },
    Some("""WITH RECURSIVE c AS (
      |  SELECT c_custkey, c_name, c_acctbal, substr(c_name, 1, 16) AS blk
      |  FROM customer),
      |e AS (
      |  SELECT a.c_custkey AS ka, b.c_custkey AS kb
      |  FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
      |  WHERE levenshtein(a.c_name, b.c_name) <= 1),
      |sym AS (
      |  SELECT ka AS a, kb AS b FROM e
      |  UNION SELECT kb, ka FROM e
      |  UNION SELECT c_custkey, c_custkey FROM c),
      |closure(node, reach) AS (
      |  SELECT a, a FROM sym
      |  UNION
      |  SELECT cl.node, s.b FROM closure cl JOIN sym s ON s.a = cl.reach),
      |roots AS (
      |  SELECT node, MIN(reach) AS cluster_root FROM closure GROUP BY node),
      |labeled AS (
      |  SELECT r.cluster_root, c.c_custkey, c.c_acctbal
      |  FROM roots r JOIN c ON c.c_custkey = r.node),
      |sel AS (
      |  SELECT cluster_root, c_custkey, c_acctbal,
      |         ROW_NUMBER() OVER (PARTITION BY cluster_root
      |           ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM labeled),
      |sizes AS (
      |  SELECT cluster_root, COUNT(*) AS n_members FROM labeled GROUP BY 1)
      |SELECT s.cluster_root, z.n_members,
      |       s.c_custkey AS canonical_key, s.c_acctbal AS canonical_acctbal
      |FROM sel s JOIN sizes z USING (cluster_root)
      |WHERE s.rn = 1 ORDER BY s.cluster_root""".stripMargin),
    doc = "MDM: golden-record consolidation — blocked fuzzy match, transitive-closure clusters, struct-max survivor election")

  val all: Seq[Q] = Seq(q145)
}
