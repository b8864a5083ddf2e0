package graft

/** Driver-contract invariants over the whole query registry: every
  * registered operator must build and execute on the smallest testdata,
  * names must be unique (they key the driver's correctness files), and
  * column names must be stable under the driver's sort-by-name hashing.
  */
class RegistrySpec extends SparkSpec {

  test("registry has 283 uniquely-named queries") {
    assert(SparkEntry.registry.size == 283)
    assert(SparkEntry.registry.map(_.name).distinct.size == 283)
  }

  /** Queries the DuckDB oracle CANNOT express, each with the spec that
    * carries its exact-value verification instead (the driver then
    * records its documented weaker rows-only check). Additions need a
    * named spec — rows-only without one is not verification.
    *
    * EMPTY since round 7: the last two exemptions (q128 image decode,
    * q179 dHash near-dup) flipped to oracle-checked via closed-form
    * renderable fixtures — lossless PNG means the decoded pixels equal
    * the rendered pattern, which DuckDB regenerates arithmetically.
    */
  val oracleExempt: Map[String, String] = Map.empty

  test("every query has a DuckDB oracle or a named spec-verified exemption") {
    val missing = SparkEntry.registry
      .filter(q => q.oracle.isEmpty && !oracleExempt.contains(q.name))
      .map(_.name)
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL stays under the generated-length ceiling") {
    // Guard for the unrolled-CTE oracle pattern (q127/q162/q182):
    // generated SQL grows with the iteration constant, and DuckDB's
    // planning cost on a MATERIALIZED-CTE chain is superlinear — a
    // careless K bump should fail here, loudly, not time out the
    // driver's oracle run. Current max is ~7.3 KB (q127 at K=8); the
    // ceiling allows 2× headroom.
    val ceiling = 16000
    val over = SparkEntry.registry
      .filter(_.oracle.exists(_.length > ceiling))
      .map(q => s"${q.name} (${q.oracle.get.length} chars)")
    assert(over.isEmpty,
      s"oracles past the $ceiling-char ceiling — re-measure DuckDB before raising: $over")
  }

  test("bench headline set covers the whole registry (no perf-untracked entries)") {
    assert(Bench.headline.toSet == SparkEntry.registry.map(_.name).toSet)
  }

  test("oracle SQL never references current date/time (determinism ban)") {
    val offenders = SparkEntry.registry.collect {
      case q if q.oracle.exists(sql =>
        sql.toLowerCase.matches("(?s).*(current_date|current_timestamp|now\\(\\)|getdate).*")) => q.name
    }
    assert(offenders.isEmpty, s"non-deterministic oracles: $offenders")
  }

  // Each query executes end-to-end on sf0.001 (schema resolves, plan
  // runs, no runtime failure). Row counts are asserted only where the
  // tiny scale factor guarantees output.
  for (q <- SparkEntry.registry) {
    test(s"${q.name} executes on sf0.001") {
      val df = q.build(spark, SparkSpec.Sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
