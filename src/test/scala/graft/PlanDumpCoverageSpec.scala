package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 coverage gate: PLANS.md is generated from
  * [[PlanDump.annotations]], so this spec is what makes "every registry
  * query has an annotated plan" a compile-enforced invariant rather
  * than a manually maintained list. A new operator cannot register in
  * [[SparkEntry]] without also stating its scale mechanism.
  */
class PlanDumpCoverageSpec extends AnyFunSuite {

  test("every registry query has a PlanDump annotation") {
    val missing = SparkEntry.queries.keySet -- PlanDump.annotations.keySet
    assert(missing.isEmpty, s"queries without a scale note: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("no annotation is stale (names a query that left the registry)") {
    val stale = PlanDump.annotations.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"annotations for unknown queries: ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("annotations are substantive (not placeholder one-liners)") {
    val thin = PlanDump.annotations.collect {
      case (n, note) if note.trim.length < 40 => n
    }
    assert(thin.isEmpty, s"thin annotations: ${thin.toSeq.sorted.mkString(", ")}")
  }
}
