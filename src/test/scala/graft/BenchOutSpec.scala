package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench artifacts are append-only (VERDICT r8 item 3): round 7's
  * full-registry record was destroyed by a later focused re-run that
  * reused the default output name. [[Bench.resolveOutPath]] must
  * never return a path that already exists.
  */
class BenchOutSpec extends AnyFunSuite {

  test("resolveOutPath returns the requested path when free") {
    val dir = java.nio.file.Files.createTempDirectory("benchout").toString
    val p = s"$dir/BENCH_full_r99.json"
    assert(Bench.resolveOutPath(p) == p)
  }

  test("resolveOutPath refuses to overwrite and lands beside the record") {
    val dir = java.nio.file.Files.createTempDirectory("benchout").toString
    val p = s"$dir/BENCH_full_r99.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(p), "old".getBytes)
    val r2 = Bench.resolveOutPath(p)
    assert(r2 == s"$dir/BENCH_full_r99_2.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(r2), "x".getBytes)
    // a third run keeps walking instead of clobbering _2
    assert(Bench.resolveOutPath(p) == s"$dir/BENCH_full_r99_3.json")
    // the historical record is untouched by the resolution logic
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p))) == "old")
  }

  test("resolveOutPath treats dots in directories correctly") {
    val dir = java.nio.file.Files.createTempDirectory("bench.out.d").toString
    val p = s"$dir/record" // no extension
    java.nio.file.Files.write(java.nio.file.Paths.get(p), "old".getBytes)
    assert(Bench.resolveOutPath(p) == s"$dir/record_2")
  }
}
