package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Library-level Catalyst extension point. Install via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`): every
  * session then has the engine's native expressions available in both
  * SQL and the DataFrame API without per-session registration calls.
  *
  * Currently injects:
  *  - `cosine_sim(array<float>, array<float>) -> double` — the
  *    codegen'd similarity kernel ([[functions.CosineSimilarity]]).
  *  - `jaro_winkler(string, string) -> double` — the record-linkage
  *    scalar ([[functions.JaroWinklerSim]]), bit-identical to DuckDB's.
  *
  * No custom optimizer `Rule`s or `SparkStrategy`s are injected by
  * design: SURVEY.md §4.2-4.3 — every reference operator plans well
  * under stock Catalyst (verified by plan audit: pushdown, pruning,
  * broadcast selection all fire), so extension surface is limited to
  * expressions where codegen genuinely beats composition.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(
        classOf[CosineSimilarity].getCanonicalName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(
        classOf[functions.DotProduct].getCanonicalName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(
        classOf[functions.JaroWinklerSim].getCanonicalName, "jaro_winkler"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.JaroWinklerSim(exprs(0), exprs(1))))
  }
}
