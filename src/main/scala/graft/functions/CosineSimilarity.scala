package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity over two `array<float>` embedding columns as a
  * native Catalyst expression with whole-stage codegen — the hot-path
  * scalar for similarity search (SURVEY.md §7 north-star extension;
  * vs. the zip_with/aggregate higher-order-function formulation this
  * avoids building an intermediate products array per row, which at
  * 100 TB × 64-dim vectors is the difference between a tight fused
  * loop and billions of short-lived ArrayData allocations).
  *
  * Accumulation is sequential in index order (double precision), the
  * same order the DuckDB oracle evaluates, keeping results
  * bit-comparable before the verification rounding.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xi = (double) $a.getFloat($i);
         |  double yi = (double) $b.getFloat($i);
         |  $dot += xi * yi; $na += xi * xi; $nb += yi * yi;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
         |  : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Register the engine's native vector expressions (`cosine_sim`,
    * `dot_product`) in the session's function registry so both the
    * DataFrame API (via expr) and Spark SQL can call them. Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // Skip when already present: createOrReplaceTempFunction logs a
    // "replacing temporary function" WARN per call, which spammed every
    // per-query registration in r1's Bench stderr.
    if (!reg.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"))) {
      reg.createOrReplaceTempFunction(
        "cosine_sim",
        exprs => CosineSimilarity(exprs(0), exprs(1)),
        "scala_udf")
      reg.createOrReplaceTempFunction(
        "dot_product",
        exprs => DotProduct(exprs(0), exprs(1)),
        "scala_udf")
    }
  }
}
