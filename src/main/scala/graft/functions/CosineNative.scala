package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two float vectors.
  *
  * The higher-order-function formulation (Similarity.cosine: zip_with +
  * aggregate) is correct but walks the arrays three times through
  * interpreted lambda plumbing. This expression is the promotion path
  * SURVEY §4.3 reserved: ONE fused loop over both arrays, generated
  * straight into whole-stage codegen (doGenCode), no virtual calls per
  * element — the "native Catalyst Expression beats a UDF" tier from the
  * design rules.
  *
  * Numeric contract: identical accumulation order to the HOF form and the
  * DuckDB oracle mirror — elements left to right, float widened to double,
  * dot/(sqrt(na)*sqrt(nb)) — so all three produce bit-identical doubles
  * (CosineNativeSpec asserts exact equality against the HOF fold).
  *
  * Totality: this expression divides in JVM doubles, so a zero-norm vector
  * yields NaN (filterable); the HOF form goes through Catalyst's Divide,
  * which under ANSI mode (Spark 4 default) raises DIVIDE_BY_ZERO instead —
  * EdgeCaseSpec pins both behaviors.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_native"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
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
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineNative {
  val Name = "cosine_native"

  /** (identifier, info, builder) — consumed by both session-state
    * registration below and GraftExtensions.injectFunction. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(Name),
      new ExpressionInfo(classOf[CosineSimilarity].getName, Name),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))

  /** Register into the session's function registry so `expr`/SQL resolve
    * it like a built-in (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      registration._1, registration._2, registration._3)
}
