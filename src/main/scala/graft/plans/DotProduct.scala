package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dense dot product over array<float>/array<double>.
  *
  * The builtin route (`aggregate(zip_with(a,b,*),0,+)`) is a
  * higher-order function — CodegenFallback, per-element lambda
  * dispatch, intermediate array allocation. For the similarity
  * operators the dot product is the innermost hot loop at
  * |pairs|·dim evaluations, so this is the custom-`Expression`
  * tier of the design hierarchy: a tight fused loop in generated
  * Java, float inputs read in place (no array<double> conversion),
  * each product widened to double BEFORE multiply so results match
  * the oracle's `CAST(x AS DOUBLE)` semantics bit-for-bit.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (FloatType | DoubleType, FloatType | DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires array<float|double> inputs, got $other")
    }

  private def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lt = elemType(left); val rt = elemType(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) { acc += get(x, i, lt) * get(y, i, rt); i += 1 }
    acc
  }

  private def getter(t: DataType, arr: String, i: String): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      // The loop variable must be fresh too: ≥2 DotProducts in one
      // projection (multi-plane LSH, k-means assignment) land in the
      // same codegen scope, and a literal `i` collides ("Redefinition
      // of local variable i") — janino then rejects the whole stage
      // and Spark silently falls back to interpreted projection.
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${getter(elemType(left), a, i)} * ${getter(elemType(right), b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
