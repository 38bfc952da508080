package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Native Catalyst expression for embedding math (the custom-`Expression`
  * extension tier): dot product over two numeric-array columns (each side
  * independently `array<float>` or `array<double>`) computed as a tight
  * primitive loop on `ArrayData` — no per-element boxing, no higher-order-
  * function interpretation, generated into whole-stage codegen via
  * `doGenCode`. The double side exists for the exact-integer centroid
  * tables of `Similarity.ivfTopKExact` (integer sums exceed float's 2^24
  * exactness envelope on large clusters).
  *
  * Accumulation is sequential in array order (double), so results are
  * bit-identical to the left-fold/static-unroll forms in
  * `operators.Similarity` and to a SQL engine's ordered list_dot_product —
  * the property the DuckDB oracle compare relies on.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (Seq(left, right).forall(elemType(_).isDefined))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float|double> arguments, got ${left.dataType} / ${right.dataType}")
  }

  private def get(e: Expression, arr: ArrayData, i: Int): Double =
    if (elemType(e).contains(FloatType)) arr.getFloat(i).toDouble else arr.getDouble(i)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += get(left, x, i) * get(right, y, i)
      i += 1
    }
    acc
  }

  private def genGet(e: Expression, arr: String, i: String): String =
    if (elemType(e).contains(FloatType)) s"(double) $arr.getFloat($i)"
    else s"$arr.getDouble($i)"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${genGet(left, a, i)} * ${genGet(right, b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {
  /** Column-level API: dot product of two float-array columns. */
  def vec_dot(a: Column, b: Column): Column =
    Shim.column(VectorDot(Shim.expression(a), Shim.expression(b)))

  /** Cosine similarity built on the native dot. */
  def vec_cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    vec_dot(a, b) / (sqrt(vec_dot(a, a)) * sqrt(vec_dot(b, b)))
  }
}
