package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftExpressionBridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two numeric array columns — the
  * innermost kernel of every similarity operator (cosine scoring,
  * norms, LSH signatures run it per candidate pair).
  *
  * Why a custom expression (SURVEY.md §7.2 discipline): the built-in
  * route is either `aggregate`/`zip_with` (CodegenFallback — one
  * interpreted Expression.eval per ELEMENT) or a Scala UDF (compiled
  * loop, but pays ArrayData -> Seq[Double] materialization + boxing
  * per ROW on every call). `doGenCode` emits the multiply-add loop
  * straight into the whole-stage-codegen'd projection, reading the
  * ArrayData in place — no allocation at all.
  *
  * The fold is LEFT-TO-RIGHT over min(len) elements, accumulating in
  * double — bit-identical to SimilarityOps.dotFn and to the oracle's
  * list_reduce, so swapping this in cannot move any oracle-checked
  * result. Float arrays are widened per element (same as the oracle's
  * ::DOUBLE[] cast). Array ELEMENTS are assumed non-null (embedding
  * vectors; nulls would read as garbage in any engine).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // each side independently float[] or double[] (the eval/codegen paths
  // widen per element); anything else fails analysis, not execution
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects ARRAY<FLOAT> or ARRAY<DOUBLE> arguments, " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def get(a: ArrayData, i: Int, float: Boolean): Double =
    if (float) a.getFloat(i).toDouble else a.getDouble(i)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (fa, fb) = (isFloat(left), isFloat(right))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(a, i, fa) * get(b, i, fb); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val ga = if (isFloat(left)) s"(double) $a.getFloat($i)"
               else s"$a.getDouble($i)"
      val gb = if (isFloat(right)) s"(double) $b.getFloat($i)"
               else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $ga * $gb;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpression(a), toExpression(b)))
}
