package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftExpressionBridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst Hilbert-curve index for a 2-D pre-quantized cell
  * (x, y) on a 2^bits x 2^bits grid — the clustering key behind
  * `IoOps.writeHilberted`, the Z-order alternative whose unit-step
  * locality gives strictly tighter per-file bounding boxes (no Morton
  * "seams": consecutive keys are always grid neighbors, so a range
  * repartition on the key yields files whose min/max footer stats
  * cover one compact blob of the key plane).
  *
  * Why a custom expression (SURVEY.md §7.2 discipline): the xy2d
  * transform is an iterative state machine (bits rounds of reflect +
  * swap on the running (x, y)); composed as Column `when` trees the
  * expression DOUBLES per round (x' and y' each reference both x and
  * y), i.e. 2^bits nodes at the default bits=16. `doGenCode` emits
  * the loop directly into whole-stage codegen — constant code size,
  * zero allocation. The algorithm is the public-domain xy2d form
  * (Wikipedia, "Hilbert curve — Applications and mapping algorithms").
  *
  * Inputs are LongType cell coordinates already clamped to
  * [0, 2^bits); out-of-range coordinates are masked into range (the
  * caller quantizes, this expression never throws row-side).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"hilbert_index: bits in [1,31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index expects (BIGINT, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val side = 1L << bits
    val mask = side - 1L
    var x = l.asInstanceOf[Long] & mask
    var y = r.asInstanceOf[Long] & mask
    var d = 0L
    var s = side >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve orientation lines up
      if (ry == 0L) {
        if (rx == 1L) { x = side - 1L - x; y = side - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      val side = 1L << bits
      s"""
         |long $x = $xv & ${side - 1L}L;
         |long $y = $yv & ${side - 1L}L;
         |long $d = 0L;
         |for (long $s = ${side >> 1}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = ${side - 1L}L - $x; $y = ${side - 1L}L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  def apply(x: Column, y: Column, bits: Int): Column =
    toColumn(HilbertIndex(toExpression(x), toExpression(y), bits))
}
