package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Per-visibility degrid fold against a sparse grid patch — the inner
  * kernel of GridOps.degridVisJoin (the physical path the dispatcher
  * picks past the broadcast budget, i.e. the one that runs at cube
  * scale). For one visibility row it walks the support×support
  * convolution taps in the broadcast kernel's exact loop order,
  * merge-scanning the SORTED slot list of the joined patch, and
  * returns [accRe/norm, accIm/norm].
  *
  * Why a native expression: the previous Scala UDF materialized three
  * boxed `Seq`s (slots/res/ims) per visibility row. Here the kernel
  * reads the join's `ArrayData` in place via primitive
  * `getInt`/`getDouble` — zero per-row allocation beyond the 2-element
  * result — and the compiled fold is invoked directly from the
  * whole-stage-codegen'd projection.
  *
  * Null contract: a NULL patch (left-join miss — no grid cell anywhere
  * in the support) degrades to the broadcast path's missing-plane
  * branch: acc 0, norm still the full kernel sum, so the result is
  * [0.0, 0.0], never null. The cgk taps are a `Seq` field (value
  * equality — see [[DeepConstEquality]]'s rationale) materialized to a
  * primitive array once per task.
  */
case class DegridFold(ufrac: Expression, vfrac: Expression,
                      slots: Expression, res: Expression, ims: Expression,
                      cgk: Seq[Double], support: Int, os: Int)
    extends Expression {

  @transient private lazy val cgkArr: Array[Double] = cgk.toArray
  private def sc: Int = support / 2

  override def children: Seq[Expression] = Seq(ufrac, vfrac, slots, res, ims)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = ufrac.nullable || vfrac.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(e: Expression, t: DataType): Boolean = e.dataType match {
      case ArrayType(et, _) => et == t
      case _ => false
    }
    if (ufrac.dataType == IntegerType && vfrac.dataType == IntegerType &&
        arr(slots, IntegerType) && arr(res, DoubleType) && arr(ims, DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "degrid_fold expects (INT, INT, ARRAY<INT>, ARRAY<DOUBLE>, " +
        s"ARRAY<DOUBLE>), got ${children.map(_.dataType.sql).mkString(", ")}")
  }

  /** Compiled kernel shared by eval and codegen; patch arrays may be
    * null (left-join miss).
    */
  def fold(uf: Int, vf: Int, sl: ArrayData, re: ArrayData,
           im: ArrayData): ArrayData = {
    val k = cgkArr
    var accRe = 0.0; var accIm = 0.0; var norm = 0.0
    val n = if (sl == null) 0 else sl.numElements()
    var ptr = 0
    var i = 0
    var dv = -sc
    while (dv < support - sc) {
      val cv = k(math.abs(os * dv + vf))
      var du = -sc
      while (du < support - sc) {
        val conv = k(math.abs(os * du + uf)) * cv
        while (ptr < n && sl.getInt(ptr) < i) ptr += 1
        if (ptr < n && sl.getInt(ptr) == i) {
          accRe += conv * re.getDouble(ptr)
          accIm += conv * im.getDouble(ptr)
        }
        norm += conv
        i += 1
        du += 1
      }
      dv += 1
    }
    new GenericArrayData(Array(accRe / norm, accIm / norm))
  }

  override def eval(input: InternalRow): Any = {
    val uf = ufrac.eval(input)
    val vf = vfrac.eval(input)
    if (uf == null || vf == null) null
    else fold(uf.asInstanceOf[Int], vf.asInstanceOf[Int],
      slots.eval(input).asInstanceOf[ArrayData],
      res.eval(input).asInstanceOf[ArrayData],
      ims.eval(input).asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("degridFold", this, classOf[DegridFold].getName)
    val uf = ufrac.genCode(ctx)
    val vf = vfrac.genCode(ctx)
    val sl = slots.genCode(ctx)
    val re = res.genCode(ctx)
    val im = ims.genCode(ctx)
    val ad = classOf[ArrayData].getName
    val code =
      code"""
        |${uf.code}
        |${vf.code}
        |boolean ${ev.isNull} = ${uf.isNull} || ${vf.isNull};
        |$ad ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${sl.code}
        |  ${re.code}
        |  ${im.code}
        |  ${ev.value} = $ref.fold(${uf.value}, ${vf.value},
        |    ${sl.isNull} ? null : ${sl.value},
        |    ${re.isNull} ? null : ${re.value},
        |    ${im.isNull} ? null : ${im.value});
        |}
      """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DegridFold =
    copy(ufrac = newChildren(0), vfrac = newChildren(1),
      slots = newChildren(2), res = newChildren(3), ims = newChildren(4))
}

object DegridFold {
  def apply(ufrac: Column, vfrac: Column, slots: Column, res: Column,
            ims: Column, cgk: Array[Double], support: Int,
            os: Int): Column =
    toColumn(DegridFold(toExpression(ufrac), toExpression(vfrac),
      toExpression(slots), toExpression(res), toExpression(ims),
      cgk.toList, support, os))
}
