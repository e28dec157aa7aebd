package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftExpressionBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-statistic kernels — per-row scans over the raw UTF-8
  * bytes of a string column, emitted straight into whole-stage codegen
  * (same discipline as [[SquaredDistance]]: no UDF, so no UTF8String →
  * java.lang.String copy per row on the corpus scan).
  */

/** Shannon entropy (nats) of the BYTE distribution of a string's UTF-8
  * encoding — the character-distribution quality signal of a filtering
  * pipeline (binary junk / base64 blobs / single-char spam score far
  * from natural text). For ASCII text bytes == characters; for
  * multi-byte text this is byte entropy, documented as such.
  *
  * Float determinism: the fold visits byte values in ascending order
  * accumulating `acc + (-(p) * ln(p))` in double — the oracle replays
  * the identical order via `list(cnt ORDER BY ch)` + list_reduce, so
  * both engines produce bit-identical doubles (ln parity is already
  * proven by lang_id / bm25). Empty string → 0.0.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy expects STRING, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    CharEntropy.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.CharEntropy.entropy($s)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  /** Compiled kernel shared by eval and codegen (one virtual call per
    * row; the histogram loop itself JITs tight).
    */
  def entropy(s: UTF8String): Double = {
    val n = s.numBytes()
    if (n == 0) return 0.0
    val hist = new Array[Int](256)
    var i = 0
    while (i < n) { hist(s.getByte(i) & 0xff) += 1; i += 1 }
    val nd = n.toDouble
    var acc = 0.0
    var v = 0
    while (v < 256) {
      val c = hist(v)
      // StrictMath.log, not Math.log: Spark's own Log expression uses
      // StrictMath, and that is the flavor whose DuckDB-ln parity the
      // oracle suite has proven — Math.log's intrinsic can differ by
      // one ulp.
      if (c > 0) { val p = c / nd; acc += -(p) * StrictMath.log(p) }
      v += 1
    }
    acc
  }

  def apply(c: Column): Column = toColumn(CharEntropy(toExpression(c)))
}
