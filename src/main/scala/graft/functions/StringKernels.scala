package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity — the record-linkage scoring kernel (the
  * fuzzy-match step after blocking in entity resolution over customer/
  * supplier-style tables). Standard definition, pinned to the exact
  * semantics DuckDB's `jaro_winkler_similarity` exposes (verified
  * empirically against it) so the oracle can replay scores:
  *
  *   - Jaro: matches within window floor(max(|a|,|b|)/2) - 1, greedy
  *     left-to-right; j = (m/|a| + m/|b| + (m-t)/m) / 3; either side
  *     empty → 0 (DuckDB returns 0 even for two empties).
  *   - Winkler bonus: j + l·0.1·(1-j) with l = common prefix capped at
  *     4, applied ONLY when j > 0.7 (the classic boost threshold —
  *     also what DuckDB does).
  *
  * Why a native expression: linkage prices this once per BLOCKED
  * candidate pair — a corpus-scale scan after the block join. The
  * compiled kernel runs over the codepoint arrays with two scratch
  * boolean arrays; no UDF boxing, called straight from the
  * whole-stage-codegen'd projection (TermFreqs pattern).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (STRING, STRING), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  def kernel(l: UTF8String, r: UTF8String): Double = {
    val a = l.toString.codePoints().toArray
    val b = r.toString.codePoints().toArray
    val (la, lb) = (a.length, b.length)
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var hit = false
      while (j <= hi && !hit) {
        if (!bm(j) && a(i) == b(j)) { am(i) = true; bm(j) = true; m += 1; hit = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of a vs matched chars of b in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mD = m.toDouble
    val j = (mD / la + mD / lb + (mD - t / 2) / mD) / 3.0
    if (j > 0.7) {
      var l4 = 0
      while (l4 < math.min(4, math.min(la, lb)) && a(l4) == b(l4)) l4 += 1
      j + l4 * 0.1 * (1.0 - j)
    } else j
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    kernel(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, classOf[JaroWinkler].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.kernel($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def apply(a: Column, b: Column): Column =
    toColumn(JaroWinkler(toExpression(a), toExpression(b)))
}
