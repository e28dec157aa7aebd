package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftExpressionBridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's polynomial string hash
  * (see graft.operators.TextOps): fold (acc*base + charCode) % mod
  * over the string's characters.
  *
  * This is the one place the built-in surface genuinely couldn't keep
  * up (SURVEY.md §7.2): array higher-order functions are interpreted
  * (CodegenFallback), and a Scala UDF pays String materialization +
  * boxing per row. Here `doGenCode` emits the loop directly into the
  * whole-stage-codegen'd projection, reading the UTF8String in place.
  *
  * Two independent (base, mod) instances give a 2x~30-bit composite
  * key: a single ~2^30 hash space false-merges distinct documents from
  * ~50k docs by birthday bound — far below the 100 TB corpus target —
  * while a pair of independent primes pushes collisions past 2^59.
  *
  * Semantics match TextOps.polyHashFn exactly for BMP text (the fold
  * is over UTF-16 code units there, code points here only differing
  * beyond the BMP; the corpus contract is ASCII).
  */
case class PolyHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  // strict (no implicit cast): hashing a non-string is almost always a
  // bug — surface it at analysis, not as per-row nonsense
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"polyhash expects a STRING argument, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    graft.operators.TextOps.polyHashFn(
      input.asInstanceOf[UTF8String].toString, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 0L;
         |int $n = $s.length();
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = ($acc * ${base}L + (long) $s.charAt($i)) % ${mod}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Column wrapper: the codegen'd form of TextOps.polyHash. */
  def apply(c: Column): Column =
    apply(c, graft.operators.TextOps.HashBase, graft.operators.TextOps.HashMod)

  def apply(c: Column, base: Long, mod: Long): Column =
    toColumn(PolyHash(toExpression(c), base, mod))
}
