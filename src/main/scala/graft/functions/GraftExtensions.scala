package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the library's native Catalyst expressions.
  *
  * Registers [[PolyHash]] and [[DotProduct]] as SQL functions so the
  * whole engine API is reachable from `spark.sql(...)` — the brief's
  * third entry point next to the Column DSL and the operator objects:
  *
  *   - `polyhash(s)`               — engine-default (base, mod)
  *   - `polyhash(s, base, mod)`    — explicit constants (foldable args)
  *   - `dot_product(a, b)`         — float[]/double[] multiply-add fold
  *   - `squared_distance(a, b)`    — float[]/double[] L2^2 fold
  *   - `char_entropy(s)`           — UTF-8 byte-distribution entropy (nats)
  *   - `jaro_winkler(a, b)`        — record-linkage similarity (DuckDB semantics)
  *
  * Two registration paths, same builders:
  *
  *   - cluster-wide, before session creation (the idiomatic Spark way):
  *     `spark.sql.extensions=graft.functions.GraftExtensions`
  *   - on a live session (REPL / tests): `GraftFunctions.register(spark)`
  *
  * Both end in the session's `FunctionRegistry`, so the planner treats
  * the functions exactly like built-ins — whole-stage codegen included
  * (these expressions implement `doGenCode`; nothing here falls back to
  * interpreted eval or a UDF).
  */
object GraftFunctions {

  private def constLong(e: Expression, fn: String, arg: String): Long = {
    require(e.foldable, s"$fn: $arg must be a constant")
    e.eval() match {
      case i: Int   => i.toLong
      case l: Long  => l
      case s: Short => s.toLong
      case b: Byte  => b.toLong
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integral constant, got $other")
    }
  }

  /** (name, info, builder) descriptions — the exact shape
    * `SparkSessionExtensions.injectFunction` consumes.
    */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "polyhash"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => PolyHash(c,
          graft.operators.TextOps.HashBase, graft.operators.TextOps.HashMod)
        case Seq(c, b, m) => PolyHash(c,
          constLong(b, "polyhash", "base"), constLong(m, "polyhash", "mod"))
        case _ => throw new IllegalArgumentException(
          s"polyhash takes 1 or 3 arguments, got ${args.size}")
      }),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException(
          s"dot_product takes 2 arguments, got ${args.size}")
      }),
    (FunctionIdentifier("char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "char_entropy"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => CharEntropy(c)
        case _ => throw new IllegalArgumentException(
          s"char_entropy takes 1 argument, got ${args.size}")
      }),
    (FunctionIdentifier("squared_distance"),
      new ExpressionInfo(classOf[SquaredDistance].getName, "squared_distance"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => SquaredDistance(a, b)
        case _ => throw new IllegalArgumentException(
          s"squared_distance takes 2 arguments, got ${args.size}")
      }),
    (FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => JaroWinkler(a, b)
        case _ => throw new IllegalArgumentException(
          s"jaro_winkler takes 2 arguments, got ${args.size}")
      }))

  /** Register on a live session (idempotent — re-registration replaces). */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptions.foreach(ext.injectFunction)
}
