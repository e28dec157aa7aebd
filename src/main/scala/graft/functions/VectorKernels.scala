package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftExpressionBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Native Catalyst kernels for the ANN index family (IVF / PQ / LSH)
  * — the corpus-side scan expressions of the similarity operators.
  *
  * Why expressions and not Scala UDFs (round-8 verdict item 3): a UDF
  * pays the CatalystTypeConverters tax on every row — the vector is
  * materialized as a boxed WrappedArray[Double] before the compiled
  * loop ever runs. At 100 TB the corpus scan of an embedding index is
  * the single hottest loop in the library, so these kernels read the
  * columnar ArrayData in place (primitive getDouble per element, no
  * allocation) and stay inside the whole-stage-codegen'd projection.
  *
  * Two codegen strategies, chosen by kernel complexity:
  *   - simple folds/argmins (SquaredDistance, NearestCentroidId,
  *     HyperplaneSig, AdcFromTable) emit the loop as Java source
  *     straight into the generated projection;
  *   - array-RETURNING kernels (ProbeListIds, PqCodes, PqDistTable)
  *     emit one virtual call to a compiled Scala method on the
  *     expression instance (ctx.addReferenceObj) — still inside
  *     whole-stage codegen, still no per-element boxing; these run on
  *     the tiny query side or once per corpus row with array output,
  *     where the call overhead is irrelevant.
  *
  * All folds are LEFT-TO-RIGHT over min(len) elements accumulating in
  * double — bit-identical to SimilarityOps.{dotFn,sqDistFn} and to the
  * oracle's list_reduce, so swapping these in cannot move any
  * oracle-checked result. Array elements are assumed non-null
  * (embedding vectors). Index state (centroids / codebooks / planes)
  * is embedded in the expression and ships once per task in the
  * serialized plan, exactly like a broadcast closure.
  */
private[graft] trait VectorArrayInput { self: Expression =>
  protected def arrayOk(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  protected def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected def getD(a: ArrayData, i: Int, float: Boolean): Double =
    if (float) a.getFloat(i).toDouble else a.getDouble(i)
  /** Java source for element i of ArrayData term `a`, widened. */
  protected def genGet(a: String, i: String, float: Boolean): String =
    if (float) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
}

/** Squared L2 distance of two numeric array columns — same codegen
  * discipline as [[DotProduct]]; fold order matches
  * SimilarityOps.sqDistFn (and the zip_with/aggregate spelling it
  * replaces, which was CodegenFallback: interpreted per ELEMENT).
  */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression with VectorArrayInput {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (arrayOk(left) && arrayOk(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"squared_distance expects ARRAY<FLOAT> or ARRAY<DOUBLE> arguments, " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (fa, fb) = (isFloat(left), isFloat(right))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = getD(a, i, fa) - getD(b, i, fb); acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${genGet(a, i, isFloat(left))} - ${genGet(b, i, isFloat(right))};
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}

object SquaredDistance {
  def apply(a: Column, b: Column): Column =
    toColumn(SquaredDistance(toExpression(a), toExpression(b)))
}

/** Argmin over an embedded centroid table: the IVF coarse-quantizer
  * assignment (corpus-side scan of ivfTopK / ivfPqTopK /
  * semanticDedup). Centroids MUST be pre-sorted ascending by id —
  * first-wins strict `<` then reproduces the lowest-id tiebreak of
  * every caller. Returns the centroid id (−1 on an empty table).
  */
case class NearestCentroidId(child: Expression, ids: Array[Long],
                             cents: Array[Array[Double]])
    extends UnaryExpression with VectorArrayInput with DeepConstEquality {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (arrayOk(child)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid_id expects ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val f = isFloat(child)
    var best = -1L
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      val n = math.min(a.numElements(), ct.length)
      var acc = 0.0
      var i = 0
      while (i < n) { val d = getD(a, i, f) - ct(i); acc += d * d; i += 1 }
      if (acc < bestD) { best = ids(c); bestD = acc }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ct = ctx.freshName("ct")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |long $best = -1L;
         |double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] $ct = $centsRef[$c];
         |  int $n = java.lang.Math.min($a.numElements(), $ct.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = ${genGet(a, i, isFloat(child))} - $ct[$i];
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $bestD) { $best = $idsRef[$c]; $bestD = $acc; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidId =
    copy(child = newChild)
}

object NearestCentroidId {
  def apply(vec: Column, cents: Seq[(Long, Array[Double])]): Column = {
    val sorted = cents.sortBy(_._1).toArray
    toColumn(NearestCentroidId(toExpression(vec),
      sorted.map(_._1), sorted.map(_._2)))
  }
}

/** nplanes-bit LSH signature: bit i = sign of dot(vec, plane_i) — the
  * corpus-side bucketing scan of lshTopK / nearDupPairs. Plane
  * components are embedded (they are deterministic hash values, never
  * data-sized).
  */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with VectorArrayInput with DeepConstEquality {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (arrayOk(child)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig expects ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val f = isFloat(child)
    var out = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      val n = math.min(a.numElements(), pl.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += getD(a, i, f) * pl(i); i += 1 }
      if (acc > 0) out += (1L << p)
      p += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val pl = ctx.freshName("pl")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |long $out = 0L;
         |for (int $p = 0; $p < $planesRef.length; $p++) {
         |  double[] $pl = $planesRef[$p];
         |  int $n = java.lang.Math.min($a.numElements(), $pl.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ${genGet(a, i, isFloat(child))} * $pl[$i];
         |  }
         |  if ($acc > 0) $out += (1L << $p);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  def apply(vec: Column, planes: Array[Array[Double]]): Column =
    toColumn(HyperplaneSig(toExpression(vec), planes))
}

/** The nProbe nearest centroid ids, ordered by (distance, id) asc —
  * the query-side multi-probe list of IVF search. Runs once per QUERY
  * row (tiny side), so the kernel is a compiled method call rather
  * than emitted Java. Centroids must be pre-sorted ascending by id;
  * the strict `<` selection then reproduces sortBy((dist, id)).
  */
case class ProbeListIds(child: Expression, ids: Array[Long],
                        cents: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression with VectorArrayInput with DeepConstEquality {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (arrayOk(child)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"probe_list_ids expects ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${child.dataType.sql}")

  /** Compiled kernel shared by eval and codegen. */
  def probe(a: ArrayData): ArrayData = {
    val f = isFloat(child)
    val k = cents.length
    val dist = new Array[Double](k)
    var c = 0
    while (c < k) {
      val ct = cents(c)
      val n = math.min(a.numElements(), ct.length)
      var acc = 0.0
      var i = 0
      while (i < n) { val d = getD(a, i, f) - ct(i); acc += d * d; i += 1 }
      dist(c) = acc
      c += 1
    }
    val m = math.min(nProbe, k)
    val used = new Array[Boolean](k)
    val out = new Array[Long](m)
    var r = 0
    var exhausted = false
    while (r < m && !exhausted) {
      var best = -1
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) { // ids asc: strict < keeps the lower id on ties
        if (!used(j) && dist(j) < bestD) { best = j; bestD = dist(j) }
        j += 1
      }
      // best stays -1 when every remaining distance is NaN (a NaN
      // query component): truncate instead of indexing used(-1)
      if (best < 0) exhausted = true
      else { used(best) = true; out(r) = ids(best); r += 1 }
    }
    new GenericArrayData(
      if (r == m) out else java.util.Arrays.copyOf(out, r))
  }

  override def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("kernel", this, classOf[ProbeListIds].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $kernel.probe($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): ProbeListIds =
    copy(child = newChild)
}

object ProbeListIds {
  def apply(vec: Column, cents: Seq[(Long, Array[Double])], nProbe: Int): Column = {
    val sorted = cents.sortBy(_._1).toArray
    toColumn(ProbeListIds(toExpression(vec),
      sorted.map(_._1), sorted.map(_._2), nProbe))
  }
}

/** PQ encoding: per subspace, the index of the nearest codebook entry
  * (squared distance, lowest-code tiebreak via first-wins strict `<`)
  * — the corpus-side scan of pqEncode / ivfPqTopK.
  */
case class PqCodes(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with VectorArrayInput with DeepConstEquality {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (arrayOk(child)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_codes expects ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${child.dataType.sql}")

  private def dsub: Int = codebooks(0)(0).length

  /** Compiled kernel shared by eval and codegen. */
  def codes(a: ArrayData): ArrayData = {
    val f = isFloat(child)
    val m = codebooks.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val lo = s * dsub
      val len = math.max(0, math.min(a.numElements(), lo + dsub) - lo)
      val book = codebooks(s)
      var best = -1
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cb = book(c)
        val n = math.min(len, cb.length)
        var acc = 0.0
        var i = 0
        while (i < n) { val d = getD(a, lo + i, f) - cb(i); acc += d * d; i += 1 }
        if (acc < bestD) { best = c; bestD = acc }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    codes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("kernel", this, classOf[PqCodes].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $kernel.codes($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {
  def apply(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    toColumn(PqCodes(toExpression(vec), codebooks))
}

/** The per-query ADC distance table: entry s*ksub + c = exact squared
  * distance from the query's s-th subvector to codebook entry c — the
  * standard asymmetric-distance precomputation (Jégou et al., PQ).
  * Runs once per QUERY row; corpus rows then price in m lookups via
  * [[AdcFromTable]] instead of m*dsub flops.
  */
case class PqDistTable(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with VectorArrayInput with DeepConstEquality {

  // the flattened m x ksub table indexes with a UNIFORM ksub — a ragged
  // codebook set would silently corrupt neighboring subspace slots
  require(codebooks.nonEmpty &&
    codebooks.forall(_.length == codebooks(0).length),
    "pq_dist_table requires the same ksub in every subspace codebook")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (arrayOk(child)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_dist_table expects ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${child.dataType.sql}")

  private def dsub: Int = codebooks(0)(0).length
  private def ksub: Int = codebooks(0).length

  /** Compiled kernel shared by eval and codegen. */
  def table(a: ArrayData): ArrayData = {
    val f = isFloat(child)
    val m = codebooks.length
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val lo = s * dsub
      val len = math.max(0, math.min(a.numElements(), lo + dsub) - lo)
      val book = codebooks(s)
      var c = 0
      while (c < book.length) {
        val cb = book(c)
        val n = math.min(len, cb.length)
        var acc = 0.0
        var i = 0
        while (i < n) { val d = getD(a, lo + i, f) - cb(i); acc += d * d; i += 1 }
        out(s * ksub + c) = acc
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    table(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("kernel", this, classOf[PqDistTable].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $kernel.table($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistTable =
    copy(child = newChild)
}

object PqDistTable {
  def apply(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    toColumn(PqDistTable(toExpression(vec), codebooks))
}

/** Dense matrix-vector projection with an embedded row-major matrix —
  * the Johnson-Lindenstrauss kernel of randomProject. Each output
  * component is a LEFT-TO-RIGHT fold over input dims (oracle's
  * list_reduce order), scaled after the fold.
  */
case class ProjectVector(child: Expression, mat: Array[Array[Double]],
                         scale: Double)
    extends UnaryExpression with VectorArrayInput with DeepConstEquality {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (arrayOk(child)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"project_vector expects ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${child.dataType.sql}")

  /** Compiled kernel shared by eval and codegen. */
  def project(a: ArrayData): ArrayData = {
    val f = isFloat(child)
    val out = new Array[Double](mat.length)
    var d = 0
    while (d < mat.length) {
      val row = mat(d)
      val n = math.min(a.numElements(), row.length)
      var acc = 0.0
      var j = 0
      while (j < n) { acc += getD(a, j, f) * row(j); j += 1 }
      out(d) = acc * scale
      d += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    project(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("kernel", this, classOf[ProjectVector].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $kernel.project($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): ProjectVector =
    copy(child = newChild)
}

object ProjectVector {
  def apply(vec: Column, mat: Array[Array[Double]], scale: Double): Column =
    toColumn(ProjectVector(toExpression(vec), mat, scale))
}

/** ADC pricing at the corpus scan: sum the query's distance-table
  * entries selected by the corpus row's codes, in subspace order
  * (deterministic float addition), then quantize to the ranking grid.
  * This is the hottest expression of the PQ search path — m lookups
  * and adds per corpus row, emitted as Java into the join's projection.
  * Bit-identical to summing per-subspace sqDistFn directly: the table
  * entries ARE those fold results.
  */
case class AdcFromTable(left: Expression, right: Expression,
                        ksub: Int, scale: Double)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_from_table expects (ARRAY<DOUBLE>, ARRAY<INT>), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val table = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) { acc += table.getDouble(s * ksub + codes.getInt(s)); s += 1 }
    math.floor(acc * scale + 0.5) / scale
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) => {
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $c.numElements();
         |double $acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  $acc += $t.getDouble($s * $ksub + $c.getInt($s));
         |}
         |${ev.value} = java.lang.Math.floor($acc * $scale + 0.5) / $scale;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcFromTable =
    copy(left = newLeft, right = newRight)
}

object AdcFromTable {
  def apply(table: Column, codes: Column, ksub: Int, scale: Double): Column =
    toColumn(AdcFromTable(toExpression(table), toExpression(codes), ksub, scale))
}
