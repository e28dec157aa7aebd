package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group polynomial regression along an axis — the engine behind
  * uv_cont_fit (cngi/vis/uv_cont_fit.py:21-95, per (time,baseline,pol)
  * across chan) and cont_sub (cngi/image/cont_sub.py:27-96, per
  * (l,m,time,pol) across chan).
  *
  * Spark-first shape: the reference collects each group into a dense
  * matrix and runs sklearn OLS per chunk. Here the normal equations
  * X'X, X'y are plain codegen'd SUM aggregates (one shuffle, map-side
  * partial agg), the tiny (order+1)^2 solve runs once per GROUP (not
  * per row) in a UDF over group-cardinality data, and the model values
  * come back via a key join + pure column expression. At 100 TB the
  * hot path is all whole-stage codegen; the solve touches only
  * |groups| rows.
  *
  * Null semantics: the reference median-imputes NaNs into the dense
  * matrix (uv_cont_fit.py:71-74) because sklearn needs a full matrix.
  * Long-form Spark needs no imputation: null / absent cells simply do
  * not enter the normal equations — a documented (better) divergence.
  */
object RegressionOps {

  /** Solve the (order+1)x(order+1) normal-equation system by Gaussian
    * elimination with partial pivoting. moments(k) = sum(x^k) for
    * k = 0..2*order; rhs(i) = sum(y*x^i). Returns null for singular /
    * under-determined groups (fewer distinct x than order+1).
    */
  private[graft] def solveNormal(moments: Seq[Double], rhs: Seq[Double]): Option[Seq[Double]] =
    solveNormalMat(Array.tabulate(rhs.length, rhs.length)((i, j) => moments(i + j)),
      rhs.toArray)

  /** General small dense solve (Gaussian elimination, partial pivot). */
  private[graft] def solveNormalMat(aIn: Array[Array[Double]],
                                    bIn: Array[Double]): Option[Seq[Double]] = {
    val n = bIn.length
    val a = aIn.map(_.clone())
    val b = bIn.clone()
    for (col <- 0 until n) {
      var p = col
      for (r <- col + 1 until n) if (math.abs(a(r)(col)) > math.abs(a(p)(col))) p = r
      if (math.abs(a(p)(col)) < 1e-12) return None
      val tmp = a(col); a(col) = a(p); a(p) = tmp
      val tb = b(col); b(col) = b(p); b(p) = tb
      for (r <- col + 1 until n) {
        val f = a(r)(col) / a(col)(col)
        for (c <- col until n) a(r)(c) -= f * a(col)(c)
        b(r) -= f * b(col)
      }
    }
    for (i <- n - 1 to 0 by -1) {
      var s = b(i)
      for (j <- i + 1 until n) s -= a(i)(j) * b(j)
      b(i) = s / a(i)(i)
    }
    Some(b.toSeq)
  }

  private[graft] val solveUdf =
    udf((m: Seq[Double], r: Seq[Double]) => solveNormal(m, r).orNull)

  /** Fit y(x) = sum_k c_k x^k per group and append the model values.
    *
    * @param ys (sourceColumn, targetColumn) pairs sharing the same x —
    *           e.g. the real and imaginary parts of a visibility
    *           (uv_cont_fit fits them as two independent regressions,
    *           uv_cont_fit.py:75-79).
    * @param excludeX axis values excluded from the FIT but still
    *           receiving model values (`excludechans`, uv_cont_fit.py:66).
    */
  def polyFit(df: DataFrame, keys: Seq[String], xCol: String,
              ys: Seq[(String, String)], order: Int,
              excludeX: Seq[Int] = Nil): DataFrame = {
    require(order >= 0, "order must be >= 0")
    val x = col(xCol).cast("double")
    val inFit =
      if (excludeX.isEmpty) lit(true) else !col(xCol).isin(excludeX: _*)

    def pw(k: Int): Column = k match {
      case 0 => lit(1.0)
      case 1 => x
      case n => pow(x, n)
    }

    // per-y moment vectors: nulls in THAT y drop the row from its fit
    val aggs = ys.flatMap { case (y, tgt) =>
      val valid = inFit && col(y).isNotNull
      Seq(
        array((0 to 2 * order).map(k => sum(when(valid, pw(k)).otherwise(lit(0.0)))): _*)
          .as(s"_m_$tgt"),
        array((0 to order).map(k => sum(when(valid, col(y) * pw(k)).otherwise(lit(0.0)))): _*)
          .as(s"_r_$tgt"))
    }
    val solved = df.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(keys.map(col) ++ ys.map { case (_, tgt) =>
        solveUdf(col(s"_m_$tgt"), col(s"_r_$tgt")).as(s"_c_$tgt")
      }: _*)

    // model value: pure column expression over the joined coefficients
    val joined = df.join(solved, keys)
    val withModels = ys.foldLeft(joined) { case (d, (_, tgt)) =>
      val cs = col(s"_c_$tgt")
      val model = (0 to order)
        .map(k => element_at(cs, k + 1) * pw(k))
        .reduce(_ + _)
      d.withColumn(tgt, model)
    }
    withModels.drop(ys.map { case (_, t) => s"_c_$t" }: _*)
  }

  /** uv_cont_fit (cngi/vis/uv_cont_fit.py:21): fit the continuum
    * polynomial to a value column across chan, store model in target.
    */
  def uvContFit(df: DataFrame, keys: Seq[String], chanCol: String,
                source: String, target: String, fitorder: Int = 1,
                excludeChans: Seq[Int] = Nil): DataFrame =
    polyFit(df, keys, chanCol, Seq(source -> target), fitorder, excludeChans)

  /** cont_sub (cngi/image/cont_sub.py:27): model -> LINE, residual
    * (data - model) -> CONTINUUM. (Naming follows the reference:
    * the fit IS the line/continuum estimate, cont_sub.py:96.)
    */
  def contSub(df: DataFrame, keys: Seq[String], chanCol: String,
              source: String, lineName: String, contName: String,
              fitorder: Int = 1, excludeChans: Seq[Int] = Nil): DataFrame =
    polyFit(df, keys, chanCol, Seq(source -> lineName), fitorder, excludeChans)
      .withColumn(contName, col(source) - col(lineName))

  /** Fit-quality metrics (uv_cont_fit.py:85-95): rms / min / max of the
    * |model - data| error over the included channels.
    */
  def fitMetrics(fitted: DataFrame, chanCol: String, source: String,
                 target: String, excludeChans: Seq[Int] = Nil): DataFrame = {
    val included =
      if (excludeChans.isEmpty) fitted
      else fitted.where(!col(chanCol).isin(excludeChans: _*))
    val err = col(target) - col(source)
    included.agg(
      sqrt(avg(err * err)).as("rms_error"),
      min(abs(err)).as("min_abs_error"),
      max(abs(err)).as("max_abs_error"))
  }
}
