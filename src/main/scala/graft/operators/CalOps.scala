package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.complex._

/** self_cal (ngcasa/calibration/self_cal.py:52-863): per-solution-
  * interval antenna-based complex gain solve g_i g_j* ~= V_ij / M_ij,
  * then gain-correct the visibilities.
  *
  * Spark-first shape (SURVEY.md §2.8): the data reduction —
  * X = V/M weighted-averaged over channels per (interval, baseline) —
  * is a plain hash aggregate; only the tiny per-interval solve
  * (n_antenna unknowns over n_baseline equations) runs as a local
  * kernel inside mapGroups, and the correction is two broadcast joins.
  *
  * The solver is the alternating-direction gain iteration (StEFCal /
  * Hamaker): g_i <- sum_j w X_ij g_j / sum_j w |g_j|^2, averaged with
  * the previous iterate for stability — same chi^2 minimum as the
  * reference's Levenberg-Marquardt (self_cal.py:444), reached without
  * a generic optimizer; reference antenna phase fixed to 0
  * (self_cal.py:418-421).
  */
object CalOps {

  final case class BaselineX(solint: Long, ant1: Int, ant2: Int,
                             xre: Double, xim: Double, wt: Double)

  final case class GainRow(solint: Long, antenna: Int,
                           gain_re: Double, gain_im: Double, n_iter: Int)

  /** Local scalar-gain solve for one interval. */
  private[graft] def solveGains(rows: Seq[BaselineX], refAnt: Int,
                                maxIter: Int = 100, tol: Double = 1e-12)
      : (Map[Int, (Double, Double)], Int) = {
    val ants = rows.flatMap(r => Seq(r.ant1, r.ant2)).distinct.sorted
    val idx = ants.zipWithIndex.toMap
    val n = ants.length
    var gRe = Array.fill(n)(1.0); var gIm = Array.fill(n)(0.0)
    var it = 0
    var delta = Double.MaxValue
    while (it < maxIter && delta > tol) {
      val nRe = new Array[Double](n); val nIm = new Array[Double](n)
      val den = new Array[Double](n)
      for (r <- rows if r.ant1 != r.ant2 && r.wt > 0) {
        val (i, j) = (idx(r.ant1), idx(r.ant2))
        // X_ij ~ g_i conj(g_j):  g_i update uses X_ij * g_j
        nRe(i) += r.wt * (r.xre * gRe(j) - r.xim * gIm(j))
        nIm(i) += r.wt * (r.xim * gRe(j) + r.xre * gIm(j))
        den(i) += r.wt * (gRe(j) * gRe(j) + gIm(j) * gIm(j))
        // conj(X_ij) ~ g_j conj(g_i):  g_j update uses conj(X_ij) * g_i
        nRe(j) += r.wt * (r.xre * gRe(i) + r.xim * gIm(i))
        nIm(j) += r.wt * (-r.xim * gRe(i) + r.xre * gIm(i))
        den(j) += r.wt * (gRe(i) * gRe(i) + gIm(i) * gIm(i))
      }
      val newRe = new Array[Double](n); val newIm = new Array[Double](n)
      var d = 0.0
      for (k <- 0 until n) {
        if (den(k) > 0) {
          // damped update (average with previous) for convergence
          newRe(k) = 0.5 * (gRe(k) + nRe(k) / den(k))
          newIm(k) = 0.5 * (gIm(k) + nIm(k) / den(k))
        } else { newRe(k) = gRe(k); newIm(k) = gIm(k) }
        d = math.max(d, math.abs(newRe(k) - gRe(k)) + math.abs(newIm(k) - gIm(k)))
      }
      gRe = newRe; gIm = newIm
      delta = d; it += 1
    }
    // fix the reference antenna phase to zero: rotate all gains by
    // conj(phase(g_ref))
    val r = idx.getOrElse(refAnt, 0)
    val mag = math.sqrt(gRe(r) * gRe(r) + gIm(r) * gIm(r))
    if (mag > 0) {
      val (cr, ci) = (gRe(r) / mag, -gIm(r) / mag)
      for (k <- 0 until n) {
        val re = gRe(k) * cr - gIm(k) * ci
        val im = gRe(k) * ci + gIm(k) * cr
        gRe(k) = re; gIm(k) = im
      }
    }
    (ants.map(a => a -> ((gRe(idx(a)), gIm(idx(a))))).toMap, it)
  }

  /** Relational reduction + distributed per-interval solve.
    *
    * Input: long-form rows with a complex `vis` and `model` struct,
    * weight, flag; output: one gain row per (solint, antenna).
    */
  /** The relational reduction stage of self_cal (self_cal.py:289-301):
    * X = V/M weighted-averaged over chans/pols per (interval,
    * baseline) with weight wt*|M|^2; flagged/autocorr rows dropped.
    * One hash aggregate — exposed separately so it can be verified
    * against a SQL oracle independently of the iterative solve.
    */
  def reduceVisModel(df: DataFrame, solintCol: String, ant1Col: String,
                     ant2Col: String, visCol: String, modelCol: String,
                     weightCol: String, flagCol: String): DataFrame = {
    val x = c_div(col(visCol), col(modelCol))
    val xwt = col(weightCol) * c_abs2(col(modelCol))
    df.where(!coalesce(col(flagCol), lit(false)) &&
        col(ant1Col) =!= col(ant2Col) && col(weightCol) > 0)
      .groupBy(col(solintCol).cast("long").as("solint"),
        col(ant1Col).cast("int").as("ant1"),
        col(ant2Col).cast("int").as("ant2"))
      .agg((sum(re(x) * xwt) / sum(xwt)).as("xre"),
        (sum(im(x) * xwt) / sum(xwt)).as("xim"),
        sum(xwt).as("wt"))
  }

  def selfCal(spark: SparkSession, df: DataFrame, solintCol: String,
              ant1Col: String, ant2Col: String, visCol: String,
              modelCol: String, weightCol: String, flagCol: String,
              refAnt: Int = 0, maxIter: Int = 100): DataFrame = {
    import spark.implicits._
    val reduced = reduceVisModel(df, solintCol, ant1Col, ant2Col,
      visCol, modelCol, weightCol, flagCol).as[BaselineX]
    reduced.groupByKey(_.solint)
      .flatMapGroups { (solint, it) =>
        val rows = it.toSeq
        val (gains, nIter) = solveGains(rows, refAnt, maxIter)
        gains.iterator.map { case (a, (gre, gim)) =>
          GainRow(solint, a, gre, gim, nIter)
        }
      }.toDF()
  }

  /** Apply solved gains: V_corrected = V / (g_i * conj(g_j))
    * (self_cal.py docstring "Vcorrect=Vobs/Gsol_i/conj(Gsol_j)").
    * Two broadcast joins on the (solint, antenna) gain table.
    */
  def applyGains(df: DataFrame, gains: DataFrame, solintCol: String,
                 ant1Col: String, ant2Col: String, visCol: String,
                 outCol: String = "vis_corrected"): DataFrame = {
    val g1 = gains.select(col("solint").as("_s1"), col("antenna").as("_a1"),
      col("gain_re").as("g1re"), col("gain_im").as("g1im"))
    val g2 = gains.select(col("solint").as("_s2"), col("antenna").as("_a2"),
      col("gain_re").as("g2re"), col("gain_im").as("g2im"))
    df.join(broadcast(g1), col(solintCol) === col("_s1") && col(ant1Col) === col("_a1"), "left")
      .join(broadcast(g2), col(solintCol) === col("_s2") && col(ant2Col) === col("_a2"), "left")
      .withColumn(outCol,
        c_div(col(visCol),
          c_mul(c(col("g1re"), col("g1im")), c_conj(c(col("g2re"), col("g2im"))))))
      .drop("_s1", "_a1", "_s2", "_a2", "g1re", "g1im", "g2re", "g2im")
  }
}
