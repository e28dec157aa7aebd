package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** deconvolve_point_clean (ngcasa/deconvolution/
  * deconvolve_point_clean.py:30-332): Hogbom CLEAN — per (chan, pol)
  * plane, repeatedly find the absolute peak of the residual, add
  * gain*peak to the model at that pixel, subtract gain*shifted-PSF
  * from the residual, until |peak| <= threshold*|initial peak| or
  * niter (mirrors _clean_jit:175-237, including the
  * threshold-relative-to-initial-peak semantics).
  *
  * Spark shape: planes are co-grouped by (img_chan, pol) and the
  * iterative kernel runs inside one task per plane (the reference
  * holds the full (l,m) plane per task too — SURVEY.md §3.3). Image
  * and PSF arrive in long form and are densified per group.
  */
object CleanOps {

  final case class CleanResult(img_chan: Int, pol: Int, l_idx: Int, m_idx: Int,
                               model: Double, residual: Double)

  /** Local Hogbom loop over dense planes (row-major nL x nM). */
  private[graft] def hogbom(residual: Array[Double], psf: Array[Double],
                            nL: Int, nM: Int, psfL: Int, psfM: Int,
                            gain: Double, threshold: Double, niter: Int)
      : Array[Double] = {
    val model = new Array[Double](residual.length)
    val (pcL, pcM) = (psfL / 2, psfM / 2)
    def peak(): (Int, Double) = {
      var best = 0; var bestAbs = -1.0
      var i = 0
      while (i < residual.length) {
        val a = math.abs(residual(i))
        if (a > bestAbs) { bestAbs = a; best = i }
        i += 1
      }
      (best, residual(best))
    }
    var (pPos, pVal) = peak()
    if (pVal.isNaN || pVal == 0.0) return model
    val scaledThreshold = threshold * math.abs(pVal)
    var i = 0
    while (math.abs(pVal) > scaledThreshold && i < niter) {
      val (pl, pm) = (pPos / nM, pPos % nM)
      model(pPos) += gain * pVal
      // subtract the psf centered at the peak, clipped to the plane
      val l0 = math.max(pl - pcL, 0); val l1 = math.min(pl + (psfL - pcL), nL)
      val m0 = math.max(pm - pcM, 0); val m1 = math.min(pm + (psfM - pcM), nM)
      var l = l0
      while (l < l1) {
        val psfRow = (pcL + (l - pl)) * psfM
        var m = m0
        while (m < m1) {
          residual(l * nM + m) -= gain * pVal * psf(psfRow + (pcM + (m - pm)))
          m += 1
        }
        l += 1
      }
      val p = peak(); pPos = p._1; pVal = p._2
      if (pVal.isNaN || pVal == 0.0) i = niter
      i += 1
    }
    model
  }

  /** Distributed CLEAN: long-form image + psf (img_chan, pol, l_idx,
    * m_idx, value) -> long-form (model, residual).
    *
    * NOTE the PSF the reference subtracts is NORMALIZED to unit peak
    * (make_psf output); pass it that way.
    */
  def cleanPlanes(spark: SparkSession, image: DataFrame, psf: DataFrame,
                  nL: Int, nM: Int, psfL: Int, psfM: Int,
                  gain: Double = 0.1, threshold: Double = 0.01,
                  niter: Int = 1000): DataFrame = {
    import spark.implicits._
    val img = image.select(col("img_chan").cast("int"), col("pol").cast("int"),
        col("l_idx").cast("int"), col("m_idx").cast("int"),
        col("image").cast("double"), lit(0).as("kind"))
      .union(psf.select(col("img_chan").cast("int"), col("pol").cast("int"),
        col("l_idx").cast("int"), col("m_idx").cast("int"),
        col("image").cast("double"), lit(1).as("kind")))
      .as[(Int, Int, Int, Int, Double, Int)]
    img.groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (Int, Int), it: Iterator[(Int, Int, Int, Int, Double, Int)]) =>
        val (chan, pol) = key
        val res = new Array[Double](nL * nM)
        val psfA = new Array[Double](psfL * psfM)
        for ((_, _, l, m, v, kind) <- it)
          if (kind == 0) res(l * nM + m) = v else psfA(l * psfM + m) = v
        val model = hogbom(res, psfA, nL, nM, psfL, psfM, gain, threshold, niter)
        (0 until nL).iterator.flatMap(l => (0 until nM).iterator.map(m =>
          CleanResult(chan, pol, l, m, model(l * nM + m), res(l * nM + m))))
      }.toDF()
  }
}
