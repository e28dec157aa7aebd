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

  /** restore_model (ngcasa/deconvolution/restore_model.py — a
    * NotImplementedError stub in the reference; semantics from its
    * docstring): restored = model (x) clean-beam + residual, the
    * cube/single-term path ("smooth the model image to the target
    * resolution ... add"). At native resolution the residual passes
    * through unsmoothed; at a non-native target both planes are
    * convolved with the restoring beam.
    *
    * Spark shape: one per-plane FFT convolution (BeamOps.smooth) plus
    * an equi-join on the pixel key — the join is plane-partitioned and
    * the beam is image-sized, so shuffle volume is O(pixels), never
    * O(visibilities).
    */
  def restoreModel(spark: SparkSession, model: DataFrame, residual: DataFrame,
                   beam: DataFrame, nL: Int, nM: Int,
                   nativeResolution: Boolean = true): DataFrame = {
    val key = Seq("img_chan", "pol", "l_idx", "m_idx")
    val sm = BeamOps.smooth(spark, model, beam, nL, nM, valueCol = "model")
      .withColumnRenamed("smoothed", "_model_sm")
    val res =
      if (nativeResolution) residual.select(key.map(col) :+
        col("residual").as("_res"): _*)
      else BeamOps.smooth(spark, residual, beam, nL, nM, valueCol = "residual")
        .withColumnRenamed("smoothed", "_res")
    sm.join(res, key)
      .withColumn("restored", col("_model_sm") + col("_res"))
      .drop("_model_sm", "_res")
  }

  /** make_mask (ngcasa/deconvolution/make_mask.py — stub; docstring
    * semantics): the deconvolution mask is the INTERSECTION of
    * (a) an auto-mask — |image| above nSigma times the plane's robust
    *     noise (median absolute deviation scaled to gaussian sigma),
    * (b) a primary-beam limit — pb above pbLimit,
    * (c) an optional user region column (cngi.image.region output).
    *
    * Robust sigma per plane = 1.4826 * median(|v - median(v)|) — two
    * per-plane exact medians via percentile, computed group-local (a
    * plane is image-sized) and broadcast-joined back; the comparison
    * itself is a pure scan. At 100 TB the agg output is one row per
    * (chan, pol) plane — dimension-scale.
    */
  def makeMask(image: DataFrame, nSigma: Double, pbCol: Option[String] = None,
               pbLimit: Double = 0.2, regionCol: Option[String] = None,
               valueCol: String = "image"): DataFrame = {
    val planeKey = Seq(col("img_chan"), col("pol"))
    val med = image.groupBy(planeKey: _*)
      .agg(expr(s"percentile($valueCol, 0.5)").as("_med"))
    val dev = image.join(broadcast(med), Seq("img_chan", "pol"))
    val sig = dev
      .withColumn("_adev", abs(col(valueCol) - col("_med")))
      .groupBy(planeKey: _*)
      .agg(expr("percentile(_adev, 0.5)").as("_mad"))
      .withColumn("_sigma", col("_mad") * lit(1.4826))
      .select(col("img_chan"), col("pol"), col("_sigma"))
    val auto = abs(col(valueCol)) > lit(nSigma) * col("_sigma")
    val pbOk = pbCol.map(c => col(c) > lit(pbLimit)).getOrElse(lit(true))
    val regionOk = regionCol.map(col).getOrElse(lit(true))
    dev.join(broadcast(sig), Seq("img_chan", "pol"))
      .withColumn("mask", auto && pbOk && regionOk)
      .drop("_med", "_sigma")
  }

  /** is_converged (ngcasa/deconvolution/is_converged.py — stub;
    * docstring semantics): evaluate the current image set against the
    * stopping criteria and emit a convergence-history record. Applied
    * criteria (the docstring's ordered list): peak residual within the
    * mask <= threshold, total iterations >= niter. One aggregate row
    * per plane — a single hash agg, no driver-side data.
    */
  def isConverged(residual: DataFrame, itersDone: DataFrame,
                  threshold: Double, niter: Int,
                  maskCol: Option[String] = None): DataFrame = {
    val inMask = maskCol.map(col).getOrElse(lit(true))
    val peaks = residual
      .groupBy(col("img_chan"), col("pol"))
      .agg(max(when(inMask, abs(col("residual")))).as("peak_residual"))
    peaks.join(itersDone, Seq("img_chan", "pol"))
      .withColumn("hit_threshold", col("peak_residual") <= lit(threshold))
      .withColumn("hit_niter", col("iters_done") >= lit(niter))
      .withColumn("converged", col("hit_threshold") || col("hit_niter"))
  }
}
