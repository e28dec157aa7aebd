package graft.operators

import org.apache.spark.sql.DataFrame

/** Declared-but-unimplemented surface — EXACT parity with the
  * reference, which ships these as docstring + NotImplementedError
  * stubs (SURVEY.md §2.8 stub rows; e.g. ngcasa/flagging/shadow.py:53,
  * elevation.py:40, auto_uvbin.py:44, ngcasa/imaging/make_sd_image.py,
  * cngi/vis/reframe.py:62-95 — the reference's reframe is itself
  * non-functional, see SURVEY §2.8).
  *
  * A user of the reference switching to this library sees the same
  * API names fail the same way, rather than silently missing methods.
  */
object Stubs {

  private def ni(name: String, ref: String): Nothing =
    throw new NotImplementedError(
      s"$name is not implemented (parity with reference stub at $ref)")

  // flagging stubs (ngcasa/flagging/*.py)
  /** Kept for API parity; real implementations of the documented
    * semantics exist — FlagOps.autoRflag / FlagOps.autoTfcrop (the
    * `auto_rflag` / `auto_tfcrop` contract queries).
    */
  def autoRflag(df: DataFrame): DataFrame = ni("auto_rflag", "ngcasa/flagging/auto_rflag.py")
  def autoTfcrop(df: DataFrame): DataFrame = ni("auto_tfcrop", "ngcasa/flagging/auto_tfcrop.py")
  /** Kept for API parity; the real implementation is
    * FlagOps.autoUvBin (the `auto_uvbin` contract query).
    */
  def autoUvbin(df: DataFrame): DataFrame = ni("auto_uvbin", "ngcasa/flagging/auto_uvbin.py:44")
  /** Kept for API parity; real implementations of the stubbed
    * semantics exist — FlagOps.elevationFlag / FlagOps.shadow (the
    * `elevation_flag` / `shadow_flag` contract queries).
    */
  def elevation(df: DataFrame): DataFrame = ni("elevation", "ngcasa/flagging/elevation.py:40")
  /** Kept for API parity; real implementations of the stubbed
    * semantics exist — FlagOps.extendFlags / FlagOps.quack (the
    * `extend_flag` / `quack_flag` contract queries).
    */
  def extendFlags(df: DataFrame): DataFrame = ni("extend", "ngcasa/flagging/extend.py")
  def quack(df: DataFrame): DataFrame = ni("quack", "ngcasa/flagging/quack.py")
  def shadow(df: DataFrame): DataFrame = ni("shadow", "ngcasa/flagging/shadow.py:53")

  // imaging / calibration / deconvolution stubs
  /** Kept for API parity; the real implementation is
    * GridOps.predictComponentVis (the `predict_component` query).
    */
  def predictModelvisComponent(df: DataFrame): DataFrame =
    ni("predict_modelvis_component", "ngcasa/imaging/predict_modelvis_component.py")
  /** Kept for API parity; the _degrid core the reference's stub
    * sketches IS implemented here — see GridOps.degridVis (the
    * `degrid_vis` contract query).
    */
  def predictModelvisImage(df: DataFrame): DataFrame =
    ni("predict_modelvis_image", "ngcasa/imaging/predict_modelvis_image.py")
  /** Kept for API parity; the real implementation of all three SD
    * planes (image / psf / weight) is GridOps.makeSdImage (the
    * `make_sd_image` contract query).
    */
  def makeSdImage(df: DataFrame): DataFrame = ni("make_sd_image", "ngcasa/imaging/make_sd_image.py")
  def makeSdPsf(df: DataFrame): DataFrame = ni("make_sd_psf", "ngcasa/imaging/make_sd_psf.py")
  /** Kept for API parity; the real implementation is BeamOps.feather
    * (the `feather` contract query).
    */
  def feather(a: DataFrame, b: DataFrame): DataFrame = ni("feather", "ngcasa/imaging/feather.py")
  /** Kept for API parity; the real implementation is
    * ImageOps.linearMosaic (the `linear_mosaic` contract query).
    */
  def linearMosaic(df: DataFrame): DataFrame = ni("linear_mosaic", "ngcasa/imaging/linear_mosaic.py")
  /** Kept for API parity; the MS-Clean (nterms=1) option is really
    * implemented as CleanOps.msCleanPlanes (the
    * `deconvolve_multiscale_clean` / `msclean_one_iter` queries).
    */
  def deconvolveMultitermClean(df: DataFrame): DataFrame =
    ni("deconvolve_multiterm_clean", "ngcasa/deconvolution/deconvolve_multiterm_clean.py")
  def deconvolveAdaptiveScaleClean(df: DataFrame): DataFrame =
    ni("deconvolve_adaptive_scale_pixel_clean", "ngcasa/deconvolution/deconvolve_adaptive_scale_pixel_clean.py")
  /** Kept for API parity; the real implementation is
    * CleanOps.fastResolve (the `deconvolve_fast_resolve` query).
    */
  def deconvolveFastResolve(df: DataFrame): DataFrame =
    ni("deconvolve_fast_resolve", "ngcasa/deconvolution/deconvolve_fast_resolve.py")
  /** Kept for API parity; the real implementation is CleanOps.rmClean
    * (the `deconvolve_rm_clean` / `rmclean_one_iter` queries).
    */
  def deconvolveRotationMeasureClean(df: DataFrame): DataFrame =
    ni("deconvolve_rotation_measure_clean", "ngcasa/deconvolution/deconvolve_rotation_measure_clean.py")
  /** Kept for API parity; real implementations exist —
    * CleanOps.restoreModel / makeMask / isConverged (the
    * `restore_model` / `make_mask` / `is_converged` queries).
    */
  def restoreModel(df: DataFrame): DataFrame = ni("restore_model", "ngcasa/deconvolution/restore_model.py")
  def makeMask(df: DataFrame): DataFrame = ni("make_mask", "ngcasa/deconvolution/make_mask.py")
  def isConverged(df: DataFrame): Boolean = ni("is_converged", "ngcasa/deconvolution/is_converged.py")
  /** Kept for API parity; gain application is CalOps.applyGains (the
    * `apply_gains` contract query).
    */
  def applyCalibration(df: DataFrame): DataFrame =
    ni("apply_calibration", "ngcasa/calibration/apply_calibration.py")
  /** Kept for API parity; the real implementation is
    * AverageOps.reframe (the `reframe` contract query).
    */
  def reframe(df: DataFrame): DataFrame =
    ni("reframe", "cngi/vis/reframe.py:62-95 (broken in reference: undefined vars)")
}
