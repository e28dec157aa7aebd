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
  * Every entry whose semantics ARE implemented elsewhere in this
  * library carries `@deprecated` naming the real operator, so calling
  * the dead parity stub instead of the live implementation is a
  * compile-time warning, not a runtime surprise.
  */
object Stubs {

  private def ni(name: String, ref: String): Nothing =
    throw new NotImplementedError(
      s"$name is not implemented (parity with reference stub at $ref)")

  // flagging stubs (ngcasa/flagging/*.py)
  @deprecated("parity stub; use FlagOps.autoRflag (the auto_rflag query)", "0.8")
  def autoRflag(df: DataFrame): DataFrame = ni("auto_rflag", "ngcasa/flagging/auto_rflag.py")
  @deprecated("parity stub; use FlagOps.autoTfcrop (the auto_tfcrop query)", "0.8")
  def autoTfcrop(df: DataFrame): DataFrame = ni("auto_tfcrop", "ngcasa/flagging/auto_tfcrop.py")
  @deprecated("parity stub; use FlagOps.autoUvBin (the auto_uvbin query)", "0.8")
  def autoUvbin(df: DataFrame): DataFrame = ni("auto_uvbin", "ngcasa/flagging/auto_uvbin.py:44")
  @deprecated("parity stub; use FlagOps.elevationFlag (the elevation_flag query)", "0.8")
  def elevation(df: DataFrame): DataFrame = ni("elevation", "ngcasa/flagging/elevation.py:40")
  @deprecated("parity stub; use FlagOps.extendFlags (the extend_flag query)", "0.8")
  def extendFlags(df: DataFrame): DataFrame = ni("extend", "ngcasa/flagging/extend.py")
  @deprecated("parity stub; use FlagOps.quack (the quack_flag query)", "0.8")
  def quack(df: DataFrame): DataFrame = ni("quack", "ngcasa/flagging/quack.py")
  @deprecated("parity stub; use FlagOps.shadow (the shadow_flag query)", "0.8")
  def shadow(df: DataFrame): DataFrame = ni("shadow", "ngcasa/flagging/shadow.py:53")

  // imaging / calibration / deconvolution stubs
  @deprecated("parity stub; use GridOps.predictComponentVis (the predict_component query)", "0.8")
  def predictModelvisComponent(df: DataFrame): DataFrame =
    ni("predict_modelvis_component", "ngcasa/imaging/predict_modelvis_component.py")
  @deprecated("parity stub; use GridOps.degridVis (the degrid_vis query)", "0.8")
  def predictModelvisImage(df: DataFrame): DataFrame =
    ni("predict_modelvis_image", "ngcasa/imaging/predict_modelvis_image.py")
  @deprecated("parity stub; use GridOps.makeSdImage (the make_sd_image query)", "0.8")
  def makeSdImage(df: DataFrame): DataFrame = ni("make_sd_image", "ngcasa/imaging/make_sd_image.py")
  @deprecated("parity stub; use GridOps.makeSdImage(doPsf = true)", "0.8")
  def makeSdPsf(df: DataFrame): DataFrame = ni("make_sd_psf", "ngcasa/imaging/make_sd_psf.py")
  @deprecated("parity stub; use BeamOps.feather (the feather query)", "0.8")
  def feather(a: DataFrame, b: DataFrame): DataFrame = ni("feather", "ngcasa/imaging/feather.py")
  @deprecated("parity stub; use ImageOps.linearMosaic (the linear_mosaic query)", "0.8")
  def linearMosaic(df: DataFrame): DataFrame = ni("linear_mosaic", "ngcasa/imaging/linear_mosaic.py")
  @deprecated("parity stub; use CleanOps.msCleanPlanes (the deconvolve_multiscale_clean query)", "0.8")
  def deconvolveMultitermClean(df: DataFrame): DataFrame =
    ni("deconvolve_multiterm_clean", "ngcasa/deconvolution/deconvolve_multiterm_clean.py")
  @deprecated("parity stub; use CleanOps.aspCleanPlanes (the deconvolve_asp_clean query)", "0.8")
  def deconvolveAdaptiveScaleClean(df: DataFrame): DataFrame =
    ni("deconvolve_adaptive_scale_pixel_clean", "ngcasa/deconvolution/deconvolve_adaptive_scale_pixel_clean.py")
  @deprecated("parity stub; use CleanOps.fastResolve (the deconvolve_fast_resolve query)", "0.8")
  def deconvolveFastResolve(df: DataFrame): DataFrame =
    ni("deconvolve_fast_resolve", "ngcasa/deconvolution/deconvolve_fast_resolve.py")
  @deprecated("parity stub; use CleanOps.rmClean (the deconvolve_rm_clean query)", "0.8")
  def deconvolveRotationMeasureClean(df: DataFrame): DataFrame =
    ni("deconvolve_rotation_measure_clean", "ngcasa/deconvolution/deconvolve_rotation_measure_clean.py")
  @deprecated("parity stub; use CleanOps.restoreModel (the restore_model query)", "0.8")
  def restoreModel(df: DataFrame): DataFrame = ni("restore_model", "ngcasa/deconvolution/restore_model.py")
  @deprecated("parity stub; use CleanOps.makeMask (the make_mask query)", "0.8")
  def makeMask(df: DataFrame): DataFrame = ni("make_mask", "ngcasa/deconvolution/make_mask.py")
  @deprecated("parity stub; use CleanOps.isConverged (the is_converged query)", "0.8")
  def isConverged(df: DataFrame): Boolean = ni("is_converged", "ngcasa/deconvolution/is_converged.py")
  @deprecated("parity stub; use CalOps.applyGains (the apply_gains query)", "0.8")
  def applyCalibration(df: DataFrame): DataFrame =
    ni("apply_calibration", "ngcasa/calibration/apply_calibration.py")
  @deprecated("parity stub; use AverageOps.reframe (the reframe query)", "0.8")
  def reframe(df: DataFrame): DataFrame =
    ni("reframe", "cngi/vis/reframe.py:62-95 (broken in reference: undefined vars)")
}
