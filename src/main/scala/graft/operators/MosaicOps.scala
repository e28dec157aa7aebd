package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import GridOps.{GridParams, PartialPlane, SpeedOfLight}

/** Mosaic (aperture) gridding — the reference's
  * make_gridding_convolution_function
  * (ngcasa/imaging/make_gridding_convolution_function.py:36-620) +
  * _graph_aperture_grid (_imaging_utils/_aperture_grid.py:25-530):
  * like the standard gridder, but the convolution kernel is looked up
  * per baseline TYPE (antenna-pair dish combination) and a per-FIELD
  * phase gradient steers each pointing to its offset in the mosaic.
  *
  * Spark-first shape: the kernel table is a tiny broadcastable
  * structure (n_baseline_types x oversampled support — the reference
  * notes the same, SURVEY.md §2.8) captured in the task closure; the
  * per-field phase gradient is the common-tangent small-offset phasor
  * e^{2 pi i (u dl + v dm) f / c} applied to the visibility before the
  * scatter (simplified from the reference's per-field gradient applied
  * to the aperture function — same first-order mosaic steering,
  * documented divergence). Partial-plane merge is identical to the
  * standard gridder.
  */
object MosaicOps {

  /** Per-baseline-type oversampled 1-D kernel + support. */
  final case class Gcf(cgk: Array[Double], support: Int, oversampling: Int)

  /** make_gridding_convolution_function analog: PSWF kernels whose
    * support scales inversely with dish diameter (larger dish =>
    * tighter aperture => smaller uv support), one per baseline type.
    * Returns (kernels by type, phase gradient (dl, dm) by field).
    */
  def makeGcf(dishDiameters: Map[Int, Double], baseDish: Double,
              baseSupport: Int = 7, oversampling: Int = 100,
              fieldOffsets: Map[Int, (Double, Double)] = Map.empty)
      : (Map[Int, Gcf], Map[Int, (Double, Double)]) = {
    val kernels = dishDiameters.map { case (t, d) =>
      val support = math.max(3,
        (baseSupport * baseDish / d).round.toInt | 1) // odd support
      t -> Gcf(GridOps.cgk1D(oversampling, support), support, oversampling)
    }
    (kernels, fieldOffsets)
  }

  /** Gridder input with kernel type and field. */
  final case class MosaicVis(img_chan: Int, pol: Int, u: Double, v: Double,
                             re: Double, im: Double, weight: Double,
                             freq: Double, cf_type: Int, field_id: Int)

  private def gridPartitionMosaic(rows: Iterator[MosaicVis], p: GridParams,
                                  gcf: Map[Int, Gcf],
                                  fieldOffsets: Map[Int, (Double, Double)])
      : Iterator[PartialPlane] = {
    val (nU, nV) = (p.nU, p.nV)
    val (cU, cV) = (nU / 2, nV / 2)
    val planes = mutable.LinkedHashMap.empty[(Int, Int), PartialPlane]
    for (r <- rows) {
      val kern = gcf.getOrElse(r.cf_type, null)
      if (kern != null) {
        val sc = kern.support / 2
        val os = kern.oversampling
        val u = r.u * (-(r.freq * p.deltaLM._1 * nU) / SpeedOfLight)
        val v = r.v * (-(r.freq * p.deltaLM._2 * nV) / SpeedOfLight)
        if (!u.isNaN && !v.isNaN) {
          val uPos = u + cU; val vPos = v + cV
          val uc = (uPos + 0.5).toInt; val vc = (vPos + 0.5).toInt
          if (uc + sc < nU && vc + sc < nV && uc - sc >= 0 && vc - sc >= 0) {
            val uFrac = math.floor((uc - uPos) * os + 0.5).toInt
            val vFrac = math.floor((vc - vPos) * os + 0.5).toInt
            // per-field mosaic steering phasor
            val (dl, dm) = fieldOffsets.getOrElse(r.field_id, (0.0, 0.0))
            val theta = 2.0 * math.Pi * (r.u * dl + r.v * dm) * r.freq / SpeedOfLight
            val (pc, ps) = (math.cos(theta), math.sin(theta))
            val vRe = r.re * pc - r.im * ps
            val vIm = r.re * ps + r.im * pc
            val (wRe, wIm, selW) = (vRe * r.weight, vIm * r.weight, r.weight)
            if (!(wRe.isNaN || wIm.isNaN) && (wRe != 0.0 || wIm != 0.0)) {
              val plane = planes.getOrElseUpdate((r.img_chan, r.pol),
                PartialPlane(r.img_chan, r.pol, new Array[Double](2 * nU * nV),
                  new Array[Boolean](nU * nV), 0.0))
              // [-sc, support-sc): exactly `support` taps either parity
              var norm = 0.0
              var iv = -sc
              while (iv < kern.support - sc) {
                val convV = kern.cgk(math.abs(os * iv + vFrac))
                var iu = -sc
                while (iu < kern.support - sc) {
                  val conv = kern.cgk(math.abs(os * iu + uFrac)) * convV
                  if (conv != 0.0) {
                    val cell = (uc + iu) * nV + (vc + iv)
                    plane.grid(2 * cell) += conv * wRe
                    plane.grid(2 * cell + 1) += conv * wIm
                    plane.touched(cell) = true
                  }
                  norm += conv
                  iu += 1
                }
                iv += 1
              }
              planes((r.img_chan, r.pol)) =
                plane.copy(sum_weight = plane.sum_weight + selW * norm)
            }
          }
        }
      }
    }
    planes.valuesIterator
  }

  /** Mosaic gridding: same partial/merge shape as the standard path. */
  def gridPlanesMosaic(spark: SparkSession, vis: DataFrame, p: GridParams,
                       gcf: Map[Int, Gcf],
                       fieldOffsets: Map[Int, (Double, Double)])
      : Dataset[PartialPlane] = {
    import spark.implicits._
    vis.select(col("img_chan").cast("int"), col("pol").cast("int"),
        col("u").cast("double"), col("v").cast("double"),
        col("re").cast("double"), col("im").cast("double"),
        col("weight").cast("double"), col("freq").cast("double"),
        col("cf_type").cast("int"), col("field_id").cast("int"))
      .as[MosaicVis]
      .mapPartitions(rows => gridPartitionMosaic(rows, p, gcf, fieldOffsets))
      .groupByKey(pl => (pl.img_chan, pl.pol))
      .reduceGroups(GridOps.mergePlanes _)
      .map(_._2)
  }

  /** make_image_with_gcf (ngcasa/imaging/make_image_with_gcf.py:20-210)
    * simplified: mosaic-grid then FFT+normalize like make_image.
    */
  def makeImageMosaic(spark: SparkSession, vis: DataFrame, p: GridParams,
                      gcf: Map[Int, Gcf],
                      fieldOffsets: Map[Int, (Double, Double)]): DataFrame = {
    import spark.implicits._
    val (nU, nV) = (p.nU, p.nV)
    val (nL, nM) = p.imgSize
    val corrU = GridOps.correcting1D(nU)
    val corrV = GridOps.correcting1D(nV)
    val (offL, offM) = (nU / 2 - nL / 2, nV / 2 - nM / 2)
    gridPlanesMosaic(spark, vis, p, gcf, fieldOffsets).flatMap { pl =>
      var re = new Array[Double](nU * nV)
      var im = new Array[Double](nU * nV)
      var i = 0
      while (i < nU * nV) { re(i) = pl.grid(2 * i); im(i) = pl.grid(2 * i + 1); i += 1 }
      re = graft.functions.Fft.fftshift2(re, nU, nV)
      im = graft.functions.Fft.fftshift2(im, nU, nV)
      graft.functions.Fft.fft2(re, im, nU, nV, invert = true)
      re = graft.functions.Fft.fftshift2(re, nU, nV)
      val sw = if (pl.sum_weight == 0.0) 1.0 else pl.sum_weight
      for (l <- 0 until nL; m <- 0 until nM) yield {
        val pix = re((l + offL) * nV + (m + offM))
        (pl.img_chan, pl.pol, l, m,
          pix / sw / (corrU(l + offL) * corrV(m + offM)), pl.sum_weight)
      }
    }.toDF("img_chan", "pol", "l_idx", "m_idx", "image", "sum_weight")
  }
}
