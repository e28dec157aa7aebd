package graft

import org.apache.spark.sql.functions._
import graft.operators.{GridOps, MosaicOps}
import graft.operators.GridOps.GridParams

class MosaicOpsSpec extends SparkSpec {
  import spark.implicits._

  private val p = GridParams((32, 32), (0.002, 0.002), imageSize = Some((16, 16)))

  private def pointVis(fieldId: Int) = {
    val rng = new scala.util.Random(11)
    (0 until 300).map { _ =>
      val scale = 1.5e9 * 0.002 * 32 / GridOps.SpeedOfLight
      (0, 0, (rng.nextDouble() - 0.5) / scale * 16,
        (rng.nextDouble() - 0.5) / scale * 16,
        2.0, 0.0, 1.0, 1.5e9, 0, fieldId)
    }.toDF("img_chan", "pol", "u", "v", "re", "im", "weight", "freq",
      "cf_type", "field_id")
  }

  test("mosaic gridder with one type and zero offset matches the standard grid") {
    // with zero field offset the complex kernel degenerates to the real
    // PSWF, so the raw uv grids must agree exactly (images differ only
    // by the mosaic path's Re(norm^2) sum-weight + sinc normalization)
    val vis = pointVis(0)
    val (gcf, _) = MosaicOps.makeGcf(Map(0 -> 25.0), baseDish = 25.0)
    val mosaic = MosaicOps.gridPlanesMosaic(spark, vis, p, gcf,
      Map(0 -> ((0.0, 0.0)))).collect().head
    val standard = GridOps.gridPlanes(spark,
      vis.drop("cf_type", "field_id"), p).collect().head
    val maxDiff = mosaic.grid.zip(standard.grid)
      .map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff < 1e-12)
  }

  test("per-field phase gradient steers the PRIMARY BEAM, not the source") {
    // kernel-side gradient (reference _aperture_grid_jit): the source
    // stays at the phase center; the PB envelope shifts toward the
    // field offset, tilting the image asymmetrically along l
    val vis = pointVis(fieldId = 1)
    val (gcf, _) = MosaicOps.makeGcf(Map(0 -> 25.0), baseDish = 25.0)
    val img = MosaicOps.makeImageMosaic(spark, vis, p, gcf,
      Map(1 -> ((3 * 0.002, 0.0)))) // offset of 3 cells in +l
    val rows = img.collect()
      .map(r => (r.getInt(2), r.getInt(3)) -> r.getDouble(4)).toMap
    val peak = rows.maxBy(kv => math.abs(kv._2))
    assert(peak._1 === ((8, 8)), "point source stays at the phase center")
    assert(rows((9, 8)) - rows((7, 8)) > 0.02,
      "PB envelope should tilt toward the +l field offset")
  }

  test("smaller dish type gets larger support kernel") {
    val (gcf, _) = MosaicOps.makeGcf(Map(0 -> 25.0, 1 -> 12.0), baseDish = 25.0)
    assert(gcf(1).support > gcf(0).support)
    assert(gcf(0).support === 7)
  }
}
