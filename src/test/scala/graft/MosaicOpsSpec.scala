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

  test("mosaic gridder with one type and zero offset matches the standard gridder") {
    val vis = pointVis(0)
    val (gcf, _) = MosaicOps.makeGcf(Map(0 -> 25.0), baseDish = 25.0)
    val mosaic = MosaicOps.makeImageMosaic(spark, vis, p, gcf, Map(0 -> ((0.0, 0.0))))
    val standard = GridOps.makeImage(spark,
      vis.drop("cf_type", "field_id"), p)
    val j = mosaic.as("a").join(standard.as("b"),
      Seq("img_chan", "pol", "l_idx", "m_idx"))
    val bad = j.where(abs(col("a.image") - col("b.image")) > 1e-9).count()
    assert(bad === 0L)
  }

  test("per-field phase gradient steers the point source off center") {
    val vis = pointVis(fieldId = 1)
    val (gcf, _) = MosaicOps.makeGcf(Map(0 -> 25.0), baseDish = 25.0)
    // offset of 3 cells in l: dl = 3 * cell
    val img = MosaicOps.makeImageMosaic(spark, vis, p, gcf,
      Map(1 -> ((3 * 0.002, 0.0))))
    val rows = img.collect()
    val peak = rows.maxBy(r => math.abs(r.getDouble(4)))
    assert(peak.getInt(2) != 8 || peak.getInt(3) != 8,
      "peak should move off the phase center")
    // peak lands on the m-center row, displaced along l
    assert(peak.getInt(3) === 8)
    assert(math.abs(peak.getInt(2) - 8) === 3, s"peak at ${peak.getInt(2)}")
  }

  test("smaller dish type gets larger support kernel") {
    val (gcf, _) = MosaicOps.makeGcf(Map(0 -> 25.0, 1 -> 12.0), baseDish = 25.0)
    assert(gcf(1).support > gcf(0).support)
    assert(gcf(0).support === 7)
  }
}
