package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._
import graft.operators.PlotOps

/** visplot/implot rendering: the rasterization is relational (and
  * oracle-gated as visplot_render / implot_render); here the PNG shell
  * is proven lossless — encode the pixel table, decode with ImageIO,
  * get the same gray values back.
  */
class PlotOpsSpec extends SparkSpec {
  import spark.implicits._

  private def decode(png: Array[Byte]): java.awt.image.BufferedImage =
    ImageIO.read(new ByteArrayInputStream(png))

  test("implotPixels collapses with max and normalizes to 0..255") {
    val df = Seq(
      (0, 0, 1.0), (0, 0, 3.0), // duplicate cell -> max = 3
      (1, 0, 5.0), (0, 1, 4.0)).toDF("l", "m", "v")
    val px = PlotOps.implotPixels(df, "l", "m", "v").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    // range 3..5 -> 3 maps to 0, 5 to 255, 4 to 128 (floor(127.5+0.5))
    assert(px === Map((0, 0) -> 0, (1, 0) -> 255, (0, 1) -> 128))
  }

  test("visplotPixels bins points and darkens with density") {
    val pts = Seq((0.0, 0.0), (0.0, 0.0), (10.0, 10.0)).toDF("x", "y")
    val px = PlotOps.visplotPixels(pts, "x", "y", width = 11, height = 11)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getInt(3)))
      .toMap
    assert(px === Map((0, 0) -> ((2L, 253)), (10, 10) -> ((1L, 254))))
  }

  test("renderPng is lossless: decode returns the same gray raster") {
    val df = Seq((0, 0, 0.0), (1, 0, 10.0), (0, 1, 2.5), (1, 1, 7.5))
      .toDF("l", "m", "v")
    val png = PlotOps.implotPng(df, "l", "m", "v", width = 2, height = 2)
    val img = decode(png)
    assert(img.getWidth === 2 && img.getHeight === 2)
    val r = img.getRaster
    assert(r.getSample(0, 0, 0) === 0)
    assert(r.getSample(1, 0, 0) === 255)
    assert(r.getSample(0, 1, 0) === 64)  // floor(2.5/10*255+0.5)
    assert(r.getSample(1, 1, 0) === 191) // floor(7.5/10*255+0.5)
  }

  test("visplotPixels with fixed bounds skips the scan and clamps outliers") {
    val pts = Seq((5.0, 5.0), (99.0, -3.0)).toDF("x", "y")
    val px = PlotOps.visplotPixels(pts, "x", "y", width = 11, height = 11,
        bounds = Some((0.0, 10.0, 0.0, 10.0)))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    // (5,5) lands mid-canvas; (99,-3) clamps to the (10, 0) corner
    assert(px === Set((5, 5), (10, 0)))
  }

  test("visplotPixels drops null-axis rows instead of pinning them to (0,0)") {
    val pts = Seq((Some(0.0), Some(0.0)), (None, Some(1.0)),
        (Some(1.0), None), (Some(10.0), Some(10.0)))
      .toDF("x", "y")
    val px = PlotOps.visplotPixels(pts, "x", "y", width = 11, height = 11)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(px === Map((0, 0) -> 1L, (10, 10) -> 1L))
  }

  test("visplotPng paints unhit pixels white") {
    val pts = Seq((0.0, 0.0), (3.0, 3.0)).toDF("x", "y")
    val png = PlotOps.visplotPng(pts, "x", "y", width = 4, height = 4)
    val img = decode(png)
    val r = img.getRaster
    assert(r.getSample(0, 0, 0) === 254) // one point
    assert(r.getSample(3, 3, 0) === 254)
    assert(r.getSample(2, 1, 0) === 255) // empty canvas stays white
  }
}
