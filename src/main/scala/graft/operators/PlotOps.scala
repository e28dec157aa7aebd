package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** visplot / implot rendering (`cngi/vis/visplot.py:56-105`,
  * `cngi/image/implot.py:20`) — the last reference surface the library
  * left as data-path-only. The reference thin-decimates the array,
  * collapses every non-plotted dim with max, and hands matplotlib a
  * scatter / pcolormesh; here the WHOLE reduction to screen pixels is
  * relational (distributed, oracle-checkable) and only the final
  * canvas — at most width x height gray values, never fact-sized —
  * is collected into a JDK PNG encoder (javax.imageio, the same
  * dependency-free codec MultimodalOps already uses).
  *
  * 100 TB story: a preview plot of a 100 TB table is a groupBy onto
  * <= tsize^2 pixels — one map-side-combined aggregate, shuffle bounded
  * by the canvas, exactly the reference's thin+max collapse re-expressed
  * as aggregation instead of striding (striding assumes an indexable
  * dense array; a distributed long-form table has no cheap stride, but
  * pixel-binning gives the same preview with one scan).
  */
object PlotOps {

  /** Scatter-density rasterization of (x, y) points onto a w x h
    * canvas (visplot's 2-axis scatter). Pixel coordinates bin the
    * min/max-scaled axes; intensity is the point count, darker = more
    * points (255 - min(count, 255), exact integers). Bounds ride the
    * plan as a broadcast scalar aggregate — no eager driver action.
    */
  def visplotPixels(df: DataFrame, xCol: String, yCol: String,
                    width: Int = 250, height: Int = 250,
                    bounds: Option[(Double, Double, Double, Double)] = None)
      : DataFrame = {
    // bounds: pass fixed (xmin, xmax, ymin, ymax) to skip the extra
    // bounds scan — at 100 TB the axis ranges are usually known (or
    // cheaply read from partition/footer stats) and halving the scans
    // halves the plot's cost.
    val b = bounds match {
      case Some((x0, x1, y0, y1)) =>
        df.sparkSession.range(1).select(lit(x0).as("_xmin"),
          lit(x1).as("_xmax"), lit(y0).as("_ymin"), lit(y1).as("_ymax"))
      case None => df.agg(
        min(col(xCol).cast("double")).as("_xmin"),
        max(col(xCol).cast("double")).as("_xmax"),
        min(col(yCol).cast("double")).as("_ymin"),
        max(col(yCol).cast("double")).as("_ymax"))
    }
    // clamp: a no-op when bounds came from the data's own min/max, but
    // with caller-fixed bounds it pins out-of-range points to the edge
    // pixels instead of emitting off-canvas bins
    def px(c: Column, lo: Column, hi: Column, n: Int): Column =
      least(greatest(
        when(hi > lo,
          floor((c.cast("double") - lo) / (hi - lo) * (n - 1) + 0.5))
          .otherwise(0.0), lit(0.0)), lit((n - 1).toDouble)).cast("int")
    // null on either axis is unplottable — drop instead of letting the
    // null-skipping greatest/least silently pin those rows to (0, 0)
    df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .crossJoin(broadcast(b))
      .select(px(col(xCol), col("_xmin"), col("_xmax"), width).as("x_px"),
        px(col(yCol), col("_ymin"), col("_ymax"), height).as("y_px"))
      .groupBy("x_px", "y_px")
      .agg(count(lit(1)).as("n_points"))
      .withColumn("gray",
        (lit(255) - least(col("n_points"), lit(255L))).cast("int"))
  }

  /** Raster normalization of a keyed image plane to 8-bit gray
    * (implot's pcolormesh): collapse any non-plotted dims FIRST with
    * an order-free aggregate (the reference uses max), then scale the
    * value range to 0..255 with floor(x + 0.5) rounding. One aggregate
    * onto the (l, m) raster + one broadcast min/max — shuffle bounded
    * by the image size.
    */
  def implotPixels(df: DataFrame, lCol: String, mCol: String,
                   valCol: String): DataFrame = {
    val plane = df.groupBy(col(lCol).as("l_px"), col(mCol).as("m_px"))
      .agg(max(col(valCol).cast("double")).as("_v"))
    val b = plane.agg(min(col("_v")).as("_vmin"), max(col("_v")).as("_vmax"))
    plane.crossJoin(broadcast(b))
      .select(col("l_px"), col("m_px"),
        when(col("_vmax") > col("_vmin"),
          floor((col("_v") - col("_vmin")) / (col("_vmax") - col("_vmin"))
            * 255 + 0.5))
          .otherwise(0.0).cast("int").as("gray"))
  }

  /** Render a pixel table (xCol, yCol, gray 0-255) to PNG bytes.
    * Collects exactly width x height rows — canvas-sized by
    * construction (the pixel tables above cannot exceed it); absent
    * pixels paint white. Lossless PNG: PlotOpsSpec round-trips the
    * bytes through ImageIO and gets the gray table back bit-exact.
    */
  def renderPng(pixels: DataFrame, xCol: String, yCol: String,
                grayCol: String, width: Int, height: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, 255); x += 1 }
      y += 1
    }
    pixels.select(col(xCol).cast("int"), col(yCol).cast("int"),
        col(grayCol).cast("int"))
      .collect().foreach { r =>
        val (x, yy, g) = (r.getInt(0), r.getInt(1), r.getInt(2))
        if (x >= 0 && x < width && yy >= 0 && yy < height)
          raster.setSample(x, yy, 0, math.max(0, math.min(255, g)))
      }
    val out = new ByteArrayOutputStream()
    ImageIO.setUseCache(false)
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** visplot (`cngi/vis/visplot.py:56-105`): preview PNG of y vs x. */
  def visplotPng(df: DataFrame, xCol: String, yCol: String,
                 width: Int = 250, height: Int = 250): Array[Byte] =
    renderPng(visplotPixels(df, xCol, yCol, width, height),
      "x_px", "y_px", "gray", width, height)

  /** implot (`cngi/image/implot.py:20`): preview PNG of an image
    * plane; (l, m) keys are used as pixel coordinates directly (the
    * raster is already gridded), values normalized to 8-bit.
    */
  def implotPng(df: DataFrame, lCol: String, mCol: String,
                valCol: String, width: Int, height: Int): Array[Byte] =
    renderPng(implotPixels(df, lCol, mCol, valCol),
      "l_px", "m_px", "gray", width, height)
}
