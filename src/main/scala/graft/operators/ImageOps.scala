package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.complex._

/** Image-dataset operators (SURVEY.md §2.2, §2.8): coordinate-system
  * generation, boolean mask/region columns, polarization basis change.
  * All pure projections / generated tables — fully codegen'd, no UDFs.
  */
object ImageOps {

  /** make_empty_sky_image (cngi/image/make_empty_sky_image.py:18-82):
    * build the image coordinate system as a generated table — one row
    * per (l_idx, m_idx, time, chan, pol) with direction cosines (l, m)
    * and world coordinates (right_ascension, declination) from the
    * inverse SIN (orthographic) projection about the phase center.
    *
    * The reference delegates to astropy WCS; the only projection it
    * ever uses is SIN (make_empty_sky_image.py:59), whose closed form
    * is implemented here directly:
    *   dec = asin(m cos d0 + sqrt(1-l^2-m^2) sin d0)
    *   ra  = a0 + atan2(l, sqrt(1-l^2-m^2) cos d0 - m sin d0)
    * Pixel -> l/m uses the reference's convention l_i = (i - nx/2)*cell
    * (make_empty_sky_image.py:70-72).
    *
    * Scale: spark.range(nx*ny) is an embarrassingly parallel generated
    * scan — no shuffle; chan/pol/time expansion is a broadcast-size
    * cross join.
    */
  def makeEmptySkyImage(spark: SparkSession,
                        phaseCenter: (Double, Double),
                        imageSize: (Int, Int),
                        cellSize: (Double, Double),
                        chans: Seq[Double] = Seq(0.0),
                        pols: Seq[Int] = Seq(0),
                        times: Seq[Double] = Seq(0.0)): DataFrame = {
    val (nx, ny) = imageSize
    val (cx, cy) = cellSize
    val (ra0, dec0) = phaseCenter
    val base = spark.range(nx.toLong * ny)
      .select(
        (col("id") / ny).cast("int").as("l_idx"),
        (col("id") % ny).cast("int").as("m_idx"))
      .withColumn("l", (col("l_idx") - lit(nx / 2)) * lit(cx))
      .withColumn("m", (col("m_idx") - lit(ny / 2)) * lit(cy))
    val n = sqrt(lit(1.0) - col("l") * col("l") - col("m") * col("m"))
    val withWorld = base
      .withColumn("declination",
        asin(col("m") * lit(math.cos(dec0)) + n * lit(math.sin(dec0))))
      .withColumn("right_ascension",
        lit(ra0) + atan2(col("l"),
          n * lit(math.cos(dec0)) - col("m") * lit(math.sin(dec0))))
    // chan/pol/time expansion as literal-array explodes: one generate
    // chain, no join nodes (a broadcast-join chain here costs several
    // AQE replans per tiny dimension — measured seconds of fixed
    // overhead on a 256-row grid)
    val chanArr = array(chans.zipWithIndex.map { case (f, i) =>
      struct(lit(i).as("chan"), lit(f).as("chan_freq"))
    }: _*)
    withWorld
      .withColumn("_c", explode(chanArr))
      .withColumn("chan", col("_c.chan"))
      .withColumn("chan_freq", col("_c.chan_freq"))
      .drop("_c")
      .withColumn("pol", explode(array(pols.map(lit): _*)))
      .withColumn("time", explode(array(times.map(lit): _*)))
  }

  private def between(c: Column, lo: Double, hi: Double): Column =
    c > math.min(lo, hi) && c < math.max(lo, hi)

  /** mask (cngi/image/mask.py:65-80): boolean column that is TRUE where
    * the cell is EXCLUDED — the reference builds `zeros.where(cond,
    * True)`, i.e. False inside the ra/dec box, True outside, then ANDs
    * the world-coordinate, pixel (l/m) and pol/chan criteria.
    */
  def mask(df: DataFrame, name: String,
           raRange: (Double, Double), decRange: (Double, Double),
           lRange: (Double, Double), mRange: (Double, Double),
           pols: Seq[Int] = Nil, chans: Seq[Int] = Nil): DataFrame = {
    val outsideWorld = !(between(col("right_ascension"), raRange._1, raRange._2) &&
      between(col("declination"), decRange._1, decRange._2))
    val outsidePix = !(between(col("l"), lRange._1, lRange._2) &&
      between(col("m"), mRange._1, mRange._2))
    val m0 = outsideWorld && outsidePix
    val m1 = if (pols.isEmpty) m0 else m0 && !col("pol").isin(pols: _*)
    val m2 = if (chans.isEmpty) m1 else m1 && !col("chan").isin(chans: _*)
    df.withColumn(name, m2)
  }

  /** region (cngi/image/region.py:76-91): boolean column TRUE inside
    * the union (OR) of the world-coordinate box and the pixel box,
    * restricted (AND) to the selected pols/chans.
    */
  def region(df: DataFrame, name: String,
             raRange: (Double, Double), decRange: (Double, Double),
             lRange: (Double, Double), mRange: (Double, Double),
             pols: Seq[Int] = Nil, chans: Seq[Int] = Nil): DataFrame = {
    val insideWorld = between(col("right_ascension"), raRange._1, raRange._2) &&
      between(col("declination"), decRange._1, decRange._2)
    val insidePix = between(col("l"), lRange._1, lRange._2) &&
      between(col("m"), mRange._1, mRange._2)
    val r0 = insideWorld || insidePix
    val r1 = if (pols.isEmpty) r0 else r0 && col("pol").isin(pols: _*)
    val r2 = if (chans.isEmpty) r1 else r1 && col("chan").isin(chans: _*)
    df.withColumn(name, r2)
  }

  /** PB normalization tail of _normalize.py (flat_noise direction
    * 'forward'): divide the (already sum-weight/correcting-image
    * normalized) image by the primary-beam model, zeroing pixels below
    * pb_limit. Op-order note: the reference folds the PB into the one
    * combined divisor; dividing the normalized image by pb afterwards
    * is the same quantity composed per-operator (documented fp-path
    * difference, mirrored by the oracle).
    */
  def pbNormalize(image: DataFrame, pb: DataFrame, keys: Seq[String],
                  imageCol: String = "image", pbCol: String = "pb",
                  pbLimit: Double = 0.2): DataFrame =
    image.join(broadcast(pb.select((keys.map(col) :+ col(pbCol)): _*)), keys)
      .withColumn(imageCol,
        when(col(pbCol) < pbLimit, lit(0.0))
          .otherwise(col(imageCol) / col(pbCol)))
      .drop(pbCol)

  /** Inverse of stokesToCorr (linear basis): I=(XX+YY)/2, Q=(XX-YY)/2,
    * U=(XY+YX)/2, V=(XY-YX)/(2i) — the natural completion of the
    * basis-change pair (the reference ships only the forward form).
    */
  def corrToStokes(df: DataFrame, dims: Seq[String], polCol: String,
                   valueCol: String): DataFrame = {
    val piv = df.groupBy(dims.map(col): _*)
      .pivot(polCol, Seq(9, 10, 11, 12))
      .agg(first(col(valueCol)))
    val xx = col("9"); val xy = col("10"); val yx = col("11"); val yy = col("12")
    val half = lit(0.5)
    val stokes: Seq[(Int, Column)] = Seq(
      1 -> c_scale(c_add(xx, yy), half),
      2 -> c_scale(c_sub(xx, yy), half),
      3 -> c_scale(c_add(xy, yx), half),
      // (XY - YX) / (2i): divide by 2i == multiply by -0.5i
      4 -> c((im(xy) - im(yx)) * half, (re(yx) - re(xy)) * half))
    val packed = piv.select(dims.map(col) :+
      explode(array(stokes.map { case (code, expr) =>
        struct(lit(code).as(polCol), expr.as(valueCol))
      }: _*)).as("_c"): _*)
    packed.select(dims.map(col) :+ col(s"_c.$polCol") :+ col(s"_c.$valueCol"): _*)
  }

  /** linear_mosaic (beyond-parity — ngcasa/imaging/linear_mosaic.py is
    * a NotImplementedError stub): combine per-field images onto one
    * mosaic plane with the optimal (noise-minimizing) primary-beam
    * weighting  mosaic(p) = sum_f pb_f(p) img_f(p) / sum_f pb_f(p)^2.
    * One hash aggregate over the pixel key — fields need not be
    * co-partitioned, and the shuffle carries one row per (field,
    * pixel) only where the field's PB support overlaps the pixel.
    */
  def linearMosaic(fields: DataFrame, imgCol: String, pbCol: String,
                   pixelKeys: Seq[String]): DataFrame =
    fields.groupBy(pixelKeys.map(col): _*)
      .agg(sum(col(pbCol) * col(imgCol)).as("num"),
        sum(col(pbCol) * col(pbCol)).as("den"),
        count(lit(1)).as("n_fields"))
      .select((pixelKeys.map(col) :+
        when(col("den") =!= 0.0, col("num") / col("den"))
          .otherwise(lit(0.0)).as("mosaic_image") :+ col("n_fields")): _*)

  /** stokes_to_corr (cngi/image/stokes_to_corr.py:113-120 linear,
    * circular branch below it): polarization basis change from Stokes
    * rows (pol codes 1=I 2=Q 3=U 4=V) to correlation rows
    * (linear: 9=XX 10=XY 11=YX 12=YY; circular: 5=RR 6=RL 7=LR 8=LL).
    *
    *   XX = I + Q      XY = U + iV     YX = U - iV     YY = I - Q
    *   RR = I + V      RL = Q + iU     LR = Q - iU     LL = I - V
    *
    * Long-form shape: pivot pol up to 4 columns per group (bounded
    * pivot, no shuffle beyond the group-by), apply the 4 closed-form
    * expressions, explode back to rows. `value` is a complex
    * struct(re, im).
    */
  def stokesToCorr(df: DataFrame, dims: Seq[String], polCol: String,
                   valueCol: String, basis: String = "linear"): DataFrame = {
    val piv = df.groupBy(dims.map(col): _*)
      .pivot(polCol, Seq(1, 2, 3, 4))
      .agg(first(col(valueCol)))
    val i = col("1"); val q = col("2"); val u = col("3"); val v = col("4")
    val corrs: Seq[(Int, Column)] = basis.toLowerCase match {
      case b if b.startsWith("l") => Seq(
        9 -> c_add(i, q),
        10 -> c(re(u) - im(v), im(u) + re(v)), // U + iV
        11 -> c(re(u) + im(v), im(u) - re(v)), // U - iV
        12 -> c_sub(i, q))
      case _ => Seq(
        5 -> c_add(i, v),
        6 -> c(re(q) - im(u), im(q) + re(u)), // Q + iU
        7 -> c(re(q) + im(u), im(q) - re(u)), // Q - iU
        8 -> c_sub(i, v))
    }
    val packed = piv.select(dims.map(col) :+
      explode(array(corrs.map { case (code, expr) =>
        struct(lit(code).as(polCol), expr.as(valueCol))
      }: _*)).as("_c"): _*)
    packed.select(dims.map(col) :+ col(s"_c.$polCol") :+ col(s"_c.$valueCol"): _*)
  }
}
