package graft

import org.apache.spark.sql.functions._
import graft.functions.Fft
import graft.operators.GridOps
import graft.operators.GridOps.GridParams

class GridOpsSpec extends SparkSpec {
  import spark.implicits._

  test("FFT: forward+inverse roundtrip recovers input (up to N)") {
    val n = 8
    val re = Array.tabulate(n * n)(i => math.sin(i * 0.7))
    val im = Array.tabulate(n * n)(i => math.cos(i * 1.3))
    val (r2, i2) = (re.clone(), im.clone())
    Fft.fft2(r2, i2, n, n, invert = false)
    Fft.fft2(r2, i2, n, n, invert = true)
    // unnormalized: inverse(forward(x)) = N * x
    r2.zip(re).foreach { case (a, b) => assert(approx(a, b * n * n, 1e-9)) }
    i2.zip(im).foreach { case (a, b) => assert(approx(a, b * n * n, 1e-9)) }
  }

  test("FFT of a delta at origin is flat") {
    val n = 8
    val re = new Array[Double](n * n); val im = new Array[Double](n * n)
    re(0) = 1.0
    Fft.fft2(re, im, n, n, invert = false)
    re.foreach(v => assert(approx(v, 1.0)))
    im.foreach(v => assert(approx(v, 0.0)))
  }

  test("fftshift moves index 0 to the center and is an involution for even n") {
    val n = 4
    val a = Array.tabulate(n * n)(_.toDouble)
    val s = Fft.fftshift2(a, n, n)
    assert(s((n / 2) * n + n / 2) === a(0))
    assert(Fft.fftshift2(s, n, n).toSeq === a.toSeq)
  }

  test("PSWF kernel: peak at center, zero at edge, positive inside") {
    assert(GridOps.kernelValue(0.0) > 0.9)
    assert(GridOps.kernelValue(1.0) === 0.0)
    assert(GridOps.grdsf(1.5) === 0.0)
    val cgk = GridOps.cgk1D(100, 7)
    assert(cgk.length === 400)
    assert(cgk(0) === GridOps.kernelValue(0.0))
    assert(cgk(399) === 0.0) // tail beyond support edge
  }

  // A visibility set from a point source AT PHASE CENTER has
  // vis == flux for every (u, v): the dirty image must peak at the
  // center pixel with value ~= flux (SURVEY.md §5 analytic fixture).
  private def pointSourceVis(flux: Double) = {
    val rng = new scala.util.Random(7)
    val c = GridOps.SpeedOfLight
    // uv in meters such that scaled |uv| stays well inside the 32-grid
    (0 until 200).map { _ =>
      val scaleMax = 1.5e9 * 0.002 * 32 / c // ~0.32 cells per meter
      (0, 0, (rng.nextDouble() - 0.5) * 20 / scaleMax / 20,
        (rng.nextDouble() - 0.5) * 20 / scaleMax / 20,
        flux, 0.0, 1.0, 1.5e9)
    }.toDF("img_chan", "pol", "u", "v", "re", "im", "weight", "freq")
  }

  private val p32 = GridParams((32, 32), (0.002, 0.002))

  test("gridder: point source at phase center -> image peaks at center with flux") {
    // pad 32 -> crop 16: the correction function blows up edge pixels of
    // the PADDED plane (grdsf -> 0 at the edge), which is exactly why the
    // reference grids padded and crops (make_image.py:118-121)
    val p = GridParams((32, 32), (0.002, 0.002), imageSize = Some((16, 16)))
    val img = GridOps.makeImage(spark, pointSourceVis(2.5), p)
    val rows = img.collect()
    assert(rows.length === 16 * 16)
    val center = rows.find(r => r.getInt(2) == 8 && r.getInt(3) == 8).get
    assert(approx(center.getDouble(4), 2.5, 1e-2),
      s"center pixel ${center.getDouble(4)} != flux 2.5")
    // center is the global max of the cropped image
    val maxPix = rows.map(_.getDouble(4)).max
    assert(center.getDouble(4) === maxPix)
  }

  test("psf: peak of unit-weight psf at center is 1 after normalization") {
    val psf = GridOps.makePsf(spark, pointSourceVis(9.9), p32)
    val center = psf.collect().find(r => r.getInt(2) == 16 && r.getInt(3) == 16).get
    assert(approx(center.getDouble(4), 1.0, 1e-2))
  }

  test("makeGrid sum_weight equals sum(weight * kernel norm)") {
    val (grid, sumW) = GridOps.makeGrid(spark, pointSourceVis(1.0), p32)
    assert(grid.count() > 0)
    val sw = sumW.head().getDouble(2)
    // 200 rows of weight 1; per-row norm = (sum of 7 kernel taps)^2 at
    // the row's fractional offset, bounded by support^2 * peak
    assert(sw > 0 && sw < 200 * 49)
  }

  test("partial grids merge across partitions identically to single partition") {
    val vis = pointSourceVis(1.0)
    val one = GridOps.makeGrid(spark, vis.coalesce(1), p32)._1
    val many = GridOps.makeGrid(spark, vis.repartition(7), p32)._1
    val j = one.as("a").join(many.as("b"),
      Seq("img_chan", "pol", "u_idx", "v_idx"), "full_outer")
    val mism = j.where(
      abs(col("a.grid_re") - col("b.grid_re")) > 1e-9 ||
        abs(col("a.grid_im") - col("b.grid_im")) > 1e-9 ||
        col("a.grid_re").isNull || col("b.grid_re").isNull).count()
    assert(mism === 0L)
  }

  test("imaging weights: uniform per-cell sums are 1/2 on a Hermitian-symmetric fixture") {
    // Symmetrize the uv coverage: for every (u,v) row add its (-u,-v)
    // mirror. The gridder also accumulates each row at its conjugate
    // cell (_standard_grid_jit do_imaging_weight), so every cell's
    // gridded weight W = 2 x (its primary weight P) and uniform
    // weighting makes each cell's imaging-weight sum P/W = 1/2.
    val half = pointSourceVis(1.0).withColumn("weight", lit(1.0))
    val vis = half.unionByName(
      half.withColumn("u", -col("u")).withColumn("v", -col("v")))
    val iw = GridOps.makeImagingWeight(vis, p32, "uniform")
    val perCell = iw.where(col("_in_grid"))
      .groupBy("u_cell", "v_cell").agg(sum("imaging_weight").as("s"))
    val bad = perCell.where(abs(col("s") - 0.5) > 1e-9).count()
    assert(bad === 0L)
  }

  test("makeImageAndPsf equals separate makeImage + makePsf bitwise") {
    val vis = pointSourceVis(1.0)
    val (img, psf) = GridOps.makeImageAndPsf(spark, vis, p32)
    def diff(a: org.apache.spark.sql.DataFrame,
             b: org.apache.spark.sql.DataFrame): Long =
      a.as("a").join(b.as("b"), Seq("img_chan", "pol", "l_idx", "m_idx"))
        .where(col("a.image") =!= col("b.image") ||
          col("a.sum_weight") =!= col("b.sum_weight")).count()
    assert(diff(img, GridOps.makeImage(spark, vis, p32)) === 0L)
    assert(diff(psf, GridOps.makePsf(spark, vis, p32)) === 0L)
  }

  test("degridVis of a constant grid returns the constant at any uv") {
    // sum(conv * c) / sum(conv) = c exactly, independent of position
    val cells = for (u <- 0 until 32; v <- 0 until 32)
      yield (0, 0, u, v, 2.5, -1.25)
    val grid = cells.toDF("img_chan", "pol", "u_idx", "v_idx",
      "grid_re", "grid_im")
    val vis = pointSourceVis(1.0).withColumn("rid",
      monotonically_increasing_id())
    val out = GridOps.degridVis(vis, grid, p32, Seq("rid")).collect()
    assert(out.length === vis.count())
    out.foreach { r =>
      assert(approx(r.getAs[Double]("model_re"), 2.5, 1e-12))
      assert(approx(r.getAs[Double]("model_im"), -1.25, 1e-12))
    }
  }

  test("degridVis at a gridded point reproduces the kernel-smoothed sample") {
    // one unit visibility at the phase center; degrid at the same spot:
    // model = sum(conv^2)/sum(conv) of the center taps — positive and
    // bounded by the peak cell value
    val vis = Seq((0, 0, 0.0, 0.0, 1.0, 0.0, 1.0, 1.5e9))
      .toDF("img_chan", "pol", "u", "v", "re", "im", "weight", "freq")
      .withColumn("rid", lit(1L))
    val (grid, _) = GridOps.makeGrid(spark, vis, p32)
    val m = GridOps.degridVis(vis, grid, p32, Seq("rid")).head()
    val peak = grid.agg(max(col("grid_re"))).head().getDouble(0)
    assert(m.getAs[Double]("model_re") > 0.0)
    assert(m.getAs[Double]("model_re") <= peak + 1e-12)
    assert(approx(m.getAs[Double]("model_im"), 0.0, 1e-12))
  }

  test("degridVis join path is bitwise identical to the broadcast path") {
    // the relational fallback must reproduce the broadcast kernel's
    // IEEE addition sequence exactly — same taps, same fold order
    val vis = pointSourceVis(1.0)
      .withColumn("rid", monotonically_increasing_id())
      .withColumn("img_chan", (col("rid") % 2).cast("int"))
    val (grid, _) = GridOps.makeGrid(spark,
      vis.withColumn("re", col("u") * 1e-3), p32)
    val b = GridOps.degridVisBroadcast(vis, grid, p32, Seq("rid"))
    val j = GridOps.degridVisJoin(vis, grid, p32, Seq("rid"))
    assert(b.count() === vis.count())
    val mism = b.as("a").join(j.as("b"), Seq("img_chan", "pol", "rid"),
        "full_outer")
      .where(col("a.model_re") =!= col("b.model_re") ||
        col("a.model_im") =!= col("b.model_im") ||
        col("a.model_re").isNull || col("b.model_re").isNull).count()
    assert(mism === 0L)
  }

  test("degridVis dispatcher picks the join path past the broadcast budget") {
    val vis = pointSourceVis(1.0).withColumn("rid",
      monotonically_increasing_id())
    val (grid, _) = GridOps.makeGrid(spark, vis, p32)
    // tiny budget -> must route through the relational path; results
    // still equal the broadcast path bitwise
    val forced = GridOps.degridVis(vis, grid, p32, Seq("rid"),
      maxBroadcastBytes = 0L)
    val bcast = GridOps.degridVisBroadcast(vis, grid, p32, Seq("rid"))
    val mism = forced.as("a").join(bcast.as("b"),
        Seq("img_chan", "pol", "rid"))
      .where(col("a.model_re") =!= col("b.model_re") ||
        col("a.model_im") =!= col("b.model_im")).count()
    assert(mism === 0L)
    assert(forced.count() === bcast.count())
  }

  test("imaging weights: natural is identity; briggs between natural and uniform") {
    val vis = pointSourceVis(1.0)
    val nat = GridOps.makeImagingWeight(vis, p32, "natural")
    assert(nat.where(col("imaging_weight") =!= col("weight")).count() === 0)
    val br = GridOps.makeImagingWeight(vis, p32, "briggs", robust = 0.5)
    assert(br.where(col("imaging_weight").isNull).count() === 0)
  }
}
