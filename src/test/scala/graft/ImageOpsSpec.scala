package graft

import org.apache.spark.sql.functions._
import graft.operators.ImageOps
import graft.functions.complex._

class ImageOpsSpec extends SparkSpec {
  import spark.implicits._

  test("makeEmptySkyImage: phase-center pixel maps to the phase center") {
    val g = ImageOps.makeEmptySkyImage(spark, (0.5, -0.3), (8, 6), (-0.001, 0.001))
    val center = g.where($"l_idx" === 4 && $"m_idx" === 3).head()
    assert(approx(center.getAs[Double]("l"), 0.0))
    assert(approx(center.getAs[Double]("m"), 0.0))
    assert(approx(center.getAs[Double]("right_ascension"), 0.5))
    assert(approx(center.getAs[Double]("declination"), -0.3))
    assert(g.count() === 8 * 6)
  }

  test("makeEmptySkyImage: SIN projection roundtrip (small-angle dec offset)") {
    val g = ImageOps.makeEmptySkyImage(spark, (0.0, 0.0), (4, 4), (0.001, 0.001))
    // at dec0=0: dec = asin(m), ra = atan2(l, sqrt(1-l^2-m^2))
    g.collect().foreach { r =>
      val (l, m) = (r.getAs[Double]("l"), r.getAs[Double]("m"))
      assert(approx(r.getAs[Double]("declination"), math.asin(m)))
      assert(approx(r.getAs[Double]("right_ascension"),
        math.atan2(l, math.sqrt(1 - l * l - m * m))))
    }
  }

  test("mask marks cells outside every criterion; region marks the selection") {
    val g = ImageOps.makeEmptySkyImage(spark, (0.0, 0.0), (6, 6), (0.001, 0.001))
    val ra = (-0.0015, 0.0015); val de = (-0.0015, 0.0015)
    val masked = ImageOps.mask(g, "msk", ra, de, ra, de)
    val regioned = ImageOps.region(masked, "rgn", ra, de, ra, de)
    val rows = regioned.collect()
    rows.foreach { r =>
      val inside = math.abs(r.getAs[Double]("l")) < 0.0015 &&
        math.abs(r.getAs[Double]("m")) < 0.0015
      // world box == pixel box here, so region == inside, mask == outside
      assert(r.getAs[Boolean]("rgn") === inside)
      assert(r.getAs[Boolean]("msk") === !inside)
    }
  }

  test("stokesToCorr linear: XX=I+Q, XY=U+iV, YX=U-iV, YY=I-Q") {
    val stokes = Seq(
      (0, 1, 10.0, 0.0), (0, 2, 2.0, 0.0), (0, 3, 3.0, 0.5), (0, 4, 1.0, -0.5))
      .toDF("px", "pol", "vr", "vi")
      .select(col("px"), col("pol"), c(col("vr"), col("vi")).as("value"))
    val out = ImageOps.stokesToCorr(stokes, Seq("px"), "pol", "value")
    val m = out.collect().map(r => r.getAs[Int]("pol") ->
      (r.getAs[org.apache.spark.sql.Row]("value").getDouble(0),
        r.getAs[org.apache.spark.sql.Row]("value").getDouble(1))).toMap
    // I=10, Q=2, U=3+0.5i, V=1-0.5i
    assert(m(9) === ((12.0, 0.0)))   // XX = I+Q
    assert(m(10) === ((3.5, 1.5)))   // XY = U+iV = 3+0.5i + (0.5+i) = 3.5+1.5i
    assert(m(11) === ((2.5, -0.5)))  // YX = U-iV = 3+0.5i - (0.5+i) = 2.5-0.5i
    assert(m(12) === ((8.0, 0.0)))   // YY = I-Q
  }

  test("corrToStokes inverts stokesToCorr (roundtrip)") {
    val stokes = Seq(
      (0, 1, 10.0, 0.5), (0, 2, 2.0, -0.25), (0, 3, 3.0, 0.5), (0, 4, 1.0, -0.5))
      .toDF("px", "pol", "vr", "vi")
      .select(col("px"), col("pol"), c(col("vr"), col("vi")).as("value"))
    val corr = ImageOps.stokesToCorr(stokes, Seq("px"), "pol", "value")
    val back = ImageOps.corrToStokes(corr, Seq("px"), "pol", "value")
    val got = back.collect().map(r => r.getAs[Int]("pol") ->
      (r.getAs[org.apache.spark.sql.Row]("value").getDouble(0),
        r.getAs[org.apache.spark.sql.Row]("value").getDouble(1))).toMap
    val want = stokes.collect().map(r => r.getAs[Int]("pol") ->
      (r.getAs[org.apache.spark.sql.Row]("value").getDouble(0),
        r.getAs[org.apache.spark.sql.Row]("value").getDouble(1))).toMap
    want.foreach { case (p, (re0, im0)) =>
      assert(approx(got(p)._1, re0) && approx(got(p)._2, im0), s"pol $p")
    }
  }

  test("stokesToCorr circular: RR=I+V, LL=I-V") {
    val stokes = Seq((0, 1, 10.0, 0.0), (0, 4, 2.0, 0.0))
      .toDF("px", "pol", "vr", "vi")
      .select(col("px"), col("pol"), c(col("vr"), col("vi")).as("value"))
    val out = ImageOps.stokesToCorr(stokes, Seq("px"), "pol", "value", basis = "circular")
    val m = out.collect().map(r => r.getAs[Int]("pol") ->
      r.getAs[org.apache.spark.sql.Row]("value")).toMap
    assert(m(5).getDouble(0) === 12.0) // RR = I+V
    assert(m(8).getDouble(0) === 8.0)  // LL = I-V
  }
}
