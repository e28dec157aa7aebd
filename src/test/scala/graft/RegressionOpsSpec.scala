package graft

import graft.operators.RegressionOps

class RegressionOpsSpec extends SparkSpec {
  import spark.implicits._

  test("solveNormal recovers exact polynomial coefficients") {
    // y = 2 + 3x - 0.5x^2 sampled at x = 0..5
    val xs = (0 to 5).map(_.toDouble)
    val ys = xs.map(x => 2 + 3 * x - 0.5 * x * x)
    val moments = (0 to 4).map(k => xs.map(math.pow(_, k)).sum)
    val rhs = (0 to 2).map(k => xs.zip(ys).map { case (x, y) => y * math.pow(x, k) }.sum)
    val Some(c) = RegressionOps.solveNormal(moments, rhs)
    assert(approx(c(0), 2.0) && approx(c(1), 3.0) && approx(c(2), -0.5))
  }

  test("solveNormal returns None for singular systems") {
    // only one distinct x -> order-1 fit under-determined
    assert(RegressionOps.solveNormal(Seq(3.0, 6.0, 12.0), Seq(9.0, 18.0)).isEmpty)
  }

  test("uvContFit order-3 recovers a known cubic per group") {
    val df = (for (g <- 0 until 2; x <- 0 until 8) yield {
      val y = (g + 1) * (1.0 + 2 * x - 0.3 * x * x + 0.01 * x * x * x)
      (g, x, y)
    }).toDF("g", "chan", "y")
    val fit = RegressionOps.uvContFit(df, Seq("g"), "chan", "y", "model", fitorder = 3)
    fit.collect().foreach { r =>
      assert(approx(r.getAs[Double]("model"), r.getAs[Double]("y"), 1e-6),
        s"row $r")
    }
  }

  test("excludeChans: excluded points get model values but do not shape the fit") {
    // line y = x except an outlier at chan 3
    val df = Seq((0, 0, 0.0), (0, 1, 1.0), (0, 2, 2.0), (0, 3, 999.0), (0, 4, 4.0))
      .toDF("g", "chan", "y")
    val fit = RegressionOps.uvContFit(df, Seq("g"), "chan", "y", "model",
      fitorder = 1, excludeChans = Seq(3))
    val m = fit.collect().map(r => r.getAs[Int]("chan") -> r.getAs[Double]("model")).toMap
    (0 to 4).foreach(ch => assert(approx(m(ch), ch.toDouble, 1e-9)))
  }

  test("null y values drop out of the fit without imputation") {
    val df = Seq((0, 0, Some(0.0)), (0, 1, None), (0, 2, Some(2.0)), (0, 3, Some(3.0)))
      .toDF("g", "chan", "y")
    val fit = RegressionOps.uvContFit(df, Seq("g"), "chan", "y", "model", 1)
    val m = fit.collect().map(r => r.getAs[Int]("chan") -> r.getAs[Double]("model")).toMap
    (0 to 3).foreach(ch => assert(approx(m(ch), ch.toDouble, 1e-9)))
  }

  test("contSub: line + continuum reconstruct the data") {
    val df = (0 until 6).map(x => (0, x, 5.0 + 0.5 * x + math.sin(x))).toDF("g", "chan", "y")
    val out = RegressionOps.contSub(df, Seq("g"), "chan", "y", "line", "cont", 1)
    out.collect().foreach { r =>
      assert(approx(r.getAs[Double]("line") + r.getAs[Double]("cont"),
        r.getAs[Double]("y")))
    }
  }

  test("complex fit: real and imaginary parts fit independently") {
    val df = (0 until 6).map(x => (0, x, 1.0 + 2 * x, 5.0 - x)).toDF("g", "chan", "re", "im")
    val fit = RegressionOps.polyFit(df, Seq("g"), "chan",
      Seq("re" -> "fit_re", "im" -> "fit_im"), order = 1)
    fit.collect().foreach { r =>
      assert(approx(r.getAs[Double]("fit_re"), 1.0 + 2 * r.getAs[Int]("chan")))
      assert(approx(r.getAs[Double]("fit_im"), 5.0 - r.getAs[Int]("chan")))
    }
  }
}
