package graft

import graft.operators.StatsOps
import org.apache.spark.sql.functions.lit

class StatsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("statistics on a known sample") {
    // values 1..5 at positions p=10..14
    val df = (1 to 5).map(v => (v.toDouble, v + 9)).toDF("v", "p")
    val r = StatsOps.statistics(df, "v", Seq("p")).head()
    assert(r.getAs[Long]("n") === 5L)
    assert(approx(r.getAs[Double]("mean"), 3.0))
    assert(approx(r.getAs[Double]("median"), 3.0))
    assert(approx(r.getAs[Double]("q1"), 2.0))
    assert(approx(r.getAs[Double]("q3"), 4.0))
    assert(approx(r.getAs[Double]("iqr"), 2.0))
    assert(approx(r.getAs[Double]("medabsdevmed"), 1.0))
    assert(approx(r.getAs[Double]("rms"), math.sqrt(11.0)))
    assert(r.getAs[org.apache.spark.sql.Row]("minpos").getInt(0) === 10)
    assert(r.getAs[org.apache.spark.sql.Row]("maxpos").getInt(0) === 14)
  }

  test("statistics argpos tie-breaks deterministically on position") {
    val df = Seq((1.0, 5), (1.0, 2), (9.0, 7), (9.0, 3)).toDF("v", "p")
    val r = StatsOps.statistics(df, "v", Seq("p")).head()
    assert(r.getAs[org.apache.spark.sql.Row]("minpos").getInt(0) === 2)
    // maxpos tie-breaks toward the LARGER position (value, pos) lexicographic max
    assert(r.getAs[org.apache.spark.sql.Row]("maxpos").getInt(0) === 7)
  }

  test("moments: all 12 reductions on an analytic spectrum") {
    // one pixel, intensity I(v) = [1, 2, 6] over chans v = [0, 1, 2]
    val df = Seq((1, 0, 1.0), (1, 1, 2.0), (1, 2, 6.0)).toDF("px", "chan", "i")
    val r = StatsOps.moments(df, Seq("px"), "chan", "i", delta = 2.0).head()
    assert(approx(r.getAs[Double]("mom_mean"), 3.0))
    assert(approx(r.getAs[Double]("mom_integrated"), 18.0))
    assert(approx(r.getAs[Double]("mom_weighted_coord"), 14.0 / 9))
    // E[v^2]_w = (0 + 2 + 24)/9 = 26/9; disp = sqrt(26/9 - (14/9)^2)
    assert(approx(r.getAs[Double]("mom_weighted_dispersion"),
      math.sqrt(26.0 / 9 - math.pow(14.0 / 9, 2))))
    assert(approx(r.getAs[Double]("mom_median"), 2.0))
    assert(approx(r.getAs[Double]("mom_stddev"), math.sqrt(7.0))) // var of 1,2,6
    assert(approx(r.getAs[Double]("mom_rms"), math.sqrt(41.0 / 3)))
    assert(approx(r.getAs[Double]("mom_absmeandev"), 2.0))
    assert(r.getAs[Double]("mom_max") === 6.0 && r.getAs[Double]("mom_min") === 1.0)
    assert(r.getAs[Int]("mom_max_coord") === 2 && r.getAs[Int]("mom_min_coord") === 0)
  }

  test("rollingByTime: trailing range frame includes boundary, drops old") {
    // user 1 at t = 0, 5, 10, 16 with window 10: frames {0},{0,5},
    // {0,5,10} (boundary inclusive), {10,16} (5 just outside)
    val df = Seq((1L, 0L, 1.0), (1L, 5L, 2.0), (1L, 10L, 4.0),
      (1L, 16L, 8.0), (2L, 7L, 16.0)).toDF("u", "tsn", "v")
    val out = StatsOps.rollingByTime(df, Seq("u"), "tsn", "v", windowNs = 10L)
      .collect().map(r => (r.getAs[Long]("u"), r.getAs[Long]("tsn")) ->
        (r.getAs[Long]("n_window"), r.getAs[Double]("sum_window"))).toMap
    assert(out((1L, 0L)) === (1L, 1.0))
    assert(out((1L, 5L)) === (2L, 3.0))
    assert(out((1L, 10L)) === (3L, 7.0))
    assert(out((1L, 16L)) === (2L, 12.0))
    assert(out((2L, 7L)) === (1L, 16.0)) // keys never mix
  }

  test("quartiles + MAD match brute force across sizes and duplicates") {
    // Covers the rank-probe + two-sequence MAD selection: odd/even n,
    // n=1..2 degenerate splits, heavy duplicates, negatives, and a
    // partition count that forces empty partitions.
    def bruteQ(xs: Array[Double], p: Double): Double = {
      val s = xs.sorted
      val rank = p * (s.length - 1)
      val lo = math.floor(rank).toInt; val hi = math.ceil(rank).toInt
      s(lo) + (s(hi) - s(lo)) * (rank - lo)
    }
    val rnd = new scala.util.Random(42)
    val cases: Seq[Array[Double]] =
      Seq(Array(7.0), Array(3.0, 1.0), Array(5.0, 5.0, 5.0, 5.0)) ++
        (0 until 8).map { i =>
          val n = 1 + rnd.nextInt(400)
          Array.fill(n)(
            if (rnd.nextBoolean()) rnd.nextInt(10).toDouble
            else rnd.nextGaussian() * 100)
        }
    for (xs <- cases) {
      val df = spark.sparkContext.parallelize(xs.toSeq, 17).toDF("v")
        .withColumn("p", lit(0))
      val r = StatsOps.statistics(df, "v", Seq("p")).head()
      val med = bruteQ(xs, 0.5)
      val mad = bruteQ(xs.map(x => math.abs(x - med)), 0.5)
      assert(approx(r.getAs[Double]("q1"), bruteQ(xs, 0.25)), s"q1 n=${xs.length}")
      assert(approx(r.getAs[Double]("median"), med), s"med n=${xs.length}")
      assert(approx(r.getAs[Double]("q3"), bruteQ(xs, 0.75)), s"q3 n=${xs.length}")
      assert(approx(r.getAs[Double]("medabsdevmed"), mad, 1e-6), s"mad n=${xs.length}")
    }
  }

  test("theilSen: outlier-immune slope, vertical pairs excluded, cap binds") {
    // key a: y = 2x exactly on x = 0..9, except y(9) = 1000 (a spike).
    // 8 of 9 pairwise slopes per point avoid the spike -> median is
    // still 2; OLS on the same data is dragged far above 2.
    val a = (0 to 9).map(x =>
      ("a", x.toLong, if (x == 9) 1000L else 2L * x, x.toLong))
    val out = StatsOps.theilSen(a.toDF("k", "x", "y", "t"),
      Seq("k"), "x", "y", "t").collect()(0)
    assert(out.getDouble(1) === 2.0, "robust slope ignores the spike")
    assert(out.getLong(2) === 45L)
    // duplicate x values: vertical pairs are excluded from the census
    val b = Seq(("b", 0L, 0L, 0L), ("b", 0L, 100L, 1L), ("b", 1L, 3L, 2L))
    val ob = StatsOps.theilSen(b.toDF("k", "x", "y", "t"),
      Seq("k"), "x", "y", "t").collect()(0)
    // pairs: (0,0)-(1,3) slope 3 and (0,100)-(1,3) slope -97; lower
    // median of {-97, 3} is -97
    assert(ob.getLong(2) === 2L && ob.getDouble(1) === -97.0)
    // maxN = 2 keeps only the first two rows in (x, t) order -> the
    // surviving pair is vertical -> the key drops out entirely
    assert(StatsOps.theilSen(b.toDF("k", "x", "y", "t"),
      Seq("k"), "x", "y", "t", maxN = 2).count() === 0L)
    intercept[IllegalArgumentException] {
      StatsOps.theilSen(b.toDF("k", "x", "y", "t"),
        Seq("k"), "x", "y", "t", maxN = 1)
    }
  }

  test("theilIndex: pure between-group case, decomposition identity") {
    // within-group equal -> within 0 and total == between
    val df = Seq(("a", 2L), ("a", 2L), ("b", 8L), ("b", 8L))
      .toDF("g", "v")
    val r = StatsOps.theilIndex(df, "g", "v").head()
    val want = 0.2 * math.log(0.4) + 0.8 * math.log(1.6)
    assert(r.getAs[Long]("n") === 4L)
    assert(approx(r.getAs[Double]("theil_total"), want, 1e-12))
    assert(approx(r.getAs[Double]("theil_between"), want, 1e-12))
    assert(r.getAs[Double]("theil_within") === 0.0)
    // perfectly equal values -> all three zero
    val eq = StatsOps.theilIndex(
      Seq(("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v"), "g", "v")
      .head()
    assert(eq.getDouble(1) === 0.0 && eq.getDouble(2) === 0.0 &&
      eq.getDouble(3) === 0.0)
    // mixed case: T = between + within up to float association
    val mx = StatsOps.theilIndex(
      Seq(("a", 1L), ("a", 3L), ("b", 6L), ("b", 10L)).toDF("g", "v"),
      "g", "v").head()
    assert(approx(mx.getDouble(1), mx.getDouble(2) + mx.getDouble(3),
      1e-12))
  }

  test("lorenzDeciles: values 1..10 give one item and share d/55 each") {
    val df = (1 to 10).map(v => ("a", v.toDouble)).toDF("g", "v")
    val out = StatsOps.lorenzDeciles(df, "g", "v").collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.size === 10)
    for (d <- 1L to 10L) {
      assert(out(d)._1 === 1L)
      assert(approx(out(d)._2, d / 55.0))
    }
    // ties spanning a boundary split exactly: [5,5] -> 0.5 per half
    val ties = Seq(("b", 5.0), ("b", 5.0)).toDF("g", "v")
    val t = StatsOps.lorenzDeciles(ties, "g", "v").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(t(5L) === 1L && t(10L) === 1L && t(1L) === 0L)
  }

  test("mannKendall: strict trend hand values, full-tie variance zero") {
    // counts 1,2,3,4 over windows 0..3: S = 6, Var = 4*3*13/18
    val up = (0L to 3L).flatMap(h => Seq.fill(h.toInt + 1)(("a", h)))
    // two equal windows: S = 0 and the tie correction kills Var
    val flat = Seq.fill(2)(("b", 0L)) ++ Seq.fill(2)(("b", 1L))
    val out = StatsOps.mannKendall((up ++ flat).toDF("g", "w"),
      "g", "w").collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4)))).toMap
    assert(out("a")._1 === 4L && out("a")._2 === 6L)
    assert(approx(out("a")._3, 4.0 * 3 * 13 / 18))
    assert(approx(out("a")._4, 5.0 / math.sqrt(4.0 * 3 * 13 / 18)))
    assert(out("b")._2 === 0L && out("b")._3 === 0.0 &&
      out("b")._4 === 0.0)
  }

  test("didEstimate: hand four-cell effect") {
    // treat pre 10 -> post 15; ctrl pre 8 -> post 9; DiD = 5 - 1 = 4
    val df = Seq((true, false, 10.0), (true, false, 10.0),
      (true, true, 15.0), (true, true, 15.0),
      (false, false, 8.0), (false, true, 9.0))
      .toDF("tr", "po", "v")
    val r = StatsOps.didEstimate(df, "tr", "po", "v").head()
    assert(r.getAs[Long]("n_t0") === 2L && r.getAs[Long]("n_c1") === 1L)
    assert(approx(r.getAs[Double]("mean_treat_post"), 15.0))
    assert(approx(r.getAs[Double]("did"), 4.0))
  }

  test("gmm1dEm: separates a clean bimodal mix; degenerate is NaN-free") {
    val lo = Seq(-0.1, 0.0, 0.1).flatMap(v => Seq.fill(20)(("a", v)))
    val hi = Seq(9.9, 10.0, 10.1).flatMap(v => Seq.fill(20)(("a", v + 0.0)))
    val r = StatsOps.gmm1dEm((lo ++ hi).toDF("g", "v"), "g", "v").head()
    assert(r.getAs[Long]("n") === 120L)
    assert(math.abs(r.getAs[Double]("w1") - 0.5) < 0.05)
    assert(math.abs(r.getAs[Double]("mu1") - 0.0) < 0.2)
    assert(math.abs(r.getAs[Double]("mu2") - 10.0) < 0.2)
    assert(r.getAs[Double]("sigma1") < 0.5)
    // constant column: variance clamp keeps everything finite
    val c = StatsOps.gmm1dEm(Seq.fill(10)(("b", 5.0)).toDF("g", "v"),
      "g", "v").head()
    for (i <- 2 to 6)
      assert(!c.getDouble(i).isNaN && !c.getDouble(i).isInfinite)
  }

  test("trimmedMean: drops exactly the tail ranks, tie-spanning clamps") {
    // 0..8 plus outlier 100, k = 1: trimmed keeps 1..8 -> 4.5
    val a = ((0 to 8).map(_.toDouble) :+ 100.0).map(("a", _))
    val r = StatsOps.trimmedMean(a.toDF("g", "v"), "g", "v").head()
    assert(r.getAs[Long]("n") === 10L && r.getAs[Long]("k") === 1L)
    assert(approx(r.getAs[Double]("mean_raw"), 13.6))
    assert(approx(r.getAs[Double]("trimmed_mean"), 4.5))
    // ties spanning the cut: [0,0,0,10] trim .25 -> keep two 0s
    val b = Seq(("b", 0.0), ("b", 0.0), ("b", 0.0), ("b", 10.0))
    val r2 = StatsOps.trimmedMean(b.toDF("g", "v"), "g", "v",
      trim = 0.25).head()
    assert(r2.getAs[Long]("k") === 1L)
    assert(r2.getAs[Double]("trimmed_mean") === 0.0)
  }

  test("quantileNormalize: disjoint groups land on the same mapped mean") {
    // global sorted [1,2,3,4,11,12,13,14]; both groups map their
    // ranks to global ranks {2,4,6,8} -> targets {2,4,12,14}, mean 8
    val df = (Seq(1, 2, 3, 4).map(("a", _)) ++
      Seq(11, 12, 13, 14).map(("b", _))).toDF("g", "v")
    val out = StatsOps.quantileNormalize(df, "g", "v").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(out("a") === ((4L, 2.5, 8.0)))
    assert(out("b") === ((4L, 12.5, 8.0)))
  }

  test("mahalanobisOutliers: hand d2 on a diagonal-cov cross; det<=0") {
    // cross at (1,0): cov diag(0.5, 0.5) in value units -> every
    // point's d2 = 2 exactly (invariant under the 1e-2 x grid)
    val a = Seq(("a", 0.0, 0.0), ("a", 2.0, 0.0),
      ("a", 1.0, 1.0), ("a", 1.0, -1.0),
      // constant y -> det = 0 exactly -> d2 census all zero
      ("b", 0.0, 5.0), ("b", 1.0, 5.0), ("b", 2.0, 5.0))
      .toDF("g", "x", "y")
    val out = StatsOps.mahalanobisOutliers(a, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("a")._1 === 4L && out("a")._2 === 0L)
    assert(approx(out("a")._3, 2.0, 1e-12))
    assert(out("b") === ((3L, 0L, 0.0)))
    // census counts past a lowered threshold
    val t = StatsOps.mahalanobisOutliers(a.where($"g" === "a"),
      "g", "x", "y", threshold = 1.5).head()
    assert(t.getAs[Long]("n_out") === 4L)
  }
}
