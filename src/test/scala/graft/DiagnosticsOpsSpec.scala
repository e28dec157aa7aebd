package graft

import graft.operators.DiagnosticsOps

/** Hand-computed fixtures for the round-13/14 diagnostics battery —
  * every expected value below is a closed-form paper calculation
  * (scipy-checkable), not an oracle replay, plus the degenerate edges
  * (single group, zero variance, b+c=0, empty cohort, constant
  * series).
  */
class DiagnosticsOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Expand (group, window, count) rows into count-many raw rows —
    * the series ops aggregate raw rows to per-window counts first.
    */
  private def seriesDf(rows: Seq[(String, Long, Int)]) =
    rows.flatMap { case (g, h, c) => Seq.fill(c)((g, h)) }
      .toDF("g", "h")

  test("anovaOneway: 3-group textbook F and eta-squared") {
    // a=(1,2,3) b=(2,4,6) c=(5,5,8): means 2/4/6, grand 4
    // SSB = 3*4+0+3*4 = 24, SSW = 2+8+6 = 16, SST = 40
    // F = (24/2)/(16/6) = 4.5, eta2 = 0.6
    val df = Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0,
      "b" -> 2.0, "b" -> 4.0, "b" -> 6.0,
      "c" -> 5.0, "c" -> 5.0, "c" -> 8.0).toDF("g", "v")
    val r = DiagnosticsOps.anovaOneway(df, "g", "v", quantDigits = 0).head()
    assert(r.getAs[Long]("k") === 3L && r.getAs[Long]("n") === 9L)
    assert(r.getAs[Long]("dof1") === 2L && r.getAs[Long]("dof2") === 6L)
    assert(approx(r.getAs[Double]("ss_between"), 24.0))
    assert(approx(r.getAs[Double]("ss_within"), 16.0))
    assert(approx(r.getAs[Double]("f"), 4.5))
    assert(approx(r.getAs[Double]("eta_sq"), 0.6))
  }

  test("anovaOneway: single group yields null F") {
    val df = Seq("a" -> 1.0, "a" -> 2.0).toDF("g", "v")
    val r = DiagnosticsOps.anovaOneway(df, "g", "v", quantDigits = 0).head()
    assert(r.getAs[Long]("k") === 1L)
    assert(r.isNullAt(r.fieldIndex("f")))
  }

  test("welchT: unequal-variance t and Welch-Satterthwaite dof") {
    // A=(1,2,3): mean 2 var 1; B=(2,4,9): mean 5 var 13
    // se2 = 1/3 + 13/3 = 14/3; t = -3/sqrt(14/3)
    // dof = (14/3)^2 / ((1/3)^2/2 + (13/3)^2/2) = 196/85
    val df = Seq("A" -> 1.0, "A" -> 2.0, "A" -> 3.0,
      "B" -> 2.0, "B" -> 4.0, "B" -> 9.0).toDF("c", "v")
    val r = DiagnosticsOps.welchT(df, "c", "A", "B", "v",
      quantDigits = 0).head()
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 3L)
    assert(approx(r.getAs[Double]("mean_a"), 2.0))
    assert(approx(r.getAs[Double]("mean_b"), 5.0))
    assert(approx(r.getAs[Double]("t"), -3.0 / math.sqrt(14.0 / 3.0)))
    assert(approx(r.getAs[Double]("dof"), 196.0 / 85.0))
  }

  test("welchT: empty cohort B yields null t/dof") {
    val df = Seq("A" -> 1.0, "A" -> 2.0).toDF("c", "v")
    val r = DiagnosticsOps.welchT(df, "c", "A", "B", "v",
      quantDigits = 0).head()
    assert(r.getAs[Long]("n_b") === 0L)
    assert(r.isNullAt(r.fieldIndex("t")))
    assert(r.isNullAt(r.fieldIndex("dof")))
  }

  test("leveneTest: Brown-Forsythe W on median absolute deviations") {
    // a=(1,2,3,10) lower-median 2 -> |dev|=(1,0,1,8) mean 2.5
    // b=(5,5,7,9)  lower-median 5 -> |dev|=(0,0,2,4) mean 1.5
    // grand 2: SSB = 4*.25+4*.25 = 2; SSW = 41+11 = 52
    // W = (2/1)/(52/6) = 3/13
    val df = Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0, "a" -> 10.0,
      "b" -> 5.0, "b" -> 5.0, "b" -> 7.0, "b" -> 9.0).toDF("g", "v")
    val r = DiagnosticsOps.leveneTest(df, "g", "v", quantDigits = 0).head()
    assert(r.getAs[Long]("k") === 2L && r.getAs[Long]("n") === 8L)
    assert(approx(r.getAs[Double]("w"), 3.0 / 13.0))
  }

  test("runsTest: alternating counts give R=5 and the closed-form z") {
    // counts (3,1,3,1,3,2) over h=1..6: lower median 2, h=6 drops
    // signs + - + - + : n1=3 n2=2 R=5
    // E[R] = 2*3*2/5+1 = 3.4; Var = 12*7/100 = 0.84
    val df = seriesDf(Seq(("g1", 1L, 3), ("g1", 2L, 1), ("g1", 3L, 3),
      ("g1", 4L, 1), ("g1", 5L, 3), ("g1", 6L, 2)))
    val r = DiagnosticsOps.runsTest(df, "g", "h").head()
    assert(r.getAs[Long]("n_above") === 3L)
    assert(r.getAs[Long]("n_below") === 2L)
    assert(r.getAs[Long]("runs") === 5L)
    assert(approx(r.getAs[Double]("e_runs"), 3.4))
    assert(approx(r.getAs[Double]("z"), 1.6 / math.sqrt(0.84)))
  }

  test("runsTest: constant series drops (every window equals median)") {
    val df = seriesDf(Seq(("g1", 1L, 2), ("g1", 2L, 2), ("g1", 3L, 2)))
    assert(DiagnosticsOps.runsTest(df, "g", "h").count() === 0L)
    // single non-median window: nn = 1 -> e/z null, no ANSI div-by-zero
    val one = seriesDf(Seq(("g1", 1L, 1), ("g1", 2L, 3)))
    val r = DiagnosticsOps.runsTest(one, "g", "h").head()
    assert(r.getAs[Long]("runs") === 1L)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("friedmanTest: 3 blocks x 3 treatments, chi2 = 14/3") {
    // ranks b1 (1,2,3), b2 (2,1,3), b3 (1,2,3): R = (4,5,9)
    // chi2 = 12/(3*3*4)*(16+25+81) - 3*3*4 = 14/3; no ties
    // block 4 is incomplete (only A) and must be excluded
    val df = Seq(
      (1L, "A", 1.0), (1L, "B", 2.0), (1L, "C", 3.0),
      (2L, "A", 2.0), (2L, "B", 1.0), (2L, "C", 3.0),
      (3L, "A", 1.0), (3L, "B", 2.0), (3L, "C", 3.0),
      (4L, "A", 9.0)).toDF("b", "t", "v")
    val r = DiagnosticsOps.friedmanTest(df, "b", "t", "v",
      quantDigits = 0).head()
    assert(r.getAs[Long]("n_blocks") === 3L)
    assert(r.getAs[Long]("k") === 3L && r.getAs[Long]("dof") === 2L)
    assert(approx(r.getAs[Double]("chi2"), 14.0 / 3.0))
    assert(approx(r.getAs[Double]("chi2_corr"), 14.0 / 3.0))
  }

  test("mcnemarTest: b=3 c=1 gives continuity-corrected chi2 = 0.25") {
    val df = Seq(
      (1L, true, false), (2L, true, false), (3L, true, false), // b
      (4L, false, true), // c
      (5L, true, true), (6L, false, false)).toDF("k", "pre", "post")
    val r = DiagnosticsOps.mcnemarTest(df, "k", "pre", "post").head()
    assert(r.getAs[Long]("n_pairs") === 6L)
    assert(r.getAs[Long]("b") === 3L && r.getAs[Long]("c") === 1L)
    assert(approx(r.getAs[Double]("chi2"), 0.25))
  }

  test("mcnemarTest: b+c=0 yields null chi2") {
    val df = Seq((1L, true, true), (2L, false, false))
      .toDF("k", "pre", "post")
    val r = DiagnosticsOps.mcnemarTest(df, "k", "pre", "post").head()
    assert(r.isNullAt(r.fieldIndex("chi2")))
  }

  test("wassersteinDrift: unit shift has W1 = 1; identity has W1 = 0") {
    val df = Seq("A" -> 0.0, "A" -> 1.0, "B" -> 1.0, "B" -> 2.0)
      .toDF("c", "v")
    val r = DiagnosticsOps.wassersteinDrift(df, "c", "A", "B", "v",
      quantDigits = 0).head()
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    assert(approx(r.getAs[Double]("w1"), 1.0))
    val same = DiagnosticsOps.wassersteinDrift(df, "c", "A", "A", "v",
      quantDigits = 0).head()
    assert(approx(same.getAs[Double]("w1"), 0.0))
  }

  test("hellingerDrift: half-overlap BC = 0.5, H = sqrt(0.5)") {
    // A=(0,1) B=(1,2): only v=1 contributes sqrt(1*1); BC = 1/sqrt(4)
    val df = Seq("A" -> 0.0, "A" -> 1.0, "B" -> 1.0, "B" -> 2.0)
      .toDF("c", "v")
    val r = DiagnosticsOps.hellingerDrift(df, "c", "A", "B", "v",
      quantDigits = 0).head()
    assert(approx(r.getAs[Double]("bc"), 0.5))
    assert(approx(r.getAs[Double]("hellinger"), math.sqrt(0.5)))
    val same = DiagnosticsOps.hellingerDrift(df, "c", "A", "A", "v",
      quantDigits = 0).head()
    assert(approx(same.getAs[Double]("bc"), 1.0))
    assert(approx(same.getAs[Double]("hellinger"), 0.0))
  }

  test("ar1Fit: alternating counts give phi = -0.75") {
    // y=(1,2,1,2): mean 1.5, c0 = 2.5-2.25 = 0.25
    // c1 = (6 - 1.5*(4+5) + 3*2.25)/4 = -0.1875; phi = -0.75
    // innov = 0.25*(1-0.5625) = 0.109375
    val df = seriesDf(Seq(("g1", 1L, 1), ("g1", 2L, 2), ("g1", 3L, 1),
      ("g1", 4L, 2)))
    val r = DiagnosticsOps.ar1Fit(df, "g", "h").head()
    assert(r.getAs[Long]("t") === 4L)
    assert(approx(r.getAs[Double]("mean"), 1.5))
    assert(approx(r.getAs[Double]("phi"), -0.75))
    assert(approx(r.getAs[Double]("innov_var"), 0.109375))
  }

  test("ar1Fit: constant series yields null phi (zero variance)") {
    val df = seriesDf(Seq(("g1", 1L, 2), ("g1", 2L, 2), ("g1", 3L, 2)))
    val r = DiagnosticsOps.ar1Fit(df, "g", "h").head()
    assert(approx(r.getAs[Double]("mean"), 2.0))
    assert(r.isNullAt(r.fieldIndex("phi")))
  }

  test("ljungBox: 6-point alternating series has Q = 12 at maxLag 2") {
    // y=(1,2,1,2,1,2): rho1 = -5/6 (5 pairs), rho2 = 2/3 (4 pairs)
    // Q = 6*8*((25/36)/5 + (4/9)/4) = 48*0.25 = 12; dof = 2
    val df = seriesDf(Seq(("g1", 1L, 1), ("g1", 2L, 2), ("g1", 3L, 1),
      ("g1", 4L, 2), ("g1", 5L, 1), ("g1", 6L, 2)))
    val r = DiagnosticsOps.ljungBox(df, "g", "h", maxLag = 2).head()
    assert(r.getAs[Long]("t") === 6L)
    assert(r.getAs[Long]("dof") === 2L)
    assert(approx(r.getAs[Double]("q"), 12.0))
  }

  test("ljungBox: zero-variance series drops; dof counts usable lags") {
    // constant counts -> every acf null -> group absent
    val const = seriesDf(Seq(("g1", 1L, 2), ("g1", 2L, 2), ("g1", 3L, 2)))
    assert(DiagnosticsOps.ljungBox(const, "g", "h", maxLag = 2)
      .count() === 0L)
    // 3 windows at maxLag 4: lags 3,4 have no pairs -> dof = 2, not 4
    val short = seriesDf(Seq(("g1", 1L, 1), ("g1", 2L, 3), ("g1", 3L, 1)))
    val r = DiagnosticsOps.ljungBox(short, "g", "h", maxLag = 4).head()
    assert(r.getAs[Long]("dof") === 2L)
  }

  test("dominantPeriod: period-2 series peaks at lag 2 with acf 0.75") {
    // y=(1,2,1,2,1,2,1,2): rho2 = 1.5/2 = 0.75, rho3 = -0.625
    val df = seriesDf((1 to 8).map(h =>
      ("g1", h.toLong, if (h % 2 == 0) 2 else 1)))
    val r = DiagnosticsOps.dominantPeriod(df, "g", "h", maxLag = 3).head()
    assert(r.getAs[Long]("period") === 2L)
    assert(approx(r.getAs[Double]("acf"), 0.75))
  }

  test("crossCorrelation: B = A shifted by one window -> ccf(1) = 1") {
    // A counts (1,2,3) at h=1..3; B counts (1,2,3) at h=2..4
    val df = seriesDf(Seq(("A", 1L, 1), ("A", 2L, 2), ("A", 3L, 3),
      ("B", 2L, 1), ("B", 3L, 2), ("B", 4L, 3)))
      .withColumnRenamed("g", "c")
    val out = DiagnosticsOps.crossCorrelation(df, "c", "A", "B", "h",
        maxLag = 1)
      .collect().map(r => r.getAs[Long]("lag") ->
        (r.getAs[Long]("n_pairs"), Option(r.getAs[Any]("ccf")))).toMap
    assert(out(1L)._1 === 3L)
    assert(approx(out(1L)._2.get.asInstanceOf[Double], 1.0))
    // lag 0 over h=1..4 incl. zero-count windows: r = -1/5
    assert(out(0L)._1 === 4L)
    assert(approx(out(0L)._2.get.asInstanceOf[Double], -0.2))
  }

  test("pageHinkley: single upward step alarms once") {
    // y=(4,6), delta=0: inc1 = 0, inc2 = 6-5 = 1
    // ph = 1, min = 0, excess 1 > lambda 0.5 -> 1 alarm
    val df = seriesDf(Seq(("g1", 1L, 4), ("g1", 2L, 6)))
    val r = DiagnosticsOps.pageHinkley(df, "g", "h", delta = 0.0,
      lambda = 0.5).head()
    assert(r.getAs[Long]("n_windows") === 2L)
    assert(approx(r.getAs[Double]("ph_final"), 1.0))
    assert(approx(r.getAs[Double]("max_excess"), 1.0))
    assert(r.getAs[Long]("alarm_windows") === 1L)
  }

  test("pageHinkley: flat series never alarms") {
    val df = seriesDf(Seq(("g1", 1L, 5), ("g1", 2L, 5), ("g1", 3L, 5)))
    val r = DiagnosticsOps.pageHinkley(df, "g", "h", delta = 0.0,
      lambda = 0.5).head()
    assert(approx(r.getAs[Double]("ph_final"), 0.0))
    assert(r.getAs[Long]("alarm_windows") === 0L)
  }

  test("grangerLite: hand-solved 2-predictor OLS, F = 27") {
    // x=(1,2,1,3,1), y=(1,1,2,1,4) at h=1..5; after lag rows t=2..5:
    // yv=(1,2,1,4) p=(1,1,2,1) q=(1,2,1,3)
    // cpp=.75 cqq=2.75 cpq=-.75 cpy=-1 cqy=4 cyy=6
    // rssR = 6-4/3 = 14/3; det = 1.5; bq = 2.25/1.5 = 1.5
    // rssF = 6+1/6-6 = 1/6; F = (14/3-1/6)/((1/6)/1) = 27
    val df = seriesDf(Seq(("x", 1L, 1), ("x", 2L, 2), ("x", 3L, 1),
      ("x", 4L, 3), ("x", 5L, 1),
      ("y", 1L, 1), ("y", 2L, 1), ("y", 3L, 2), ("y", 4L, 1),
      ("y", 5L, 4))).withColumnRenamed("g", "c")
    val r = DiagnosticsOps.grangerLite(df, "c", "x", "y", "h").head()
    assert(r.getAs[Long]("t") === 4L)
    assert(approx(r.getAs[Double]("beta_cause"), 1.5))
    assert(approx(r.getAs[Double]("rss_restricted"), 14.0 / 3.0))
    assert(approx(r.getAs[Double]("rss_full"), 1.0 / 6.0))
    assert(approx(r.getAs[Double]("f"), 27.0))
  }

  test("cvmDrift: unit shift over {0,1} vs {1,2} gives T = 0.1875") {
    // grid gaps: v0 (1,0) g=.5 h=1; v1 (2,1) g=.5 h=2; v2 (2,2) g=0
    // sum = .25 + .5 = .75; T = (2*2/16)*.75
    val df = Seq("A" -> 0.0, "A" -> 1.0, "B" -> 1.0, "B" -> 2.0)
      .toDF("c", "v")
    val r = DiagnosticsOps.cvmDrift(df, "c", "A", "B", "v",
      quantDigits = 0).head()
    assert(approx(r.getAs[Double]("t"), 0.1875))
    val same = DiagnosticsOps.cvmDrift(df, "c", "A", "A", "v",
      quantDigits = 0).head()
    assert(approx(same.getAs[Double]("t"), 0.0))
  }

  test("energyDrift: unit shift has E = 1 (2E|X-Y| - E|X-X'| - E|Y-Y'|)") {
    // E|X-Y| = 1, E|X-X'| = E|Y-Y'| = 0.5 -> E = 1
    val df = Seq("A" -> 0.0, "A" -> 1.0, "B" -> 1.0, "B" -> 2.0)
      .toDF("c", "v")
    val r = DiagnosticsOps.energyDrift(df, "c", "A", "B", "v",
      quantDigits = 0).head()
    assert(approx(r.getAs[Double]("energy"), 1.0))
    val same = DiagnosticsOps.energyDrift(df, "c", "A", "A", "v",
      quantDigits = 0).head()
    assert(approx(same.getAs[Double]("energy"), 0.0))
  }

  private def pairedFixture = Seq(
    ("k1", Some(1.0), Some(3.0)), // d = +2
    ("k2", Some(2.0), Some(1.0)), // d = -1
    ("k3", Some(1.0), Some(1.0)), // d = 0
    ("k4", Some(1.0), Some(5.0)), // d = +4
    ("k5", Some(3.0), Some(4.0))) // d = +1
    .toDF("k", "pre", "post")

  test("signTest: b=3 c=1 one zero, z = 0.5") {
    val r = DiagnosticsOps.signTest(pairedFixture, "k", "pre", "post",
      quantDigits = 0).head()
    assert(r.getAs[Long]("b") === 3L && r.getAs[Long]("c") === 1L)
    assert(r.getAs[Long]("n_zero") === 1L)
    assert(approx(r.getAs[Double]("z"), 0.5))
  }

  test("wilcoxonSignedRank: W+ = 8.5 with a |d| tie, exact variance") {
    // |d| = (2,1,4,1): ranks 3, 1.5, 4, 1.5; positives 2,4,1 -> 8.5
    // Var(W2) = 4*5*9/6 - 6/12 = 29.5; z = (17-10)/sqrt(29.5)
    val r = DiagnosticsOps.wilcoxonSignedRank(pairedFixture, "k",
      "pre", "post", quantDigits = 0).head()
    assert(r.getAs[Long]("n") === 4L)
    assert(approx(r.getAs[Double]("w_plus"), 8.5))
    assert(approx(r.getAs[Double]("z"), 7.0 / math.sqrt(29.5)))
  }

  test("cochranQ: textbook 4x3 binary table gives Q = 8/3") {
    // blocks (1,1,0),(1,0,0),(1,1,1),(0,1,0): T=(3,3,1) N=7 u2=15
    // Q = 2*(3*19-49)/(21-15) = 8/3; block 5 incomplete -> excluded
    val df = Seq(
      (1L, 0L, true), (1L, 1L, true), (1L, 2L, false),
      (2L, 0L, true), (2L, 1L, false), (2L, 2L, false),
      (3L, 0L, true), (3L, 1L, true), (3L, 2L, true),
      (4L, 0L, false), (4L, 1L, true), (4L, 2L, false),
      (5L, 0L, true)).toDF("b", "t", "x")
    val r = DiagnosticsOps.cochranQ(df, "b", "t", "x").head()
    assert(r.getAs[Long]("n_blocks") === 4L)
    assert(r.getAs[Long]("k") === 3L && r.getAs[Long]("dof") === 2L)
    assert(approx(r.getAs[Double]("q"), 8.0 / 3.0))
  }

  test("kendallTau: hand-counted C=6 D=2 with x/y/joint ties, tau_b = 0.5") {
    // x=(1,2,3,1,2) y=(1,3,2,1,3): n1=n2=n3=2
    // tau_b = (6-2)/sqrt((10-2)(10-2)) = 0.5
    val df = seriesDf(Seq(("A", 1L, 1), ("A", 2L, 2), ("A", 3L, 3),
      ("A", 4L, 1), ("A", 5L, 2),
      ("B", 1L, 1), ("B", 2L, 3), ("B", 3L, 2), ("B", 4L, 1),
      ("B", 5L, 3))).withColumnRenamed("g", "c")
    val r = DiagnosticsOps.kendallTau(df, "c", "A", "B", "h").head()
    assert(r.getAs[Long]("t") === 5L)
    assert(r.getAs[Long]("concordant") === 6L)
    assert(r.getAs[Long]("discordant") === 2L)
    assert(approx(r.getAs[Double]("tau_b"), 0.5))
  }

  test("kendallTau: perfectly concordant and anti-concordant series") {
    val up = seriesDf(Seq(("A", 1L, 1), ("A", 2L, 2), ("A", 3L, 3),
      ("B", 1L, 2), ("B", 2L, 4), ("B", 3L, 6)))
      .withColumnRenamed("g", "c")
    assert(approx(DiagnosticsOps.kendallTau(up, "c", "A", "B", "h")
      .head().getAs[Double]("tau_b"), 1.0))
    val down = seriesDf(Seq(("A", 1L, 1), ("A", 2L, 2), ("A", 3L, 3),
      ("B", 1L, 6), ("B", 2L, 4), ("B", 3L, 2)))
      .withColumnRenamed("g", "c")
    assert(approx(DiagnosticsOps.kendallTau(down, "c", "A", "B", "h")
      .head().getAs[Double]("tau_b"), -1.0))
  }

  test("matthews: hand confusion matrix, MCC = 4/sqrt(240)") {
    // tp=3 tn=2 fp=1 fn=2: MCC = (6-2)/sqrt(4*5*3*4)
    // tpr=3/5 tnr=2/3: ba = 19/30, J = 4/15
    val df = Seq((1, 1), (1, 1), (1, 1), (1, 0), (1, 0),
      (0, 0), (0, 0), (0, 1)).toDF("truth", "pred")
    val r = graft.operators.ClassifierOps.matthews(df, "truth", "pred")
      .head()
    assert(r.getAs[Long]("tp") === 3L && r.getAs[Long]("tn") === 2L)
    assert(r.getAs[Long]("fp") === 1L && r.getAs[Long]("fn") === 2L)
    assert(approx(r.getAs[Double]("mcc"), 4.0 / math.sqrt(240.0)))
    assert(approx(r.getAs[Double]("balanced_accuracy"), 19.0 / 30.0))
    assert(approx(r.getAs[Double]("youden_j"), 4.0 / 15.0))
  }

  test("matthews: constant prediction yields null MCC, not an error") {
    val df = Seq((1, 1), (0, 1), (1, 1)).toDF("truth", "pred")
    val r = graft.operators.ClassifierOps.matthews(df, "truth", "pred")
      .head()
    assert(r.isNullAt(r.fieldIndex("mcc")))
  }

  test("kCore: triangle survives k=2 peeling, tails and islands drop") {
    // triangle {1,2,3} + chain 3-4-5 + island 6-7, with a duplicate
    // and a self-loop that canonicalization must ignore
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L), (3L, 4L),
      (4L, 5L), (6L, 7L), (3L, 3L)).toDF("id1", "id2")
    val r = graft.operators.DedupOps.kCore(edges, "id1", "id2",
      k = 2, rounds = 3).head()
    assert(r.getAs[Long]("n_nodes") === 3L)
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(r.getAs[Boolean]("converged"))
    // one round is not enough to finish peeling the chain
    val r1 = graft.operators.DedupOps.kCore(edges, "id1", "id2",
      k = 2, rounds = 1).head()
    assert(r1.getAs[Long]("n_nodes") === 4L)
    assert(!r1.getAs[Boolean]("converged"))
  }

  test("graph iterators: durable checkpoint mode equals localCheckpoint" +
      " mode") {
    // The scale-safe path (checkpointDir -> df.checkpoint) must be
    // result-identical to the default local path — the cluster caveat
    // is an argument now, not scaladoc advice.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (1L, 3L), (2L, 4L)).toDF("id1", "id2")
    val ccLocal = graft.operators.DedupOps
      .connectedComponents(edges, "id1", "id2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ccDurable = graft.operators.DedupOps
      .connectedComponents(edges, "id1", "id2",
        checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ccDurable === ccLocal)
    val kLocal = graft.operators.DedupOps
      .kCore(edges, "id1", "id2", k = 2, rounds = 3).head()
    val kDurable = graft.operators.DedupOps
      .kCore(edges, "id1", "id2", k = 2, rounds = 3,
        checkpointDir = Some(dir)).head()
    assert(kDurable.getAs[Long]("n_nodes") ===
      kLocal.getAs[Long]("n_nodes"))
    assert(kDurable.getAs[Long]("n_edges") ===
      kLocal.getAs[Long]("n_edges"))
    assert(kDurable.getAs[Boolean]("converged") ===
      kLocal.getAs[Boolean]("converged"))
  }

  test("logRankTest: 2+2 subjects, hand-walked risk sets, V = 13/18") {
    // A lifetimes (1,3), B (2,5), censorDays=0 (all deaths)
    // t=1: e=.5 v=.25; t=2: e=1/3 v=2/9; t=3: e=.5 v=.25; t=5: 0
    // O_A=2, E_A=4/3, z=(2/3)/sqrt(13/18)
    val day = 86400000000000L
    val rows = Seq(("a1", 0L, "A"), ("a1", 1L, "A"),
      ("a2", 0L, "A"), ("a2", 3L, "A"),
      ("b1", 0L, "B"), ("b1", 2L, "B"),
      ("b2", 0L, "B"), ("b2", 5L, "B"))
      .map { case (k, dd, g) => (k, dd * day, g) }
      .toDF("k", "ts", "grp")
    val r = graft.operators.SequenceOps.logRankTest(rows, "k", "ts",
      "grp", "A", "B", censorDays = 0).head()
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Long]("o_a") === 2L)
    assert(approx(r.getAs[Double]("e_a"), 4.0 / 3.0))
    assert(approx(r.getAs[Double]("v"), 13.0 / 18.0))
    assert(approx(r.getAs[Double]("z"),
      (2.0 / 3.0) / math.sqrt(13.0 / 18.0)))
  }

  test("medianTest: disjoint groups give chi2 = n") {
    // a=(1,2,3) b=(4,5,6): med=3, cells (0,3)/(3,0), chi2 = 6
    val df = Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0,
      "b" -> 4.0, "b" -> 5.0, "b" -> 6.0).toDF("g", "v")
    val r = DiagnosticsOps.medianTest(df, "g", "v", quantDigits = 0)
      .head()
    assert(r.getAs[Long]("k") === 2L && r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("dof") === 1L)
    assert(approx(r.getAs[Double]("chi2"), 6.0))
  }

  test("mmdDrift: poly-2 kernel equals closed-form moment matching") {
    // A=(0,2) mu=(1,2); B=(1,3) mu=(2,5); gamma=1:
    // MMD2 = 2*(-1)^2 + (-3)^2 = 11
    val df = Seq("A" -> 0.0, "A" -> 2.0, "B" -> 1.0, "B" -> 3.0)
      .toDF("c", "v")
    val r = DiagnosticsOps.mmdDrift(df, "c", "A", "B", "v",
      gamma = 1.0, quantDigits = 0).head()
    assert(approx(r.getAs[Double]("mmd2"), 11.0))
    val same = DiagnosticsOps.mmdDrift(df, "c", "A", "A", "v",
      gamma = 1.0, quantDigits = 0).head()
    assert(approx(same.getAs[Double]("mmd2"), 0.0))
  }

  test("krippendorffAlpha: textbook missing-rating case, alpha = 0.5") {
    // i1 (a,a), i2 (a,b), i3 (b,b,b), i4 (a) dropped
    // Do = 2/7, De = 24/42 = 4/7 -> alpha = 0.5
    val df = Seq(("i1", "a"), ("i1", "a"), ("i2", "a"), ("i2", "b"),
      ("i3", "b"), ("i3", "b"), ("i3", "b"), ("i4", "a"))
      .toDF("item", "cat")
    val r = graft.operators.ClassifierOps.krippendorffAlpha(df,
      "item", "cat").head()
    assert(r.getAs[Long]("n_values") === 7L)
    assert(r.getAs[Long]("n_dropped") === 1L)
    assert(approx(r.getAs[Double]("alpha"), 0.5))
  }

  test("krippendorffAlpha: perfect agreement gives alpha = 1") {
    val df = Seq(("i1", "a"), ("i1", "a"), ("i2", "b"), ("i2", "b"))
      .toDF("item", "cat")
    val r = graft.operators.ClassifierOps.krippendorffAlpha(df,
      "item", "cat").head()
    assert(approx(r.getAs[Double]("alpha"), 1.0))
  }

  test("seasonalStrength: two clean seasons explain 80% of variance") {
    // season 0 = (1,3), season 1 = (5,7): varT=5, varR=1, F_s=0.8
    val df = Seq(("g1", 0L, 1.0), ("g1", 0L, 3.0),
      ("g1", 1L, 5.0), ("g1", 1L, 7.0)).toDF("g", "season", "v")
    val r = graft.operators.SequenceOps.seasonalStrength(df, "g",
      "season", "v", quantDigits = 0).head()
    assert(r.getAs[Long]("n") === 4L)
    assert(approx(r.getAs[Double]("var_total"), 5.0))
    assert(approx(r.getAs[Double]("var_resid"), 1.0))
    assert(approx(r.getAs[Double]("strength"), 0.8))
    // constant series: zero total variance -> null strength
    val const = Seq(("g1", 0L, 2.0), ("g1", 1L, 2.0))
      .toDF("g", "season", "v")
    val rc = graft.operators.SequenceOps.seasonalStrength(const, "g",
      "season", "v", quantDigits = 0).head()
    assert(rc.isNullAt(rc.fieldIndex("strength")))
  }

  test("kendallTau: gamma and Somers' D diverge under one-sided ties") {
    // x=(1,1,2) y=(1,2,3): C=2 D=0, n1=1 n2=0
    // gamma = 1, d_yx = 2/(3-1) = 1, d_xy = 2/3, tau_b = 2/sqrt(6)
    val df = seriesDf(Seq(("A", 1L, 1), ("A", 2L, 1), ("A", 3L, 2),
      ("B", 1L, 1), ("B", 2L, 2), ("B", 3L, 3)))
      .withColumnRenamed("g", "c")
    val r = DiagnosticsOps.kendallTau(df, "c", "A", "B", "h").head()
    assert(approx(r.getAs[Double]("tau_b"), 2.0 / math.sqrt(6.0)))
    assert(approx(r.getAs[Double]("gamma"), 1.0))
    assert(approx(r.getAs[Double]("somers_dyx"), 1.0))
    assert(approx(r.getAs[Double]("somers_dxy"), 2.0 / 3.0))
  }

  test("cohensD: pooled SD sqrt(7), d = -3/sqrt(7), g = 0.8 d") {
    val df = Seq("A" -> 1.0, "A" -> 2.0, "A" -> 3.0,
      "B" -> 2.0, "B" -> 4.0, "B" -> 9.0).toDF("c", "v")
    val r = DiagnosticsOps.cohensD(df, "c", "A", "B", "v",
      quantDigits = 0).head()
    assert(approx(r.getAs[Double]("pooled_sd"), math.sqrt(7.0)))
    assert(approx(r.getAs[Double]("d"), -3.0 / math.sqrt(7.0)))
    assert(approx(r.getAs[Double]("hedges_g"),
      -3.0 / math.sqrt(7.0) * 0.8))
  }

  test("cochranArmitage: linear dose-response, z = sqrt(2)") {
    // doses 0/1/2 with successes 1/2/3 of 4 each: num=2, den=sqrt(2)
    val rows = Seq(0 -> 1, 1 -> 2, 2 -> 3).flatMap { case (s, r) =>
      (1 to 4).map(i => (s.toLong, i <= r))
    }
    val df = rows.toDF("dose", "y")
    val r = DiagnosticsOps.cochranArmitage(df, "dose", "y").head()
    assert(r.getAs[Long]("k") === 3L && r.getAs[Long]("n") === 12L)
    assert(r.getAs[Long]("successes") === 6L)
    assert(approx(r.getAs[Double]("z"), math.sqrt(2.0)))
  }

  test("diversityIndex: even two-way mix vs single category") {
    val df = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g1", "b"),
      ("g2", "c"), ("g2", "c"), ("g2", "c"), ("g2", "c"))
      .toDF("g", "cat")
    val out = DiagnosticsOps.diversityIndex(df, "g", "cat")
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = out("g1")
    assert(approx(g1.getAs[Double]("shannon"), math.log(2.0)))
    assert(approx(g1.getAs[Double]("evenness"), 1.0))
    assert(approx(g1.getAs[Double]("simpson"), 0.5))
    assert(approx(g1.getAs[Double]("inv_simpson"), 2.0))
    val g2 = out("g2")
    assert(g2.getAs[Long]("k") === 1L)
    assert(approx(g2.getAs[Double]("shannon"), 0.0))
    assert(g2.isNullAt(g2.fieldIndex("evenness")))
    assert(approx(g2.getAs[Double]("simpson"), 1.0))
  }

  test("abPower: MDE closed form at the 0.05/0.80 operating point") {
    // arms of 2/2, pooled rate 0.5: mde = (z_a + z_p) * 0.5
    val df = Seq(("a", 1L), ("a", 0L), ("b", 1L), ("b", 0L))
      .toDF("arm", "conv")
    val r = DiagnosticsOps.abPower(df, "arm", "a", "b", "conv").head()
    val zsum = 1.959963984540054 + 0.8416212335729143
    assert(approx(r.getAs[Double]("pooled_rate"), 0.5))
    assert(approx(r.getAs[Double]("mde_abs"), zsum * 0.5))
    assert(approx(r.getAs[Double]("mde_rel"), zsum))
  }

  test("spiegelhalterZ: calibrated scores give z = 0; inflated give 2*sqrt(3)") {
    // four p=0.25 predictions, exactly one positive -> num = 0
    val cal = Seq((0.25, true), (0.25, false), (0.25, false),
      (0.25, false)).toDF("score", "label")
    val r = graft.operators.ClassifierOps.spiegelhalterZ(cal, "score",
      "label").head()
    assert(r.getAs[Long]("n") === 4L)
    assert(approx(r.getAs[Double]("z"), 0.0))
    // all four positive at p=0.25: num = 1.5, var = 0.1875
    val off = Seq((0.25, true), (0.25, true), (0.25, true),
      (0.25, true)).toDF("score", "label")
    val r2 = graft.operators.ClassifierOps.spiegelhalterZ(off, "score",
      "label").head()
    assert(approx(r2.getAs[Double]("z"), 2.0 * math.sqrt(3.0)))
  }

  test("degenerate inputs survive ANSI mode (empty-sweep regressions)") {
    // medianTest single row: one margin is 0 -> null chi2, no /0
    val one = Seq("a" -> 1.0).toDF("g", "v")
    val m = DiagnosticsOps.medianTest(one, "g", "v", quantDigits = 0)
      .head()
    assert(m.isNullAt(m.fieldIndex("chi2")))
    // twoProportionZ with an empty arm: null z, no 1/0
    val oneArm = Seq(("a", 1L), ("a", 0L)).toDF("arm", "s")
    val z = graft.operators.StatsOps.twoProportionZ(oneArm, "arm",
      "a", "b", "s").head()
    assert(z.getAs[Long]("n_b") === 0L)
    assert(z.isNullAt(z.fieldIndex("z")))
    // didEstimate with an empty cell: null did, no /0
    val did = graft.operators.StatsOps.didEstimate(
      Seq((true, true, 1.0), (false, false, 2.0))
        .toDF("treat", "post", "v"), "treat", "post", "v").head()
    assert(did.isNullAt(did.fieldIndex("did")))
    // kaplanMeier on an empty frame: zero rows (sequence(1,0) would
    // otherwise descend to [1,0] and index an empty array)
    val empty = Seq.empty[(Long, Long)].toDF("k", "ts")
    assert(graft.operators.SequenceOps.kaplanMeier(empty, "k", "ts",
      censorDays = 0).count() === 0L)
    assert(graft.operators.SequenceOps.nelsonAalen(empty, "k", "ts",
      censorDays = 0).count() === 0L)
  }

  test("scd2Apply: close/keep/insert/history plus latest-change collapse") {
    val cur = Seq(
      ("k1", "segOld", 50L, -10L, Some(0L), false), // history row
      ("k1", "segA", 100L, 0L, None, true),
      ("k2", "segB", 200L, 0L, None, true))
      .toDF("k", "seg", "bal", "valid_from", "valid_to", "is_current")
    val ch = Seq(
      ("k1", "segA", 120L, 3L), // superseded by the ts=5 change
      ("k1", "segA", 150L, 5L), // bal change -> close + new version
      ("k2", "segB", 200L, 5L), // no-op change -> kept untouched
      ("k3", "segC", 1L, 5L)) // brand-new key
      .toDF("k", "seg", "bal", "ts")
    val out = graft.sources.IoOps.scd2Apply(cur, ch, Seq("k"),
      Seq("seg", "bal"), "ts")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), Option(r.get(4)), r.getBoolean(5))).toSet
    assert(out === Set(
      ("k1", "segOld", 50L, -10L, Some(0L), false), // history kept
      ("k1", "segA", 100L, 0L, Some(5L), false), // closed at ts 5
      ("k1", "segA", 150L, 5L, None, true), // new current version
      ("k2", "segB", 200L, 0L, None, true), // unchanged passes
      ("k3", "segC", 1L, 5L, None, true))) // fresh key inserts
  }

  test("chowTest: level shift at a known break, F = 128/21") {
    // seg1 y=(1,2,1,2) h=0..3, seg2 y=(5,6,5,6) h=4..7, break at 4
    // SSE1 = SSE2 = 0.8; SSEp = 136/21; F = ((136/21-1.6)/2)/(1.6/4)
    val df = seriesDf(Seq(("g1", 0L, 1), ("g1", 1L, 2), ("g1", 2L, 1),
      ("g1", 3L, 2), ("g1", 4L, 5), ("g1", 5L, 6), ("g1", 6L, 5),
      ("g1", 7L, 6)))
    val r = DiagnosticsOps.chowTest(df, "g", "h", breakWin = 4L).head()
    assert(r.getAs[Long]("n") === 8L)
    assert(r.getAs[Long]("n_1") === 4L && r.getAs[Long]("n_2") === 4L)
    assert(approx(r.getAs[Double]("sse_pooled"), 136.0 / 21.0))
    assert(approx(r.getAs[Double]("sse_split"), 1.6))
    assert(approx(r.getAs[Double]("f"), 128.0 / 21.0))
  }

  test("chowTest: perfectly-fit segments yield null F, not Inf") {
    // both segments flat -> rss = 0
    val df = seriesDf((0L to 7L).map(h =>
      ("g1", h, if (h < 4) 1 else 5)))
    val r = DiagnosticsOps.chowTest(df, "g", "h", breakWin = 4L).head()
    assert(approx(r.getAs[Double]("sse_split"), 0.0))
    assert(r.isNullAt(r.fieldIndex("f")))
  }

  test("tostEquivalence: wide margin passes, narrow margin fails") {
    // A=(1,2,3) B=(2,4,9): diff=-3, se=sqrt(14/3)
    val df = Seq("A" -> 1.0, "A" -> 2.0, "A" -> 3.0,
      "B" -> 2.0, "B" -> 4.0, "B" -> 9.0).toDF("c", "v")
    val wide = DiagnosticsOps.tostEquivalence(df, "c", "A", "B", "v",
      delta = 10.0, quantDigits = 0).head()
    val se = math.sqrt(14.0 / 3.0)
    assert(approx(wide.getAs[Double]("diff"), -3.0))
    assert(approx(wide.getAs[Double]("se"), se))
    assert(approx(wide.getAs[Double]("z_lower"), 7.0 / se))
    assert(approx(wide.getAs[Double]("z_upper"), 13.0 / se))
    assert(wide.getAs[Boolean]("equivalent"))
    val narrow = DiagnosticsOps.tostEquivalence(df, "c", "A", "B", "v",
      delta = 1.0, quantDigits = 0).head()
    assert(!narrow.getAs[Boolean]("equivalent"))
  }

  private def crGate(id: Long, mult: Long): Boolean = {
    val M = 1000000007L
    val h0 = java.lang.Math.floorMod(id, M) * mult % M
    val g1 = h0 ^ (h0 >> 15)
    val g2 = g1 * mult % M
    (g2 ^ (g2 >> 15)) % 100 < 25
  }

  test("captureRecapture: Chapman matches the replayed hash censuses") {
    val ids = (0L until 100L)
    val df = ids.toDF("doc_id")
    val n1 = ids.count(crGate(_, 2654435761L))
    val n2 = ids.count(crGate(_, 2246822519L))
    val m = ids.count(id =>
      crGate(id, 2654435761L) && crGate(id, 2246822519L))
    val r = graft.operators.SketchOps.captureRecapture(df, "doc_id")
      .head()
    assert(r.getAs[Long]("n_true") === 100L)
    assert(r.getAs[Long]("n1") === n1.toLong)
    assert(r.getAs[Long]("n2") === n2.toLong)
    assert(r.getAs[Long]("m") === m.toLong)
    assert(approx(r.getAs[Double]("n_chapman"),
      (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0))
  }

  test("captureRecapture: gates are independent — Chapman approximates" +
      " the true population on sequential ids") {
    // The r14 bug: salt-before-shared-multiply made the gates affine
    // twins (m = 0 for ALL keys at 25%/25%, N-hat ~ N^2/16). With
    // genuinely independent hashes, m ~ N/16 and N-hat ~ N. Sequential
    // ids are the adversarial key shape for multiplicative hashes.
    val n = 200000L
    val df = spark.range(1L, n + 1L).toDF("doc_id")
    val r = graft.operators.SketchOps.captureRecapture(df, "doc_id")
      .head()
    val m = r.getAs[Long]("m")
    val est = r.getAs[Double]("n_chapman")
    // expected m = n/16 = 12500; allow +-20% (deterministic, so this
    // pins the exact hash as much as the statistics)
    assert(m > 10000L && m < 15000L,
      s"recapture overlap m=$m not near n/16=12500 — gates correlated?")
    assert(math.abs(est - n) / n < 0.05,
      s"Chapman estimate $est not within 5% of true $n")
  }

  test("groupSequential: hand-walked OBF boundary, crossing at look 2") {
    // look 1: a = 2 subjects 1 conv, b = 2 subjects 0 conv
    // look 2 adds: a = 2 subjects 2 conv, b = 2 subjects 0 conv
    val df = Seq(
      ("a", 1L, 1L), ("a", 0L, 1L), ("b", 0L, 1L), ("b", 0L, 1L),
      ("a", 1L, 2L), ("a", 1L, 2L), ("b", 0L, 2L), ("b", 0L, 2L))
      .toDF("arm", "conv", "day")
    val rows = DiagnosticsOps.groupSequential(df, "arm", "a", "b",
        "conv", "day")
      .orderBy("look").collect()
    assert(rows.length === 2)
    val r1 = rows(0)
    // look 1: pa=.5 pb=0 pp=.25, se=sqrt(.25*.75*(1/2+1/2)), t=.5
    val se1 = math.sqrt(0.25 * 0.75 * 1.0)
    assert(r1.getAs[Long]("n_a") === 2L && r1.getAs[Long]("x_a") === 1L)
    assert(approx(r1.getAs[Double]("info_frac"), 0.5))
    assert(approx(r1.getAs[Double]("z"), 0.5 / se1))
    assert(approx(r1.getAs[Double]("boundary"), 2.04 / math.sqrt(0.5)))
    assert(!r1.getAs[Boolean]("crossed")) // 1.155 < 2.885
    val r2 = rows(1)
    // look 2 cumulative: a 4/3... wait x_a = 1+2 = 3, x_b = 0
    // pa=.75 pb=0 pp=3/8, se=sqrt(3/8*5/8*(1/4+1/4)), t=1
    val pp2 = 3.0 / 8.0
    val se2 = math.sqrt(pp2 * (1 - pp2) * 0.5)
    assert(r2.getAs[Long]("n_a") === 4L && r2.getAs[Long]("x_a") === 3L)
    assert(approx(r2.getAs[Double]("info_frac"), 1.0))
    assert(approx(r2.getAs[Double]("z"), 0.75 / se2))
    assert(approx(r2.getAs[Double]("boundary"), 2.04))
    assert(r2.getAs[Boolean]("crossed")) // 2.191 >= 2.04
  }

  test("gumbelFit: block maxima (3,5,7) give MoM beta = 2*sqrt(6)/pi") {
    val df = seriesDf(Seq(("g1", 0L, 1), ("g1", 1L, 3), ("g1", 2L, 5),
      ("g1", 3L, 2), ("g1", 4L, 4), ("g1", 5L, 7)))
    val r = graft.operators.SequenceOps.gumbelFit(df, "g", "h",
      blockDiv = 2L).head()
    assert(r.getAs[Long]("n_blocks") === 3L)
    assert(approx(r.getAs[Double]("mean_max"), 5.0))
    val beta = 2.0 * math.sqrt(6.0) / math.Pi
    val mu = 5.0 - 0.5772156649015329 * beta
    assert(approx(r.getAs[Double]("beta"), beta))
    assert(approx(r.getAs[Double]("mu"), mu))
    assert(approx(r.getAs[Double]("p99"),
      mu - beta * math.log(-math.log(0.99))))
  }

  test("hllSetOps: an empty cohort estimates 0, not null") {
    // cohort B has no rows: its harmonic sum is a null SUM; the fix
    // coalesces it to 0 so zeros == m hits linear counting (= 0.0)
    val df = (1L to 200L).map(k => ("A", k)).toDF("c", "k")
    val r = graft.operators.SketchOps.hllSetOps(df, "k", "c", "A", "B")
      .head()
    assert(r.getAs[Double]("est_b") === 0.0)
    assert(r.getAs[Double]("est_intersection") === 0.0)
    assert(!r.isNullAt(r.fieldIndex("est_a")))
  }

  test("hllSetOps: union estimate equals hllDistinct of the union, bit-exact") {
    // A = 1..200, B = 101..300 (overlap 100): the union sketch must
    // be EXACTLY the sketch of the union input (register-max identity)
    val df = ((1L to 200L).map(k => ("A", k)) ++
      (101L to 300L).map(k => ("B", k))).toDF("c", "k")
    val r = graft.operators.SketchOps.hllSetOps(df, "k", "c", "A", "B")
      .head()
    val unionDf = (1L to 300L).map(k => ("g", k)).toDF("g", "k")
    val direct = graft.operators.SketchOps.hllDistinct(unionDf, "k",
      Seq("g")).head().getAs[Double]("hll_est")
    assert(r.getAs[Double]("est_union") === direct) // bit equality
    assert(r.getAs[Double]("est_intersection") >= 0.0)
    // rough sketch sanity at m=64: estimates in the right ballpark
    assert(math.abs(r.getAs[Double]("est_a") - 200.0) < 80.0)
    assert(math.abs(r.getAs[Double]("est_union") - 300.0) < 120.0)
  }

  test("hllSetOps: identical cohorts have jaccard 1; disjoint clamp at 0") {
    val same = ((1L to 150L).map(k => ("A", k)) ++
      (1L to 150L).map(k => ("B", k))).toDF("c", "k")
    val r = graft.operators.SketchOps.hllSetOps(same, "k", "c", "A", "B")
      .head()
    assert(r.getAs[Double]("est_a") === r.getAs[Double]("est_union"))
    assert(approx(r.getAs[Double]("jaccard_est"), 1.0))
    val disj = ((1L to 50L).map(k => ("A", k)) ++
      (1001L to 1050L).map(k => ("B", k))).toDF("c", "k")
    val d = graft.operators.SketchOps.hllSetOps(disj, "k", "c", "A", "B")
      .head()
    assert(d.getAs[Double]("est_intersection") >= 0.0)
    assert(d.getAs[Double]("jaccard_est") < 0.5)
  }

  test("grangerLite: exact fit (rssF = 0) yields null F, not Inf") {
    // y_t equals x_{t-1} exactly -> full model is exact
    val df = seriesDf(Seq(("x", 1L, 1), ("x", 2L, 2), ("x", 3L, 1),
      ("x", 4L, 3), ("x", 5L, 2),
      ("y", 2L, 1), ("y", 3L, 2), ("y", 4L, 1), ("y", 5L, 3)))
      .withColumnRenamed("g", "c")
    val r = DiagnosticsOps.grangerLite(df, "c", "x", "y", "h").head()
    assert(r.isNullAt(r.fieldIndex("f")))
  }

  test("msprtTest: hand-computed lambda, monotone always-valid p," +
      " null-arm looks skipped") {
    import spark.implicits._
    // look 1: arm a only (no b yet) -> lambda null, p null
    // look 2 cumulative: a: n=4,x=2 (pa=.5); b: n=2,x=0 -> pp=1/3
    //   V = (1/3)(2/3)(1/4+1/2) = 1/6; t2 = .01
    //   lam = sqrt(V/(V+t2))*exp(t2*.25/(2V(V+t2)))
    val rows = Seq(
      ("a", 1L, 1L), ("a", 1L, 0L),
      ("b", 2L, 0L), ("b", 2L, 0L), ("a", 2L, 1L), ("a", 2L, 0L))
      .toDF("arm", "day", "conv")
      // look 1 has ONLY a-arm units
      .where(!($"arm" === "b" && $"day" === 1L))
    val out = DiagnosticsOps.msprtTest(rows, "arm", "a", "b",
        "conv", "day")
      .orderBy("look").collect()
    assert(out.length === 2)
    assert(out(0).isNullAt(out(0).fieldIndex("lambda")))
    assert(out(0).isNullAt(out(0).fieldIndex("p_always_valid")))
    assert(!out(0).getBoolean(out(0).fieldIndex("rejected")))
    val v = (1.0 / 3) * (2.0 / 3) * (1.0 / 4 + 1.0 / 2)
    val t2 = 0.1 * 0.1
    val lam = math.sqrt(v / (v + t2)) *
      math.exp(t2 * 0.5 * 0.5 / (2.0 * v * (v + t2)))
    assert(approx(out(1).getDouble(out(1).fieldIndex("lambda")), lam))
    assert(approx(out(1).getDouble(out(1).fieldIndex("p_always_valid")),
      math.min(1.0, 1.0 / lam)))
    // monotonicity: p never increases across looks on a longer stream
    val many = (1L to 40L).flatMap(u => Seq(
      (if (u % 2 == 0) "a" else "b", 1L + u % 5,
        if (u % 2 == 0 && u % 3 == 0) 1L else 0L)))
      .toDF("arm", "day", "conv")
    val ps = DiagnosticsOps.msprtTest(many, "arm", "a", "b",
        "conv", "day")
      .orderBy("look").collect()
      .flatMap(r => if (r.isNullAt(7)) None else Some(r.getDouble(7)))
    assert(ps.sliding(2).forall(p => p.length < 2 || p(1) <= p(0)))
  }

  test("cupedAdjust: hand-computed theta, adjusted diff, rho^2;" +
      " perfect covariate zeroes residual variance share") {
    import spark.implicits._
    // units: (arm, x, y); hand moments over n=6:
    // sx=21, sy=12, sxy=50, sxx=91, syy=28
    // cov n-form = 6*50-21*12 = 48; varx = 6*91-441 = 105
    // theta = 48/105; vary = 6*28-144 = 24; rho2 = 48^2/(105*24)
    val df = Seq(("a", 1L, 1L), ("a", 3L, 2L), ("a", 5L, 3L),
      ("b", 2L, 1L), ("b", 4L, 2L), ("b", 6L, 3L))
      .toDF("arm", "x", "y")
    val r = DiagnosticsOps.cupedAdjust(df, "arm", "a", "b", "x", "y")
      .head()
    val theta = 48.0 / 105.0
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(approx(r.getDouble(2), theta))
    // raw diff: (6/3 - 6/3) = 0; x means differ by (9-12)/3 = -1
    assert(approx(r.getDouble(3), 0.0))
    assert(approx(r.getDouble(4), 0.0 - theta * (-1.0)))
    assert(approx(r.getDouble(5), 48.0 * 48.0 / (105.0 * 24.0)))
    // y == x: rho^2 = 1 (CUPED removes ALL variance), theta = 1
    val perfect = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 3L, 3L),
      ("b", 4L, 4L)).toDF("arm", "x", "y")
    val p = DiagnosticsOps.cupedAdjust(perfect, "arm", "a", "b", "x", "y")
      .head()
    assert(approx(p.getDouble(2), 1.0) && approx(p.getDouble(5), 1.0))
    // constant covariate: theta = 0, adjustment is a no-op
    val const = Seq(("a", 2L, 1L), ("a", 2L, 3L), ("b", 2L, 2L))
      .toDF("arm", "x", "y")
    val c = DiagnosticsOps.cupedAdjust(const, "arm", "a", "b", "x", "y")
      .head()
    assert(c.getDouble(2) === 0.0)
    assert(approx(c.getDouble(3), c.getDouble(4)))
    assert(c.getDouble(5) === 0.0)
  }
}
