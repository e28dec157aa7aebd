package graft

import org.apache.spark.sql.functions._

/** Round-10 curation-surface operators: profiling, Tukey fences,
  * Misra-Gries heavy hitters, EWMA smoothing, Jaro-Winkler linkage.
  */
class CurationOpsSpec extends SparkSpec {

  import spark.implicits._

  test("profileTable counts rows, nulls, and exact distincts per column") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("b")), (Some(2L), None),
      (None, Some("a")), (None, None))
      .toDF("x", "y")
    val out = operators.StatsOps.profileTable(df, Seq("x", "y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("x") === ((5L, 2L, 2L)))
    assert(out("y") === ((5L, 2L, 2L)))
  }

  test("profileTable approx path: KMV estimate, exact flag, null skip") {
    val df = (1L to 500L).map(v => (v, v % 7)).toDF("id", "cat")
      .union(Seq((None: Option[Long], Some(0L))).toDF("id", "cat"))
    // sketch never fills (500 distinct < k): estimate degrades exact
    val full = operators.StatsOps.profileTable(df, Seq("id", "cat"),
        approxCols = Set("id"), k = 1024)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(full("id") === ((501L, 1L, 500L, false)),
      "unfilled sketch must report the exact non-null distinct count")
    assert(full("cat") === ((501L, 0L, 7L, true)))
    // sketch fills (k = 64 < 500 distinct): closed-form KMV estimate,
    // independent of partitioning
    val hs = (1L to 500L)
      .map(operators.SketchOps.kmvHash).distinct.sorted.take(64)
    val want = math.floor(63.0 * operators.SketchOps.KmvMod / hs.last).toLong
    for (parts <- Seq(1, 7)) {
      val est = operators.StatsOps.profileTable(
          df.repartition(parts), Seq("id"), approxCols = Set("id"), k = 64)
        .collect().head.getLong(3)
      assert(est === want, s"KMV estimate at $parts partitions")
    }
  }

  test("iqrOutliers flags exactly the rows outside the Tukey fence") {
    // group g: values 1..9 plus outliers -100 and 100
    val rows = ((1 to 9).map(v => ("g", v.toLong, v.toDouble)) ++
      Seq(("g", 100L, 100.0), ("g", 101L, -100.0))).toDF("k", "id", "v")
    val out = operators.StatsOps.iqrOutliers(rows, Seq("k"), "v")
      .select("id", "is_outlier").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(100L) && out(101L), "extremes must be flagged")
    (1 to 9).foreach(v => assert(!out(v.toLong), s"inlier $v flagged"))
  }

  test("heavyHitters returns exactly the > n/(k+1) items, regardless of partitioning") {
    // 100 rows: value 1 x50, 2 x30, 3..22 x1 each -> with k=4
    // (threshold n/5 = 20): heavy = {1, 2}
    val values = Seq.fill(50)(1L) ++ Seq.fill(30)(2L) ++ (3L to 22L)
    val df = values.zipWithIndex.map { case (v, i) => ("g", v) }
      .toDF("k", "v")
    for (parts <- Seq(1, 7)) {
      val out = operators.SketchOps.heavyHitters(
          df.repartition(parts), Seq("k"), "v", k = 4)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      assert(out.toSeq === Seq((1L, 50L, 100L), (2L, 30L, 100L)),
        s"parts=$parts: got ${out.toSeq}")
    }
  }

  test("MisraGries candidate set can never miss a true heavy hitter") {
    // adversarial order: stream the heavy value LAST so naive top-k
    // counters would have been evicted
    val agg = new operators.SketchOps.MisraGriesAggregator(3)
    val stream = (1L to 60L) ++ Seq.fill(40)(999L) // 999 = 40% > n/4
    val buf = stream.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf).contains(999L),
      "MG guarantee violated: frequent item evicted")
  }

  test("ewmaSmooth matches the closed-form trailing weighted mean") {
    val df = Seq((1L, 1L, 1L, 4.0), (1L, 2L, 2L, 8.0), (1L, 3L, 3L, 16.0))
      .toDF("k", "ts", "tie", "v")
    val out = operators.SequenceOps
      .ewmaSmooth(df, "k", "ts", "tie", "v", alpha = 0.5, lookback = 8)
      .select("ts", "ewma").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) === 4.0) // single value
    // (0.5*4 + 8) / 1.5 = 10/1.5
    assert(approx(out(2L), 10.0 / 1.5, 1e-12))
    // (0.25*4 + 0.5*8 + 16) / 1.75 = 21/1.75 = 12
    assert(approx(out(3L), 12.0, 1e-12))
  }

  test("datasetFingerprint is invariant under row order and partitioning") {
    val rows = (1L to 200L).map(i => (i * 37 % 1000, i)).toDF("a", "b")
      .selectExpr("(a * 31 + b) % 1000000007 as _row_hash")
    val f1 = sources.IoOps.datasetFingerprint(Seq("t" -> rows))
      .collect()(0)
    val f2 = sources.IoOps.datasetFingerprint(
      Seq("t" -> rows.repartition(13).orderBy(desc("_row_hash"))))
      .collect()(0)
    assert(f1.getLong(1) === 200L)
    assert(f1.getLong(2) === f2.getLong(2),
      "fingerprint must not depend on layout")
    // and it moves when content moves
    val f3 = sources.IoOps.datasetFingerprint(
      Seq("t" -> rows.withColumn("_row_hash", col("_row_hash") + 1)))
      .collect()(0)
    assert(f3.getLong(2) !== f1.getLong(2))
  }

  test("oovRate: tokens outside the top-n vocabulary are counted per group") {
    // corpus: 'a' x6, 'b' x4, 'c' x2, 'd' x1 — vocab(2) = {a, b}
    val docs = Seq(
      ("g1", "a a a b b c"), ("g2", "a a a b b c d"))
      .toDF("lang", "text")
    val out = operators.TextOps.oovRate(docs, "lang", "text", vocabSize = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("g1") === ((6L, 1L, 1.0 / 6.0)))
    assert(out("g2") === ((7L, 2L, 2.0 / 7.0)))
  }

  test("containment catches a short doc swallowed by a long one where jaccard fails") {
    val short = (1 to 20).map(i => s"w$i").mkString(" ")
    val long = short + " " + (100 to 200).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long), (3L, "totally different words here entirely"))
      .toDF("doc_id", "text")
    val out = operators.DedupOps.containmentPairs(
        docs, "doc_id", "text", minContainment = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    assert(out.length === 1 && out(0)._1 === 1L && out(0)._2 === 2L,
      s"expected only the (short, long) pair, got ${out.toSeq}")
    assert(out(0)._3 === 1.0, "full containment must score 1.0")
  }

  test("bleuPairs scores identity 1.0, zero-overlap 0.0, and the closed-form partial case") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c"), // partial: p1=p2=1, BP=e^(1-4/3)
      (3L, "x y z"), (4L, "x y z"), // identity
      (5L, "p q"), (6L, "r s")) // zero overlap
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id1", "id2")
    val out = operators.TextOps.bleuPairs(pairs, docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(6))
      .toMap
    assert(out((3L, 4L)) === 1.0, "identical texts must score 1")
    assert(out((5L, 6L)) === 0.0, "no overlap must score 0")
    assert(approx(out((1L, 2L)), math.exp(1.0 - 4.0 / 3.0), 1e-12),
      "perfect precision under-length: bleu = brevity penalty alone")
  }

  test("rougePairs: identity 1.0, zero-overlap 0.0, hand-computed partial") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c"), // ref 4 uni / cand 3; ov1 = 3
      (3L, "x y z"), (4L, "x y z"), // identity
      (5L, "p q"), (6L, "r s")) // zero overlap
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id1", "id2")
    val out = operators.TextOps.rougePairs(pairs, docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(6), r.getDouble(7), r.getDouble(8)))).toMap
    assert(out((3L, 4L)) === ((1.0, 1.0, 1.0)), "identical texts score 1")
    assert(out((5L, 6L)) === ((0.0, 0.0, 0.0)), "no overlap scores 0")
    val (r1r, r1f, r2f) = out((1L, 2L))
    assert(approx(r1r, 3.0 / 4, 1e-15), "recall = ov/ref")
    assert(approx(r1f, 2.0 * 3 / (4 + 3), 1e-15), "F1 = 2ov/(ref+cand)")
    assert(approx(r2f, 2.0 * 2 / (3 + 2), 1e-15),
      "bigrams: {a b, b c} shared of ref 3 / cand 2")
  }

  test("funnelLatency: exact interpolated percentiles over completed funnels only") {
    // u1 completes in 10s, u2 in 30s, u3 never completes
    val ns = 1000L * 1000 * 1000
    val events = Seq(
      (1L, "view", 0L), (1L, "click", 4 * ns), (1L, "purchase", 10 * ns),
      (2L, "view", 0L), (2L, "click", 10 * ns), (2L, "purchase", 30 * ns),
      (3L, "view", 0L), (3L, "click", 5 * ns))
      .toDF("user_id", "event_type", "ts_ns")
    val r = operators.SequenceOps.funnelLatency(events, "user_id",
      "event_type", "ts_ns", Seq("view", "click", "purchase"),
      ps = Seq(0.5, 1.0)).collect()(0)
    assert(r.getLong(0) === 2L, "only completed funnels count")
    assert(approx(r.getDouble(1), 20.0, 1e-12), "p50 interpolates 10..30")
    assert(approx(r.getDouble(2), 30.0, 1e-12))
  }

  test("rollingMedian rejects a spike the EWMA follows") {
    val rows = Seq(1.0, 1.0, 1.0, 100.0, 1.0).zipWithIndex
      .map { case (v, i) => (1L, i.toLong, i.toLong, v) }
      .toDF("k", "ts", "tie", "v")
    val med = operators.SequenceOps
      .rollingMedian(rows, "k", "ts", "tie", "v", lookback = 8)
      .select("ts", "rolling_median")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // at the spike row the frame is [1,1,1,100]: lower median = 1
    assert(med(3L) === 1.0, "median must reject the spike")
    assert(med(4L) === 1.0)
    val ew = operators.SequenceOps
      .ewmaSmooth(rows, "k", "ts", "tie", "v", alpha = 0.5, lookback = 8)
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    assert(ew(3L) > 25.0, "the mean-based smoother follows the spike")
  }

  test("populationStability: 0 for identical cohorts, large for disjoint ones") {
    val same = ((1 to 50).map(i => ("a", i % 10 * 1.0)) ++
      (1 to 50).map(i => ("b", i % 10 * 1.0))).toDF("c", "v")
    val psiSame = operators.StatsOps
      .populationStability(same, "c", "a", "b", "v", bins = 10)
      .collect()(0).getDouble(2)
    assert(math.abs(psiSame) < 1e-12, "identical cohorts must score ~0")
    val shifted = ((1 to 50).map(_ => ("a", 1.0)) ++
      (1 to 50).map(_ => ("b", 9.0))).toDF("c", "v")
    val psiShift = operators.StatsOps
      .populationStability(shifted, "c", "a", "b", "v", bins = 10)
      .collect()(0).getDouble(2)
    assert(psiShift > 1.0, s"disjoint cohorts must score high, got $psiShift")
    // degenerate combined range: everything in bin 0; with EQUAL cohort
    // sizes the smoothed ps coincide bin-for-bin -> PSI exactly 0
    // (unequal sizes legitimately score > 0 under add-one smoothing)
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0))
      .toDF("c", "v")
    assert(operators.StatsOps
      .populationStability(const, "c", "a", "b", "v", bins = 10)
      .collect()(0).getDouble(2) === 0.0)
  }

  test("ksDrift equals the closed-form sup-distance on a known pair") {
    // a = {1,1,2,2}, b = {2,2,3,3}: ECDFs at grid {1,2,3} are
    // a: .5, 1, 1 and b: 0, .5, 1 -> KS = 0.5
    val df = Seq(("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 2.0),
      ("b", 2.0), ("b", 2.0), ("b", 3.0), ("b", 3.0)).toDF("c", "v")
    val r = operators.StatsOps.ksDrift(df, "c", "a", "b", "v").collect()(0)
    assert(r.getLong(0) === 4L && r.getLong(1) === 4L)
    assert(r.getDouble(2) === 0.5)
    // identical cohorts -> 0
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("c", "v")
    assert(operators.StatsOps.ksDrift(same, "c", "a", "b", "v")
      .collect()(0).getDouble(2) === 0.0)
  }

  test("JaroWinkler matches the published reference values") {
    // classic test vectors (same ones verified against DuckDB's
    // jaro_winkler_similarity)
    val cases = Seq(
      ("martha", "marhta", 0.9611111111),
      ("dixon", "dicksonx", 0.8133333333),
      ("jellyfish", "smellyfish", 0.8962962963),
      ("crate", "trace", 0.7333333333), // jaro > .7 but prefix 0
      ("ax", "ay", 0.6666666667), // jaro <= .7: NO winkler bonus
      ("abc", "xyz", 0.0),
      ("", "", 0.0)) // DuckDB convention: empty -> 0
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .withColumn("jw", functions.JaroWinkler(col("a"), col("b")))
    val got = df.collect().map(r => (r.getString(0), r.getString(1)) ->
      r.getDouble(2)).toMap
    for ((a, b, want) <- cases)
      assert(approx(got((a, b)), want, 1e-9), s"jw($a, $b)")
  }

  test("chi2Drift matches the hand-computed 2x2 statistic") {
    // cohort a: 10x cat x, 10x cat y; cohort b: 20x cat x, 0x cat y
    // cell x: exp_a = 30*20/40 = 15 -> (10-15)^2/15 + (20-15)^2/15 = 10/3
    // cell y: exp_a = 10*20/40 = 5  -> 25/5 + 25/5 = 10
    val df = ((1 to 10).map(_ => ("a", "x")) ++
      (1 to 10).map(_ => ("a", "y")) ++
      (1 to 20).map(_ => ("b", "x"))).toDF("c", "cat")
    val r = operators.StatsOps.chi2Drift(df, "c", "a", "b", "cat")
      .collect()(0)
    assert(r.getLong(0) === 20L && r.getLong(1) === 20L)
    assert(r.getLong(2) === 1L, "dof = categories - 1")
    assert(approx(r.getDouble(3), 10.0 / 3 + 10.0, 1e-12))
    // identical cohorts -> observed == expected in every cell -> 0
    val same = ((1 to 10).map(i => ("a", (i % 3).toString)) ++
      (1 to 10).map(i => ("b", (i % 3).toString))).toDF("c", "cat")
    assert(operators.StatsOps.chi2Drift(same, "c", "a", "b", "cat")
      .collect()(0).getDouble(3) === 0.0)
  }

  test("jsDivergence: 0 for identical mixes, near ln 2 when disjoint") {
    val same = ((1 to 10).map(i => ("a", (i % 2).toString)) ++
      (1 to 10).map(i => ("b", (i % 2).toString))).toDF("c", "cat")
    assert(operators.StatsOps.jsDivergence(same, "c", "a", "b", "cat")
      .collect()(0).getDouble(2) === 0.0, "p == q term-for-term -> 0")
    // disjoint supports: cat x only in a (10), cat y only in b (10)
    // K = 2; p_x = 11/12, q_x = 1/12 (and mirrored for y)
    val disj = ((1 to 10).map(_ => ("a", "x")) ++
      (1 to 10).map(_ => ("b", "y"))).toDF("c", "cat")
    val jsd = operators.StatsOps.jsDivergence(disj, "c", "a", "b", "cat")
      .collect()(0).getDouble(2)
    val p = 11.0 / 12; val q = 1.0 / 12; val m = (p + q) / 2
    val want = p * math.log(p / m) + q * math.log(q / m)
    assert(approx(jsd, want, 1e-12))
    assert(jsd > 0 && jsd < math.log(2.0), "JSD bounded by ln 2")
  }

  test("mutualInformation: 0 when factorized, H(X) when deterministic") {
    // exactly factorized joint: every cell count = nx*ny/N -> MI = 0
    val indep = (for { x <- Seq("a", "b"); y <- Seq("c", "d");
      _ <- 1 to 25 } yield (x, y)).toDF("x", "y")
    val ri = operators.StatsOps.mutualInformation(indep, "x", "y")
      .collect()(0)
    assert(ri.getLong(0) === 100L)
    assert(ri.getDouble(4) === 0.0, "ln(1) terms only")
    assert(approx(ri.getDouble(3), ri.getDouble(1) + ri.getDouble(2),
      1e-12), "independence: H(X,Y) = H(X) + H(Y)")
    // y = f(x): MI = H(X) = ln 2, and H(X,Y) = H(X)
    val dep = ((1 to 50).map(_ => ("a", "c")) ++
      (1 to 50).map(_ => ("b", "d"))).toDF("x", "y")
    val rd = operators.StatsOps.mutualInformation(dep, "x", "y")
      .collect()(0)
    assert(approx(rd.getDouble(4), math.log(2.0), 1e-12))
    assert(approx(rd.getDouble(3), rd.getDouble(1), 1e-12))
  }

  test("mannWhitney matches the hand-computed tied and tie-free cases") {
    // a = {1,2}, b = {2,3}: midranks 1, 2.5, 2.5, 4 -> R_a = 3.5,
    // U_a = 0.5, mu = 2, ties = 2^3-2 = 6,
    // sig2 = (4/12)*((4+1) - 6/(4*3)) = 1.5
    val tied = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("c", "v")
    val r = operators.StatsOps.mannWhitney(tied, "c", "a", "b", "v")
      .collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 0.5, "U_a from doubled midranks")
    assert(approx(r.getDouble(3), -1.5 / math.sqrt(1.5), 1e-12))
    // identical cohorts -> U_a = mu -> z = 0 exactly
    val same = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0)).toDF("c", "v")
    val rs = operators.StatsOps.mannWhitney(same, "c", "a", "b", "v")
      .collect()(0)
    assert(rs.getDouble(2) === 4.5 && rs.getDouble(3) === 0.0)
    // degenerate: every value tied -> sig2 = 0 -> z defined as 0
    val const = Seq(("a", 5.0), ("b", 5.0), ("b", 5.0)).toDF("c", "v")
    assert(operators.StatsOps.mannWhitney(const, "c", "a", "b", "v")
      .collect()(0).getDouble(3) === 0.0)
  }

  test("hillTailIndex: hand case on exact exponentials") {
    // values e^1..e^4, k=2: survivors e^4,e^3,e^2; lref = 2;
    // H = ((4+3+2) - 3*2)/2 = 1.5, alpha = 1/1.5
    val df = Seq(math.exp(1), math.exp(2), math.exp(3), math.exp(4))
      .toDF("v")
    val r = operators.StatsOps.hillTailIndex(df, "v", k = 2).head()
    assert(r.getAs[Long]("k") === 2L)
    assert(approx(r.getAs[Double]("ln_xref"), 2.0, 1e-6))
    assert(approx(r.getAs[Double]("hill_h"), 1.5, 1e-6))
    assert(approx(r.getAs[Double]("alpha"), 1.0 / 1.5, 1e-6))
    // non-positive values are excluded, not ln'd
    val withZero = Seq(0.0, -1.0, math.exp(1), math.exp(2), math.exp(3),
      math.exp(4)).toDF("v")
    assert(approx(operators.StatsOps.hillTailIndex(withZero, "v", k = 2)
      .head().getAs[Double]("hill_h"), 1.5, 1e-6))
  }

  test("fkOrphans: hand census incl. nulls, orphans, multi-relation") {
    val child = Seq(Some(1L), Some(2L), Some(2L), Some(3L), None)
      .toDF("k")
    val parent = Seq(1L, 2L).toDF("p")
    val out = operators.ValidateOps.fkOrphans(Seq(
        ("r1", child, "k", parent, "p"),
        ("r2", parent.withColumnRenamed("p", "k"), "k", child, "k")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // r1: 5 rows, 1 null, key 3 orphan (1 row, 1 key)
    assert(out("r1") === ((5L, 1L, 1L, 1L)))
    // r2: parents as child of child-keys {1,2,3}: no orphans
    assert(out("r2") === ((2L, 0L, 0L, 0L)))
  }

  test("cliffsDelta: hand pair census, dominance extremes, tie zero") {
    // a = {1,2}, b = {2,3}: pairs (1,2)< (1,3)< (2,2)= (2,3)< ->
    // greater 0, less 3, ties 1, delta = -3/4
    val tied = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("c", "v")
    val r = operators.StatsOps.cliffsDelta(tied, "c", "a", "b", "v")
      .head()
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((0L, 3L, 1L)))
    assert(r.getDouble(5) === -0.75)
    // total dominance both ways
    val dom = Seq(("a", 9.0), ("a", 8.0), ("b", 1.0)).toDF("c", "v")
    assert(operators.StatsOps.cliffsDelta(dom, "c", "a", "b", "v")
      .head().getDouble(5) === 1.0)
    assert(operators.StatsOps.cliffsDelta(dom, "c", "b", "a", "v")
      .head().getDouble(5) === -1.0)
    // identical cohorts -> delta 0
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("c", "v")
    assert(operators.StatsOps.cliffsDelta(same, "c", "a", "b", "v")
      .head().getDouble(5) === 0.0)
  }

  test("autocorrelation matches hand-computed ACF, nulls degenerate cases") {
    // k1 = [1,2,3,4]: mean 2.5, den 5; r1 = 1.25/5, r2 = -1.5/5,
    // r3 = -2.25/5. k2 constant -> den 0 -> null. k3 = [7,9] -> lag 2,3
    // have no pairs -> null.
    val rows = (Seq(1L, 2L, 3L, 4L).zipWithIndex.map { case (v, i) =>
        ("k1", i.toLong, i.toLong, v) } ++
      Seq(("k2", 0L, 0L, 5L), ("k2", 1L, 1L, 5L), ("k2", 2L, 2L, 5L)) ++
      Seq(("k3", 0L, 0L, 7L), ("k3", 1L, 1L, 9L)))
      .toDF("k", "ts", "tie", "v")
    val out = operators.StatsOps
      .autocorrelation(rows, Seq("k"), "ts", "tie", "v", maxLag = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out.size === 9, "3 keys x 3 lags")
    assert(out(("k1", 1)) === Some(0.25))
    assert(out(("k1", 2)) === Some(-0.3))
    assert(out(("k1", 3)) === Some(-0.45))
    assert(out(("k2", 1)) === None, "constant series: zero variance")
    // k3: mean 8, devs [-1, 1], den 2, lag-1 cross = -1 -> r = -0.5
    assert(out(("k3", 1)) === Some(-0.5))
    assert(out(("k3", 2)) === None && out(("k3", 3)) === None,
      "no pairs past the series length")
  }

  test("cusumChange: max-reset recursion via prefix-sum minus running min") {
    // k1 shifts UP: [10,10,20,20,20], refUp 12 -> S+ = [0,0,8,16,24],
    // first crossing of 15 at ts 3; S- never leaves 0.
    // k2 shifts DOWN: [10,0,0,0], refDown 8 -> S- = [0,8,16,24],
    // alarm at ts 2; S+ never leaves 0.
    val rows = (Seq(10L, 10L, 20L, 20L, 20L).zipWithIndex.map {
        case (v, i) => ("k1", i.toLong, i.toLong, v) } ++
      Seq(10L, 0L, 0L, 0L).zipWithIndex.map {
        case (v, i) => ("k2", i.toLong, i.toLong, v) })
      .toDF("k", "ts", "tie", "v")
    val out = operators.SequenceOps.cusumChange(rows, Seq("k"), "ts",
        "tie", "v", refUp = 12L, refDown = 8L, threshold = 15L)
      .collect().map(r => r.getString(0) -> r).toMap
    val k1 = out("k1")
    assert(k1.getLong(2) === 24L && k1.getLong(3) === 0L)
    assert(k1.getLong(4) === 3L, "first S+ > 15 at ts 3")
    assert(k1.isNullAt(5), "no downward alarm")
    val k2 = out("k2")
    assert(k2.getLong(2) === 0L && k2.getLong(3) === 24L)
    assert(k2.isNullAt(4) && k2.getLong(5) === 2L)
  }

  test("concentration: Gini 0 for equal shares, (n-1)/n for one-holder, HHI exact") {
    val df = Seq(
      ("eq", 1L, 5L), ("eq", 2L, 5L), ("eq", 3L, 5L),
      ("one", 1L, 0L), ("one", 2L, 0L), ("one", 3L, 10L),
      ("zero", 1L, 0L), ("zero", 2L, 0L)).toDF("g", "id", "v")
    val out = operators.StatsOps.concentration(df, Seq("g"), "v", "id")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("eq").getDouble(3) === 0.0)
    assert(approx(out("eq").getDouble(4), 1.0 / 3, 1e-15))
    assert(approx(out("one").getDouble(3), 2.0 / 3, 1e-15),
      "single holder of everything: G = (n-1)/n")
    assert(out("one").getDouble(4) === 1.0)
    assert(out("zero").isNullAt(3) && out("zero").isNullAt(4),
      "all-zero group: indices undefined, not a throw")
  }

  test("bottomKSample picks the k smallest key hashes, deterministically") {
    val df = (1L to 10L).map(i => ("g", i)).toDF("g", "id")
    val got = operators.SampleOps.bottomKSample(df, Seq("g"), "id", k = 3)
      .orderBy("sample_rank").collect()
      .map(r => (r.getLong(1), r.getInt(2)))
    val m = operators.TextOps.HashMod
    val want = (1L to 10L)
      .sortBy(i => (i % m * operators.SketchOps.KmvMult % m, i)).take(3)
    assert(got.map(_._1).toSeq === want)
    assert(got.map(_._2).toSeq === Seq(1, 2, 3))
    // rerun = same sample (no rand anywhere)
    val again = operators.SampleOps.bottomKSample(df, Seq("g"), "id", 3)
      .orderBy("sample_rank").collect().map(_.getLong(1))
    assert(again.toSeq === want)
  }

  test("benfordCheck: string-derived leading digits and closed-form chi2") {
    val df = Seq(("g", 123L), ("g", 19L), ("g", 250L), ("g", 999L),
      ("g", 0L), ("g", -5L)).toDF("k", "v") // 0 and negatives excluded
    val r = operators.StatsOps.benfordCheck(df, Seq("k"), "v").collect()(0)
    val obs = (1 to 9).map(i => r.getLong(i)) // o1..o9 after key col
    assert(obs === Seq(2L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 1L))
    assert(r.getLong(10) === 4L)
    val want = (1 to 9).map { i =>
      val p = math.log10(1.0 + 1.0 / i); val e = 4.0 * p
      val o = obs(i - 1).toDouble
      (o - e) * (o - e) / e
    }.sum
    assert(approx(r.getDouble(11), want, 1e-12))
  }

  test("mergeAggStates over any batching equals aggState over the whole") {
    val rows = (1 to 40).map(i =>
      (if (i % 3 == 0) "a" else "b", i.toLong, (i * 7 % 13).toLong))
      .toDF("k", "id", "v")
    val whole = operators.StatsOps.aggState(rows, Seq("k"), "v")
      .collect().map(_.toSeq).toSet
    // two-way split on id parity
    val m2 = operators.StatsOps.mergeAggStates(
      operators.StatsOps.aggState(rows.where($"id" % 2 === 0), Seq("k"), "v"),
      operators.StatsOps.aggState(rows.where($"id" % 2 === 1), Seq("k"), "v"),
      Seq("k")).collect().map(_.toSeq).toSet
    assert(m2 === whole)
    // sequential three-way fold, including a part with only one key
    val p1 = operators.StatsOps.aggState(rows.where($"id" <= 3), Seq("k"), "v")
    val p2 = operators.StatsOps.aggState(
      rows.where($"id" > 3 && $"k" === "a"), Seq("k"), "v")
    val p3 = operators.StatsOps.aggState(
      rows.where($"id" > 3 && $"k" === "b"), Seq("k"), "v")
    val m3 = operators.StatsOps.mergeAggStates(
      operators.StatsOps.mergeAggStates(p1, p2, Seq("k")), p3, Seq("k"))
      .collect().map(_.toSeq).toSet
    assert(m3 === whole)
  }

  test("termShift ranks terms by absolute smoothed log-frequency-ratio") {
    // cohort a: "x x z" (n_a=3), cohort b: "y z" (n_b=2), V=3
    // shift(x)=ln((3/6)/(1/5)), shift(y)=ln((1/6)/(2/5)), shift(z)=ln((2/6)/(2/5))
    val docs = Seq(("a", "x x z"), ("b", "y z")).toDF("c", "text")
    val out = operators.TextOps.termShift(docs, "c", "a", "b", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.map(_._1).toSeq === Seq("x", "y"),
      "|shift| order: x (rose) before y (fell), z below the cut")
    assert(out(0)._2 === 2L && out(0)._3 === 0L)
    assert(approx(out(0)._4, math.log((3.0 / 6) / (1.0 / 5)), 1e-12))
    assert(approx(out(1)._4, math.log((1.0 / 6) / (2.0 / 5)), 1e-12))
  }

  test("embeddingDrift: cosine 1 / L2 0 for equal centroids, 0 for orthogonal") {
    val same = Seq((0, Seq(1.0f, 1.0f)), (0, Seq(3.0f, 1.0f)),
      (1, Seq(1.0f, 1.0f)), (1, Seq(3.0f, 1.0f))).toDF("label", "emb")
    val rs = operators.SimilarityOps
      .embeddingDrift(same, "label", 0, 1, "emb").collect()(0)
    assert(rs.getLong(0) === 2L && rs.getLong(1) === 2L)
    assert(approx(rs.getDouble(2), 1.0, 1e-12) && rs.getDouble(3) === 0.0)
    val orth = Seq((0, Seq(1.0f, 0.0f)), (0, Seq(1.0f, 0.0f)),
      (1, Seq(0.0f, 2.0f)), (1, Seq(0.0f, 2.0f))).toDF("label", "emb")
    val ro = operators.SimilarityOps
      .embeddingDrift(orth, "label", 0, 1, "emb").collect()(0)
    assert(ro.getDouble(2) === 0.0, "orthogonal centroids")
    assert(approx(ro.getDouble(3), math.sqrt(5.0), 1e-9))
    // empty cohort: null metrics, no throw
    val one = Seq((0, Seq(1.0f, 0.0f))).toDF("label", "emb")
    val r1 = operators.SimilarityOps
      .embeddingDrift(one, "label", 0, 1, "emb").collect()(0)
    assert(r1.isNullAt(2) && r1.isNullAt(3))
  }

  test("weightedSample reproduces the Efraimidis-Spirakis hash scores") {
    val df = (1L to 20L).map(i => ("g", i, i * 10L)).toDF("g", "id", "w")
    val got = operators.SampleOps
      .weightedSample(df, Seq("g"), "id", "w", k = 4)
      .orderBy("sample_rank").collect()
      .map(r => (r.getLong(1), r.getInt(3), r.getDouble(4)))
    val m = operators.TextOps.HashMod
    def score(id: Long) = {
      val b = id % m * operators.SketchOps.KmvMult % m %
        operators.SampleOps.SplitBuckets
      math.log((b + 0.5) / operators.SampleOps.SplitBuckets) / (id * 10.0)
    }
    val want = (1L to 20L).sortBy(i => (-score(i), i)).take(4)
    assert(got.map(_._1).toSeq === want)
    assert(got.map(_._2).toSeq === Seq(1, 2, 3, 4))
    for ((id, _, s) <- got) assert(approx(s, score(id), 1e-12))
    // zero/negative weights are excluded, not a throw
    val zw = Seq(("g", 1L, 0L), ("g", 2L, 5L)).toDF("g", "id", "w")
    assert(operators.SampleOps.weightedSample(zw, Seq("g"), "id", "w", 4)
      .collect().map(_.getLong(1)).toSeq === Seq(2L))
  }

  test("null measures are excluded, not silently miscounted") {
    // concentration: a null row must not occupy rank 1 / inflate n
    val g = Seq(("g", 1L, Some(10L)), ("g", 2L, None)).toDF("k", "id", "v")
    val rc = operators.StatsOps.concentration(g, Seq("k"), "v", "id")
      .collect()(0)
    assert(rc.getLong(1) === 1L && rc.getDouble(3) === 0.0,
      "single holder of the only value: n=1, gini 0")
    // aggState: n must equal the rows the sums actually saw
    val ra = operators.StatsOps.aggState(g, Seq("k"), "v").collect()(0)
    assert(ra.getLong(1) === 1L && ra.getLong(2) === 10L)
    // and the streaming twin folds the same frame without crashing
    val rs = graft.streaming.StreamingOps.aggStateStream(spark,
      g, "k", "v").collect()(0)
    assert(rs.getLong(1) === 1L && rs.getLong(2) === 10L)
    // autocorrelation: a null row must not shift window positions
    val s3 = Seq(("k", 0L, 0L, Some(1L)), ("k", 1L, 1L, None),
      ("k", 2L, 2L, Some(3L))).toDF("k", "ts", "tie", "v")
    val acf = operators.StatsOps
      .autocorrelation(s3, Seq("k"), "ts", "tie", "v", maxLag = 1)
      .collect()(0)
    assert(acf.getLong(2) === 2L, "n counts only non-null values")
    // two points {1,3}: mean 2, lag-1 cross = (1-2)(3-2) = -1, den 2
    assert(acf.getDouble(4) === -0.5)
  }

  test("expectations: null predicates count as violations; unique flags null dupes") {
    val df = Seq((Some(5L), "a"), (None, "a"), (Some(-1L), "b"))
      .toDF("v", "k")
    val out = operators.ValidateOps.expectations(df, Seq(
        "v_not_null" -> $"v".isNotNull,
        // v >= 0 is NULL for the null row — three-valued logic must
        // still count it as a violation
        "v_nonneg_strict" -> ($"v" >= 0)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("v_not_null") === ((3L, 1L, false)))
    assert(out("v_nonneg_strict") === ((3L, 2L, false)),
      "null predicate = violation, not a silent pass")
    // uniqueness: duplicate non-null AND duplicate null keys flagged
    val dup = Seq(Some(1L), Some(1L), None, None, Some(2L))
      .toDF("id")
    val u = operators.ValidateOps.expectUnique(dup, Seq("id"), "id_unique")
      .collect()(0)
    assert(u.getLong(1) === 5L && u.getLong(2) === 2L &&
      !u.getBoolean(3))
    // report schemas compose
    val both = operators.ValidateOps.expectations(df,
        Seq("any" -> $"v".isNotNull))
      .unionByName(operators.ValidateOps.expectUnique(df, Seq("k"), "k_u"))
    assert(both.count() === 2L)
    // quarantine: per-row violated-rule tags in declaration order
    val tagged = operators.ValidateOps.quarantine(df, Seq(
        "not_null" -> $"v".isNotNull, "nonneg" -> ($"v" >= 0)))
      .collect().map(r => (r.get(0), r.getString(2))).toMap
    assert(tagged(5L) === "")
    assert(tagged(null) === "not_null,nonneg",
      "null fails BOTH rules under three-valued logic")
    assert(tagged(-1L) === "nonneg")
  }

  test("weightedQuantile: inf over cumulative weight, weight dominates count") {
    // weights: v=1 w=1, v=2 w=1, v=10 w=8 -> W=10, cum 1,2,10
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 10L, 8L),
      ("g", 3L, 0L)).toDF("k", "v", "w") // zero weight excluded
    val r = operators.StatsOps.weightedQuantile(df, Seq("k"), "v", "w",
      ps = Seq(0.1, 0.2, 0.5)).collect()(0)
    assert(r.getLong(1) === 10L, "total weight excludes w=0")
    assert(r.getLong(2) === 1L, "p=.1: cum 1 >= 1")
    assert(r.getLong(3) === 2L, "p=.2: first v with cum >= 2")
    assert(r.getLong(4) === 10L,
      "p=.5: the heavy value holds the weighted median (count median is 2)")
  }

  test("skewReport ranks keys by load with deterministic tie-break") {
    val df = ((1 to 5).map(_ => "k1") ++ (1 to 3).map(_ => "k2") ++
      (1 to 3).map(_ => "k3") ++ Seq("k4")).toDF("k")
    val rows = operators.StatsOps.skewReport(df, "k", topK = 3).collect()
      .sortBy(r => (-r.getLong(1), r.getString(0)))
    assert(rows.map(_.getString(0)).toSeq === Seq("k1", "k2", "k3"),
      "count desc then key asc")
    val r1 = rows(0)
    assert(r1.getLong(1) === 5L && r1.getLong(2) === 4L &&
      r1.getLong(3) === 12L)
    assert(approx(r1.getDouble(4), 5.0 / 12, 1e-15))
    assert(approx(r1.getDouble(5), 5.0 * 4 / 12, 1e-15),
      "skew_ratio = key load in units of the mean key")
  }

  test("twoProportionZ: hand case, off-arm rows dropped, degenerate null") {
    // arm a: 8 of 10 convert; arm b: 2 of 10; arm c must be ignored
    val rows = (1 to 10).map(i => ("a", if (i <= 8) 1L else 0L)) ++
      (1 to 10).map(i => ("b", if (i <= 2) 1L else 0L)) ++
      Seq(("c", 1L))
    val r = operators.StatsOps
      .twoProportionZ(rows.toDF("arm", "conv"), "arm", "a", "b", "conv")
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((10L, 8L, 10L, 2L)))
    assert(r.getDouble(4) === 0.8 && r.getDouble(5) === 0.2)
    // pooled p = 0.5, se = sqrt(.25 * .2) ~ .2236, z = .6/se ~ 2.683
    assert(approx(r.getDouble(7),
      0.6 / math.sqrt(0.5 * 0.5 * 0.2), 1e-12))
    // everyone converts -> pooled 1 -> se 0 -> null z, not Inf/throw
    val degen = Seq(("a", 1L), ("b", 1L)).toDF("arm", "conv")
    val dz = operators.StatsOps
      .twoProportionZ(degen, "arm", "a", "b", "conv").collect()(0)
    assert(dz.isNullAt(7) && dz.getDouble(6) === 0.0)
  }

  test("bootstrapCi: constant data collapses the CI, draws are order-free") {
    // every replicate resamples a constant -> every replicate mean IS
    // the constant -> the interval collapses to a point exactly
    val const = (1 to 500).map(i => ("g", i.toLong, 42L))
      .toDF("k", "id", "v")
    val r = operators.StatsOps.bootstrapCi(const, Seq("k"), "v", "id")
      .collect()(0)
    assert(r.getDouble(2) === 42.0 &&
      r.getDouble(3) === 42.0 && r.getDouble(4) === 42.0)
    // non-constant data: a proper bracket around the mean, and the
    // whole readout is invariant to partitioning (hash draws, no rand)
    val varied = (1 to 500).map(i => ("g", i.toLong, (i % 100).toLong))
      .toDF("k", "id", "v")
    val a = operators.StatsOps.bootstrapCi(varied, Seq("k"), "v", "id")
      .collect()(0)
    val b = operators.StatsOps.bootstrapCi(
      varied.repartition(13).orderBy(col("v").desc), Seq("k"), "v", "id")
      .collect()(0)
    assert(a.toSeq === b.toSeq, "hash draws must be partition-invariant")
    assert(a.getDouble(3) < a.getDouble(2) && a.getDouble(2) < a.getDouble(4),
      s"CI [${a.getDouble(3)}, ${a.getDouble(4)}] should bracket mean " +
        s"${a.getDouble(2)}")
    intercept[IllegalArgumentException] {
      operators.StatsOps.bootstrapCi(varied, Seq("k"), "v", "id", reps = 2)
    }
  }

  test("imputeMedian: nulls filled with the group median, empty groups stay null") {
    val df = Seq(
      ("a", 1L, Some(10L)), ("a", 2L, Some(30L)), ("a", 3L, Some(20L)),
      ("a", 4L, None), // fill with a's lower median (20)
      ("b", 5L, None)) // no survivor in b -> stays null, not imputed
      .toDF("k", "id", "v")
    val out = operators.StatsOps.imputeMedian(df, Seq("k"), "v", Seq("id"))
      .collect().map(r => r.getLong(1) ->
        ((if (r.isNullAt(3)) None else Some(r.getLong(3))),
          r.getBoolean(4))).toMap
    assert(out(1L) === ((Some(10L), false)))
    assert(out(4L) === ((Some(20L), true)), "null filled with type-1 median")
    assert(out(5L) === ((None, false)), "no fill source leaves the gap")
  }

  test("kAnonymity: group sizes vs k, null QI values form a cohort") {
    // cohorts: (x,1)x3, (x,2)x1, (y,null)x2 with k=3 ->
    // min_k 1, at-risk groups 2 (sizes 1 and 2), rows 3 of 6
    val df = Seq(("x", Some(1)), ("x", Some(1)), ("x", Some(1)),
      ("x", Some(2)), ("y", None), ("y", None)).toDF("qa", "qb")
    val r = operators.ValidateOps.kAnonymity(df, Seq("qa", "qb"), 3L)
      .collect()(0)
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L &&
      r.getLong(2) === 6L)
    assert(r.getLong(3) === 1L, "min_k")
    assert(r.getLong(4) === 2L && r.getLong(5) === 3L)
    assert(r.getDouble(6) === 0.5)
    intercept[IllegalArgumentException] {
      operators.ValidateOps.kAnonymity(df, Seq("qa"), 1L)
    }
  }

  test("laplaceNoisedCount: deterministic draw scales as 1/epsilon; " +
      "a secret salt changes it") {
    val df = (0L until 100L).map(k => (k % 7, k)).toDF("g", "id")
    def run(eps: Double, salt: Long = 0L) = operators.ValidateOps
      .laplaceNoisedCount(df.select(col("g")), "g", eps, salt)
      .orderBy("g").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    val e1 = run(1.0)
    // exact counts survive underneath; noised_n = n + noise by definition
    assert(e1.map(_._2).sum === 100L)
    e1.foreach { case (_, n, noise, dp) =>
      assert(approx(dp, n + noise, 1e-12)) }
    // same seed -> identical noise (no rand() anywhere)
    assert(run(1.0).toSeq === e1.toSeq)
    // Laplace scale is 1/eps: doubling eps exactly halves every draw
    val e2 = run(2.0)
    e1.zip(e2).foreach { case ((_, _, n1, _), (_, _, n2, _)) =>
      assert(approx(n2, n1 / 2.0, 1e-12), s"$n1 vs $n2") }
    // noise is nonzero and finite for every group
    e1.foreach { case (_, _, noise, _) =>
      assert(!noise.isNaN && !noise.isInfinite && noise != 0.0) }
    // a nonzero secret salt reseeds every draw (the DP-capable path)
    val salted = run(1.0, salt = 987654321L)
    assert(salted.map(_._3).toSeq != e1.map(_._3).toSeq)
    salted.foreach { case (_, n, noise, dp) =>
      assert(approx(dp, n + noise, 1e-12)) }
  }
}
