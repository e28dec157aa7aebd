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
}
