package graft

import org.apache.spark.sql.functions.col
import graft.operators.SequenceOps

class SequenceOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("user_id", "event_type", "ts_ns")

  test("funnelSteps: earliest strictly-ordered chain, prefix depth") {
    val events = ev(
      // user 1: full chain, with an earlier purchase that must NOT count
      (1L, "purchase", 5L), (1L, "view", 10L), (1L, "click", 20L),
      (1L, "purchase", 30L), (1L, "click", 15L),
      // user 2: view then purchase but no click -> depth 1, t3 null
      (2L, "view", 10L), (2L, "purchase", 40L),
      // user 3: click before any view -> not in the funnel at all
      (3L, "click", 10L),
      // user 4: click exactly AT the view time is not strictly after
      (4L, "view", 10L), (4L, "click", 10L))
    val out = SequenceOps.funnelSteps(events, "user_id", "event_type",
        "ts_ns", Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getAs[Int]("depth")))).toMap
    assert(out(1L) === ((Some(10L), Some(15L), Some(30L), 3)))
    // purchase at 40 does NOT count for user 2: the click step is
    // missing, so the chain stops at depth 1
    assert(out(2L) === ((Some(10L), None, None, 1)))
    assert(out(4L) === ((Some(10L), None, None, 1)))
    assert(!out.contains(3L))
  }

  test("sessionPaths: gap splits sessions, order is (time, tie), counts rank") {
    val events = ev(
      // user 1, session A: view(10) -> click(12); session B after gap:
      // view(100) -> click(101)
      (1L, "view", 10L), (1L, "click", 12L),
      (1L, "view", 100L), (1L, "click", 101L),
      // user 2, one session with the same path shape
      (2L, "view", 5L), (2L, "click", 6L),
      // user 3: single event
      (3L, "error", 7L))
    val out = operators.SequenceOps.sessionPaths(
        events.withColumn("event_id", col("ts_ns")), // unique tie
        "user_id", "ts_ns", "event_id", "event_type",
        gapNs = 50L, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("view>click" -> 3L, "error" -> 1L))
  }

  test("retentionCohorts: cohort by first period, distinct actives per offset") {
    val events = Seq(
      (1L, 0L), (1L, 5L),          // user 1: cohort 0, active p0 (twice)
      (1L, 25L),                   // ... and p2
      (2L, 12L), (2L, 22L),        // user 2: cohort 1, active p1 + p2
      (3L, 21L)).toDF("user_id", "ts_ns") // user 3: cohort 2 only
    val out = operators.SequenceOps.retentionCohorts(events, "user_id",
        "ts_ns", periodNs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map((0L, 0L) -> 1L, (0L, 2L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L, (2L, 0L) -> 1L))
  }

  test("anomalyZscore: trailing window, minN gate, constant-window null, flag") {
    val events = Seq(
      (1L, 1L, 1L, 10.0), (1L, 2L, 2L, 12.0), (1L, 3L, 3L, 10.0),
      (1L, 4L, 4L, 12.0), (1L, 5L, 5L, 100.0),
      // user 2: constant history -> variance 0 -> z stays null
      (2L, 1L, 6L, 7.0), (2L, 2L, 7L, 7.0), (2L, 3L, 8L, 7.0),
      (2L, 4L, 9L, 7.0))
      .toDF("user_id", "ts_ns", "event_id", "value")
    val out = SequenceOps.anomalyZscore(events, "user_id", "ts_ns",
        "event_id", "value", scale = 1L, lookback = 3, minN = 2,
        threshold = 1.5)
      .collect().map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("n_prev"), Option(r.get(r.fieldIndex("z")))
            .map(_.asInstanceOf[Double]),
          r.getAs[Int]("is_anomaly")))).toMap
    // first row: no history; second: n=1 < minN
    assert(out(1L) === ((0L, None, 0)))
    assert(out(2L) === ((1L, None, 0)))
    // row 3 scored against [10, 12]: mean 11, var 2 -> z = -1/sqrt(2)
    val (n3, z3, f3) = out(3L)
    assert(n3 === 2L && f3 === 0)
    assert(math.abs(z3.get - (-1.0 / math.sqrt(2.0))) < 1e-12)
    // row 5 scored against [12, 10, 12]: the spike flags
    val (n5, z5, f5) = out(5L)
    val varr5 = (388.0 - 34.0 * 34.0 / 3.0) / 2.0
    val exp5 = (100.0 - 34.0 / 3.0) / math.sqrt(varr5)
    assert(n5 === 3L && f5 === 1)
    assert(math.abs(z5.get - exp5) < 1e-12)
    // constant windows never score (variance 0, not infinity)
    assert(Seq(8L, 9L).forall(id => out(id)._2.isEmpty))
  }

  test("scd2History: change rows, half-open intervals, version numbers") {
    val events = Seq(
      (1L, 1L, 1L, "A"), (1L, 2L, 2L, "A"), (1L, 3L, 3L, "B"),
      (1L, 4L, 4L, "B"), (1L, 5L, 5L, "A"),
      (2L, 7L, 6L, "X"))
      .toDF("user_id", "ts_ns", "event_id", "event_type")
    val out = SequenceOps.scd2History(events, "user_id", "ts_ns",
        "event_id", "event_type")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[String]("state"), r.getAs[Int]("version"),
        r.getAs[Long]("valid_from"),
        Option(r.get(r.fieldIndex("valid_to"))))).toSet
    assert(out === Set(
      (1L, "A", 1, 1L, Some(3L)), (1L, "B", 2, 3L, Some(5L)),
      (1L, "A", 3, 5L, None), (2L, "X", 1, 7L, None)))
  }

  test("lastTouchAttribution: strictly-preceding touch, nulls kept, ties excluded") {
    val events = Seq(
      // user 1: view(10) -> purchase(20); a later view must not count
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "purchase"),
      (1L, 30L, 3L, "view"), (1L, 40L, 4L, "purchase"),
      // user 2: purchase with NO prior view -> null attribution
      (2L, 5L, 5L, "purchase"),
      // user 3: view at the SAME ts as the purchase does not attribute
      (3L, 7L, 6L, "view"), (3L, 7L, 7L, "purchase"))
      .toDF("user_id", "ts_ns", "event_id", "event_type")
    val out = SequenceOps.lastTouchAttribution(events, "user_id", "ts_ns",
        "event_id", "event_type", "view", "purchase")
      .collect().map(r => r.getAs[Long]("event_id") ->
        ((Option(r.get(r.fieldIndex("touch_ts"))),
          Option(r.get(r.fieldIndex("latency")))))).toMap
    assert(out(2L) === ((Some(10L), Some(10L))))
    assert(out(4L) === ((Some(30L), Some(10L))))
    assert(out(5L) === ((None, None)))
    // (7,view) sorts before (7,purchase) by the tie-break but sits in
    // the same-row-exclusive frame: ROWS ... 1 PRECEDING still sees it
    assert(out(7L) === ((Some(7L), Some(0L))))
  }

  test("resampleFfill: grid spans activity, forward-fills, on-grid event visible") {
    val events = Seq(
      (1L, 12L, 1L, 5.0),   // first obs after grid point 10
      (1L, 20L, 2L, 7.0),   // exactly ON grid point 20
      (1L, 33L, 3L, 9.0),
      (2L, 5L, 4L, 1.0))
      .toDF("user_id", "ts_ns", "event_id", "value")
    val out = SequenceOps.resampleFfill(events, "user_id", "ts_ns",
        "event_id", "value", stepNs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    // user 1 grid: 10 (before first obs -> null), 20 (on-grid event
    // wins over the carried 5.0), 30 (carry 7.0)
    assert(out === Map(
      (1L, 10L) -> None, (1L, 20L) -> Some(7.0), (1L, 30L) -> Some(7.0),
      (2L, 0L) -> None))
  }

  test("behavioralEntropy: uniform mix maxes, single-type is zero") {
    val events = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"),   // uniform over 4
      (2L, "a"), (2L, "a"), (2L, "a"),              // constant -> 0
      (3L, "a"), (3L, "a"), (3L, "b"))              // 2/3, 1/3
      .toDF("user_id", "event_type")
    val out = SequenceOps.behavioralEntropy(events, "user_id", "event_type")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("entropy")))).toMap
    assert(out(1L)._1 === 4L)
    assert(math.abs(out(1L)._2 - math.log(4.0)) < 1e-12)
    assert(out(2L) === ((3L, 0.0)))
    val p1 = 2.0 / 3.0; val p2 = 1.0 / 3.0
    assert(math.abs(out(3L)._2 -
      (-p1 * math.log(p1) - p2 * math.log(p2))) < 1e-12)
  }

  test("eventTransitions: _start fronting, counts and exact conditional p") {
    val events = Seq(
      (1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"), (1L, 3L, 3L, "A"),
      (2L, 1L, 4L, "B"))
      .toDF("user_id", "ts_ns", "event_id", "event_type")
    val out = SequenceOps.eventTransitions(events, "user_id", "ts_ns",
        "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("p")))).toMap
    assert(out === Map(
      ("_start", "A") -> ((1L, 0.5)), ("_start", "B") -> ((1L, 0.5)),
      ("A", "B") -> ((1L, 1.0)), ("B", "A") -> ((1L, 1.0))))
  }

  test("burstiness: constant windows give Fano 0, known split gives 0.5") {
    val df = Seq(("a", 0L), ("a", 0L), ("a", 1L), ("a", 1L),
      ("a", 2L), ("a", 2L), // constant 2 per window
      ("b", 0L), ("b", 1L), ("b", 1L), ("b", 1L)) // {1, 3}
      .toDF("g", "w")
    val out = operators.SequenceOps.burstiness(df, "g", "w")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("a") === ((3L, 2.0, 0.0)))
    assert(out("b") === ((2L, 2.0, 0.5))) // var (1+9)/2 - 4 = 1; 1/2
  }

  test("changepointSplit: clean level shift found exactly") {
    // counts per window: [1,1,1,1,3,3,3,3] -> split at 4, total SSE 8
    val rows = (0L to 3L).map(("a", _)) ++
      (4L to 7L).flatMap(h => Seq.fill(3)(("a", h)))
    val r = operators.SequenceOps.changepointSplit(
      rows.toDF("g", "w"), "g", "w").head()
    assert(r.getLong(1) === 4L)
    assert(approx(r.getDouble(2), 8.0))
    assert(approx(r.getDouble(3), 1.0) && approx(r.getDouble(4), 3.0))
  }

  test("burstDetect: strong burst entered once, weak burst gated out") {
    // counts [1,1,9,9,1,1]: lambda0 = 22/6; the 9s beat gamma=2
    val strong = Seq(0L -> 1, 1L -> 1, 2L -> 9, 3L -> 9, 4L -> 1,
      5L -> 1).flatMap { case (h, c) => Seq.fill(c)(("a", h)) }
    val r = operators.SequenceOps.burstDetect(strong.toDF("g", "w"),
      "g", "w").head()
    assert(r.getAs[Long]("n_windows") === 6L)
    assert(r.getAs[Long]("n_bursts") === 1L)
    assert(r.getAs[Long]("burst_windows") === 2L)
    // counts [1,1,5,5,1,1]: the entry penalty keeps state 0 throughout
    val weak = Seq(0L -> 1, 1L -> 1, 2L -> 5, 3L -> 5, 4L -> 1,
      5L -> 1).flatMap { case (h, c) => Seq.fill(c)(("b", h)) }
    val r2 = operators.SequenceOps.burstDetect(weak.toDF("g", "w"),
      "g", "w").head()
    assert(r2.getAs[Long]("n_bursts") === 0L)
  }

  test("rmst: hand step integral over the KM curve, tau clipping") {
    val day = 86400000000000L
    // same fixture as nelsonAalen: deaths at t=0 (S->3/4), t=1
    // (S->1/2), t=2 (S->1/4); RMST(7) = 0.75 + 0.5 + 0.25*5 = 2.5
    val df = Seq((1L, 0L), (1L, 2L), (2L, 0L), (2L, 1L), (3L, 2L),
      (4L, 1L), (4L, 3L)).map { case (k, dd) => (k, dd * day) }
      .toDF("k", "ts")
    val r = operators.SequenceOps.rmst(df, "k", "ts", censorDays = 1,
      tauDays = 7).head()
    assert(r.getAs[Long]("n_death_times") === 3L)
    assert(approx(r.getAs[Double]("rmst"), 2.5))
    assert(approx(r.getAs[Double]("s_final"), 0.25))
    // tau = 1 clips: area = 0.75*1 = 0.75 (deaths past tau ignored)
    val r2 = operators.SequenceOps.rmst(df, "k", "ts", censorDays = 1,
      tauDays = 1).head()
    assert(approx(r2.getAs[Double]("rmst"), 0.75))
  }

  test("transitionEntropy: deterministic chain has zero conditional H") {
    // one user, a b a b: every prev fully determines next
    val df = Seq((1L, 0L, 0L, "a"), (1L, 1L, 1L, "b"),
      (1L, 2L, 2L, "a"), (1L, 3L, 3L, "b")).toDF("k", "ts", "tie", "t")
    val r = operators.SequenceOps.transitionEntropy(df, "k", "ts",
      "tie", "t").head()
    assert(r.getAs[Long]("n_transitions") === 4L)
    assert(r.getAs[Double]("h_cond") === 0.0)
    assert(approx(r.getAs[Double]("h_next"), math.log(2.0), 1e-12))
    assert(approx(r.getAs[Double]("info_gain"), math.log(2.0), 1e-12))
  }

  test("maxDrawdown: hand series, trough stamped at first max dd") {
    // means per window: 5, 8, 3, 6, 2 -> peak 8, mdd 8-2=6 at h=4
    val rows = Seq((0L, 5.0), (1L, 8.0), (2L, 3.0), (3L, 6.0),
      (4L, 2.0)).map { case (h, v) => ("a", h, v) }
    val r = operators.SequenceOps.maxDrawdown(rows.toDF("g", "w", "v"),
      "g", "w", "v").head()
    assert(r.getAs[Long]("n_windows") === 5L)
    assert(r.getAs[Double]("peak") === 8.0)
    assert(r.getAs[Double]("max_drawdown") === 6.0)
    assert(r.getAs[Long]("trough_at") === 4L)
    // monotone rise -> zero drawdown, trough stays at the start
    val up = Seq((0L, 1.0), (1L, 2.0), (2L, 3.0))
      .map { case (h, v) => ("b", h, v) }
    val r2 = operators.SequenceOps.maxDrawdown(up.toDF("g", "w", "v"),
      "g", "w", "v").head()
    assert(r2.getAs[Double]("max_drawdown") === 0.0)
    assert(r2.getAs[Long]("trough_at") === 0L)
  }

  test("holtLinear: hand recurrence on counts [1,3,2,5,4]") {
    // python/scala replay: init l=3 b=2, fold 2,5,4 with a=.3 b=.1
    val rows = Seq.fill(1)(0L) ++ Seq.fill(3)(1L) ++ Seq.fill(2)(2L) ++
      Seq.fill(5)(3L) ++ Seq.fill(4)(4L)
    val r = operators.SequenceOps.holtLinear(
      rows.map(("a", _)).toDF("g", "w"), "g", "w").head()
    var (l, b, s) = (3.0, 2.0, 0.0)
    for (y <- Seq(2.0, 5.0, 4.0)) {
      val f = l + b
      s += (y - f) * (y - f)
      val l2 = 0.3 * y + (1.0 - 0.3) * (l + b)
      val b2 = 0.1 * (l2 - l) + (1.0 - 0.1) * b
      l = l2; b = b2
    }
    assert(r.getAs[Long]("n_windows") === 5L)
    assert(r.getAs[Double]("level") === l)    // bit-exact
    assert(r.getAs[Double]("trend") === b)
    assert(r.getAs[Double]("sse") === s)
    assert(r.getAs[Double]("forecast") === l + b)
  }

  test("nelsonAalen: hand hazard curve with censoring") {
    val day = 86400000000000L
    // spans: k1 0->2 (t=2, dead), k2 0->1 (t=1, dead), k3 2 only
    // (t=0, dead), k4 1->3 (t=2, censored at end-1=2)
    val df = Seq((1L, 0L), (1L, 2L), (2L, 0L), (2L, 1L), (3L, 2L),
      (4L, 1L), (4L, 3L)).map { case (k, dd) => (k, dd * day) }
      .toDF("k", "ts")
    val out = operators.SequenceOps.nelsonAalen(df, "k", "ts",
      censorDays = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(0L)._1 === 1L && out(0L)._2 === 4L)
    assert(approx(out(0L)._3, 0.25) && approx(out(0L)._4, 1.0 / 16))
    assert(out(1L)._2 === 3L)
    assert(approx(out(1L)._3, 0.25 + 1.0 / 3))
    assert(out(2L)._1 === 1L && out(2L)._2 === 2L)
    assert(approx(out(2L)._3, 0.25 + 1.0 / 3 + 0.5))
    assert(approx(out(2L)._4, 1.0 / 16 + 1.0 / 9 + 0.25))
  }

  test("hurstExponent: noise is short-memory, exact under repartition") {
    // deterministic hash noise: iid-ish -> Var(m) ~ 1/m -> H near 0.5
    // (splitmix64 finalizer; a bare multiplicative stride is strongly
    // anti-persistent and drives H toward 0)
    def mix(i: Long): Long = {
      var z = i + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val rows = (0L until 512L).map { i =>
      ("s", i, i, math.floorMod(mix(i), 1000L).toDouble / 10.0)
    }
    val df = rows.toDF("g", "ts", "id", "v")
    val r = operators.SequenceOps.hurstExponent(df, "g", "ts", "id", "v")
      .head()
    assert(r.getAs[Long]("n_scales") === 6L)
    val h = r.getAs[Double]("hurst")
    assert(h > 0.2 && h < 0.8, s"hash-noise H should be near 0.5, got $h")
    // the exactness contract: identical output at any partitioning
    val r16 = operators.SequenceOps.hurstExponent(
      df.repartition(16), "g", "ts", "id", "v").head()
    assert(r16.getAs[Double]("hurst") === h)
    assert(r16.getAs[Double]("slope") === r.getAs[Double]("slope"))
  }

  test("saxEncode: PAA z-scores hit the four quartile symbols") {
    // one point per window at 0/10/20/30: mean 15, population std
    // sqrt(125) -> z = ±1.342, ±0.447 -> symbols a, b, c, d
    val df = Seq(("g", 0L, 0.0), ("g", 1L, 10.0), ("g", 2L, 20.0),
      ("g", 3L, 30.0)).toDF("g", "w", "v")
    val out = operators.SequenceOps.saxEncode(df, "g", "w", "v")
      .orderBy("w").collect()
    assert(out.map(_.getAs[String]("symbol")).toSeq ===
      Seq("a", "b", "c", "d"))
    assert(out.map(_.getAs[Double]("paa")).toSeq ===
      Seq(0.0, 10.0, 20.0, 30.0))
    val z = out.map(_.getAs[Double]("z"))
    assert(approx(z(0), -15.0 / math.sqrt(125.0), 1e-9))
    assert(approx(z(2), 5.0 / math.sqrt(125.0), 1e-9))
    // window means, not raw rows: two points in one window pool first
    val pooled = operators.SequenceOps.saxEncode(
        Seq(("g", 0L, 0.0), ("g", 0L, 20.0), ("g", 1L, 5.0),
          ("g", 1L, 15.0)).toDF("g", "w", "v"), "g", "w", "v")
      .orderBy("w").collect()
    assert(pooled.map(_.getAs[Double]("paa")).toSeq === Seq(10.0, 10.0))
    assert(pooled.map(_.getAs[String]("symbol")).toSeq === Seq("c", "c"))
  }
}
