package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over event streams — the funnel /
  * path-progression family every event-analytics engine ships next to
  * sessionization (the batch twin of StreamingOps.sessionizeStream's
  * domain).
  */
object SequenceOps {

  /** First-touch funnel: per key, the earliest strictly-ordered chain
    * through `steps` — t1 = first step-0 event, t(i) = first step-i
    * event strictly after t(i-1). `depth` counts completed steps; a
    * missing step nulls every later one (the conditional min of a null
    * comparison stays null), so depth is always a prefix length.
    *
    * Plan shape: one filtered aggregate for step 0, then per further
    * step one key-equi join + conditional-min re-aggregate — every
    * stage hash-partitioned by the key, partial-agg combined, with the
    * `event_type` filters pushed to the scan. Per-key state never
    * exceeds the chain timestamps; shuffle volume is the type-filtered
    * event counts, not the full stream. At 100 TB: identical shape,
    * AQE handles the hot-key tail (a celebrity user's events all hash
    * to one partition but only their own rows).
    */
  def funnelSteps(events: DataFrame, keyCol: String, typeCol: String,
                  timeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelSteps needs at least one step")
    var acc = events.where(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(timeCol)).as("t1"))
    var i = 2
    for (step <- steps.tail) {
      val prev = s"t${i - 1}"
      val e = events.where(col(typeCol) === step)
        .select(col(keyCol), col(timeCol).as("_t"))
      acc = acc.join(e, Seq(keyCol), "left")
        .withColumn("_tv", when(col("_t") > col(prev), col("_t")))
        .groupBy((col(keyCol) +: (1 until i).map(j => col(s"t$j"))): _*)
        .agg(min(col("_tv")).as(s"t$i"))
      i += 1
    }
    val depth = (2 to steps.size).foldLeft(lit(1)) { (d, j) =>
      d + when(col(s"t$j").isNotNull, 1).otherwise(0)
    }
    acc.withColumn("depth", depth)
  }

  /** Top session paths — the "user journey" readout next to funnels:
    * sessionize by inactivity gap (gaps-and-islands on integer
    * timestamps), concatenate each session's event types in exact
    * (time, tiebreak) order, rank the resulting path strings by
    * frequency. The ordered concat rides array_sort over collected
    * (time, tie, type) structs — deterministic total order, no
    * window-ordered collect_list — and the per-session collect is
    * bounded by session length (human-scale), never the key's full
    * history. Top-k is one TakeOrdered.
    */
  def sessionPaths(events: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, typeCol: String, gapNs: Long,
                   k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val sessioned = events
      .withColumn("_new",
        when(lag(col(tsCol), 1).over(w).isNull ||
          col(tsCol) - lag(col(tsCol), 1).over(w) > gapNs, 1L)
          .otherwise(0L))
      .withColumn("_sess", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessioned.groupBy(col(keyCol), col("_sess"))
      .agg(array_join(expr(
          s"transform(array_sort(collect_list(struct($tsCol, $tieCol, " +
            s"$typeCol))), x -> x.$typeCol)"), ">").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** Cohort retention: bucket every key by its first-activity period
    * (integer division of the long timestamp by `periodNs`), then count
    * distinct keys active at each offset from their cohort — the
    * retention-triangle table behind every cohort chart.
    *
    * Plan shape: distinct (key, period) — shuffle bounded by distinct
    * activity pairs, not events — one min-aggregate for the cohort, a
    * key-equi join back, and the final count-distinct (which Spark
    * expands to a two-phase exact aggregate). All integer arithmetic:
    * hash-exact against any engine.
    */
  def retentionCohorts(events: DataFrame, keyCol: String, timeCol: String,
                       periodNs: Long): DataFrame = {
    val periods = events
      .select(col(keyCol), expr(s"$timeCol div ${periodNs}L").as("period"))
      .distinct()
    val cohorts = periods.groupBy(col(keyCol))
      .agg(min(col("period")).as("cohort"))
    periods.join(cohorts, Seq(keyCol))
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("offset"))
      .agg(countDistinct(col(keyCol)).as("n_active"))
  }

  /** Per-key rolling z-score anomaly flags over the TRAILING `lookback`
    * events (current row excluded — the score judges each event against
    * its own past, so an outlier never dilutes its own baseline).
    *
    * Exactness across engines: the value is fixed-point-scaled to an
    * exact BIGINT (`round(value * scale)` — lossless when the data is
    * money-like at 1/scale resolution), so the windowed sum / sum-of-
    * squares / count are exact integers; mean, variance and z are then
    * ONE closed-form double expression over those integers, evaluated
    * in the same operation order by any IEEE-754 engine — the
    * |z| > threshold DECISION is therefore bit-identical, no rounding
    * tolerance needed. z is null (and the flag 0) until `minN` prior
    * events exist or when the trailing window is constant (variance
    * ≤ 0 — a z-score against zero spread is undefined, not infinite).
    *
    * Plan shape: one shuffle on the key, one per-partition sort, a
    * bounded ROWS frame (Spark keeps a sliding buffer of `lookback`
    * rows, O(1) state per row). At 100 TB: identical — window state is
    * frame-bounded, never key-history-bounded; AQE absorbs hot keys.
    */
  def anomalyZscore(events: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, valueCol: String, scale: Long = 1000L,
                    lookback: Int = 10, minN: Int = 5,
                    threshold: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-lookback, -1)
    val iv = round(col(valueCol) * scale).cast("long")
    val base = events
      .withColumn("_iv", iv)
      // pre-project the square: an expression INSIDE a window aggregate
      // forces Spark into a second WindowExec pass; with _iv2 material,
      // all three aggregates share one Window over one sort
      .withColumn("_iv2", col("_iv") * col("_iv"))
      .withColumn("_n", count(col("_iv")).over(w))
      .withColumn("_sm", sum(col("_iv")).over(w))
      .withColumn("_sq", sum(col("_iv2")).over(w))
    val nD = col("_n").cast("double")
    val smD = col("_sm").cast("double")
    val sqD = col("_sq").cast("double")
    val mean = smD / nD
    val varr = (sqD - smD * smD / nD) / (nD - lit(1.0))
    val z = when(col("_n") >= minN && varr > 0.0,
      (col("_iv").cast("double") - mean) / sqrt(varr))
    base.select(col(keyCol), col(tsCol), col(tieCol),
      col("_iv").as("value_scaled"), col("_n").as("n_prev"),
      z.as("z"),
      when(abs(z) > threshold, 1).otherwise(0).as("is_anomaly"))
  }

  /** SCD type-2 history from an event stream: collapse each key's
    * ordered (state) sequence into change rows carrying
    * [valid_from, valid_to) validity intervals — the lakehouse
    * dimension-history builder that pairs with JoinOps.mergeUpsert
    * (which handles type-1 upserts) and the asof join (which reads
    * this table back at a point in time).
    *
    * valid_to is the NEXT change's valid_from (half-open interval);
    * null marks the current row. version numbers changes 1..k per key.
    * Integers and strings only — hash-exact against any engine.
    *
    * Plan shape: one shuffle on the key, one sort serving both the
    * change-detection lag and (after the filter) the lead/row_number —
    * Spark reuses the exchange+sort across the two window stages
    * because partitioning and ordering match. State per row is O(1).
    */
  def scd2History(events: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, stateCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changes = events
      .withColumn("_prev", lag(col(stateCol), 1).over(w))
      .where(col("_prev").isNull || col("_prev") =!= col(stateCol))
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(stateCol).as("state"), col("version"),
        col("valid_from"), col("valid_to"))
  }

  /** Last-touch attribution: each conversion event paired with the
    * most recent PRECEDING touch event of the same key (marketing's
    * "which view gets credit for this purchase"), plus the
    * touch-to-conversion latency. "Preceding" is by ROW under the
    * total (time, tie) order — a touch sharing the conversion's
    * timestamp attributes (latency 0) iff the tiebreak sorts it first.
    * Conversions with no prior touch surface with null attribution —
    * the unattributed-revenue row marketers audit first.
    *
    * Plan shape: one shuffle+sort on the key; the conditional max over
    * the UNBOUNDED PRECEDING frame is O(1) running state per row
    * (Spark keeps the running max, never the frame), and the
    * conversion filter prunes the output, not the scan — both event
    * roles come from one pass over one sorted partition.
    */
  def lastTouchAttribution(events: DataFrame, keyCol: String, tsCol: String,
                           tieCol: String, typeCol: String,
                           touchType: String, convType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("_touch_ts",
        max(when(col(typeCol) === touchType, col(tsCol))).over(w))
      .where(col(typeCol) === convType)
      .select(col(keyCol), col(tsCol).as("conv_ts"), col(tieCol),
        col("_touch_ts").as("touch_ts"),
        (col(tsCol) - col("_touch_ts")).as("latency"))
  }

  /** Gap-filling resample: per key, a fixed `stepNs` time grid spanning
    * the key's own activity, each grid point carrying the LAST observed
    * value at or before it (forward fill) — the asfreq+ffill move that
    * turns an irregular event stream into a regular time series for
    * joins and models. Grid points before the key's first observation
    * stay null (nothing to carry). An observation exactly ON a grid
    * point is visible to it (events order before grid markers at equal
    * timestamps).
    *
    * Plan shape: a tiny per-key bounds aggregate explodes to the grid
    * (output size = activity span / step, never events × grid); one
    * union, ONE shuffle+sort on the key, and the forward fill is a
    * running `last(ignoreNulls)` — O(1) state per row. No as-of join,
    * no per-grid-point probe.
    */
  def resampleFfill(events: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, valueCol: String,
                    stepNs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = events.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("_t0"), max(col(tsCol)).as("_t1"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(expr(s"_t0 div ${stepNs}L"),
        expr(s"_t1 div ${stepNs}L"))).as("_g"))
      .select(col(keyCol), (col("_g") * stepNs).as("_ts"),
        lit(null).cast("long").as(tieCol),
        lit(null).cast("double").as(valueCol), lit(1).as("_is_grid"))
    val obs = events.select(col(keyCol), col(tsCol).as("_ts"),
      col(tieCol), col(valueCol).cast("double").as(valueCol),
      lit(0).as("_is_grid"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_ts"), col("_is_grid"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    obs.unionByName(grid)
      .withColumn("_v", last(col(valueCol), ignoreNulls = true).over(w))
      .where(col("_is_grid") === 1)
      .select(col(keyCol), col("_ts").as("grid_ts"),
        col("_v").as("value_ffill"))
  }

  /** Behavioral entropy: per key, the Shannon entropy (nats) of its
    * event-type distribution — the bot-vs-human diversity signal
    * (a scraper hammering one endpoint scores ~0; an organic session
    * mix scores high). p = c/n are exact int ratios; the Σ −p·ln p is
    * a FIXED-ORDER fold over the type-sorted count list, never a
    * parallel float sum — engine-exact up to the ln ulp that
    * qround absorbs.
    *
    * Scale shape: one hash aggregate to (key, type) counts —
    * map-side combined, state bounded by keys × |type domain| — then
    * a per-key collect of at most |type domain| elements. No windows,
    * no sort of the fact.
    */
  def behavioralEntropy(events: DataFrame, keyCol: String,
                        typeCol: String): DataFrame = {
    events
      .groupBy(col(keyCol), col(typeCol).as("_ty"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(keyCol))
      .agg(sum(col("_c")).as("n_events"),
        expr("array_sort(collect_list(struct(_ty, _c)))").as("_arr"))
      .select(col(keyCol), col("n_events"),
        expr(
          """aggregate(_arr, cast(0.0 as double), (acc, x) ->
            |  acc - (cast(x._c as double) / cast(n_events as double))
            |    * ln(cast(x._c as double) / cast(n_events as double)))"""
            .stripMargin).as("entropy"))
  }

  /** First-order Markov transition matrix over each key's ordered event
    * types: counts and conditional probabilities of (prev → next),
    * with the synthetic '_start' state in front of every key's first
    * event (so outgoing-from-start rows double as per-first-event
    * marketing attribution). p = n / total(prev) is one division of
    * two exact integers — bit-identical across engines, no rounding.
    *
    * Plan shape: one shuffle+sort on the key for the lag, then a hash
    * aggregate whose cardinality is |types|² + |types| — trivially
    * broadcastable downstream however large the stream; the per-prev
    * total rides a second tiny aggregate joined broadcast-style.
    */
  def eventTransitions(events: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("_prev", coalesce(lag(col(typeCol), 1).over(w),
        lit("_start")))
      .groupBy(col("_prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("prev_type"))
      .agg(sum(col("n")).as("_tot"))
    pairs.join(broadcast(totals), Seq("prev_type"))
      .select(col("prev_type"), col("next_type"), col("n"),
        (col("n").cast("double") / col("_tot").cast("double")).as("p"))
  }

  /** Restricted mean survival time — the scalar summary of the
    * [[kaplanMeier]] curve (expected days survived within the first
    * τ days; the number a retention intervention is actually graded
    * on): RMST(τ) = ∫₀^τ S(t)dt over the step function, one
    * fixed-order fold carrying (prev time, running S, area) through
    * the death-time domain with τ-clipped segment widths, plus the
    * tail segment after the last death.
    *
    * Exactness + plan: same day-bounded lifetime domain as
    * kaplanMeier (per-key aggregate, exact integer (d, n) histogram);
    * the fold multiplies/accumulates the same rational sequence in
    * the same order on both engines.
    */
  def rmst(df: DataFrame, keyCol: String, tsNsCol: String,
           censorDays: Int = 7, tauDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(censorDays >= 0 && tauDays > 0,
      s"bad censorDays/tauDays: $censorDays/$tauDays")
    val dayNs = 86400000000000L
    val perKey = df.where(col(keyCol).isNotNull && col(tsNsCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(min(expr(s"$tsNsCol div ${dayNs}L")).as("_d0"),
        max(expr(s"$tsNsCol div ${dayNs}L")).as("_d1"))
    val end = perKey.agg(max(col("_d1")).as("_end"))
    val lives = perKey.crossJoin(broadcast(end))
      .select((col("_d1") - col("_d0")).as("_t"),
        (col("_d1") <= col("_end") - censorDays).as("_dead"))
    val hist = lives.groupBy(col("_t"))
      .agg(sum(when(col("_dead"), 1L).otherwise(0L)).as("_d"),
        sum(when(col("_dead"), 0L).otherwise(1L)).as("_c"))
    val w = Window.orderBy(col("_t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.agg(sum(col("_d") + col("_c")).as("_nn"))
    val domain = hist
      .withColumn("_cum", sum(col("_d") + col("_c")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("_t"), col("_d"),
        (col("_nn") - col("_cum") + col("_d") + col("_c")).as("_n"))
      .where(col("_d") > 0)
    val tau = tauDays.toDouble.toString
    domain
      .agg(sort_array(collect_list(struct(col("_t"), col("_d"),
        col("_n")))).as("arr"))
      .select(size(col("arr")).cast("long").as("n_death_times"),
        lit(tauDays.toLong).as("tau_days"),
        expr(
          s"""aggregate(arr,
             |  named_struct('pt', cast(0.0 as double),
             |    'sv', cast(1.0 as double), 'ar', cast(0.0 as double)),
             |  (acc, x) -> named_struct(
             |    'pt', cast(x._t as double),
             |    'sv', acc.sv * (cast(1.0 as double)
             |      - cast(x._d as double) / cast(x._n as double)),
             |    'ar', acc.ar + acc.sv
             |      * (least(cast(x._t as double), cast($tau as double))
             |        - least(acc.pt, cast($tau as double)))),
             |  acc -> named_struct(
             |    's_final', acc.sv,
             |    'rmst', acc.ar + acc.sv * (cast($tau as double)
             |      - least(acc.pt, cast($tau as double)))))"""
            .stripMargin).as("_f"))
      .select(col("n_death_times"), col("tau_days"),
        col("_f.rmst").as("rmst"), col("_f.s_final").as("s_final"))
  }

  /** Sequence predictability — entropy-rate readout over the
    * [[eventTransitions]] matrix: marginal H(next), conditional
    * H(next|prev), and the information gain between them (how much
    * does knowing the previous event tell you about the next — the
    * one-number test of whether session context is worth modeling).
    * Includes the synthetic '_start' state, so the chain covers every
    * observed event exactly once.
    *
    * Exactness: all counts exact integers; entropy terms
    * (n/N)·ln(tot/n) fold in fixed (prev, next) order via
    * [[graft.operators.StatsOps.orderedFoldSum]]. Plan: one keyed
    * lag window on the fact, then |types|²-bounded arithmetic.
    */
  def transitionEntropy(events: DataFrame, keyCol: String,
                        tsCol: String, tieCol: String,
                        typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val cells = events
      .where(col(keyCol).isNotNull && col(typeCol).isNotNull)
      .withColumn("_prev", coalesce(lag(col(typeCol), 1).over(w),
        lit("_start")))
      .groupBy(col("_prev"), col(typeCol).as("_next"))
      .agg(count(lit(1)).as("_n"))
    val prevTot = cells.groupBy(col("_prev")).agg(sum(col("_n")).as("_tp"))
    val nextTot = cells.groupBy(col("_next")).agg(sum(col("_n")).as("_tn"))
    val tot = cells.agg(sum(col("_n")).as("_nn"))
    def D(c: String) = col(c).cast("double")
    val hCond = cells.join(broadcast(prevTot), Seq("_prev"))
      .crossJoin(broadcast(tot))
      .select(col("_prev"), col("_next"),
        (D("_n") / D("_nn") * log(D("_tp") / D("_n"))).as("_t"))
      .agg(StatsOps.orderedFoldSum(Seq("_prev", "_next"), "_t")
        .as("h_cond"))
    val hNext = nextTot.crossJoin(broadcast(tot))
      .select(col("_next"),
        (D("_tn") / D("_nn") * log(D("_nn") / D("_tn"))).as("_t"))
      .agg(StatsOps.orderedFoldSum(Seq("_next"), "_t").as("h_next"))
    tot.crossJoin(hNext).crossJoin(hCond)
      .select(col("_nn").as("n_transitions"), col("h_next"),
        col("h_cond"), (col("h_next") - col("h_cond")).as("info_gain"))
  }

  /** Funnel completion-latency distribution: over keys that completed
    * the whole funnel (last step time non-null), exact interpolated
    * quantiles of (t_last − t_first) in seconds plus the completion
    * count. One row out. Rides [[funnelSteps]] (per-key aggregate, so
    * the quantile input is bounded by key count, not event count) and
    * StatsOps.groupedQuantiles' rank-select machinery — at data-scale
    * key cardinality swap in SketchOps.quantileSketch, same contract.
    */
  def funnelLatency(events: DataFrame, keyCol: String, typeCol: String,
                    tsCol: String, steps: Seq[String],
                    ps: Seq[Double]): DataFrame = {
    val n = steps.size
    val funnel = funnelSteps(events, keyCol, typeCol, tsCol, steps)
    val completed = funnel.where(col(s"t$n").isNotNull)
      .select(((col(s"t$n") - col("t1")).cast("double") / lit(1e9))
        .as("_lat_s"), lit(1).as("_g"))
    val q = StatsOps.groupedQuantiles(completed, Seq("_g"), "_lat_s", ps)
    // zero completions must still yield ONE summary row (n_completed=0,
    // null quantiles) — SQL aggregates-without-GROUP-BY do, and an
    // empty result would silently drop the "nobody converted" signal
    events.sparkSession.range(1).join(broadcast(q), lit(true), "left")
      .select((coalesce(col("n_group"), lit(0L)).as("n_completed") +:
        ps.indices.map(i => col(s"q_$i"))): _*)
  }

  /** Trailing rolling median (lower-median pick) over the last
    * `lookback`+1 rows per key — the robust companion to [[ewmaSmooth]]
    * (a mean-based smoother follows spikes; the rolling median rejects
    * them, the standard robust-baseline step before anomaly scoring).
    * The pick is a DISCRETE element of the sorted frame list
    * (ceil(n/2)-th), so it is engine-exact with no float interpolation.
    *
    * Plan shape: one shuffle on the key, one sort, a bounded
    * collect_list frame, then a codegen'd array_sort + element_at per
    * row — state per row is O(lookback), the same budget as the EWMA
    * and the anomaly ring buffer.
    */
  def rollingMedian(events: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, valueCol: String,
                    lookback: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-lookback, 0)
    events
      .withColumn("_vs", collect_list(col(valueCol).cast("double")).over(w))
      .withColumn("rolling_median", expr(
        "element_at(array_sort(_vs), cast(ceil(size(_vs) / 2.0) as int))"))
      .drop("_vs")
  }

  /** Bounded-lookback exponentially-weighted moving average: per key,
    * over rows in (ts, tie) order,
    *   ewma_t = Σ_{i=0..L} α^i · x_{t−i} / Σ_{i=0..L} α^i
    * restricted to the rows that actually exist in the trailing frame
    * — the classic time-series smoother, made scale-exact two ways:
    *
    *   - the lookback is a ROWS frame (L+1 values max), so the state
    *     carried per row is bounded — a true recursive EWMA would need
    *     the key's full history and is not order-free;
    *   - with α an exact power of two (default 0.5), α^i, α^i·x and
    *     the fixed-left-to-right fold are all exact IEEE scalings in
    *     ANY engine, so the smoothed value replays bit-identically in
    *     the oracle (no rounding tolerance needed before qround).
    *
    * Plan shape: one shuffle on the key, one sort, a bounded
    * collect_list frame (frame order = window order), then a pure
    * codegen'd `aggregate` fold per row. No UDF, no second window.
    */
  def ewmaSmooth(events: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, valueCol: String, alpha: Double = 0.5,
                 lookback: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-lookback, 0)
    // frame values oldest..current; weight of slot i (1-based of n) is
    // alpha^(n - i): the CURRENT row gets alpha^0, the oldest the most
    // decay — both folds below run left-to-right over the same list
    events
      .withColumn("_vs", collect_list(col(valueCol).cast("double")).over(w))
      .withColumn("ewma", expr(
        s"""aggregate(sequence(1, size(_vs)), cast(0.0 as double),
           |  (acc, i) -> acc + power(cast($alpha as double),
           |    size(_vs) - i) * element_at(_vs, i)) /
           |aggregate(sequence(1, size(_vs)), cast(0.0 as double),
           |  (acc, i) -> acc + power(cast($alpha as double),
           |    size(_vs) - i))""".stripMargin))
      .drop("_vs")
  }

  /** Two-sided CUSUM changepoint summary per series — the sequential
    * shift detector of the monitoring family ([[rollingMedian]] smooths,
    * anomaly_zscore flags points; CUSUM flags sustained LEVEL SHIFTS,
    * the "this metric quietly moved 10% three days ago" alarm):
    *
    *   S⁺_t = max(0, S⁺_{t−1} + (x_t − refUp)),
    *   S⁻_t = max(0, S⁻_{t−1} + (refDown − x_t)),
    * alarm when either exceeds `threshold`.
    *
    * The max-reset recursion is NOT window-expressible directly, but
    * its closed form is: with prefix sums P_t = Σ_{i≤t}(x_i − refUp),
    *   S⁺_t = P_t − min(0, min_{j≤t} P_j)
    * (resetting at zero ≡ subtracting the running minimum, empty
    * prefix included) — two partitioned cumulative windows over the
    * SAME sort, no recursion, no UDF. `valueCol` and the three
    * parameters must be integral (callers fixed-point-scale, the
    * [[StatsOps.groupCorrelation]] contract), so every S is an exact
    * bigint and the whole output is hash-exact with no quantization.
    *
    * Output per key: n, max S⁺/S⁻ excursions, and the first timestamp
    * each side crossed `threshold` (null = never alarmed).
    */
  def cusumChange(df: DataFrame, keys: Seq[String], tsCol: String,
                  tieCol: String, valueCol: String, refUp: Long,
                  refDown: Long, threshold: Long): DataFrame = {
    require(threshold > 0, "cusumChange needs threshold > 0")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withS = df
      .select((keys.map(col) :+ col(tsCol) :+ col(tieCol) :+
        col(valueCol).cast("long").as("_x")): _*)
      .withColumn("_p", sum(col("_x") - lit(refUp)).over(w))
      .withColumn("_r", sum(lit(refDown) - col("_x")).over(w))
      .withColumn("_sp", col("_p") - least(lit(0L), min(col("_p")).over(w)))
      .withColumn("_sn", col("_r") - least(lit(0L), min(col("_r")).over(w)))
    withS.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      max(col("_sp")).as("max_pos"),
      max(col("_sn")).as("max_neg"),
      min(when(col("_sp") > threshold, col(tsCol))).as("first_alarm_pos"),
      min(when(col("_sn") > threshold, col(tsCol))).as("first_alarm_neg"))
  }

  /** Classical seasonal decomposition by period means — the
    * time-series triage every monitoring stack runs before an anomaly
    * hunt ("is the daily wave SEASONALITY or drift?"): per (series,
    * season-bucket) the seasonal mean and its index (season mean −
    * series mean), plus the pooled residual variance LEFT once the
    * seasonal component is removed — the "how much signal does
    * seasonality explain" number.
    *
    * Exactness: values snap to the 1e-`quantDigits` integer grid, so
    * per-season n/Σv/Σv² are exact BIGINTs off ONE fact-sized hash
    * aggregate (Σv² stays in-range while n·v̂² < 9·10¹⁸ — pick the
    * grid for the value range); the pooled within-season sum of
    * squares Σ_s(Σv² − (Σv)²/n_s) uses the textbook shortcut per
    * season (single double expression of exact integers) and Σ_s is a
    * fixed-order fold over the season-sorted list; every mean is one
    * division. Residual variance is the biased (÷n) form.
    *
    * Plan shape: one fact hash aggregate to the (series × season)
    * domain; a series-bounded re-aggregation; one broadcast join
    * back. Output is |series|·|seasons| rows.
    */
  def seasonalDecompose(df: DataFrame, groupCol: String,
                        seasonCol: String, valueCol: String,
                        quantDigits: Int = 2): DataFrame = {
    val sc = math.pow(10, quantDigits)
    val q = floor(col(valueCol) * lit(sc) + lit(0.5)).cast("long")
    val perSeason = df
      .where(col(valueCol).isNotNull && col(seasonCol).isNotNull &&
        col(groupCol).isNotNull)
      .select(col(groupCol), col(seasonCol), q.as("_v"))
      .groupBy(col(groupCol), col(seasonCol))
      .agg(count(lit(1)).as("n"), sum(col("_v")).as("_sv"),
        sum(col("_v") * col("_v")).as("_svv"))
    def D(c: String) = col(c).cast("double")
    val ssw = (D("_svv") - D("_sv") * D("_sv") / D("n")) /
      lit(sc * sc)
    val perGroup = perSeason
      .withColumn("_ssw", ssw)
      .groupBy(col(groupCol))
      .agg(sum(col("n")).as("_ng"), sum(col("_sv")).as("_svg"),
        StatsOps.orderedFoldSum(Seq(seasonCol), "_ssw").as("_ssr"))
    val seasonMean = D("_sv") / (lit(sc) * D("n"))
    val groupMean = D("_svg") / (lit(sc) * D("_ng"))
    perSeason.join(broadcast(perGroup), Seq(groupCol))
      .select(col(groupCol), col(seasonCol), col("n"),
        seasonMean.as("season_mean"),
        (seasonMean - groupMean).as("seasonal_idx"),
        (col("_ssr") / D("_ng")).as("resid_var"))
  }

  /** Burstiness (Fano factor / index of dispersion) per series — the
    * arrival-process triage next to [[hurstExponent]]: Fano =
    * Var(counts per window)/Mean(counts per window) over OBSERVED
    * time windows (1 = Poisson, >1 bursty, <1 regular). Cron-driven
    * scrapers vs organic traffic separate on this one number.
    *
    * Exactness: window counts are exact integers, so n/Σc/Σc² are
    * BIGINTs off two hash aggregates; Fano's biased-variance/mean
    * form is a closed-form double of exact integers. Plan: fact →
    * (series × window) counts → series-bounded re-aggregation.
    */
  def burstiness(df: DataFrame, groupCol: String,
                 windowCol: String): DataFrame = {
    val counts = df.where(col(groupCol).isNotNull &&
        col(windowCol).isNotNull)
      .groupBy(col(groupCol), col(windowCol))
      .agg(count(lit(1)).as("_c"))
    def D(c: String) = col(c).cast("double")
    counts.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_windows"), sum("_c").as("_sc"),
        sum(col("_c") * col("_c")).as("_scc"))
      .select(col(groupCol), col("n_windows"),
        (D("_sc") / D("n_windows")).as("mean_count"),
        ((D("_scc") / D("n_windows") -
          (D("_sc") / D("n_windows")) * (D("_sc") / D("n_windows"))) /
          (D("_sc") / D("n_windows"))).as("fano"))
  }

  /** Hurst exponent by the aggregated-variance method — the
    * long-range-dependence diagnostic for a metric stream (H ≈ 0.5 =
    * short memory; H → 1 = trends persist, so window-based anomaly
    * thresholds and traffic forecasts need wider bands): for block
    * sizes m ∈ {1, 2, 4, …}, the variance of complete-block means
    * scales as m^(2H−2); H comes from the log-log OLS slope.
    *
    * Exactness: block sums are exact BIGINTs on the quantized grid
    * and only COMPLETE blocks enter (the ragged tail would bias the
    * small-m variances); each Var(m) is a closed-form double of exact
    * integers; the OLS runs on 1e-6-quantized logs as exact bigints
    * (the zipf_fit discipline), so slope/H are the only float ops.
    *
    * Plan shape: one partitioned window pass for sequence numbers,
    * one fact×|ms| explode into block aggregates (the autocorrelation
    * lag-k cost shape), a (series × ms)-bounded re-aggregation, and a
    * series-bounded OLS. Degenerate variances (≤ 0) drop out of the
    * fit; a series needs ≥ 2 usable block sizes to report.
    */
  def hurstExponent(df: DataFrame, groupCol: String, tsCol: String,
                    tieCol: String, valueCol: String,
                    blockSizes: Seq[Int] = Seq(1, 2, 4, 8, 16, 32),
                    quantDigits: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(blockSizes.nonEmpty && blockSizes.forall(_ >= 1))
    val sc = math.pow(10, quantDigits)
    val seqW = Window.partitionBy(col(groupCol))
      .orderBy(col(tsCol), col(tieCol))
    val base = df.where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("_g"),
        floor(col(valueCol) * lit(sc) + lit(0.5)).cast("long").as("_v"),
        (row_number().over(seqW) - 1).cast("long").as("_i"))
    val ms = {
      val sp = df.sparkSession
      import sp.implicits._
      blockSizes.toDF("_m")
    }
    val blocks = base.crossJoin(broadcast(ms))
      .groupBy(col("_g"), col("_m"),
        expr("_i div _m").as("_blk"))
      .agg(count(lit(1)).as("_nr"), sum("_v").as("_sv"))
      .where(col("_nr") === col("_m")) // complete blocks only
    def D(c: org.apache.spark.sql.Column) = c.cast("double")
    val perM = blocks.groupBy("_g", "_m")
      .agg(count(lit(1)).as("_nb"), sum("_sv").as("_s1"),
        sum(col("_sv") * col("_sv")).as("_s2"))
      .where(col("_nb") >= 2)
      .select(col("_g"), col("_m"), col("_nb"),
        (D(col("_s2")) / (D(col("_nb")) * lit(sc) * lit(sc) *
          D(col("_m")) * D(col("_m"))) -
          (D(col("_s1")) / (D(col("_nb")) * lit(sc) * D(col("_m")))) *
          (D(col("_s1")) / (D(col("_nb")) * lit(sc) * D(col("_m")))))
          .as("_var"))
      .where(col("_var") > 0)
      .select(col("_g"),
        floor(log(lit(1.0) * col("_m")) * lit(1.0e6) + lit(0.5))
          .cast("long").as("_lx"),
        floor(log(col("_var")) * lit(1.0e6) + lit(0.5))
          .cast("long").as("_ly"))
    val fit = perM.groupBy("_g")
      .agg(count(lit(1)).as("n_scales"), sum("_lx").as("_sx"),
        sum("_ly").as("_sy"), sum(col("_lx") * col("_lx")).as("_sxx"),
        sum(col("_lx") * col("_ly")).as("_sxy"))
      .where(col("n_scales") >= 2)
    val n = D(col("n_scales"))
    val slope = (n * D(col("_sxy")) - D(col("_sx")) * D(col("_sy"))) /
      (n * D(col("_sxx")) - D(col("_sx")) * D(col("_sx")))
    fit.select(col("_g").as(groupCol), col("n_scales"),
      slope.as("slope"),
      (lit(1.0) + slope / lit(2.0)).as("hurst"))
  }

  /** SAX (Symbolic Aggregate approXimation, Lin/Keogh) encoding of a
    * time-bucketed series — the time-series-to-text bridge: PAA means
    * per window, z-normalized against the series, then mapped to an
    * alphabet via N(0,1) quantile breakpoints. The resulting symbol
    * strings feed every text-side tool in the library (n-gram motifs,
    * MinHash near-dup of series shapes, frequency anomalies).
    *
    * Exactness: window and series statistics are exact integer sums
    * on the `quantDigits` grid; mean, std (population) and each z are
    * the same IEEE expressions an oracle replays; symbols compare z
    * against the quartile breakpoints of N(0,1) with half-open
    * [lo, hi) cells — comparisons only, no float accumulation.
    * alphabet=4 uses breakpoints (-0.6745, 0, 0.6745).
    *
    * Plan shape: one fact hash aggregate to (series × window), a
    * series-bounded re-aggregation, one broadcast join back — the
    * [[seasonalDecompose]] shape.
    */
  def saxEncode(df: DataFrame, groupCol: String, windowCol: String,
                valueCol: String, quantDigits: Int = 2): DataFrame = {
    val sc = math.pow(10, quantDigits)
    val q = floor(col(valueCol) * lit(sc) + lit(0.5)).cast("long")
    val perWin = df
      .where(col(valueCol).isNotNull && col(windowCol).isNotNull &&
        col(groupCol).isNotNull)
      .select(col(groupCol), col(windowCol), q.as("_v"))
      .groupBy(col(groupCol), col(windowCol))
      .agg(count(lit(1)).as("n_w"), sum(col("_v")).as("_svw"),
        sum(col("_v") * col("_v")).as("_svvw"))
    val perGroup = perWin.groupBy(col(groupCol))
      .agg(sum(col("n_w")).as("_n"), sum(col("_svw")).as("_sv"),
        sum(col("_svvw")).as("_svv"))
    def D(c: String) = col(c).cast("double")
    val mean = D("_sv") / (lit(sc) * D("_n"))
    val std = sqrt((D("_svv") / (lit(sc) * lit(sc)) -
      D("_sv") * D("_sv") / (lit(sc) * lit(sc) * D("_n"))) / D("_n"))
    val paa = D("_svw") / (lit(sc) * D("n_w"))
    val bp = 0.6745 // N(0,1) quartile; alphabet 'a' < -bp <= 'b' < 0 <= 'c' < bp <= 'd'
    // zero-variance guard: a constant series has std = 0, so the raw
    // z would be NaN/±Inf and silently fall through every when-branch
    // to 'd' — emit null z/symbol instead (try_divide convention)
    perWin.join(broadcast(perGroup), Seq(groupCol))
      .withColumn("_z", when(std > lit(0.0), (paa - mean) / std))
      .select(col(groupCol), col(windowCol), col("n_w"),
        paa.as("paa"), col("_z").as("z"),
        when(col("_z").isNotNull,
          when(col("_z") < -bp, "a").when(col("_z") < 0.0, "b")
            .when(col("_z") < bp, "c").otherwise("d")).as("symbol"))
  }

  /** Seasonal-naive forecast backtest — the "beat this before you
    * ship a model" baseline eval: per series, predict each point by
    * the value `season` observations back, score MAE/RMSE on the
    * quantized grid, and report MASE = MAE(seasonal)/MAE(one-step
    * naive) — the scale-free "is the seasonal structure real" ratio
    * (< 1 means the season beats pure persistence). Both predictors
    * are evaluated on the SAME rows (those with both lags defined) so
    * the ratio compares like with like.
    *
    * Exactness: on the integer grid every |error| and error² is an
    * exact BIGINT, so MAE/RMSE are single divisions and MASE is a
    * pure integer ratio (the grid scale cancels). Plan: one
    * partitioned window pass (two lags over (ts, id) within each
    * series — callers at 100 TB supply series keys fine enough to
    * shard the sort), one hash aggregate.
    */
  def forecastBacktest(df: DataFrame, groupCol: String, tsCol: String,
                       idCol: String, valueCol: String, season: Int,
                       quantDigits: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(season >= 2, s"season must be >= 2, got $season")
    val sc = math.pow(10, quantDigits)
    val q = floor(col(valueCol) * lit(sc) + lit(0.5)).cast("long")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(tsCol), col(idCol))
    val lagged = df.where(col(valueCol).isNotNull)
      .select(col(groupCol), col(tsCol), col(idCol), q.as("_v"))
      .withColumn("_ps", lag(col("_v"), season).over(w))
      .withColumn("_pn", lag(col("_v"), 1).over(w))
      .where(col("_ps").isNotNull && col("_pn").isNotNull)
    val diffS = col("_v") - col("_ps")
    val diffN = col("_v") - col("_pn")
    val g = lagged.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(diffS)).as("_saes"), sum(diffS * diffS).as("_sses"),
        sum(abs(diffN)).as("_saen"))
    def D(c: String) = col(c).cast("double")
    g.select(col(groupCol), col("n_eval"),
      (D("_saes") / (lit(sc) * D("n_eval"))).as("mae"),
      sqrt(D("_sses") / (lit(sc * sc) * D("n_eval"))).as("rmse"),
      (D("_saen") / (lit(sc) * D("n_eval"))).as("mae_naive"),
      try_divide(D("_saes"), D("_saen")).as("mase"))
  }

  /** Kaplan-Meier survival curve of per-key lifetimes with
    * right-censoring — the retention readout beyond the cohort
    * triangle (retention_cohorts bins survivors per period; KM is the
    * estimator that stays unbiased when the observation window cuts
    * lives short): keys whose last activity falls within `censorDays`
    * of the window end are CENSORED (still alive as far as the data
    * can say), everyone else's lifetime is an observed death.
    *   S(t) = Π_{death times u ≤ t} (1 − d_u / n_u),
    * with n_u the at-risk count (observed lifetime ≥ u).
    *
    * Exactness: lifetimes are integer day counts; d/c/n are exact
    * BIGINTs off the per-key aggregate + one cumulative window over
    * the day-bounded lifetime domain; the product prefix is a
    * fixed-order left fold per output row over that bounded domain
    * (O(m²) for m distinct lifetimes — m is bounded by the
    * observation span in days), so both engines multiply the exact
    * same factor sequence. Output: one row per DEATH time.
    *
    * Plan shape: one fact hash aggregate to per-key (first, last),
    * one 1-row window-end broadcast, one domain-bounded histogram +
    * window, one 1-row collect_list fold (m-bounded) re-exploded.
    */
  def kaplanMeier(df: DataFrame, keyCol: String, tsNsCol: String,
                  censorDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(censorDays >= 0, s"censorDays must be >= 0, got $censorDays")
    val dayNs = 86400000000000L
    val perKey = df.where(col(keyCol).isNotNull && col(tsNsCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(min(expr(s"$tsNsCol div ${dayNs}L")).as("_d0"),
        max(expr(s"$tsNsCol div ${dayNs}L")).as("_d1"))
    val end = perKey.agg(max(col("_d1")).as("_end"))
    val lives = perKey.crossJoin(broadcast(end))
      .select((col("_d1") - col("_d0")).as("_t"),
        (col("_d1") <= col("_end") - censorDays).as("_dead"))
    val hist = lives.groupBy(col("_t"))
      .agg(sum(when(col("_dead"), 1L).otherwise(0L)).as("_d"),
        sum(when(col("_dead"), 0L).otherwise(1L)).as("_c"))
    val w = Window.orderBy(col("_t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.agg(sum(col("_d") + col("_c")).as("_nn"))
    val domain = hist
      .withColumn("_cum", sum(col("_d") + col("_c")).over(w))
      .crossJoin(broadcast(tot))
      // at-risk at t = keys whose observed lifetime is >= t
      .select(col("_t"), col("_d"), col("_c"),
        (col("_nn") - col("_cum") + col("_d") + col("_c")).as("_n"))
    domain
      .agg(sort_array(collect_list(struct(col("_t"), col("_d"),
        col("_c"), col("_n")))).as("arr"))
      // empty input: sequence(1, 0) DESCENDS to [1, 0] instead of
      // yielding an empty array, so arr[0] on a 0-element array would
      // throw; an empty domain legitimately produces zero output rows
      .where(size(col("arr")) > 0)
      .select(explode(expr(
        """transform(sequence(1, size(arr)), i -> struct(
          |  arr[i-1]._t as t, arr[i-1]._d as d, arr[i-1]._n as n_at_risk,
          |  aggregate(slice(arr, 1, i), cast(1.0 as double),
          |    (acc, x) -> acc * (cast(1.0 as double)
          |      - cast(x._d as double) / cast(x._n as double))) as s))"""
        .stripMargin)).as("r"))
      .select(col("r.t").as("t"), col("r.d").as("d"),
        col("r.n_at_risk").as("n_at_risk"), col("r.s").as("s"))
      .where(col("d") > 0)
  }

  /** Two-cohort log-rank test — "do these two populations' survival
    * curves differ" (the inferential companion to [[kaplanMeier]]'s
    * estimate; same lifetime/censoring model: last activity within
    * `censorDays` of the window end = censored). At each death time
    * t: O accumulates cohort-A deaths, E the hypergeometric
    * expectation d_t·n1_t/n_t, V the variance
    * d_t·(n1/n)·(n2/n)·(n−d)/(n−1);
    *   z = (O − E)/√V,  χ² = (O − E)²/V.
    *
    * The cohort must be constant per key (it is keyed on the subject);
    * a key's cohort is the A-indicator max over its rows. Exactness:
    * d/c/n censuses are exact BIGINTs off one per-key aggregate + one
    * cumulative window over the day-bounded lifetime domain
    * (kaplan_meier's whitelist argument); E and V are per-t closed
    * forms folded t-ordered. Plan: nothing fact-sized past the
    * per-key aggregate.
    */
  def logRankTest(df: DataFrame, keyCol: String, tsNsCol: String,
                  cohortCol: String, cohortA: String, cohortB: String,
                  censorDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(censorDays >= 0, s"censorDays must be >= 0, got $censorDays")
    val dayNs = 86400000000000L
    val perKey = df.where(col(keyCol).isNotNull && col(tsNsCol).isNotNull
        && col(cohortCol).isin(cohortA, cohortB))
      .groupBy(col(keyCol))
      .agg(min(expr(s"$tsNsCol div ${dayNs}L")).as("_d0"),
        max(expr(s"$tsNsCol div ${dayNs}L")).as("_d1"),
        max(when(col(cohortCol) === cohortA, 1L).otherwise(0L))
          .as("_ia"))
    val end = perKey.agg(max(col("_d1")).as("_end"))
    val lives = perKey.crossJoin(broadcast(end))
      .select((col("_d1") - col("_d0")).as("_t"),
        (col("_d1") <= col("_end") - censorDays).as("_dead"),
        col("_ia"))
    def cnt(dead: Boolean, a: Boolean) =
      sum(when(col("_dead") === dead &&
        col("_ia") === (if (a) 1L else 0L), 1L).otherwise(0L))
    val hist = lives.groupBy(col("_t"))
      .agg(cnt(dead = true, a = true).as("_da"),
        cnt(dead = false, a = true).as("_ca"),
        cnt(dead = true, a = false).as("_db"),
        cnt(dead = false, a = false).as("_cb"))
    val w = Window.orderBy(col("_t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cohort totals ride the SAME day-domain window pass with a
    // full-partition frame — a separate totals aggregate would
    // re-derive the histogram and its per-key fact aggregate
    // (PlanAudit r14 counted the duplicate scans)
    val wAll = Window.orderBy(col("_t"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def D(c: Column) = c.cast("double")
    val atRisk = hist
      .withColumn("_cuma", sum(col("_da") + col("_ca")).over(w))
      .withColumn("_cumb", sum(col("_db") + col("_cb")).over(w))
      .withColumn("n_a", sum(col("_da") + col("_ca")).over(wAll))
      .withColumn("n_b", sum(col("_db") + col("_cb")).over(wAll))
      .select(col("_t"), col("_da"), col("_db"), col("n_a"), col("n_b"),
        (col("n_a") - col("_cuma") + col("_da") + col("_ca")).as("_n1"),
        (col("n_b") - col("_cumb") + col("_db") + col("_cb")).as("_n2"))
      .where(col("_da") + col("_db") > 0)
    val d = D(col("_da")) + D(col("_db"))
    val n1 = D(col("_n1"))
    val n2 = D(col("_n2"))
    val nn = n1 + n2
    val terms = atRisk
      .withColumn("_e", d * n1 / nn)
      .withColumn("_v", when(nn > 1,
        d * (n1 / nn) * (n2 / nn) * ((nn - d) / (nn - 1)))
        .otherwise(lit(0.0)))
    val agg = terms.agg(max(col("n_a")).as("n_a"),
      max(col("n_b")).as("n_b"), sum(col("_da")).as("o_a"),
      StatsOps.orderedFoldSum(Seq("_t"), "_e").as("e_a"),
      StatsOps.orderedFoldSum(Seq("_t"), "_v").as("_v"))
    val oe = D(col("o_a")) - col("e_a")
    agg.select(col("n_a"), col("n_b"), col("o_a"), col("e_a").as("e_a"),
      col("_v").as("v"),
      when(col("_v") > 0, oe / sqrt(col("_v"))).as("z"),
      when(col("_v") > 0, oe * oe / col("_v")).as("chi2"))
  }

  /** Seasonal strength per series — Hyndman's
    * F_s = max(0, 1 − Var(remainder)/Var(detrended)) specialized to
    * [[seasonalDecompose]]'s period-mean model (no trend component,
    * so the denominator is the series' total variance): one number
    * per group saying how much of the variance the seasonal profile
    * explains. Shares the decomposition's exact grid moments — total
    * variance from (n, Σv, Σv²), remainder variance as the
    * season-ordered fold of within-season SS.
    */
  def seasonalStrength(df: DataFrame, groupCol: String,
                       seasonCol: String, valueCol: String,
                       quantDigits: Int = 2): DataFrame = {
    val sc = math.pow(10, quantDigits)
    val q = floor(col(valueCol) * lit(sc) + lit(0.5)).cast("long")
    val perSeason = df
      .where(col(valueCol).isNotNull && col(seasonCol).isNotNull &&
        col(groupCol).isNotNull)
      .select(col(groupCol), col(seasonCol), q.as("_v"))
      .groupBy(col(groupCol), col(seasonCol))
      .agg(count(lit(1)).as("n"), sum(col("_v")).as("_sv"),
        sum(col("_v") * col("_v")).as("_svv"))
    def D(c: String) = col(c).cast("double")
    val ssw = (D("_svv") - D("_sv") * D("_sv") / D("n")) /
      lit(sc * sc)
    val perGroup = perSeason
      .withColumn("_ssw", ssw)
      .groupBy(col(groupCol))
      .agg(sum(col("n")).as("n"), sum(col("_sv")).as("_svg"),
        sum(col("_svv")).as("_svvg"),
        StatsOps.orderedFoldSum(Seq(seasonCol), "_ssw").as("_ssr"))
    val varTotal = (D("_svvg") - D("_svg") * D("_svg") / D("n")) /
      lit(sc * sc) / D("n")
    val varResid = col("_ssr") / D("n")
    perGroup.select(col(groupCol), col("n"),
      varTotal.as("var_total"), varResid.as("var_resid"),
      when(varTotal > 0,
        greatest(lit(0.0), lit(1.0) - varResid / varTotal))
        .as("strength"))
  }

  /** Holt linear (level+trend) exponential smoothing over each
    * series' per-window counts — the forecasting step up from
    * [[SequenceOps]]'s seasonal-naive backtest and ewma: state
    * (l, b) folds once through the window domain in time order,
    * accumulating one-step-ahead SSE, and emits the fitted level,
    * trend, and next-window forecast. Init: l=y₁, b=y₁−y₀ (the
    * standard two-point start), fold from y₂.
    *
    * Exactness: the series is exact integer counts; the fold is a
    * per-group fixed-order aggregate over the collected window domain
    * (bounded by the observation span), so both engines run the same
    * IEEE recurrence; smoothing literals are spelled identically
    * (`alpha`, `1.0 - alpha`) in both expression trees. Plan: one
    * fact hash aggregate, one domain-bounded collect_list fold per
    * group.
    */
  def holtLinear(df: DataFrame, groupCol: String, windowCol: String,
                 alpha: Double = 0.3, beta: Double = 0.1): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"alpha/beta in (0,1), got $alpha/$beta")
    val a = alpha.toString
    val b = beta.toString
    val series = df.where(col(groupCol).isNotNull &&
        col(windowCol).isNotNull)
      .groupBy(col(groupCol).as("_g"), col(windowCol).as("_h"))
      .agg(count(lit(1)).cast("double").as("_y"))
    series.groupBy(col("_g"))
      .agg(sort_array(collect_list(struct(col("_h"), col("_y"))))
        .as("arr"))
      .where(size(col("arr")) >= 3)
      .withColumn("_st", expr(
        s"""aggregate(slice(arr, 3, size(arr) - 2),
           |  named_struct(
           |    'l', arr[1]._y,
           |    'b', arr[1]._y - arr[0]._y,
           |    's', cast(0.0 as double)),
           |  (acc, x) -> named_struct(
           |    'l', $a * x._y + (1.0 - $a) * (acc.l + acc.b),
           |    'b', $b * (($a * x._y + (1.0 - $a) * (acc.l + acc.b))
           |      - acc.l) + (1.0 - $b) * acc.b,
           |    's', acc.s + (x._y - (acc.l + acc.b))
           |      * (x._y - (acc.l + acc.b))))""".stripMargin))
      .select(col("_g").as(groupCol),
        size(col("arr")).cast("long").as("n_windows"),
        col("_st.l").as("level"), col("_st.b").as("trend"),
        (col("_st.l") + col("_st.b")).as("forecast"),
        col("_st.s").as("sse"))
  }

  /** Greedy two-state burst detection (Kleinberg-lite) over each
    * series' per-window counts: baseline rate λ0 = the series mean,
    * burst rate λ1 = 2λ0, per-window Poisson cost λ − y·ln λ (the y!
    * term cancels between states), entering the burst state pays
    * penalty γ; the fold greedily takes the cheaper state per window
    * and counts burst entries and burst windows. Not full Viterbi —
    * the greedy form is the standard streaming-friendly variant, and
    * it is exactly replayable.
    *
    * Exactness: counts and the mean are exact-integer-derived; the
    * fold is the same domain-bounded list recurrence as
    * [[holtLinear]] (ln probed bit-identical across engines).
    */
  def burstDetect(df: DataFrame, groupCol: String, windowCol: String,
                  gamma: Double = 2.0): DataFrame = {
    require(gamma >= 0, s"gamma must be >= 0, got $gamma")
    val g = gamma.toString
    val series = df.where(col(groupCol).isNotNull &&
        col(windowCol).isNotNull)
      .groupBy(col(groupCol).as("_g"), col(windowCol).as("_h"))
      .agg(count(lit(1)).cast("double").as("_y"))
    val lam = series.groupBy(col("_g"))
      .agg((sum(col("_y")) / count(lit(1)).cast("double")).as("_l0"))
    series.join(broadcast(lam), Seq("_g"))
      .groupBy(col("_g"))
      .agg(sort_array(collect_list(struct(col("_h"), col("_y"),
        col("_l0")))).as("arr"))
      .withColumn("_st", expr(
        s"""aggregate(arr,
           |  named_struct('s', cast(0.0 as double),
           |    'nb', cast(0.0 as double), 'bw', cast(0.0 as double)),
           |  (acc, x) -> named_struct(
           |    's', if(x._l0 * 2.0 - x._y * ln(x._l0 * 2.0)
           |        + if(acc.s < 0.5, cast($g as double),
           |          cast(0.0 as double))
           |      < x._l0 - x._y * ln(x._l0), cast(1.0 as double),
           |      cast(0.0 as double)),
           |    'nb', acc.nb + if(acc.s < 0.5 AND
           |      x._l0 * 2.0 - x._y * ln(x._l0 * 2.0)
           |        + if(acc.s < 0.5, cast($g as double),
           |          cast(0.0 as double))
           |      < x._l0 - x._y * ln(x._l0), cast(1.0 as double),
           |      cast(0.0 as double)),
           |    'bw', acc.bw + if(x._l0 * 2.0 - x._y * ln(x._l0 * 2.0)
           |        + if(acc.s < 0.5, cast($g as double),
           |          cast(0.0 as double))
           |      < x._l0 - x._y * ln(x._l0), cast(1.0 as double),
           |      cast(0.0 as double))))""".stripMargin))
      .select(col("_g").as(groupCol),
        size(col("arr")).cast("long").as("n_windows"),
        col("_st.nb").cast("long").as("n_bursts"),
        col("_st.bw").cast("long").as("burst_windows"))
  }

  /** Maximum drawdown of each series' per-window mean — the
    * peak-to-trough collapse metric (how far did the metric fall from
    * its running high, and when): one fixed-order fold carrying
    * (running peak, max drawdown, trough window) through the window
    * domain in time order.
    *
    * Exactness: window means are exact-integer ratios (1e-2-grid
    * sums / counts); the fold is the same domain-bounded
    * collect_list recurrence as [[holtLinear]], so both engines run
    * identical IEEE comparisons. Plan: one fact hash aggregate, one
    * domain fold per group.
    */
  def maxDrawdown(df: DataFrame, groupCol: String, windowCol: String,
                  valueCol: String, quantDigits: Int = 2): DataFrame = {
    val scale = math.pow(10, quantDigits)
    val series = df.where(col(groupCol).isNotNull &&
        col(windowCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("_g"), col(windowCol).as("_h"))
      .agg((sum(floor(col(valueCol).cast("double") * lit(scale) +
          lit(0.5)).cast("long")).cast("double") / lit(scale) /
        count(lit(1)).cast("double")).as("_y"))
    series.groupBy(col("_g"))
      .agg(sort_array(collect_list(struct(col("_h"), col("_y"))))
        .as("arr"))
      .where(size(col("arr")) >= 2)
      .withColumn("_st", expr(
        """aggregate(slice(arr, 2, size(arr) - 1),
          |  named_struct(
          |    'p', arr[0]._y,
          |    'd', cast(0.0 as double),
          |    'at', cast(arr[0]._h as double)),
          |  (acc, x) -> named_struct(
          |    'p', greatest(acc.p, x._y),
          |    'd', greatest(acc.d, greatest(acc.p, x._y) - x._y),
          |    'at', if(greatest(acc.p, x._y) - x._y > acc.d,
          |      cast(x._h as double), acc.at)))""".stripMargin))
      .select(col("_g").as(groupCol),
        size(col("arr")).cast("long").as("n_windows"),
        col("_st.p").as("peak"), col("_st.d").as("max_drawdown"),
        col("_st.at").cast("long").as("trough_at"))
  }

  /** Best single change-point by variance reduction — the offline
    * sibling of [[cusumChange]] (CUSUM alarms online; this LOCATES
    * the break): over each series' per-window counts, choose the
    * boundary t maximizing SSE(all) − SSE(<t) − SSE(≥t), the exact
    * two-segment least-squares split (binary segmentation's first
    * step).
    *
    * Exactness + scale: window counts are exact integers; segment
    * SSEs are Σy² − (Σy)²/n over exact BIGINT prefix sums (one
    * group-partitioned window over the window domain); the argmax is
    * a rank-1 filter with deterministic (reduction desc, t) ordering,
    * mirrored IEEE throughout. Plan: fact → (series × window) counts
    * → domain window → domain-bounded argmax. Nothing fact-sized
    * after the first aggregate.
    */
  def changepointSplit(df: DataFrame, groupCol: String,
                       windowCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val series = df.where(col(groupCol).isNotNull &&
        col(windowCol).isNotNull)
      .groupBy(col(groupCol).as("_g"), col(windowCol).as("_h"))
      .agg(count(lit(1)).as("_y"))
    val w = Window.partitionBy(col("_g")).orderBy(col("_h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = series.groupBy(col("_g"))
      .agg(count(lit(1)).as("_n"), sum(col("_y")).as("_s"),
        sum(col("_y") * col("_y")).as("_ss"))
    def D(c: Column) = c.cast("double")
    def sse(n: Column, s: Column, ss: Column): Column =
      D(ss) - D(s) * D(s) / D(n)
    val cand = series
      .withColumn("_cn", count(lit(1)).over(w))
      .withColumn("_cs", sum(col("_y")).over(w))
      .withColumn("_css", sum(col("_y") * col("_y")).over(w))
      .join(broadcast(tot), Seq("_g"))
      // split BEFORE row _h: left = rows with window < _h
      .select(col("_g"), col("_h"),
        (col("_cn") - 1).as("_ln"), (col("_cs") - col("_y")).as("_ls"),
        (col("_css") - col("_y") * col("_y")).as("_lss"),
        col("_n"), col("_s"), col("_ss"))
      .where(col("_ln") > 0)
    val rn = col("_n") - col("_ln")
    val rs = col("_s") - col("_ls")
    val rss = col("_ss") - col("_lss")
    val reduction = sse(col("_n"), col("_s"), col("_ss")) -
      sse(col("_ln"), col("_ls"), col("_lss")) - sse(rn, rs, rss)
    val scored = cand.select(col("_g"), col("_h"),
      reduction.as("_red"),
      (D(col("_ls")) / D(col("_ln"))).as("_ml"),
      (D(rs) / D(rn)).as("_mr"))
    val rk = Window.partitionBy(col("_g"))
      .orderBy(col("_red").desc, col("_h"))
    scored.withColumn("_r", row_number().over(rk))
      .where(col("_r") === 1)
      .select(col("_g").as(groupCol), col("_h").as("split_at"),
        col("_red").as("sse_reduction"), col("_ml").as("mean_left"),
        col("_mr").as("mean_right"))
  }

  /** Nelson-Aalen cumulative hazard — [[kaplanMeier]]'s additive
    * sibling (H(t) = Σ_{tᵢ<=t} dᵢ/nᵢ, with the Σ dᵢ/nᵢ² variance):
    * preferred when hazard RATE, not survival probability, drives the
    * decision (e.g. retention interventions). Same lifetime model:
    * per-key first→last day span, right-censored at the observation
    * end.
    *
    * Exactness + plan: identical shape to kaplanMeier — day-bounded
    * domain, exact integer (d, n) histogram, and the prefix sums are
    * fixed-order left folds over the sorted bounded domain, so both
    * engines add the same rational sequence in the same order.
    */
  def nelsonAalen(df: DataFrame, keyCol: String, tsNsCol: String,
                  censorDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(censorDays >= 0, s"censorDays must be >= 0, got $censorDays")
    val dayNs = 86400000000000L
    val perKey = df.where(col(keyCol).isNotNull && col(tsNsCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(min(expr(s"$tsNsCol div ${dayNs}L")).as("_d0"),
        max(expr(s"$tsNsCol div ${dayNs}L")).as("_d1"))
    val end = perKey.agg(max(col("_d1")).as("_end"))
    val lives = perKey.crossJoin(broadcast(end))
      .select((col("_d1") - col("_d0")).as("_t"),
        (col("_d1") <= col("_end") - censorDays).as("_dead"))
    val hist = lives.groupBy(col("_t"))
      .agg(sum(when(col("_dead"), 1L).otherwise(0L)).as("_d"),
        sum(when(col("_dead"), 0L).otherwise(1L)).as("_c"))
    val w = Window.orderBy(col("_t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.agg(sum(col("_d") + col("_c")).as("_nn"))
    val domain = hist
      .withColumn("_cum", sum(col("_d") + col("_c")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("_t"), col("_d"), col("_c"),
        (col("_nn") - col("_cum") + col("_d") + col("_c")).as("_n"))
    domain
      .agg(sort_array(collect_list(struct(col("_t"), col("_d"),
        col("_c"), col("_n")))).as("arr"))
      // empty input: sequence(1, 0) DESCENDS to [1, 0] instead of
      // yielding an empty array, so arr[0] on a 0-element array would
      // throw; an empty domain legitimately produces zero output rows
      .where(size(col("arr")) > 0)
      .select(explode(expr(
        """transform(sequence(1, size(arr)), i -> struct(
          |  arr[i-1]._t as t, arr[i-1]._d as d, arr[i-1]._n as n_at_risk,
          |  aggregate(slice(arr, 1, i), cast(0.0 as double),
          |    (acc, x) -> acc + cast(x._d as double)
          |      / cast(x._n as double)) as h,
          |  aggregate(slice(arr, 1, i), cast(0.0 as double),
          |    (acc, x) -> acc + cast(x._d as double)
          |      / (cast(x._n as double) * cast(x._n as double)))
          |    as var_h))""".stripMargin)).as("r"))
      .select(col("r.t").as("t"), col("r.d").as("d"),
        col("r.n_at_risk").as("n_at_risk"), col("r.h").as("h"),
        col("r.var_h").as("var_h"))
      .where(col("d") > 0)
  }

  /** Gumbel (EV-I) fit of per-DAY block maxima of each series' hourly
    * counts, by the method of moments — the tail-risk readout ("how
    * big a burst should a day bring"): block maxima of light-tailed
    * arrival counts converge to Gumbel, whose MoM fit is
    *   β = s·√6/π,   μ = m − γβ
    * (γ Euler-Mascheroni, both constants full-precision literals so
    * the engines compare identical IEEE values). The maxima are exact
    * integers off two domain-bounded aggregates (fact → hour counts →
    * day maxima), so m and s come from exact BIGINT moment sums; the
    * P99-day forecast μ − β·ln(−ln 0.99) is one more closed form.
    */
  def gumbelFit(df: DataFrame, groupCol: String, windowCol: String,
                blockDiv: Long = 24L): DataFrame = {
    require(blockDiv >= 1, s"blockDiv must be >= 1, got $blockDiv")
    val series = df.where(col(groupCol).isNotNull &&
        col(windowCol).isNotNull)
      .groupBy(col(groupCol).as("_g"), col(windowCol).as("_h"))
      .agg(count(lit(1)).as("_y"))
    val maxima = series
      .groupBy(col("_g"), expr(s"_h div ${blockDiv}L").as("_b"))
      .agg(max(col("_y")).as("_m"))
    val agg = maxima.groupBy(col("_g"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("_m")).as("_s"),
        sum(col("_m") * col("_m")).as("_ss"))
    def D(c: String) = col(c).cast("double")
    val nD = D("n_blocks")
    val mean = D("_s") / nD
    val sd = sqrt((D("_ss") - D("_s") * D("_s") / nD) / (nD - 1))
    val beta = sd * lit(2.449489742783178) / lit(3.141592653589793)
    val mu = mean - lit(0.5772156649015329) * beta
    val ok = col("n_blocks") > 1 && sd > 0
    agg.select(col("_g").as(groupCol), col("n_blocks"),
      when(col("n_blocks") > 0, mean).as("mean_max"),
      when(ok, beta).as("beta"), when(ok, mu).as("mu"),
      when(ok, mu - beta * lit(-4.600149226776579)).as("p99"))
  }
}
