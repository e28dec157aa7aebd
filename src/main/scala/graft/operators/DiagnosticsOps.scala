package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Experiment-analysis / model-diagnostics completions (round 13):
  * the classical test battery a 100 TB training-data pipeline runs on
  * its metric streams before trusting a change — one-way ANOVA +
  * effect size, Brown-Forsythe variance homogeneity, Welch's unequal-
  * variance t, Wald-Wolfowitz runs randomness, Friedman blocked
  * ranks, McNemar paired flips, 1-D Wasserstein and Hellinger
  * distribution drift, and the time-series diagnostics (AR(1)
  * Yule-Walker, Ljung-Box portmanteau, cross-correlation lead/lag,
  * dominant period, Page-Hinkley drift, Granger-lite F).
  *
  * House rules throughout (SURVEY §5): values quantize to an integer
  * grid before any sum, so every accumulated moment is an exact
  * BIGINT and order-free; non-integer folds walk bounded domains in a
  * fixed key order ([[StatsOps.orderedFoldSum]]); windows run over
  * value/window DOMAINS (grid-bounded), never fact sorts; the only
  * fact-sized stage anywhere is one hash aggregate.
  */
object DiagnosticsOps {

  private def D(c: Column): Column = c.cast("double")
  private def D(s: String): Column = col(s).cast("double")

  /** One-way ANOVA over a quantized value grid: F = MSB/MSW plus the
    * eta-squared effect size. Exactness: per-group (n, Σv, Σv²) are
    * exact grid BIGINTs; Σ_g S_g²/n_g is the only non-integer sum and
    * folds group-ordered. Plan: one fact hash aggregate → k rows.
    */
  def anovaOneway(df: DataFrame, groupCol: String, valueCol: String,
                  quantDigits: Int = 2): DataFrame = {
    val scale = math.pow(10, quantDigits)
    val vq = floor(col(valueCol).cast("double") * lit(scale) + lit(0.5))
      .cast("long")
    val per = df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("_g"))
      .agg(count(lit(1)).as("_n"), sum(vq).as("_s"),
        sum(vq * vq).as("_ss"))
      .withColumn("_term", D("_s") * D("_s") / D("_n"))
    val agg = per.agg(count(lit(1)).as("k"), sum(col("_n")).as("n"),
      sum(col("_s")).as("_ts"), sum(col("_ss")).as("_tss"),
      StatsOps.orderedFoldSum(Seq("_g"), "_term").as("_sb"))
    val nD = D("n")
    val kD = D("k")
    val gm = D("_ts") * D("_ts") / nD
    val ssb = col("_sb") - gm
    val ssw = D("_tss") - col("_sb")
    val sst = D("_tss") - gm
    val s2 = scale * scale
    val f = when(col("k") > 1 && col("n") > col("k") && ssw > 0,
      (ssb / (kD - 1)) / (ssw / (nD - kD)))
    agg.select(col("k"), col("n"), (col("k") - 1).as("dof1"),
      (col("n") - col("k")).as("dof2"),
      (ssb / lit(s2)).as("ss_between"), (ssw / lit(s2)).as("ss_within"),
      f.as("f"),
      when(sst > 0, ssb / sst).as("eta_sq"))
  }

  /** Welch's unequal-variance two-sample t with the Welch-
    * Satterthwaite degrees of freedom — the default two-cohort mean
    * test when variances differ (the pooled test ab_test assumes they
    * don't). All moments exact grid BIGINTs; t and dof are closed
    * forms both engines derive identically.
    */
  def welchT(df: DataFrame, cohortCol: String, cohortA: String,
             cohortB: String, valueCol: String,
             quantDigits: Int = 4): DataFrame = {
    val scale = math.pow(10, quantDigits)
    val vq = floor(col(valueCol).cast("double") * lit(scale) + lit(0.5))
      .cast("long")
    def side(c: String, suf: String) = Seq(
      sum(when(col(cohortCol) === c, 1L).otherwise(0L)).as(s"n_$suf"),
      sum(when(col(cohortCol) === c, vq).otherwise(0L)).as(s"_s$suf"),
      sum(when(col(cohortCol) === c, vq * vq).otherwise(0L))
        .as(s"_ss$suf"))
    val aggs = side(cohortA, "a") ++ side(cohortB, "b")
    val agg = df.where(col(cohortCol).isin(cohortA, cohortB) &&
        col(valueCol).isNotNull)
      .agg(aggs.head, aggs.tail: _*)
    // empty/singleton cohorts yield null, not an ANSI divide-by-zero
    def mean(s: String, n: String) =
      when(col(n) > 0, D(s) / lit(scale) / D(n))
    // sample variance in USER units: (Σv² − (Σv)²/n) / (scale²·(n−1))
    def varS(ss: String, s: String, n: String) =
      when(col(n) > 1,
        (D(ss) - D(s) * D(s) / D(n)) / lit(scale * scale) / (D(n) - 1))
    val va = varS("_ssa", "_sa", "n_a")
    val vb = varS("_ssb", "_sb", "n_b")
    val sa2 = va / D("n_a")
    val sb2 = vb / D("n_b")
    val se2 = sa2 + sb2
    val t = when(col("n_a") > 1 && col("n_b") > 1 && se2 > 0,
      (mean("_sa", "n_a") - mean("_sb", "n_b")) / sqrt(se2))
    val dof = when(col("n_a") > 1 && col("n_b") > 1 && se2 > 0,
      se2 * se2 / (sa2 * sa2 / (D("n_a") - 1) +
        sb2 * sb2 / (D("n_b") - 1)))
    agg.select(col("n_a"), col("n_b"),
      mean("_sa", "n_a").as("mean_a"), mean("_sb", "n_b").as("mean_b"),
      t.as("t"), dof.as("dof"))
  }

  /** Brown-Forsythe variance-homogeneity test (Levene with median
    * centers — the robust form): one-way ANOVA F over the absolute
    * deviations from each group's median. Entirely on the (group ×
    * grid value) HISTOGRAM: the median is an exact integer rank
    * select on the per-group cumulative histogram (lower median at
    * rank (n+1) div 2), |v − med| is an exact grid BIGINT, and the
    * deviation moments come from the histogram's multiplicities — no
    * second fact pass. The per-group cumulative window is
    * group-partitioned over the value domain.
    */
  def leveneTest(df: DataFrame, groupCol: String, valueCol: String,
                 quantDigits: Int = 2): DataFrame = {
    val scale = math.pow(10, quantDigits)
    val vq = floor(col(valueCol).cast("double") * lit(scale) + lit(0.5))
      .cast("long")
    val hist = df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("_g"), vq.as("_v"))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col("_g")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("_cum", sum(col("_c")).over(w))
      .join(hist.groupBy("_g").agg(sum(col("_c")).as("_n")), Seq("_g"))
    val med = cum.where(col("_cum") >= expr("(_n + 1) div 2"))
      .groupBy("_g").agg(min(col("_v")).as("_med"))
    val dev = hist.join(med, Seq("_g"))
      .select(col("_g"), col("_c"), abs(col("_v") - col("_med")).as("_z"))
    val per = dev.groupBy("_g")
      .agg(sum(col("_c")).as("_n"), sum(col("_c") * col("_z")).as("_s"),
        sum(col("_c") * col("_z") * col("_z")).as("_ss"))
      .withColumn("_term", D("_s") * D("_s") / D("_n"))
    val agg = per.agg(count(lit(1)).as("k"), sum(col("_n")).as("n"),
      sum(col("_s")).as("_ts"), sum(col("_ss")).as("_tss"),
      StatsOps.orderedFoldSum(Seq("_g"), "_term").as("_sb"))
    val nD = D("n")
    val kD = D("k")
    val ssb = col("_sb") - D("_ts") * D("_ts") / nD
    val ssw = D("_tss") - col("_sb")
    val wStat = when(col("k") > 1 && col("n") > col("k") && ssw > 0,
      (ssb / (kD - 1)) / (ssw / (nD - kD)))
    agg.select(col("k"), col("n"), (col("k") - 1).as("dof1"),
      (col("n") - col("k")).as("dof2"), wStat.as("w"))
  }

  /** Wald-Wolfowitz runs test for randomness of each series' per-
    * window counts around its median: R runs of above/below-median
    * signs (median-equal windows drop, the standard convention), with
    * the exact-integer E[R]/Var[R] closed forms and normal z.
    * The sign-change census is a lag over the WINDOW DOMAIN
    * partitioned by series.
    */
  def runsTest(df: DataFrame, groupCol: String,
               windowCol: String): DataFrame = {
    val series = df.where(col(groupCol).isNotNull &&
        col(windowCol).isNotNull)
      .groupBy(col(groupCol).as("_g"), col(windowCol).as("_h"))
      .agg(count(lit(1)).as("_y"))
    val yh = series.groupBy(col("_g"), col("_y"))
      .agg(count(lit(1)).as("_c"))
    val wv = Window.partitionBy(col("_g")).orderBy(col("_y"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = yh.withColumn("_cum", sum(col("_c")).over(wv))
      .join(yh.groupBy("_g").agg(sum(col("_c")).as("_n")), Seq("_g"))
    val med = cum.where(col("_cum") >= expr("(_n + 1) div 2"))
      .groupBy("_g").agg(min(col("_y")).as("_med"))
    val signs = series.join(med, Seq("_g"))
      .where(col("_y") =!= col("_med"))
      .select(col("_g"), col("_h"), (col("_y") > col("_med")).as("_s"))
    val wt = Window.partitionBy(col("_g")).orderBy(col("_h"))
    val runs = signs
      .withColumn("_prev", lag(col("_s"), 1).over(wt))
      .groupBy("_g")
      .agg(sum(when(col("_s"), 1L).otherwise(0L)).as("n_above"),
        sum(when(col("_s"), 0L).otherwise(1L)).as("n_below"),
        (sum(when(col("_prev").isNotNull &&
          (col("_s") =!= col("_prev")), 1L).otherwise(0L)) + 1)
          .as("runs"))
    val n1 = D("n_above")
    val n2 = D("n_below")
    val nn = n1 + n2
    val e = lit(2.0) * n1 * n2 / nn + 1
    // try_divide: a single-sign series (nn = 1) must yield null, not
    // an ANSI divide-by-zero
    val v = try_divide(lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - nn),
      nn * nn * (nn - 1))
    val ok = col("n_above") > 0 && col("n_below") > 0 &&
      col("n_above") + col("n_below") > 1
    runs.select(col("_g").as(groupCol), col("n_above"), col("n_below"),
      col("runs"), when(ok, e).as("e_runs"),
      when(ok && v > 0, (D("runs") - e) / sqrt(v)).as("z"))
  }

  /** Friedman blocked-rank test — "does any treatment differ, given
    * block effects" (the k-sample, blocked sibling of kruskal_wallis):
    * treatments ranked WITHIN each block (doubled midranks stay exact
    * BIGINTs), χ²_F from Σ R_j², with the tie-corrected variant.
    * Only COMPLETE blocks (all k treatments present) count, per the
    * classical design. All windows are block-partitioned over ≤ k
    * rows. Cell values quantize to the 10^-quantDigits grid before
    * the per-cell sum (the house grid idiom), so fractional values
    * rank exactly rather than truncating.
    */
  def friedmanTest(df: DataFrame, blockCol: String, treatCol: String,
                   valueCol: String, quantDigits: Int = 2): DataFrame = {
    val qscale = math.pow(10, quantDigits)
    val vq = floor(col(valueCol).cast("double") * lit(qscale) + lit(0.5))
      .cast("long")
    val cells = df.where(col(blockCol).isNotNull && col(treatCol).isNotNull
        && col(valueCol).isNotNull)
      .groupBy(col(blockCol).as("_b"), col(treatCol).as("_t"))
      .agg(sum(vq).as("_y"))
    val k = cells.agg(count_distinct(col("_t")).as("_k"))
    val complete = cells.groupBy("_b").agg(count(lit(1)).as("_kb"))
      .crossJoin(broadcast(k)).where(col("_kb") === col("_k"))
      .select(col("_b"))
    val used = cells.join(complete, Seq("_b"))
    // doubled midrank of _y within the block: 2·cum − t + 1 over the
    // block's value histogram (≤ k rows per block)
    val bh = used.groupBy(col("_b"), col("_y"))
      .agg(count(lit(1)).as("_tc"))
    val wb = Window.partitionBy(col("_b")).orderBy(col("_y"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = bh.withColumn("_cum", sum(col("_tc")).over(wb))
      .select(col("_b"), col("_y"),
        (lit(2) * col("_cum") - col("_tc") + 1).as("_dr"),
        (col("_tc") * col("_tc") * col("_tc") - col("_tc")).as("_t3"))
    val r2 = used.join(ranked.select("_b", "_y", "_dr"), Seq("_b", "_y"))
      .groupBy("_t").agg(sum(col("_dr")).as("_r2"))
    val ties = ranked.groupBy("_b").agg(sum(col("_t3")).as("_bt3"))
      .agg(sum(col("_bt3")).as("_t3"), count(lit(1)).as("n_blocks"))
    val sums = r2.withColumn("_term", D("_r2") / 2 * (D("_r2") / 2))
      .agg(StatsOps.orderedFoldSum(Seq("_t"), "_term").as("_sr2"),
        count(lit(1)).as("k"))
      .crossJoin(broadcast(ties))
    val nD = D("n_blocks")
    val kD = D("k")
    val chi2 = lit(12.0) / (nD * kD * (kD + 1)) * col("_sr2") -
      lit(3.0) * nD * (kD + 1)
    val corr = lit(1.0) -
      try_divide(D("_t3"), nD * kD * (kD * kD - 1))
    sums.select(col("n_blocks"), col("k"), (col("k") - 1).as("dof"),
      when(col("n_blocks") > 0 && col("k") > 1, chi2).as("chi2"),
      when(col("n_blocks") > 0 && col("k") > 1 && corr > 0,
        chi2 / corr).as("chi2_corr"))
  }

  /** McNemar's paired-flip test with continuity correction — "did the
    * same population's binary outcome change between two conditions"
    * (the paired sibling of ab_test): per key, pre/post indicators
    * OR-reduced over the key's rows, then the discordant-pair census
    * b (1→0) and c (0→1) and χ² = (|b−c|−1)²/(b+c). One fact hash
    * aggregate to the key domain, one 1-row reduction.
    */
  def mcnemarTest(df: DataFrame, keyCol: String, preCol: String,
                  postCol: String): DataFrame = {
    val per = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(max(when(col(preCol), 1L).otherwise(0L)).as("_x"),
        max(when(col(postCol), 1L).otherwise(0L)).as("_y"))
    val agg = per.agg(count(lit(1)).as("n_pairs"),
      sum(when(col("_x") === 1 && col("_y") === 0, 1L).otherwise(0L))
        .as("b"),
      sum(when(col("_x") === 0 && col("_y") === 1, 1L).otherwise(0L))
        .as("c"))
    val bc = D("b") + D("c")
    val num = (abs(D("b") - D("c")) - 1) * (abs(D("b") - D("c")) - 1)
    agg.select(col("n_pairs"), col("b"), col("c"),
      when(col("b") + col("c") > 0, num / bc).as("chi2"))
  }

  /** 1-D Wasserstein (earth mover's) distance between two cohorts'
    * value distributions — the drift metric that, unlike PSI/KS,
    * weighs HOW FAR mass moved: W1 = Σ_i |F_a(v_i) − F_b(v_i)|·Δv_i
    * over the sorted quantized value grid. Exactness: the CDF gap
    * clears denominators to the exact BIGINT |cumA·Nb − cumB·Na|, the
    * grid gap Δv is an exact integer, and their product sums
    * order-free; one division at the end. The cumulative/lead window
    * walks the GRID domain (same whitelist argument as ks_drift).
    * Integer range: every factor is widened to decimal(38,0) BEFORE
    * the first product (cumA·Nb alone clears 2⁶³ once N_a·N_b does —
    * cohorts of ~3·10⁹ rows each, real at 100 TB), so products,
    * per-term |·|·Δv, and the running sum are all exact 128-bit in
    * both engines (DuckDB computes the mirrored term in HUGEINT);
    * N_a·N_b·span can reach ~10³⁸ before overflow instead of wrapping
    * silently at 2⁶³.
    */
  def wassersteinDrift(df: DataFrame, cohortCol: String, cohortA: String,
                       cohortB: String, valueCol: String,
                       quantDigits: Int = 4): DataFrame = {
    val scale = math.pow(10, quantDigits)
    val vq = floor(col(valueCol).cast("double") * lit(scale) + lit(0.5))
      .cast("long")
    val counts = df.where(col(cohortCol).isin(cohortA, cohortB) &&
        col(valueCol).isNotNull)
      .select(col(cohortCol).as("_c"), vq.as("_v"))
      .groupBy("_v")
      .agg(sum(when(col("_c") === cohortA, 1L).otherwise(0L)).as("_ca"),
        sum(when(col("_c") === cohortB, 1L).otherwise(0L)).as("_cb"))
    val w = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wl = Window.orderBy(col("_v"))
    val tot = counts.agg(sum(col("_ca")).as("n_a"),
      sum(col("_cb")).as("n_b"))
    counts
      .withColumn("_cuma", sum(col("_ca")).over(w))
      .withColumn("_cumb", sum(col("_cb")).over(w))
      .withColumn("_gap", lead(col("_v"), 1).over(wl) - col("_v"))
      .crossJoin(broadcast(tot))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        // widen to decimal BEFORE any product: cumA·N_b alone exceeds
        // int64 once N_a·N_b > 2^63 (cohorts ~3e9 rows each — real at
        // 100 TB); decimal(38,0) throughout keeps the whole term exact
        // to ~10^38
        sum(abs(col("_cuma").cast("decimal(38,0)")
            * col("n_b").cast("decimal(38,0)")
          - col("_cumb").cast("decimal(38,0)")
            * col("n_a").cast("decimal(38,0)"))
          * coalesce(col("_gap"), lit(0L)).cast("decimal(38,0)"))
          .as("_sw"))
      .select(col("n_a"), col("n_b"),
        (D("_sw") / (D("n_a") * D("n_b") * lit(scale))).as("w1"))
  }

  /** Hellinger distance between two cohorts' value distributions over
    * the quantized grid: BC = Σ √(p_i·q_i), H = √(1 − BC) — the
    * bounded [0,1] drift companion to [[wassersteinDrift]] (which is
    * scale-bearing). √(ca·cb) of exact BIGINTs is correctly rounded
    * identically in both engines; the BC fold runs value-ordered.
    */
  def hellingerDrift(df: DataFrame, cohortCol: String, cohortA: String,
                     cohortB: String, valueCol: String,
                     quantDigits: Int = 4): DataFrame = {
    val scale = math.pow(10, quantDigits)
    val vq = floor(col(valueCol).cast("double") * lit(scale) + lit(0.5))
      .cast("long")
    val counts = df.where(col(cohortCol).isin(cohortA, cohortB) &&
        col(valueCol).isNotNull)
      .select(col(cohortCol).as("_c"), vq.as("_v"))
      .groupBy("_v")
      .agg(sum(when(col("_c") === cohortA, 1L).otherwise(0L)).as("_ca"),
        sum(when(col("_c") === cohortB, 1L).otherwise(0L)).as("_cb"))
      .withColumn("_term", sqrt(D("_ca") * D("_cb")))
    val agg = counts.agg(sum(col("_ca")).as("n_a"),
      sum(col("_cb")).as("n_b"),
      StatsOps.orderedFoldSum(Seq("_v"), "_term").as("_sbc"))
    val bc = try_divide(col("_sbc"), sqrt(D("n_a") * D("n_b")))
    agg.select(col("n_a"), col("n_b"), bc.as("bc"),
      sqrt(greatest(lit(0.0), lit(1.0) - bc)).as("hellinger"))
  }

  /** Two-sample Cramér–von Mises ω² between two cohorts' value
    * distributions over the quantized grid — the whole-CDF companion
    * to [[wassersteinDrift]] (W1 weighs displacement; CvM weighs
    * squared CDF gap under the POOLED distribution):
    *   T = (n·m/N²) · Σ_k (F_a(v_k) − F_b(v_k))² · h_k
    * with h_k the pooled count at grid value k. The CDF gap clears
    * denominators to the exact BIGINT d_k = cumA·m − cumB·n; each
    * term (d_k/(n·m))²·h_k is one mirrored IEEE expression and the Σ
    * folds value-ordered, so the statistic is engine-exact at ANY
    * cohort size (no integer-range cliff — the only integers are
    * d_k and h_k). The cumulative window walks the grid domain
    * (ks_drift's whitelist argument).
    */
  def cvmDrift(df: DataFrame, cohortCol: String, cohortA: String,
               cohortB: String, valueCol: String,
               quantDigits: Int = 4): DataFrame = {
    val scale = math.pow(10, quantDigits)
    val vq = floor(col(valueCol).cast("double") * lit(scale) + lit(0.5))
      .cast("long")
    val counts = df.where(col(cohortCol).isin(cohortA, cohortB) &&
        col(valueCol).isNotNull)
      .select(col(cohortCol).as("_c"), vq.as("_v"))
      .groupBy("_v")
      .agg(sum(when(col("_c") === cohortA, 1L).otherwise(0L)).as("_ca"),
        sum(when(col("_c") === cohortB, 1L).otherwise(0L)).as("_cb"))
    val w = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = counts.agg(sum(col("_ca")).as("n_a"),
      sum(col("_cb")).as("n_b"))
    val cum = counts
      .withColumn("_cuma", sum(col("_ca")).over(w))
      .withColumn("_cumb", sum(col("_cb")).over(w))
      .crossJoin(broadcast(tot))
    val nm = D("n_a") * D("n_b")
    val gap = (D("_cuma") * D("n_b") - D("_cumb") * D("n_a")) / nm
    val agg = cum
      .withColumn("_term", gap * gap * (D("_ca") + D("_cb")))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        StatsOps.orderedFoldSum(Seq("_v"), "_term").as("_s"))
    val nD = D("n_a") + D("n_b")
    agg.select(col("n_a"), col("n_b"),
      when(col("n_a") > 0 && col("n_b") > 0,
        D("n_a") * D("n_b") / (nD * nD) * col("_s")).as("t"))
  }

  /** 1-D energy distance (= twice the squared Cramér distance)
    * between two cohorts over the quantized grid:
    *   E = 2 · Σ_k (F_a(v_k) − F_b(v_k))² · Δv_k / scale
    * — the metric form 2E|X−Y| − E|X−X'| − E|Y−Y'|, which for 1-D
    * reduces to the squared-CDF-gap integral. Same exact-BIGINT
    * d_k core and value-ordered fold as [[cvmDrift]]; Δv is the
    * exact integer grid gap. Zero iff the distributions coincide.
    */
  def energyDrift(df: DataFrame, cohortCol: String, cohortA: String,
                  cohortB: String, valueCol: String,
                  quantDigits: Int = 4): DataFrame = {
    val scale = math.pow(10, quantDigits)
    val vq = floor(col(valueCol).cast("double") * lit(scale) + lit(0.5))
      .cast("long")
    val counts = df.where(col(cohortCol).isin(cohortA, cohortB) &&
        col(valueCol).isNotNull)
      .select(col(cohortCol).as("_c"), vq.as("_v"))
      .groupBy("_v")
      .agg(sum(when(col("_c") === cohortA, 1L).otherwise(0L)).as("_ca"),
        sum(when(col("_c") === cohortB, 1L).otherwise(0L)).as("_cb"))
    val w = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wl = Window.orderBy(col("_v"))
    val tot = counts.agg(sum(col("_ca")).as("n_a"),
      sum(col("_cb")).as("n_b"))
    val cum = counts
      .withColumn("_cuma", sum(col("_ca")).over(w))
      .withColumn("_cumb", sum(col("_cb")).over(w))
      .withColumn("_gap", lead(col("_v"), 1).over(wl) - col("_v"))
      .crossJoin(broadcast(tot))
    val nm = D("n_a") * D("n_b")
    val g = (D("_cuma") * D("n_b") - D("_cumb") * D("n_a")) / nm
    val agg = cum
      .withColumn("_term",
        g * g * D(coalesce(col("_gap"), lit(0L))))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        StatsOps.orderedFoldSum(Seq("_v"), "_term").as("_s"))
    agg.select(col("n_a"), col("n_b"),
      when(col("n_a") > 0 && col("n_b") > 0,
        lit(2.0) * col("_s") / lit(scale)).as("energy"))
  }

  /** Per-key paired delta census shared by [[signTest]] and
    * [[wilcoxonSignedRank]]: one fact hash aggregate to
    * (key, d = Σ quant(post) − Σ quant(pre)), exact grid BIGINTs.
    */
  private def pairedDeltas(df: DataFrame, keyCol: String, preCol: String,
                           postCol: String, quantDigits: Int): DataFrame = {
    val scale = math.pow(10, quantDigits)
    def q(c: String) = sum(coalesce(
      floor(col(c).cast("double") * lit(scale) + lit(0.5)).cast("long"),
      lit(0L)))
    df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg((q(postCol) - q(preCol)).as("_d"))
  }

  /** Paired sign test over per-key pre/post sums: b keys improved,
    * c regressed, zeros dropped (the classical convention), normal z
    * with continuity correction sign(b−c)·(|b−c|−1)/√(b+c). The
    * distribution-free sibling of [[welchT]] for paired designs; one
    * fact hash aggregate, one 1-row reduction.
    */
  def signTest(df: DataFrame, keyCol: String, preCol: String,
               postCol: String, quantDigits: Int = 2): DataFrame = {
    val per = pairedDeltas(df, keyCol, preCol, postCol, quantDigits)
    val agg = per.agg(
      sum(when(col("_d") > 0, 1L).otherwise(0L)).as("b"),
      sum(when(col("_d") < 0, 1L).otherwise(0L)).as("c"),
      sum(when(col("_d") === 0, 1L).otherwise(0L)).as("n_zero"))
    val bD = D("b")
    val cD = D("c")
    val z = signum(bD - cD) * (abs(bD - cD) - 1) / sqrt(bD + cD)
    agg.select(col("b"), col("c"), col("n_zero"),
      when(col("b") + col("c") > 0, z).as("z"))
  }

  /** Wilcoxon signed-rank test over the same per-key paired deltas:
    * midranks of |d| (zeros dropped) via DOUBLED ranks on the
    * distinct-|d| histogram — dr = 2·cum − t + 1 keeps every rank an
    * exact BIGINT (mann_whitney's trick), so W2 = 2·W⁺ and the
    * tie-corrected variance term Σ(t³−t) are exact integers;
    *   z = (W2 − n(n+1)/2) / √(n(n+1)(2n+1)/6 − Σ(t³−t)/12).
    * The rank cumulative walks the distinct-|d| value domain
    * (mann_whitney's whitelist argument verbatim).
    */
  def wilcoxonSignedRank(df: DataFrame, keyCol: String, preCol: String,
                         postCol: String,
                         quantDigits: Int = 2): DataFrame = {
    val per = pairedDeltas(df, keyCol, preCol, postCol, quantDigits)
      .where(col("_d") =!= 0)
      .select(abs(col("_d")).as("_ad"), (col("_d") > 0).as("_pos"))
    val hist = per.groupBy(col("_ad"))
      .agg(count(lit(1)).as("_t"),
        sum(when(col("_pos"), 1L).otherwise(0L)).as("_tp"))
    val w = Window.orderBy(col("_ad"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = hist.withColumn("_cum", sum(col("_t")).over(w))
      .select(col("_t"), col("_tp"),
        (lit(2) * col("_cum") - col("_t") + 1).as("_dr"))
    // coalesce: an all-zero-delta input leaves the histogram empty
    // and a bare sum would report null n instead of an honest 0
    val agg = ranked.agg(coalesce(sum(col("_t")), lit(0L)).as("n"),
      sum(col("_dr") * col("_tp")).as("_w2"),
      sum(col("_t") * col("_t") * col("_t") - col("_t")).as("_t3"))
    val nD = D("n")
    val varW2 = nD * (nD + 1) * (lit(2.0) * nD + 1) / 6 -
      D("_t3") / 12
    val z = (D("_w2") - nD * (nD + 1) / 2) / sqrt(varW2)
    agg.select(col("n"), (D("_w2") / 2).as("w_plus"),
      when(col("n") > 0 && varW2 > 0, z).as("z"))
  }

  /** Cochran's Q — "did the binary outcome rate differ across k
    * conditions, blocked by subject" (the k-condition generalization
    * of [[mcnemarTest]]): per (block, treatment) OR-reduced outcome,
    * complete blocks only, and the all-integer closed form
    *   Q = (k−1)·(k·ΣT_j² − N²) / (k·N − Σu_i²)
    * (T_j = treatment successes, u_i = block successes, N = Σu_i) —
    * numerator and denominator are exact BIGINTs, one division.
    */
  def cochranQ(df: DataFrame, blockCol: String, treatCol: String,
               outcomeCol: String): DataFrame = {
    val cells = df.where(col(blockCol).isNotNull && col(treatCol).isNotNull)
      .groupBy(col(blockCol).as("_b"), col(treatCol).as("_t"))
      .agg(max(when(col(outcomeCol), 1L).otherwise(0L)).as("_x"))
    val k = cells.agg(count_distinct(col("_t")).as("_k"))
    val complete = cells.groupBy("_b").agg(count(lit(1)).as("_kb"))
      .crossJoin(broadcast(k)).where(col("_kb") === col("_k"))
      .select(col("_b"))
    val used = cells.join(complete, Seq("_b"))
    val tj = used.groupBy("_t").agg(sum(col("_x")).as("_tj"))
      .agg(count(lit(1)).as("k"), sum(col("_tj")).as("n"),
        sum(col("_tj") * col("_tj")).as("_st2"))
    val ui = used.groupBy("_b").agg(sum(col("_x")).as("_ui"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("_ui") * col("_ui")).as("_su2"))
    val agg = tj.crossJoin(broadcast(ui))
    val num = (col("k") - 1) * (col("k") * col("_st2") -
      col("n") * col("n"))
    val den = col("k") * col("n") - col("_su2")
    agg.select(col("n_blocks"), col("k"), (col("k") - 1).as("dof"),
      when(col("k") > 1 && den > 0, D(num) / D(den)).as("q"))
  }

  /** Kendall τ-b between two cohorts' per-window counts — rank
    * concordance of the paired (x_t, y_t) hourly series, the
    * tie-corrected cross-series sibling of mann_kendall and the
    * robust alternative to Pearson cross-correlation at lag 0.
    * Discordant pairs D = inversions of the y-sequence after sorting
    * pairs by (x asc, y asc) — x-tied pairs sort y-ascending and so
    * contribute no inversion, exactly matching "neither concordant
    * nor discordant". C = C(T,2) − n1 − n2 + n3 − D with n1/n2/n3
    * the x/y/joint tie-pair censuses;
    *   τ_b = (C − D)/√((C(T,2) − n1)(C(T,2) − n2)).
    * All censuses exact BIGINTs; D is [[StatsOps.seriesInversions]]
    * (O(T log T) merge sort) over the window-domain-bounded pair
    * list. One fact hash aggregate; everything after is domain-sized.
    */
  def kendallTau(df: DataFrame, cohortCol: String, cohortA: String,
                 cohortB: String, windowCol: String): DataFrame = {
    val dom = df.where(col(cohortCol).isin(cohortA, cohortB) &&
        col(windowCol).isNotNull)
      .groupBy(col(windowCol).as("_h"))
      .agg(sum(when(col(cohortCol) === cohortA, 1L).otherwise(0L))
          .as("_x"),
        sum(when(col(cohortCol) === cohortB, 1L).otherwise(0L))
          .as("_y"))
    // every census reads the SAME collected (x, y) array — separate
    // groupBy censuses would re-derive the fact scan once each (the
    // round-14 PlanAudit caught 4 scans); a run-length fold over the
    // sorted bounded-domain array costs O(T) and keeps ONE scan.
    // Adding the (k+1)'th member of an equal-key run adds k tied
    // pairs, so each fold carries (prev key, run length, pair count);
    // counts are never negative, so -1 is a safe "no previous" key.
    val agg = dom
      .agg(count(lit(1)).as("t"),
        sort_array(collect_list(struct(col("_x"), col("_y"))))
          .as("_tv"))
      .withColumn("_d", StatsOps.seriesInversions(
        expr("transform(_tv, p -> p._y)")))
      .withColumn("_n1", expr(
        """(aggregate(_tv,
          |  named_struct('p', cast(-1 as bigint), 'r', cast(0 as bigint),
          |    'a', cast(0 as bigint)),
          |  (acc, e) -> named_struct('p', e._x,
          |    'r', if(e._x = acc.p, acc.r + 1, cast(1 as bigint)),
          |    'a', acc.a + if(e._x = acc.p, acc.r,
          |      cast(0 as bigint))))).a""".stripMargin))
      .withColumn("_n3", expr(
        """(aggregate(_tv,
          |  named_struct('p', cast(-1 as bigint), 'q', cast(-1 as bigint),
          |    'r', cast(0 as bigint), 'a', cast(0 as bigint)),
          |  (acc, e) -> named_struct('p', e._x, 'q', e._y,
          |    'r', if(e._x = acc.p AND e._y = acc.q, acc.r + 1,
          |      cast(1 as bigint)),
          |    'a', acc.a + if(e._x = acc.p AND e._y = acc.q, acc.r,
          |      cast(0 as bigint))))).a""".stripMargin))
      .withColumn("_n2", expr(
        """(aggregate(array_sort(transform(_tv, p -> p._y)),
          |  named_struct('p', cast(-1 as bigint), 'r', cast(0 as bigint),
          |    'a', cast(0 as bigint)),
          |  (acc, e) -> named_struct('p', e,
          |    'r', if(e = acc.p, acc.r + 1, cast(1 as bigint)),
          |    'a', acc.a + if(e = acc.p, acc.r,
          |      cast(0 as bigint))))).a""".stripMargin))
    val n0 = expr("t * (t - 1) div 2")
    val c = n0 - col("_n1") - col("_n2") + col("_n3") - col("_d")
    val den = sqrt(D(n0 - col("_n1")) * D(n0 - col("_n2")))
    val s = D(c) - D(col("_d"))
    agg.select(col("t"), c.as("concordant"),
      col("_d").as("discordant"),
      when(col("t") > 1 && den > 0, s / den).as("tau_b"),
      // the whole ordinal-association family falls out of the same
      // censuses: Goodman-Kruskal γ ignores all ties, Somers' D
      // conditions on the predictor's untied pairs (d_yx treats x as
      // the predictor, d_xy treats y)
      try_divide(s, D(c) + D(col("_d"))).as("gamma"),
      try_divide(s, D(n0 - col("_n1"))).as("somers_dyx"),
      try_divide(s, D(n0 - col("_n2"))).as("somers_dxy"))
  }

  /** Cohen's d / Hedges' g standardized mean difference between two
    * cohorts — the "how big, in SD units" companion to [[welchT]]'s
    * "how sure": pooled-SD d, small-sample-corrected
    * g = d·(1 − 3/(4N − 9)). Exact grid moments (welch's sums);
    * d is one closed form.
    */
  def cohensD(df: DataFrame, cohortCol: String, cohortA: String,
              cohortB: String, valueCol: String,
              quantDigits: Int = 4): DataFrame = {
    val scale = math.pow(10, quantDigits)
    val vq = floor(col(valueCol).cast("double") * lit(scale) + lit(0.5))
      .cast("long")
    def side(c: String, suf: String) = Seq(
      sum(when(col(cohortCol) === c, 1L).otherwise(0L)).as(s"n_$suf"),
      sum(when(col(cohortCol) === c, vq).otherwise(0L)).as(s"_s$suf"),
      sum(when(col(cohortCol) === c, vq * vq).otherwise(0L))
        .as(s"_ss$suf"))
    val aggs = side(cohortA, "a") ++ side(cohortB, "b")
    val agg = df.where(col(cohortCol).isin(cohortA, cohortB) &&
        col(valueCol).isNotNull)
      .agg(aggs.head, aggs.tail: _*)
    def mean(s: String, n: String) =
      when(col(n) > 0, D(s) / lit(scale) / D(n))
    def ssc(ss: String, s: String, n: String) =
      (D(ss) - D(s) * D(s) / D(n)) / lit(scale * scale)
    val nA = D("n_a")
    val nB = D("n_b")
    val sp = sqrt((ssc("_ssa", "_sa", "n_a") +
      ssc("_ssb", "_sb", "n_b")) / (nA + nB - 2))
    val dd = (mean("_sa", "n_a") - mean("_sb", "n_b")) / sp
    val ok = col("n_a") > 1 && col("n_b") > 1 && sp > 0
    agg.select(col("n_a"), col("n_b"),
      when(ok, sp).as("pooled_sd"), when(ok, dd).as("d"),
      when(ok, dd * (lit(1.0) - lit(3.0) /
        (lit(4.0) * (nA + nB) - 9))).as("hedges_g"))
  }

  /** Cochran-Armitage trend test — "does the success rate trend
    * monotonically across ordered doses" (the dose-response sibling
    * of [[cochranQ]]; scores are the ordered group labels):
    *   z = Σ s(r_s − n_s·p̄) / √(p̄(1−p̄)(Σ n s² − (Σ n s)²/N)).
    * Every census (n_s, r_s, Σns, Σns², Σsr) is an exact BIGINT off
    * one hash aggregate; z is one closed form — no fold at all.
    */
  def cochranArmitage(df: DataFrame, scoreCol: String,
                      outcomeCol: String): DataFrame = {
    val s = col(scoreCol).cast("long")
    val y = when(col(outcomeCol), 1L).otherwise(0L)
    // null outcomes are EXCLUDED (not coerced to failure) — the same
    // null-dropping convention as every sibling test in this file
    val agg = df.where(col(scoreCol).isNotNull &&
        col(outcomeCol).isNotNull)
      .agg(count_distinct(s).as("k"), count(lit(1)).as("n"),
        sum(y).as("_r"), sum(s * y).as("_sr"), sum(s).as("_sn"),
        sum(s * s).as("_sn2"))
    val nD = D("n")
    val pbar = D("_r") / nD
    val num = D("_sr") - pbar * D("_sn")
    val den = sqrt(pbar * (lit(1.0) - pbar) *
      (D("_sn2") - D("_sn") * D("_sn") / nD))
    agg.select(col("k"), col("n"), col("_r").as("successes"),
      when(col("k") > 1 && den > 0, num / den).as("z"))
  }

  /** Category-mix diversity per group — Shannon H (nats), Pielou
    * evenness H/ln k, and Simpson concentration Σp² (with its inverse,
    * the "effective number of categories"): the corpus-mix health
    * readout next to gini_concentration. Simpson is EXACT
    * (Σc²/n² over BIGINT censuses); H folds category-ordered
    * (StrictMath/DuckDB ln probed bit-identical by gmm1d_em).
    */
  def diversityIndex(df: DataFrame, groupCol: String,
                     catCol: String): DataFrame = {
    val counts = df.where(col(groupCol).isNotNull && col(catCol).isNotNull)
      .groupBy(col(groupCol).as("_g"), col(catCol).cast("string").as("_c"))
      .agg(count(lit(1)).as("_n"))
    val tot = counts.groupBy("_g").agg(sum(col("_n")).as("_t"))
    val agg = counts.join(broadcast(tot), Seq("_g"))
      .withColumn("_term",
        (D("_n") / D("_t")) * log(D("_n") / D("_t")) * lit(-1.0))
      .groupBy("_g")
      .agg(max(col("_t")).as("n"), count(lit(1)).as("k"),
        sum(col("_n") * col("_n")).as("_s2"),
        StatsOps.orderedFoldSum(Seq("_c"), "_term").as("_h"))
    val simpson = D("_s2") / (D("n") * D("n"))
    agg.select(col("_g").as(groupCol), col("n"), col("k"),
      col("_h").as("shannon"),
      when(col("k") > 1, col("_h") / log(D("k"))).as("evenness"),
      simpson.as("simpson"),
      try_divide(lit(1.0), simpson).as("inv_simpson"))
  }

  /** Post-hoc power readout for a two-arm binary experiment — the
    * minimum detectable ABSOLUTE effect at the classic α=0.05
    * two-sided / 80%-power operating point (z literals spelled to
    * full double precision so both engines compare the same IEEE
    * constants):
    *   MDE = (z_{α/2} + z_{power}) · √(p̄(1−p̄)(1/n_a + 1/n_b)).
    * The honest companion to [[StatsOps.twoProportionZ]]: a
    * non-significant test with MDE ≫ the effect you care about is an
    * underpowered experiment, not a negative result.
    */
  def abPower(df: DataFrame, armCol: String, armA: String, armB: String,
              successCol: String,
              zAlpha: Double = 1.959963984540054,
              zPower: Double = 0.8416212335729143): DataFrame = {
    val sCol = col(successCol).cast("long")
    val agg = df.where(col(armCol).isin(armA, armB) &&
        col(successCol).isNotNull)
      .agg(sum(when(col(armCol) === armA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col(armCol) === armB, 1L).otherwise(0L)).as("n_b"),
        sum(sCol).as("_x"))
    val pbar = D("_x") / (D("n_a") + D("n_b"))
    val mde = (lit(zAlpha) + lit(zPower)) *
      sqrt(pbar * (lit(1.0) - pbar) *
        (lit(1.0) / D("n_a") + lit(1.0) / D("n_b")))
    val ok = col("n_a") > 0 && col("n_b") > 0
    agg.select(col("n_a"), col("n_b"),
      when(ok, pbar).as("pooled_rate"), when(ok, mde).as("mde_abs"),
      when(ok, try_divide(mde, pbar)).as("mde_rel"))
  }

  /** Group-sequential A/B monitoring — the always-valid-inference leg
    * of the experimentation surface: the two-proportion z statistic at
    * every interim look against an O'Brien-Fleming-shaped boundary
    *   b(t_k) = C / √t_k,   t_k = (n_a+n_b cumulative at look k) / N,
    * which spends almost no α early (b(0.2) ≈ 4.6·C) and converges to
    * the fixed-horizon critical value at t=1 — the standard defence
    * against the "peek every day, 30% false-positive rate" failure.
    * `obfConstant` is the K-look two-sided critical constant from the
    * published OBF tables (α=0.05: K=1 → 1.960, 2 → 1.977, 3 → 2.004,
    * 4 → 2.024, 5 → 2.040); with information-fraction spacing the same
    * C applies at unequally sized looks.
    *
    * Looks are `lookCol` values (e.g. enrollment day); subjects
    * accumulate across looks. Output: one row per look with cumulative
    * exact-BIGINT censuses, z, the boundary, and the crossing flag.
    * Exactness: per-look increments are one hash aggregate; cumulatives
    * are a window over the LOOK domain (bounded — K interim analyses,
    * the ks_drift whitelist argument); z and boundary are mirrored
    * closed forms over exact counts.
    */
  /** Cumulative per-look arm censuses shared by the sequential
    * monitors ([[groupSequential]], [[msprtTest]]): one fact hash
    * aggregate onto the bounded look domain, then the cumulative
    * window over it (whitelisted: look-domain-sized, never the fact).
    */
  private def lookCensus(df: DataFrame, armCol: String, armA: String,
                         armB: String, successCol: String,
                         lookCol: String): DataFrame = {
    val sCol = col(successCol).cast("long")
    val inc = df.where(col(armCol).isin(armA, armB) &&
        col(successCol).isNotNull && col(lookCol).isNotNull)
      .groupBy(col(lookCol).cast("long").as("look"))
      .agg(sum(when(col(armCol) === armA, 1L).otherwise(0L)).as("_ia"),
        sum(when(col(armCol) === armA, sCol).otherwise(0L)).as("_xa"),
        sum(when(col(armCol) === armB, 1L).otherwise(0L)).as("_ib"),
        sum(when(col(armCol) === armB, sCol).otherwise(0L)).as("_xb"))
    val w = Window.orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wl = Window.orderBy(col("look"))
    inc
      .withColumn("k", row_number().over(wl).cast("long"))
      .withColumn("n_a", sum(col("_ia")).over(w))
      .withColumn("x_a", sum(col("_xa")).over(w))
      .withColumn("n_b", sum(col("_ib")).over(w))
      .withColumn("x_b", sum(col("_xb")).over(w))
  }

  def groupSequential(df: DataFrame, armCol: String, armA: String,
                      armB: String, successCol: String, lookCol: String,
                      obfConstant: Double = 2.04): DataFrame = {
    val censed = lookCensus(df, armCol, armA, armB, successCol, lookCol)
    val tot = censed
      .agg((sum(col("_ia")) + sum(col("_ib"))).as("_nn"))
    val cum = censed.crossJoin(broadcast(tot))
    val pa = D("x_a") / D("n_a")
    val pb = D("x_b") / D("n_b")
    val pp = (D("x_a") + D("x_b")) / (D("n_a") + D("n_b"))
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / D("n_a") + lit(1.0) / D("n_b")))
    val infoFrac = (D("n_a") + D("n_b")) / D("_nn")
    val boundary = lit(obfConstant) / sqrt(infoFrac)
    val ok = col("n_a") > 0 && col("n_b") > 0 && se > 0
    cum.select(col("look"), col("k"), col("n_a"), col("x_a"),
      col("n_b"), col("x_b"),
      infoFrac.as("info_frac"),
      when(ok, (pa - pb) / se).as("z"),
      boundary.as("boundary"),
      when(ok, abs((pa - pb) / se) >= boundary).otherwise(lit(false))
        .as("crossed"))
  }

  /** mSPRT always-valid inference (Johari et al. 2017, "Peeking at
    * A/B tests"): at every look the mixture likelihood ratio against
    * H0: δ = 0 under a N(0, τ²) effect prior has the closed form
    * Λ = sqrt(V/(V+τ²)) · exp(τ²·δ̂²/(2V(V+τ²))) with δ̂ the
    * cumulative rate difference and V its pooled-proportion sampling
    * variance; p_n = min over looks so far of min(1, 1/Λ) is a valid
    * p-value at EVERY stopping time — the peeking-proof companion to
    * [[groupSequential]]'s fixed-boundary monitor (OBF needs the
    * final horizon; mSPRT never does). Same one-hash-aggregate look
    * census; the running minimum is a window MIN over the bounded
    * look domain — selection, not accumulation, so no IEEE ordering
    * concern. Looks with an empty arm carry null Λ and are skipped by
    * the running min (never a spurious rejection).
    */
  def msprtTest(df: DataFrame, armCol: String, armA: String,
                armB: String, successCol: String, lookCol: String,
                tau: Double = 0.1, alpha: Double = 0.05): DataFrame = {
    require(tau > 0, s"mixture sd tau must be positive: $tau")
    val cum = lookCensus(df, armCol, armA, armB, successCol, lookCol)
    val pa = D("x_a") / D("n_a")
    val pb = D("x_b") / D("n_b")
    val pp = (D("x_a") + D("x_b")) / (D("n_a") + D("n_b"))
    val vv = pp * (lit(1.0) - pp) *
      (lit(1.0) / D("n_a") + lit(1.0) / D("n_b"))
    val t2 = lit(tau * tau)
    val lam = sqrt(vv / (vv + t2)) *
      exp(t2 * (pa - pb) * (pa - pb) / (lit(2.0) * vv * (vv + t2)))
    val ok = col("n_a") > 0 && col("n_b") > 0 && vv > 0
    val w = Window.orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum
      .withColumn("_lam", when(ok, lam))
      .withColumn("_cand",
        when(ok, least(lit(1.0), lit(1.0) / col("_lam"))))
      .withColumn("p_always_valid", min(col("_cand")).over(w))
      .select(col("look"), col("k"), col("n_a"), col("x_a"),
        col("n_b"), col("x_b"),
        col("_lam").as("lambda"),
        col("p_always_valid"),
        coalesce(col("p_always_valid") <= lit(alpha), lit(false))
          .as("rejected"))
  }

  /** Mood's median test across k groups: χ² homogeneity of the
    * above-/at-or-below-grand-median split — the crude-but-robust
    * k-group location test (kruskal_wallis is its rank-powered
    * sibling; this one survives arbitrary outliers and needs only the
    * 2×k census). Grand median = exact lower-median rank select on
    * the pooled grid histogram (one global cumulative over the value
    * domain, ks_drift's whitelist argument); cells are exact BIGINTs;
    * each (obs−exp)²/exp term is one mirrored IEEE expression folded
    * group-ordered. dof = k−1.
    */
  def medianTest(df: DataFrame, groupCol: String, valueCol: String,
                 quantDigits: Int = 2): DataFrame = {
    val scale = math.pow(10, quantDigits)
    val vq = floor(col(valueCol).cast("double") * lit(scale) + lit(0.5))
      .cast("long")
    val hist = df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("_g"), vq.as("_v"))
      .agg(count(lit(1)).as("_c"))
    val pooled = hist.groupBy("_v").agg(sum(col("_c")).as("_pc"))
    val w = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = pooled.agg(sum(col("_pc")).as("_nn"))
    val med = pooled.withColumn("_cum", sum(col("_pc")).over(w))
      .crossJoin(broadcast(tot))
      .where(col("_cum") >= expr("(_nn + 1) div 2"))
      .agg(min(col("_v")).as("_med"))
    val cells = hist.crossJoin(broadcast(med))
      .groupBy("_g")
      .agg(sum(when(col("_v") > col("_med"), col("_c")).otherwise(0L))
          .as("_a"),
        sum(when(col("_v") <= col("_med"), col("_c")).otherwise(0L))
          .as("_b"))
    val margins = cells.agg(sum(col("_a")).as("_ta"),
      sum(col("_b")).as("_tb"))
    val nD = D("_ta") + D("_tb")
    val rowT = D("_a") + D("_b")
    val ea = rowT * D("_ta") / nD
    val eb = rowT * D("_tb") / nD
    val term = (D("_a") - ea) * (D("_a") - ea) / ea +
      (D("_b") - eb) * (D("_b") - eb) / eb
    // a zero margin (every value on one side of the median — e.g. a
    // single-row input) makes an expected cell 0: the statistic is
    // undefined, so emit null rather than an ANSI divide-by-zero; the
    // term guard keeps the fold total (0.0) so the final when decides
    val marginOk = col("_ta") > 0 && col("_tb") > 0
    cells.crossJoin(broadcast(margins))
      .withColumn("_term", when(marginOk, term).otherwise(lit(0.0)))
      .agg(count(lit(1)).as("k"), sum(col("_a") + col("_b")).as("n"),
        max(col("_ta")).as("_ta2"), max(col("_tb")).as("_tb2"),
        StatsOps.orderedFoldSum(Seq("_g"), "_term").as("_chi2"))
      .select(col("k"), col("n"), (col("k") - 1).as("dof"),
        when(col("k") > 1 && col("_ta2") > 0 && col("_tb2") > 0,
          col("_chi2")).as("chi2"))
  }

  /** Maximum mean discrepancy between two cohorts under the
    * degree-2 polynomial kernel k(a,b) = (1 + ab/γ)² — which expands
    * exactly to first/second moment matching:
    *   MMD² = (2/γ)(μ₁ᴬ − μ₁ᴮ)² + (1/γ²)(μ₂ᴬ − μ₂ᴮ)²
    * (the V-statistic form; no pair enumeration, ever). This is the
    * honest closed-form face of kernel MMD at this kernel: moments
    * come from the exact 10^-quantDigits grid BIGINTs, so the
    * statistic is one short mirrored IEEE expression. γ sets the
    * value scale the kernel saturates at.
    */
  def mmdDrift(df: DataFrame, cohortCol: String, cohortA: String,
               cohortB: String, valueCol: String,
               gamma: Double = 100.0,
               quantDigits: Int = 4): DataFrame = {
    val scale = math.pow(10, quantDigits)
    val vq = floor(col(valueCol).cast("double") * lit(scale) + lit(0.5))
      .cast("long")
    def side(c: String, suf: String) = Seq(
      sum(when(col(cohortCol) === c, 1L).otherwise(0L)).as(s"n_$suf"),
      sum(when(col(cohortCol) === c, vq).otherwise(0L)).as(s"_s$suf"),
      sum(when(col(cohortCol) === c, vq * vq).otherwise(0L))
        .as(s"_ss$suf"))
    val aggs = side(cohortA, "a") ++ side(cohortB, "b")
    val agg = df.where(col(cohortCol).isin(cohortA, cohortB) &&
        col(valueCol).isNotNull)
      .agg(aggs.head, aggs.tail: _*)
    def m1(s: String, n: String) = D(s) / lit(scale) / D(n)
    def m2(ss: String, n: String) =
      D(ss) / lit(scale * scale) / D(n)
    val d1 = m1("_sa", "n_a") - m1("_sb", "n_b")
    val d2 = m2("_ssa", "n_a") - m2("_ssb", "n_b")
    val mmd2 = lit(2.0) / lit(gamma) * (d1 * d1) +
      d2 * d2 / (lit(gamma) * lit(gamma))
    agg.select(col("n_a"), col("n_b"),
      when(col("n_a") > 0 && col("n_b") > 0, mmd2).as("mmd2"))
  }

  /** Chow structural-break test at a KNOWN break window τ per series:
    * pooled straight-line fit vs separate fits left/right of τ,
    *   F = ((SSE_p − SSE_1 − SSE_2)/2) / ((SSE_1 + SSE_2)/(n − 4)).
    * The "did the regime change at the deploy" companion to
    * changepoint_split (which SEARCHES for the break; Chow tests a
    * hypothesized one). Each segment's OLS SSE is the centered closed
    * form Syy − Sxy²/Sxx over exact BIGINT moment sums, and both
    * segments accumulate in ONE hash aggregate over the window domain
    * via conditional sums. Degenerate segments (< 3 windows or zero
    * x-variance) yield null F.
    */
  def chowTest(df: DataFrame, groupCol: String, windowCol: String,
               breakWin: Long): DataFrame = {
    val series = seriesCounts(df, groupCol, windowCol)
    def seg(pred: Column, suf: String) = Seq(
      sum(when(pred, 1L).otherwise(0L)).as(s"n_$suf"),
      sum(when(pred, col("_h")).otherwise(0L)).as(s"_sx$suf"),
      sum(when(pred, col("_y")).otherwise(0L)).as(s"_sy$suf"),
      sum(when(pred, col("_h") * col("_h")).otherwise(0L))
        .as(s"_sxx$suf"),
      sum(when(pred, col("_h") * col("_y")).otherwise(0L))
        .as(s"_sxy$suf"),
      sum(when(pred, col("_y") * col("_y")).otherwise(0L))
        .as(s"_syy$suf"))
    val aggs = seg(col("_h") < breakWin, "1") ++
      seg(col("_h") >= breakWin, "2")
    val agg = series.groupBy(col("_g")).agg(aggs.head, aggs.tail: _*)
    def sse(n: Column, sx: Column, sy: Column, sxx: Column,
            sxy: Column, syy: Column): Column = {
      val nD = D(n)
      val cxx = D(sxx) - D(sx) * D(sx) / nD
      val cxy = D(sxy) - D(sx) * D(sy) / nD
      val cyy = D(syy) - D(sy) * D(sy) / nD
      when(n > 2 && cxx > 0, cyy - cxy * cxy / cxx)
    }
    def c(s: String) = col(s)
    val sse1 = sse(c("n_1"), c("_sx1"), c("_sy1"), c("_sxx1"),
      c("_sxy1"), c("_syy1"))
    val sse2 = sse(c("n_2"), c("_sx2"), c("_sy2"), c("_sxx2"),
      c("_sxy2"), c("_syy2"))
    val sseP = sse(c("n_1") + c("n_2"), c("_sx1") + c("_sx2"),
      c("_sy1") + c("_sy2"), c("_sxx1") + c("_sxx2"),
      c("_sxy1") + c("_sxy2"), c("_syy1") + c("_syy2"))
    val nD = D(c("n_1") + c("n_2"))
    val rss = sse1 + sse2
    val f = when(c("n_1") + c("n_2") > 4 && rss > 0,
      (sseP - rss) / 2 / (rss / (nD - 4)))
    agg.select(col("_g").as(groupCol),
      (c("n_1") + c("n_2")).as("n"), c("n_1"), c("n_2"),
      lit(breakWin).as("break_win"), sseP.as("sse_pooled"),
      rss.as("sse_split"), f.as("f"))
  }

  /** TOST equivalence test (two one-sided tests) for two cohorts'
    * means under an absolute margin ±δ — the test that can CONFIRM
    * "no meaningful difference" (a non-significant welch_t cannot):
    * both z_lower = (diff + δ)/se and z_upper = (δ − diff)/se must
    * clear z_{α} (one-sided 0.05 literal spelled to full double
    * precision). Welch's unequal-variance se over exact grid moments.
    */
  def tostEquivalence(df: DataFrame, cohortCol: String, cohortA: String,
                      cohortB: String, valueCol: String, delta: Double,
                      quantDigits: Int = 4,
                      zCrit: Double = 1.6448536269514722): DataFrame = {
    val scale = math.pow(10, quantDigits)
    val vq = floor(col(valueCol).cast("double") * lit(scale) + lit(0.5))
      .cast("long")
    def side(cv: String, suf: String) = Seq(
      sum(when(col(cohortCol) === cv, 1L).otherwise(0L)).as(s"n_$suf"),
      sum(when(col(cohortCol) === cv, vq).otherwise(0L)).as(s"_s$suf"),
      sum(when(col(cohortCol) === cv, vq * vq).otherwise(0L))
        .as(s"_ss$suf"))
    val aggs = side(cohortA, "a") ++ side(cohortB, "b")
    val agg = df.where(col(cohortCol).isin(cohortA, cohortB) &&
        col(valueCol).isNotNull)
      .agg(aggs.head, aggs.tail: _*)
    def mean(s: String, n: String) =
      when(col(n) > 0, D(s) / lit(scale) / D(n))
    def varS(ss: String, s: String, n: String) =
      when(col(n) > 1,
        (D(ss) - D(s) * D(s) / D(n)) / lit(scale * scale) / (D(n) - 1))
    val se = sqrt(varS("_ssa", "_sa", "n_a") / D("n_a") +
      varS("_ssb", "_sb", "n_b") / D("n_b"))
    val diff = mean("_sa", "n_a") - mean("_sb", "n_b")
    val zLo = (diff + lit(delta)) / se
    val zHi = (lit(delta) - diff) / se
    val ok = col("n_a") > 1 && col("n_b") > 1 && se > 0
    agg.select(col("n_a"), col("n_b"), when(ok, diff).as("diff"),
      when(ok, se).as("se"), when(ok, zLo).as("z_lower"),
      when(ok, zHi).as("z_upper"),
      when(ok, zLo > zCrit && zHi > zCrit).as("equivalent"))
  }

  // ------------------------------------------------- series diagnostics

  /** Per-series (group × window) integer count table — the shared
    * first stage of every series diagnostic below (one fact hash
    * aggregate; everything after is window-domain-bounded).
    */
  private def seriesCounts(df: DataFrame, groupCol: String,
                           windowCol: String): DataFrame =
    df.where(col(groupCol).isNotNull && col(windowCol).isNotNull)
      .groupBy(col(groupCol).as("_g"), col(windowCol).as("_h"))
      .agg(count(lit(1)).as("_y"))

  /** AR(1) Yule-Walker fit per series: φ = c₁/c₀ over the textbook
    * autocovariances (full-series mean, 1/T normalization), plus the
    * innovation variance c₀(1 − φ²). All moment sums are exact
    * BIGINTs off the window domain; the lag pairing is one lead over
    * the series-partitioned window order.
    */
  def ar1Fit(df: DataFrame, groupCol: String,
             windowCol: String): DataFrame = {
    val series = seriesCounts(df, groupCol, windowCol)
    val w = Window.partitionBy(col("_g")).orderBy(col("_h"))
    val agg = series
      .withColumn("_y1", lead(col("_y"), 1).over(w))
      .groupBy("_g")
      .agg(count(lit(1)).as("t"), sum(col("_y")).as("_s"),
        sum(col("_y") * col("_y")).as("_ss"),
        sum(col("_y") * col("_y1")).as("_s1"),
        sum(when(col("_y1").isNotNull, col("_y"))).as("_sh"),
        sum(col("_y1")).as("_st"),
        count(col("_y1")).as("_c1"))
    val tD = D("t")
    val yb = D("_s") / tD
    val c0 = D("_ss") / tD - yb * yb
    val c1 = (D("_s1") - yb * (D("_sh") + D("_st")) +
      D("_c1") * yb * yb) / tD
    val phi = try_divide(c1, c0)
    agg.select(col("_g").as(groupCol), col("t"), yb.as("mean"),
      phi.as("phi"),
      (c0 * (lit(1.0) - phi * phi)).as("innov_var"))
  }

  /** Ljung-Box portmanteau whiteness test per series, composed on
    * [[StatsOps.autocorrelation]] over the window-domain counts:
    * Q = T(T+2) Σ_{k≤h} ρ_k²/(T−k). The ρ fold runs lag-ordered.
    * Lags whose ACF is null (series shorter than the lag, or zero
    * variance) are EXCLUDED from the sum, and dof reports the count
    * of lags actually summed — a short series yields a valid Q over
    * its computable lags rather than an all-null row; a series with
    * NO computable lag drops from the output.
    */
  def ljungBox(df: DataFrame, groupCol: String, windowCol: String,
               maxLag: Int = 6): DataFrame = {
    val series = seriesCounts(df, groupCol, windowCol)
    val acf = StatsOps.autocorrelation(series, Seq("_g"), "_h", "_h",
      "_y", maxLag)
    val terms = acf.where(col("acf").isNotNull).withColumn("_term",
      col("acf") * col("acf") / D("n_pairs"))
    terms.groupBy(col("_g"))
      .agg(max(col("n")).as("t"), count(lit(1)).as("dof"),
        StatsOps.orderedFoldSum(Seq("lag"), "_term").as("_sq"))
      .select(col("_g").as(groupCol), col("t"), col("dof"),
        (D("t") * (D("t") + 2) * col("_sq")).as("q"))
  }

  /** Dominant period per series: the lag k in [2, maxLag] with the
    * largest ACF (Pearson form shared with [[ljungBox]]); determinism
    * from the (acf desc, lag asc) rank over the lag domain — both
    * engines compare identical IEEE doubles.
    */
  def dominantPeriod(df: DataFrame, groupCol: String, windowCol: String,
                     maxLag: Int = 24): DataFrame = {
    val series = seriesCounts(df, groupCol, windowCol)
    val acf = StatsOps.autocorrelation(series, Seq("_g"), "_h", "_h",
      "_y", maxLag)
    val rk = Window.partitionBy(col("_g"))
      .orderBy(col("acf").desc, col("lag"))
    acf.where(col("lag") >= 2 && col("acf").isNotNull)
      .withColumn("_r", row_number().over(rk))
      .where(col("_r") === 1)
      .select(col("_g").as(groupCol), col("n"),
        col("lag").cast("long").as("period"), col("acf"))
  }

  /** Lead/lag cross-correlation between two cohorts' per-window
    * counts: Pearson r over the PAIRED windows (t, t+lag) for each
    * lag in [−maxLag, maxLag]. The pairing is a self-join of the
    * window DOMAIN against its lag-shifted self (domain × lags,
    * never the fact); all sums exact BIGINTs.
    */
  def crossCorrelation(df: DataFrame, cohortCol: String, cohortA: String,
                       cohortB: String, windowCol: String,
                       maxLag: Int = 6): DataFrame = {
    val dom = df.where(col(cohortCol).isin(cohortA, cohortB) &&
        col(windowCol).isNotNull)
      .groupBy(col(windowCol).as("_h"))
      .agg(sum(when(col(cohortCol) === cohortA, 1L).otherwise(0L))
          .as("_xa"),
        sum(when(col(cohortCol) === cohortB, 1L).otherwise(0L))
          .as("_xb"))
    val lags = df.sparkSession.range(-maxLag.toLong, maxLag + 1L)
      .select(col("id").as("lag"))
    val pairs = dom.as("t").crossJoin(broadcast(lags))
      .join(dom.as("u"), col("u._h") === col("t._h") + col("lag"))
      .select(col("lag"), col("t._xa").as("_a"), col("u._xb").as("_b"))
    val agg = pairs.groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"), sum(col("_a")).as("_sa"),
        sum(col("_b")).as("_sb"), sum(col("_a") * col("_a")).as("_saa"),
        sum(col("_b") * col("_b")).as("_sbb"),
        sum(col("_a") * col("_b")).as("_sab"))
    val nD = D("n_pairs")
    val num = D("_sab") - D("_sa") * D("_sb") / nD
    val den = sqrt((D("_saa") - D("_sa") * D("_sa") / nD) *
      (D("_sbb") - D("_sb") * D("_sb") / nD))
    agg.select(col("lag"), col("n_pairs"),
      try_divide(num, den).as("ccf"))
  }

  /** Page-Hinkley drift detector per series — the sequential mean-
    * shift monitor (CUSUM's running-mean sibling): one time-ordered
    * fold over the window-domain counts carrying
    * (n, Σy, PH, min PH, max excess, alarm windows); a window alarms
    * when PH − min PH > λ. The fold is the same domain-bounded
    * collect_list recurrence as holtLinear (the oracle replays it as
    * a LIST-state reduce — struct states rebind mid-struct in DuckDB).
    */
  def pageHinkley(df: DataFrame, groupCol: String, windowCol: String,
                  delta: Double = 0.1,
                  lambda: Double = 10.0): DataFrame = {
    val d = delta.toString
    val l = lambda.toString
    val series = seriesCounts(df, groupCol, windowCol)
    series.groupBy(col("_g"))
      .agg(sort_array(collect_list(struct(col("_h"),
        col("_y").cast("double").as("_y")))).as("arr"))
      .withColumn("_st", expr(
        s"""aggregate(arr,
           |  named_struct('n', cast(0.0 as double),
           |    's', cast(0.0 as double), 'ph', cast(0.0 as double),
           |    'mn', cast(0.0 as double), 'mx', cast(0.0 as double),
           |    'al', cast(0.0 as double)),
           |  (acc, x) -> named_struct(
           |    'n', acc.n + 1.0,
           |    's', acc.s + x._y,
           |    'ph', acc.ph + (x._y - (acc.s + x._y) / (acc.n + 1.0)
           |      - cast($d as double)),
           |    'mn', least(acc.mn, acc.ph + (x._y
           |      - (acc.s + x._y) / (acc.n + 1.0)
           |      - cast($d as double))),
           |    'mx', greatest(acc.mx, acc.ph + (x._y
           |      - (acc.s + x._y) / (acc.n + 1.0)
           |      - cast($d as double)) - acc.mn),
           |    'al', acc.al + if(acc.ph + (x._y
           |      - (acc.s + x._y) / (acc.n + 1.0)
           |      - cast($d as double)) - acc.mn
           |      > cast($l as double), 1.0, 0.0)))""".stripMargin))
      .select(col("_g").as(groupCol),
        size(col("arr")).cast("long").as("n_windows"),
        col("_st.ph").as("ph_final"), col("_st.mx").as("max_excess"),
        col("_st.al").cast("long").as("alarm_windows"))
  }

  /** Granger-lite causality F per direction x→y on two cohorts'
    * per-window counts: restricted model y_t ~ y_{t−1} vs full model
    * y_t ~ y_{t−1} + x_{t−1}, both as closed-form centered OLS over
    * exact BIGINT moment sums (the 2-predictor solve is the explicit
    * 2×2 inverse), F = (RSS_r − RSS_f)/(RSS_f/(T−3)). The lag shift
    * is one lag window over the GLOBAL window domain (grid-bounded,
    * whitelisted).
    */
  def grangerLite(df: DataFrame, cohortCol: String, causeCohort: String,
                  effectCohort: String,
                  windowCol: String): DataFrame = {
    val dom = df.where(col(cohortCol).isin(causeCohort, effectCohort) &&
        col(windowCol).isNotNull)
      .groupBy(col(windowCol).as("_h"))
      .agg(sum(when(col(cohortCol) === causeCohort, 1L).otherwise(0L))
          .as("_x"),
        sum(when(col(cohortCol) === effectCohort, 1L).otherwise(0L))
          .as("_yv"))
    val w = Window.orderBy(col("_h"))
    val rows = dom
      .withColumn("_p", lag(col("_yv"), 1).over(w))
      .withColumn("_q", lag(col("_x"), 1).over(w))
      .where(col("_p").isNotNull)
    val agg = rows.agg(count(lit(1)).as("t"),
      sum(col("_yv")).as("_sy"), sum(col("_p")).as("_sp"),
      sum(col("_q")).as("_sq"),
      sum(col("_yv") * col("_yv")).as("_syy"),
      sum(col("_p") * col("_p")).as("_spp"),
      sum(col("_q") * col("_q")).as("_sqq"),
      sum(col("_p") * col("_q")).as("_spq"),
      sum(col("_p") * col("_yv")).as("_spy"),
      sum(col("_q") * col("_yv")).as("_sqy"))
    val tD = D("t")
    def cen(sab: String, sa: String, sb: String) =
      D(sab) - D(sa) * D(sb) / tD
    val spp = cen("_spp", "_sp", "_sp")
    val sqq = cen("_sqq", "_sq", "_sq")
    val spq = cen("_spq", "_sp", "_sq")
    val spy = cen("_spy", "_sp", "_sy")
    val sqy = cen("_sqy", "_sq", "_sy")
    val syy = cen("_syy", "_sy", "_sy")
    val rssR = syy - when(spp > 0, spy * spy / spp).otherwise(lit(0.0))
    val det = spp * sqq - spq * spq
    // try_divide: a singular normal matrix (constant predictor) must
    // yield null, not an ANSI divide-by-zero
    val bp = try_divide(spy * sqq - sqy * spq, det)
    val bq = try_divide(sqy * spp - spy * spq, det)
    val rssF = syy - bp * spy - bq * sqy
    val ok = col("t") > 3 && det > 0 && rssF > 0
    agg.select(col("t"),
      when(ok, bq).as("beta_cause"),
      when(ok, rssR).as("rss_restricted"),
      when(ok, rssF).as("rss_full"),
      when(ok, (rssR - rssF) / (rssF / (tD - 3))).as("f"))
  }

  /** CUPED variance reduction (Deng et al. 2013, "Improving the
    * sensitivity of online controlled experiments"): adjust each
    * unit's experiment metric `y` by its PRE-experiment covariate `x`
    * — Y' = Y − θ(X − X̄) with θ = cov(X,Y)/var(X) — which shrinks
    * metric variance by exactly ρ² while leaving the treatment-effect
    * estimate unbiased (X predates assignment, so E[X|arm] is equal
    * across arms). The workhorse sensitivity lever of industrial A/B
    * platforms: the same experiment resolves with ~1/(1−ρ²) fewer
    * units.
    *
    * Input: one row per unit with integer-valued `x`/`y` (counts) and
    * the arm label. ONE hash aggregate produces every global and
    * per-arm moment as an exact BIGINT (order-free); θ, the raw and
    * adjusted arm means, their difference, and the variance-reduction
    * ratio ρ² = cov²/(var·var) are closed-form doubles off those
    * integers — engine-exact after output quantization. A zero-
    * variance covariate degrades to θ = 0 (no adjustment), never /0.
    */
  def cupedAdjust(perUnit: DataFrame, armCol: String, armA: Any,
                  armB: Any, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    // second-moment sums accumulate in decimal(38,0), NOT BIGINT: at
    // ~10^10 units a per-unit product of ~10^9 clears 2^63 (the
    // wasserstein_drift overflow class) — widen BEFORE the product so
    // the product itself cannot overflow either
    val xD = x.cast("decimal(19,0)")
    val yD = y.cast("decimal(19,0)")
    val isA = col(armCol) === lit(armA)
    val isB = col(armCol) === lit(armB)
    val agg = perUnit.where(isA || isB).agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(xD * yD).as("sxy"), sum(xD * xD).as("sxx"),
      sum(yD * yD).as("syy"),
      sum(when(isA, 1L).otherwise(0L)).as("n_a"),
      sum(when(isA, x).otherwise(0L)).as("sxa"),
      sum(when(isA, y).otherwise(0L)).as("sya"),
      sum(when(isB, 1L).otherwise(0L)).as("n_b"),
      sum(when(isB, x).otherwise(0L)).as("sxb"),
      sum(when(isB, y).otherwise(0L)).as("syb"))
    val nD = D("n")
    val covXY = nD * D("sxy") - D("sx") * D("sy")
    val varX = nD * D("sxx") - D("sx") * D("sx")
    val varY = nD * D("syy") - D("sy") * D("sy")
    val theta = when(varX > 0, covXY / varX).otherwise(lit(0.0))
    // an empty arm has no mean: guard the divisions (ANSI /0) and
    // report null differences rather than a crash or an Inf
    val bothArms = col("n_a") > 0 && col("n_b") > 0
    val diffRaw = D("sya") / D("n_a") - D("syb") / D("n_b")
    val diffCuped =
      diffRaw - theta * (D("sxa") / D("n_a") - D("sxb") / D("n_b"))
    val varRed = when(varX > 0 && varY > 0,
      covXY * covXY / (varX * varY)).otherwise(lit(0.0))
    agg.select(col("n_a"), col("n_b"),
      theta.as("theta"),
      when(bothArms, diffRaw).as("diff_raw"),
      when(bothArms, diffCuped).as("diff_cuped"),
      varRed.as("var_reduction"))
  }
}
