package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear-classifier training (beyond-parity: the
  * fastText-style quality/language filter every web-scale pretraining
  * pipeline runs between heuristic gating and tokenization — cf.
  * CCNet / GPT-3 WebText quality classifiers).
  *
  * Full-batch gradient-descent logistic regression as ONE hash
  * aggregate per iteration: the gradient is d+1 `sum()` columns
  * (partial/final aggregation, map-side combined — no shuffle of fact
  * rows, no per-row state), and the only driver state is the
  * (d+1)-double weight vector. k iterations = k scans at 100 TB, the
  * same access pattern as MLlib's iterative optimizers; at that scale
  * the input would be the (tiny) featurized projection of the corpus,
  * which Catalyst prunes to d+2 columns off the parquet scan.
  *
  * Determinism: weights are quantized to the 1e-9 grid after every
  * step, in the same arithmetic order on both engines, so the whole
  * trajectory is engine-exact and oracle-replayable (the last-ulp
  * noise of float sum order and libm exp stays ~1e-13, far inside the
  * grid — the round-4 CLEAN-oracle technique).
  */
object ClassifierOps {

  /** floor(x*1e9 + 0.5)/1e9 — the per-iteration weight grid. */
  private def q9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  /** z = w(0)*f0 + w(1)*f1 + ... + bias, built left-associated so the
    * SQL mirror `w1*f1 + w2*f2 + ... + b` is bit-identical.
    */
  private def margin(features: Seq[String], w: Array[Double]): Column = {
    val terms = features.zipWithIndex.map { case (f, j) => col(f) * lit(w(j)) }
    terms.reduceLeft(_ + _) + lit(w.last)
  }

  /** Train on `features` (double columns) against a 0/1 double
    * `label`; returns d weights + bias (last). lr and iters are part
    * of the model's identity — mirror them in any oracle.
    */
  def trainLogistic(df: DataFrame, features: Seq[String], label: String,
                    iters: Int = 5, lr: Double = 0.5): Array[Double] = {
    require(features.nonEmpty && iters >= 0)
    val d = features.size
    var w = Array.fill(d + 1)(0.0)
    for (_ <- 1 to iters) {
      val sig = lit(1.0) / (lit(1.0) + exp(-margin(features, w)))
      val err = sig - col(label)
      val gradCols = features.map(f => sum(err * col(f))) :+ sum(err)
      val row = df.agg(count(lit(1)).as("_n"),
        gradCols.zipWithIndex.map { case (c, j) => c.as(s"_g$j") }: _*)
        .collect()(0)
      require(row.getLong(0) > 0,
        "trainLogistic needs a non-empty corpus (0 rows after filtering)")
      val n = row.getLong(0).toDouble
      w = Array.tabulate(d + 1)(j => q9(w(j) - lr * row.getDouble(j + 1) / n))
    }
    w
  }

  /** Score rows with a trained model: sigmoid(margin), pure codegen
    * projection (weights are literals in the plan — broadcast-free,
    * shuffle-free, scan-shaped at any scale).
    */
  def scoreLogistic(df: DataFrame, features: Seq[String],
                    w: Array[Double], out: String = "score"): DataFrame = {
    require(w.length == features.size + 1,
      s"got ${w.length} weights for ${features.size} features + bias")
    df.withColumn(out, lit(1.0) / (lit(1.0) + exp(-margin(features, w))))
  }

  /** Exact ROC AUC of a scorer against a 0/1 label — the
    * threshold-free quality readout of the classifier family (the
    * confusion matrix and calibration curve pin ONE threshold; AUC
    * ranks the whole score distribution).
    *
    * AUC is the Mann-Whitney U statistic normalized by n_pos·n_neg
    * (ties counted half), computed over the DISTINCT-score table, not
    * the fact: one hash aggregate collapses the corpus to per-score
    * (positives, negatives) counts, then a cumulative window over that
    * score-bounded table prices every pos/neg comparison in closed
    * form. The doubled U stays an exact BIGINT (a positive at score s
    * beats the `cum_neg - neg_s` negatives strictly below twice and
    * the `neg_s` tied ones once), so the single final division is the
    * only float op. Callers should pass an already-quantized score so
    * both engines group on the same grid points.
    *
    * Plan shape: one fact-scan hash aggregate (map-side combined), one
    * window over the distinct-score domain (bounded by the score
    * quantization grid, NOT the fact — whitelisted in the plan sweep
    * with exactly this cardinality argument), one 1-row reduce. A
    * degenerate corpus (no positives or no negatives) yields null AUC
    * via try_divide, never an ANSI throw.
    */
  def rocAuc(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pos = col(labelCol).cast("long") === 1L
    val counts = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("_s"))
      .agg(sum(when(pos, 1L).otherwise(0L)).as("_p"),
        sum(when(pos, 0L).otherwise(1L)).as("_n"))
    val w = Window.orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("_cumn", sum(col("_n")).over(w))
      .agg(sum(col("_p")).as("n_pos"), sum(col("_n")).as("n_neg"),
        sum(col("_p") * (col("_cumn") * 2L - col("_n"))).as("_u2"))
      .select(col("n_pos"), col("n_neg"),
        try_divide(col("_u2").cast("double"),
          lit(2.0) * col("n_pos").cast("double") *
            col("n_neg").cast("double")).as("auc"))
  }

  /** Per-group fairness audit of a binary classifier — the release
    * gate that catches a model performing differently across cohorts
    * (languages, sources, demographics): for every group the exact
    * selection rate P(pred=1), TPR and FPR, plus the three max−min
    * GAPS across groups (demographic-parity gap on selection rate,
    * equalized-odds gaps on TPR/FPR) broadcast onto every row so one
    * table answers both "how does each group fare" and "how unequal
    * is the worst spread".
    *
    * Exactness: every rate is one division of exact conditional
    * BIGINT sums (try_divide → null for a group missing a class, and
    * null rates are EXCLUDED from the gap extrema rather than
    * polluting them). Plan: one hash aggregate to the group domain,
    * one 1-row gap fold, one broadcast join — nothing fact-sized
    * past the scan.
    */
  def fairnessReport(df: DataFrame, groupCol: String, labelCol: String,
                     predCol: String): DataFrame = {
    val y = col(labelCol).cast("long")
    val p = col(predCol).cast("long")
    val g = df
      .where(col(labelCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(p === 1L, 1L).otherwise(0L)).as("_sel"),
        sum(when(y === 1L && p === 1L, 1L).otherwise(0L)).as("_tp"),
        sum(when(y === 1L, 1L).otherwise(0L)).as("_pos"),
        sum(when(y === 0L && p === 1L, 1L).otherwise(0L)).as("_fp"),
        sum(when(y === 0L, 1L).otherwise(0L)).as("_neg"))
      .select(col(groupCol), col("n"),
        try_divide(col("_sel").cast("double"), col("n").cast("double"))
          .as("sel_rate"),
        try_divide(col("_tp").cast("double"), col("_pos").cast("double"))
          .as("tpr"),
        try_divide(col("_fp").cast("double"), col("_neg").cast("double"))
          .as("fpr"))
    val gaps = g.agg(
      (max(col("sel_rate")) - min(col("sel_rate"))).as("sel_rate_gap"),
      (max(col("tpr")) - min(col("tpr"))).as("tpr_gap"),
      (max(col("fpr")) - min(col("fpr"))).as("fpr_gap"))
    g.crossJoin(broadcast(gaps))
  }

  /** Per-group exact ROC AUC — [[rocAuc]] partitioned by a cohort
    * column, the ranking-quality half of the fairness audit (a model
    * can have equal rates yet rank one cohort's positives worse).
    * Same doubled-U construction per group: counts per (group,
    * distinct score), cumulative window over each group's score
    * DOMAIN, exact BIGINT U; plus the max−min AUC gap broadcast onto
    * every row.
    */
  def aucByGroup(df: DataFrame, groupCol: String, labelCol: String,
                 scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pos = col(labelCol).cast("long") === 1L
    val counts = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(groupCol), col(scoreCol).as("_s"))
      .agg(sum(when(pos, 1L).otherwise(0L)).as("_p"),
        sum(when(pos, 0L).otherwise(1L)).as("_n"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perGroup = counts
      .withColumn("_cumn", sum(col("_n")).over(w))
      .groupBy(col(groupCol))
      .agg(sum(col("_p")).as("n_pos"), sum(col("_n")).as("n_neg"),
        sum(col("_p") * (col("_cumn") * 2L - col("_n"))).as("_u2"))
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        try_divide(col("_u2").cast("double"),
          lit(2.0) * col("n_pos").cast("double") *
            col("n_neg").cast("double")).as("auc"))
    val gap = perGroup.agg((max(col("auc")) - min(col("auc")))
      .as("auc_gap"))
    perGroup.crossJoin(broadcast(gap))
  }

  /** Cumulative-gains / lift curve — the targeting readout of the
    * classifier family (rank the corpus by score, take the top X%:
    * what share of the positives did you capture, and how much better
    * than random is each slice?): completes the eval suite beside the
    * confusion matrix (one threshold), calibration curve (probability
    * quality), and AUC (whole-ranking order).
    *
    * Scale-sound bucketing: a textbook ntile(k) over the corpus is a
    * GLOBAL SORT of the fact and splits tied scores arbitrarily.
    * Instead the fact collapses to the distinct-quantized-score table
    * (one hash aggregate), and every row of a score lands in the
    * bucket of that score's cumulative rank — floor(cumBefore·k/n) —
    * so ties stay together, buckets are deterministic, and the only
    * windows walk the score-grid domain (whitelisted, like
    * [[rocAuc]]). Callers pass an already-quantized score.
    *
    * All counts exact BIGINTs; gain and lift are single closed-form
    * divisions (lift = n_pos·n_total / (n·pos_total), null via
    * try_divide when the corpus has no positives). Buckets with no
    * score mass (heavy ties) simply don't appear.
    */
  def liftCurve(df: DataFrame, labelCol: String, scoreCol: String,
                buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 2, "liftCurve needs at least 2 buckets")
    val pos = col(labelCol).cast("long") === 1L
    val counts = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("_s"))
      .agg(count(lit(1)).as("_n"),
        sum(when(pos, 1L).otherwise(0L)).as("_p"))
    val w = Window.orderBy(col("_s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = counts.agg(sum(col("_n")).as("_tn"), sum(col("_p")).as("_tp"))
    val bucketed = counts
      .withColumn("_cum", sum(col("_n")).over(w))
      .crossJoin(broadcast(tot))
      // integer division on BOTH engines (Spark `div`, DuckDB `//`):
      // a double-division-then-cast would round on one engine and
      // truncate on the other at exact bucket boundaries
      .withColumn("bucket",
        expr(s"((_cum - _n) * $buckets) div _tn"))
      .groupBy(col("bucket"), col("_tn"), col("_tp"))
      .agg(sum(col("_n")).as("n"), sum(col("_p")).as("n_pos"))
    val wb = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn("_cump", sum(col("n_pos")).over(wb))
      .select(col("bucket"), col("n"), col("n_pos"),
        try_divide(col("_cump").cast("double"), col("_tp").cast("double"))
          .as("gain"),
        try_divide(
          (col("n_pos") * col("_tn")).cast("double"),
          (col("n") * col("_tp")).cast("double")).as("lift"))
  }

  /** Cohen's kappa — chance-corrected agreement between two
    * categorical raters (heuristic gate vs learned classifier, two
    * annotator pools, old vs new model): the governance number that
    * says whether a cheap labeler can stand in for an expensive one.
    *
    * kappa = (p_o - p_e) / (1 - p_e) with p_o the observed agreement
    * and p_e the chance agreement from the marginals. Every input is
    * an exact BIGINT cell count, and the closed form clears
    * denominators — kappa = (n·n_agree - Σ_k row_k·col_k) /
    * (n² - Σ_k row_k·col_k) — so ONE division is the only float op.
    * Multi-class by construction; a degenerate table where a single
    * class carries all mass on both sides (p_e = 1) yields null via
    * try_divide.
    *
    * Plan shape: one fact-scan hash aggregate to the (a, b) confusion
    * cells (class²-bounded), marginals re-aggregated from the CELLS
    * table — never a second fact pass — and combined through
    * broadcast joins of 1-row/class-bounded frames.
    */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("_a"), col(bCol).as("_b"))
      .agg(count(lit(1)).as("_c"))
    val totals = cells.agg(sum(col("_c")).as("n"),
      sum(when(col("_a") === col("_b"), col("_c")).otherwise(0L))
        .as("n_agree"))
    val margins = cells.groupBy(col("_a").as("_k"))
      .agg(sum(col("_c")).as("_ra"))
      .join(cells.groupBy(col("_b").as("_k")).agg(sum(col("_c")).as("_rb")),
        Seq("_k"))
      .agg(coalesce(sum(col("_ra") * col("_rb")), lit(0L)).as("_pe2"))
    totals.crossJoin(broadcast(margins))
      .select(col("n"), col("n_agree"),
        try_divide(
          (col("n") * col("n_agree") - col("_pe2")).cast("double"),
          (col("n") * col("n") - col("_pe2")).cast("double")).as("kappa"))
  }

  /** Matthews correlation coefficient + balanced accuracy + Youden's J
    * for a BINARY prediction column against a binary truth column —
    * the chance-robust single-number classifier summaries that, unlike
    * raw accuracy, stay honest under class imbalance (the usual state
    * of a quality gate at corpus scale, where "keep" dominates).
    * Both columns are 0/1 ints. The four confusion cells are exact
    * BIGINTs off one hash aggregate;
    *   MCC = (TP·TN − FP·FN)/√((TP+FP)(TP+FN)(TN+FP)(TN+FN))
    * is one mirrored IEEE expression over the cells (the product
    * under the root exceeds 2⁶³ long before the cells do, so the
    * root's factors multiply in double); balanced accuracy =
    * (TPR+TNR)/2, J = TPR+TNR−1. Degenerate margins (any factor 0)
    * yield null MCC, not an ANSI error.
    */
  def matthews(df: DataFrame, truthCol: String,
               predCol: String): DataFrame = {
    def cell(t: Int, p: Int) =
      sum(when(col(truthCol) === t && col(predCol) === p, 1L)
        .otherwise(0L))
    val agg = df.where(col(truthCol).isNotNull && col(predCol).isNotNull)
      .agg(count(lit(1)).as("n"), cell(1, 1).as("tp"),
        cell(0, 0).as("tn"), cell(0, 1).as("fp"), cell(1, 0).as("fn"))
    def D(s: String) = col(s).cast("double")
    val den = sqrt((D("tp") + D("fp")) * (D("tp") + D("fn")) *
      (D("tn") + D("fp")) * (D("tn") + D("fn")))
    val tpr = try_divide(D("tp"), D("tp") + D("fn"))
    val tnr = try_divide(D("tn"), D("tn") + D("fp"))
    agg.select(col("n"), col("tp"), col("tn"), col("fp"), col("fn"),
      when(den > 0, (D("tp") * D("tn") - D("fp") * D("fn")) / den)
        .as("mcc"),
      ((tpr + tnr) / 2).as("balanced_accuracy"),
      (tpr + tnr - 1).as("youden_j"))
  }

  /** Spiegelhalter's calibration z — "are the predicted probabilities
    * themselves honest" (the inferential cut of the reliability
    * curve; Brier measures the loss, this tests the calibration null):
    *   z = Σ(y−p)(1−2p) / √(Σ(1−2p)²·p(1−p)).
    * Scores quantize to the 1e-6 grid first, so both sums reduce to
    * the distinct-score domain — per grid point p: numerator term
    * (y_p − n_p·p)(1−2p), variance term n_p(1−2p)²p(1−p) — folded
    * score-ordered (roc_auc's distinct-quantized-score domain
    * argument). y_p/n_p are exact BIGINTs.
    */
  def spiegelhalterZ(df: DataFrame, scoreCol: String,
                     labelCol: String): DataFrame = {
    val iq = floor(col(scoreCol).cast("double") * lit(1e6) + lit(0.5))
      .cast("long")
    val y = when(col(labelCol).cast("boolean"), 1L).otherwise(0L)
    val cells = df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(iq.as("_iq"))
      .agg(count(lit(1)).as("_n"), sum(y).as("_y"))
    def D(c: Column) = c.cast("double")
    val p = D(col("_iq")) / lit(1e6)
    val omp = lit(1.0) - lit(2.0) * p
    val terms = cells
      .withColumn("_num", (D(col("_y")) - D(col("_n")) * p) * omp)
      .withColumn("_var",
        D(col("_n")) * omp * omp * p * (lit(1.0) - p))
    val agg = terms.agg(sum(col("_n")).as("n"),
      StatsOps.orderedFoldSum(Seq("_iq"), "_num").as("_sn"),
      StatsOps.orderedFoldSum(Seq("_iq"), "_var").as("_sv"))
    agg.select(col("n"),
      when(col("_sv") > 0, col("_sn") / sqrt(col("_sv"))).as("z"))
  }

  /** Krippendorff's alpha (nominal data) — the agreement coefficient
    * that, unlike [[fleissKappa]], tolerates MISSING ratings: items
    * keep whatever raters they have, items with fewer than two
    * ratings drop (counted). α = 1 − D_o/D_e with
    *   D_o = (1/n)·Σ_i Σ_c n_ic·(m_i − n_ic)/(m_i − 1)
    *   D_e = Σ_c n_c·(n − n_c) / (n·(n − 1))
    * over the pairable values (n = Σ m_i). Exactness: n_ic/m_i/n_c
    * are exact BIGINT censuses; each item's D_o term is quantized to
    * the 1e-9 grid before summing (integer sums are order-free — the
    * items domain is too large for an ordered fold, and the term is
    * a small rational, so the grid loses nothing detectable at 1e-8
    * output rounding); D_e is a category-ordered fold (categories are
    * domain-bounded). Plan: one (item × category) hash aggregate,
    * then item- and category-bounded reductions.
    */
  def krippendorffAlpha(df: DataFrame, itemCol: String,
                        catCol: String): DataFrame = {
    val cells = df.where(col(itemCol).isNotNull && col(catCol).isNotNull)
      .groupBy(col(itemCol).as("_i"), col(catCol).as("_c"))
      .agg(count(lit(1)).as("_nic"))
    val items = cells.groupBy("_i").agg(sum(col("_nic")).as("_m"))
    val usable = items.where(col("_m") >= 2)
    val dropped = items.agg(
      sum(when(col("_m") < 2, 1L).otherwise(0L)).as("n_dropped"))
    val used = cells.join(usable, Seq("_i"))
    def D(c: Column) = c.cast("double")
    // per-item D_o mass, quantized to the 1e-9 grid for an order-free
    // exact BIGINT sum over the (unbounded) item domain
    // accumulate in decimal(38,0): the grid sum is ~n_values·1e9 worst
    // case, which clears 2^63 once pairable values exceed ~9e9 — inside
    // the corpus scale this targets (the wassersteinDrift discipline)
    val termQ = floor(D(col("_nic")) * (D(col("_m")) - D(col("_nic"))) /
      (D(col("_m")) - 1) * lit(1e9) + lit(0.5)).cast("decimal(38,0)")
    val doSum = used.agg(sum(termQ).as("_doq"),
      sum(col("_nic")).as("n_values"))
    val nc = used.groupBy("_c").agg(sum(col("_nic")).as("_nc"))
    val deTot = nc.agg(sum(col("_nc")).as("_n"))
    val deSum = nc.crossJoin(broadcast(deTot))
      .withColumn("_term", D(col("_nc")) * (D(col("_n")) - D(col("_nc"))))
      .agg(max(col("_n")).as("_n"),
        StatsOps.orderedFoldSum(Seq("_c"), "_term").as("_de"))
    val agg = doSum.crossJoin(broadcast(deSum))
      .crossJoin(broadcast(dropped))
    val dObs = D(col("_doq")) / lit(1e9) / D(col("n_values"))
    val dExp = col("_de") / (D(col("_n")) * (D(col("_n")) - 1))
    agg.select(col("n_values"), col("n_dropped"),
      when(col("n_values") > 1 && dExp > 0,
        lit(1.0) - dObs / dExp).as("alpha"))
  }

  /** Fleiss' kappa — [[cohensKappa]] generalized to n raters per item
    * (the labeling-quality gate for multi-annotator curation: raters
    * here are usually heuristic classifiers whose consensus is being
    * audited). Input = one row per (item, rating); items without
    * exactly `raters` ratings are dropped (and counted) rather than
    * silently biasing the statistic.
    *
    * Exactness: P̄'s numerator Σᵢ Σ_c n_ic(n_ic−1) and P_e's numerator
    * Σ_c S_c² are exact BIGINT censuses (S_c < ~3e9 before the square
    * overflows — fine for any rating table whose category sums fit
    * int32-ish; document-scale rating audits do); kappa is one closed
    * form over them. Plan: fact → (item,cat) cells → item-bounded and
    * k-bounded aggregates; nothing fact-sized past the first shuffle.
    */
  def fleissKappa(df: DataFrame, itemCol: String, catCol: String,
                  raters: Int): DataFrame = {
    require(raters >= 2, s"fleissKappa needs raters >= 2, got $raters")
    val cells = df.where(col(itemCol).isNotNull && col(catCol).isNotNull)
      .groupBy(col(itemCol).as("_i"), col(catCol).as("_cat"))
      .agg(count(lit(1)).as("_c"))
    val perItem = cells.groupBy(col("_i"))
      .agg(sum(col("_c") * (col("_c") - 1)).as("_pn"),
        sum(col("_c")).as("_nr"))
    val kept = perItem.where(col("_nr") === raters)
    val dropped = perItem.agg(
      sum(when(col("_nr") =!= raters, 1L).otherwise(0L)).as("n_dropped"))
    val base = kept.agg(count(lit(1)).as("n_items"),
      sum(col("_pn")).as("_np"))
    val ne = cells.join(kept.select(col("_i")), Seq("_i"), "left_semi")
      .groupBy(col("_cat")).agg(sum(col("_c")).as("_sc"))
      .agg(coalesce(sum(col("_sc") * col("_sc")), lit(0L)).as("_ne"))
    def D(c: Column) = c.cast("double")
    val nTot = col("n_items") * raters
    val pbar = try_divide(D(col("_np")),
      D(col("n_items") * (raters * (raters - 1))))
    val pe = try_divide(D(col("_ne")), D(nTot) * D(nTot))
    base.crossJoin(broadcast(ne)).crossJoin(broadcast(dropped))
      .select(col("n_items"), col("n_dropped"), pbar.as("p_bar"),
        pe.as("p_e"),
        try_divide(pbar - pe, lit(1.0) - pe).as("kappa"))
  }

  /** Bradley-Terry strength ratings from pairwise match outcomes —
    * the principled "which model/source wins head-to-heads" ranking
    * (win RATE is confounded by opponent strength; BT is not). MM
    * iterations: p'ₛ = Wₛ / Σ_o n_so/(pₛ+p_o), run on the driver over
    * the entity²-bounded win matrix (the codebook-collect budget),
    * every fold ascending-entity so an engine replaying the same
    * folds reproduces the ratings bit-for-bit. Ratings normalize to
    * sum 1. Entities with zero matches are excluded (their MM update
    * is undefined); zero-win entities converge to rating 0.
    *
    * 100 TB plan: ONE hash aggregate from the match fact to the
    * (winner, loser) cells; everything after is entity-bounded.
    */
  def bradleyTerry(matches: DataFrame, winnerCol: String,
                   loserCol: String, iters: Int = 10): DataFrame = {
    require(iters >= 1 && iters <= 32, s"iters in [1,32], got $iters")
    val cells = matches.where(col(winnerCol).isNotNull &&
        col(loserCol).isNotNull && col(winnerCol) =!= col(loserCol))
      .groupBy(col(winnerCol).cast("string").as("_w"),
        col(loserCol).cast("string").as("_l"))
      .agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap
    val spark = matches.sparkSession
    import spark.implicits._
    if (cells.isEmpty)
      return Seq.empty[(String, Long, Long, Double)]
        .toDF(winnerCol, "wins", "n_matches", "rating")
    val entities = cells.keys.flatMap(k => Seq(k._1, k._2)).toSeq
      .distinct.sorted
    def n(a: String, b: String): Long =
      cells.getOrElse((a, b), 0L) + cells.getOrElse((b, a), 0L)
    val wins = entities.map(s =>
      s -> entities.iterator.map(o => cells.getOrElse((s, o), 0L)).sum)
      .toMap
    var p = entities.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      p = entities.map { s =>
        var denom = 0.0
        for (o <- entities if o != s) { // ascending-entity fold
          val m = n(s, o)
          if (m > 0) denom += m.toDouble / (p(s) + p(o))
        }
        s -> wins(s).toDouble / denom
      }.toMap
    }
    var z = 0.0
    for (s <- entities) z += p(s)
    entities.map(s => (s, wins(s),
        entities.iterator.map(o => n(s, o)).sum, p(s) / z))
      .toDF(winnerCol, "wins", "n_matches", "rating")
  }

  /** pass@k — the standard unbiased estimator for "of n sampled
    * attempts per task, c correct, what's P(at least one of a random
    * k-subset is correct)": 1 − C(n−c,k)/C(n,k), evaluated per task as
    * the fixed-order product Π_{i<k}(n−c−i)/(n−i) (never factorials —
    * overflow-free for any n), with the n−c<k degenerate case exactly
    * 1. Tasks with n < k are dropped from that k's mean rather than
    * polluting it.
    *
    * Exactness: (n, c) are exact integers; the k-term product is a
    * fixed-order fold; the per-task pass snaps to a 1e-9 BIGINT before
    * the cross-task mean, so the report is an exact integer ratio.
    * Plan: one fact hash aggregate to the task table, then
    * (tasks × |ks|)-bounded arithmetic.
    */
  def passAtK(df: DataFrame, taskCol: String, correctCol: String,
              ks: Seq[Int] = Seq(1, 5, 10)): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be >= 1: $ks")
    val perTask = df.where(col(taskCol).isNotNull &&
        col(correctCol).isNotNull)
      .groupBy(col(taskCol).as("_task"))
      .agg(count(lit(1)).as("_n"),
        sum(col(correctCol).cast("long")).as("_c"))
    val pass = perTask
      .select(col("_task"), col("_n"), col("_c"),
        explode(lit(ks.toArray)).as("k"))
      .where(col("_n") >= col("k"))
      .withColumn("_pass",
        when(col("_n") - col("_c") < col("k"), lit(1.0))
          .otherwise(lit(1.0) - expr(
            """aggregate(sequence(0, k - 1), cast(1.0 as double),
              |  (acc, i) -> acc * (cast(_n - _c - i as double)
              |    / cast(_n - i as double)))""".stripMargin)))
    pass
      .select(col("k"),
        floor(col("_pass") * lit(1.0e9) + lit(0.5)).cast("long")
          .as("_pq"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_tasks"), sum(col("_pq")).as("_sp"))
      .select(col("k").cast("long").as("k"), col("n_tasks"),
        (col("_sp").cast("double") / lit(1.0e9) /
          col("n_tasks").cast("double")).as("mean_pass"))
  }

  /** Exact decision-stump training — the interpretable baseline
    * classifier next to logistic regression: over melted (feature,
    * grid-value, 0/1 label) rows, score EVERY (feature, threshold)
    * split by Gini gain computed from cumulative integer censuses,
    * and return the single best split (ties broken deterministically
    * by feature then threshold). "Predict 1 when x >= threshold" is
    * the right branch.
    *
    * Exactness + scale: one fact hash aggregate to the (feature ×
    * grid) cells; the cumulative window is partitioned by feature
    * over the grid-bounded domain; gains are mirrored IEEE
    * expressions of exact BIGINTs, so the argmax (a TakeOrdered over
    * the bounded candidate table, never a fact sort) picks the same
    * split on both engines.
    */
  def stumpTrain(df: DataFrame, featureCol: String, xqCol: String,
                 labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.where(col(featureCol).isNotNull &&
        col(xqCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(featureCol).as("_f"), col(xqCol).as("_x"))
      .agg(sum(col(labelCol).cast("long")).as("_p"),
        count(lit(1)).as("_t"))
    val w = Window.partitionBy(col("_f")).orderBy(col("_x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cells.groupBy(col("_f"))
      .agg(sum(col("_p")).as("_bp"), sum(col("_t")).as("_bt"))
    val cand = cells
      .withColumn("_cp", sum(col("_p")).over(w))
      .withColumn("_ct", sum(col("_t")).over(w))
      .join(broadcast(tot), Seq("_f"))
      .select(col("_f"), col("_x"),
        (col("_cp") - col("_p")).as("_lp"),
        (col("_ct") - col("_t")).as("_lt"),
        col("_bp"), col("_bt"))
      .where(col("_lt") > 0)
    def D(c: Column) = c.cast("double")
    def gini(p: Column, t: Column): Column =
      lit(1.0) - (D(p) / D(t)) * (D(p) / D(t)) -
        (D(t - p) / D(t)) * (D(t - p) / D(t))
    val rp = col("_bp") - col("_lp")
    val rt = col("_bt") - col("_lt")
    val gain = gini(col("_bp"), col("_bt")) -
      (D(col("_lt")) / D(col("_bt"))) * gini(col("_lp"), col("_lt")) -
      (D(rt) / D(col("_bt"))) * gini(rp, rt)
    val acc = (D(greatest(col("_lp"), col("_lt") - col("_lp"))) +
      D(greatest(rp, rt - rp))) / D(col("_bt"))
    cand.select(col("_f").as("feature"), col("_x").as("threshold"),
        gain.as("gain"), acc.as("acc"), col("_bt").as("n"))
      .orderBy(col("gain").desc, col("feature"), col("threshold"))
      .limit(1)
  }

  /** Pinball (quantile) loss backtest — the eval for quantile
    * FORECASTS (P90 latency budgets, demand bands) that MAE/RMSE
    * can't grade: train/test split by the deterministic hash gate,
    * prediction = the exact train-side q-quantile per group, loss =
    * mean max(q·e, (q−1)·e) on the test side, one row per (group, q).
    *
    * Exactness: values ride the 10^digits grid as BIGINTs; with q a
    * tenth (k/10), ceil(q·n) = (k·n+9) div 10 is integer rank
    * selection over the distinct-value domain, and the per-row loss
    * scaled by 10·10^digits is max(k·e, (k−10)·e) — a BIGINT — so the
    * test mean is an exact integer ratio. Plan: train fact → grid
    * histogram → domain window (group-partitioned); predictions are
    * (groups × tenths)-bounded and broadcast onto the test fact.
    */
  def pinballEval(df: DataFrame, groupCol: String, keyCol: String,
                  valueCol: String, quantDigits: Int = 2,
                  tenths: Seq[Int] = Seq(1, 5, 9),
                  trainBuckets: Int = 8000): DataFrame = {
    require(tenths.nonEmpty && tenths.forall(k => k >= 1 && k <= 9),
      s"tenths must be within [1,9], got $tenths")
    import org.apache.spark.sql.expressions.Window
    val scale = math.pow(10, quantDigits)
    val f = df.where(col(groupCol).isNotNull && col(keyCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(groupCol).as("_g"),
        floor(col(valueCol).cast("double") * lit(scale) + lit(0.5))
          .cast("long").as("_vq"),
        SampleOps.splitBucket(col(keyCol)).as("_b"))
    val train = f.where(col("_b") < trainBuckets)
    val test = f.where(col("_b") >= trainBuckets)
    val hist = train.groupBy(col("_g"), col("_vq"))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col("_g")).orderBy(col("_vq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("_cum", sum(col("_c")).over(w))
      .join(train.groupBy(col("_g")).agg(count(lit(1)).as("_nt")),
        Seq("_g"))
    val preds = cum
      .select(col("_g"), col("_vq"), col("_cum"), col("_nt"),
        explode(lit(tenths.toArray)).as("_k"))
      .where(col("_cum") >= expr("(_k * _nt + 9) div 10"))
      .groupBy(col("_g"), col("_k"))
      .agg(min(col("_vq")).as("_qhat"))
    val e = col("_vq") - col("_qhat")
    val lossScaled = greatest(col("_k") * e, (col("_k") - 10) * e)
    test.join(broadcast(preds), Seq("_g"))
      .select(col("_g"), col("_k"), col("_qhat"), lossScaled.as("_l"))
      .groupBy(col("_g"), col("_k"), col("_qhat"))
      .agg(count(lit(1)).as("n_test"), sum(col("_l")).as("_sl"))
      .select(col("_g").as(groupCol),
        (col("_k").cast("double") / lit(10.0)).as("q"),
        (col("_qhat").cast("double") / lit(scale)).as("qhat"),
        col("n_test"),
        (col("_sl").cast("double") / lit(10.0) / lit(scale) /
          col("n_test").cast("double")).as("pinball"))
  }

  /** Precision-recall curve + average precision — the imbalanced-data
    * companion to [[rocAuc]] (AUC stays optimistic when negatives
    * dwarf positives; PR space does not): one row per distinct
    * quantized score threshold τ with the counts and rates of the
    * "predict positive when score ≥ τ" rule, plus the AP summary
    * (the step-integral Σ_τ ΔR·P) broadcast onto every row.
    *
    * Scale/exactness contract mirrors [[liftCurve]]: the fact
    * collapses to the distinct-quantized-score table in one hash
    * aggregate; ONE descending cumulative window walks that
    * grid-bounded domain (whitelisted with the same argument), so
    * tp/fp are exact BIGINTs; precision/recall/f1 are short double
    * expressions of those integers; and because ΔR at threshold τ is
    * exactly p_τ/P (the positives AT that score), AP's fold terms are
    * per-score local — summed in fixed score order so both engines
    * associate identically. Callers pass an already-quantized score
    * (coarse — the grid bounds the OUTPUT row count too).
    */
  def prCurve(df: DataFrame, labelCol: String,
              scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pos = col(labelCol).cast("long") === 1L
    val counts = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("score"))
      .agg(sum(when(pos, 1L).otherwise(0L)).as("_p"),
        sum(when(pos, 0L).otherwise(1L)).as("_n"))
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = counts.agg(sum(col("_p")).as("n_pos"),
      sum(col("_n")).as("n_neg"))
    val cur = counts
      .withColumn("tp", sum(col("_p")).over(w))
      .withColumn("fp", sum(col("_n")).over(w))
      .crossJoin(broadcast(tot))
    val prec = col("tp").cast("double") /
      (col("tp") + col("fp")).cast("double")
    val rec = try_divide(col("tp").cast("double"),
      col("n_pos").cast("double"))
    val f1 = try_divide(lit(2.0) * prec * rec, prec + rec)
    val rows = cur.select(col("score"), col("tp"), col("fp"),
      col("n_pos"), col("n_neg"), prec.as("precision"), rec.as("recall"),
      f1.as("f1"),
      (try_divide(col("_p").cast("double"), col("n_pos").cast("double"))
        * prec).as("_term"))
    val ap = rows.agg(
      StatsOps.orderedFoldSum(Seq("score"), "_term").as("ap"))
    rows.drop("_term").crossJoin(broadcast(ap))
  }

  /** Brier score + expected calibration error in one 1-row readout —
    * the proper-scoring and calibration summary beside the per-bin
    * reliability curve (which shows WHERE the probabilities are off;
    * these two numbers say HOW MUCH, comparably across models):
    *   brier = Σ (p − y)² / n,   ece = Σ_bins |conf_b − acc_b|·n_b/n.
    *
    * Exactness: the score is snapped to the 1e-4 integer grid
    * (p4 = floor(score·10⁴ + 0.5), a BIGINT), so each squared error
    * (p4 − y·10⁴)² is an exact BIGINT ≤ 10⁸ and the Brier numerator
    * is an exact integer sum (in-range to ~9·10¹⁰ rows); bins are
    * integer division of p4 (clamped to the last bin at p = 1); per
    * bin, Σp4 and Σy are exact BIGINTs, conf/acc are single
    * divisions, and the ECE Σ is a fixed-order fold over the ≤`bins`
    * sorted bins. Plan: ONE fact-sized hash aggregate to the bin
    * domain (carrying the Brier partials), a 1-row totals broadcast,
    * one bounded fold.
    */
  def brierEce(df: DataFrame, labelCol: String, scoreCol: String,
               bins: Int = 10): DataFrame = {
    require(bins >= 2, "brierEce needs at least 2 bins")
    val y = col(labelCol).cast("long")
    val p4 = floor(col(scoreCol) * lit(10000.0) + lit(0.5)).cast("long")
    val perBin = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(p4.as("_p4"), y.as("_y"))
      // integer division on BOTH engines (Spark `div`, DuckDB `//`)
      .select(least(expr(s"_p4 * ${bins}L div 10000L"),
          lit(bins.toLong - 1)).as("_b"),
        col("_p4"), col("_y"),
        ((col("_p4") - col("_y") * 10000L) *
          (col("_p4") - col("_y") * 10000L)).as("_sq"))
      .groupBy("_b")
      .agg(count(lit(1)).as("_nb"), sum(col("_p4")).as("_sp"),
        sum(col("_y")).as("_sy"), sum(col("_sq")).as("_ssq"))
    val tot = perBin.agg(sum(col("_nb")).as("n"),
      sum(col("_ssq")).as("_tsq"))
    val nbD = col("_nb").cast("double")
    val term = abs(col("_sp").cast("double") / (lit(10000.0) * nbD) -
      col("_sy").cast("double") / nbD) * nbD
    perBin.crossJoin(broadcast(tot))
      .select(col("_b"), (term / col("n").cast("double")).as("_term"),
        col("n"), col("_tsq"))
      .agg(max(col("n")).as("n"),
        (max(col("_tsq")).cast("double") /
          (lit(1.0e8) * max(col("n")).cast("double"))).as("brier"),
        StatsOps.orderedFoldSum(Seq("_b"), "_term").as("ece"))
  }

  /** Isotonic calibration (pool-adjacent-violators) of a [0,1] score
    * against a 0/1 label — the standard nonparametric recalibrator
    * (sklearn's `IsotonicRegression`, Zadrozny–Elkan) a quality/
    * reward-model eval runs when the reliability diagram
    * (calibration_curve / brier_ece) shows miscalibration.
    *
    * PAV is computed by its minimax characterization instead of the
    * sequential pooling loop:
    *   iso(i) = max_{j ≤ i} min_{k ≥ i} mean(y over buckets j..k)
    * which needs only per-bucket INTEGER sums (order-free), cumulative
    * sums over the B-row bucket table, and min/max over exact IEEE
    * divisions — no float summation anywhere, so the result is
    * engine-exact with no quantization tricks.
    *
    * Scale: ONE fact-scan hash aggregate to B rows; the j≤i≤k triple
    * join is O(B³) on a broadcast-size table (B=50 → 20k rows),
    * constant at any corpus scale. Same 1e-4 score snap + integer
    * `div` bucketing as [[brierEce]].
    */
  def isotonicCalibrate(df: DataFrame, labelCol: String, scoreCol: String,
                        bins: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bins >= 2, "isotonicCalibrate needs at least 2 bins")
    val y = col(labelCol).cast("long")
    val p4 = floor(col(scoreCol) * lit(10000.0) + lit(0.5)).cast("long")
    val perBin = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(p4.as("_p4"), y.as("_y"))
      .select(least(expr(s"_p4 * ${bins}L div 10000L"),
        lit(bins.toLong - 1)).as("_b"), col("_p4"), col("_y"))
      .groupBy("_b")
      .agg(count(lit(1)).as("n_b"), sum(col("_y")).as("s_b"),
        sum(col("_p4")).as("sp_b"))
    val cum = perBin
      .withColumn("cn", sum("n_b").over(Window.orderBy("_b")))
      .withColumn("cs", sum("s_b").over(Window.orderBy("_b")))
    // segment means over bucket ranges [j, k]: integer cum diffs, one
    // exact division — (j, k, mean)
    val a = cum.select(col("_b").as("j"), col("cn").as("cnj"),
      col("cs").as("csj"), col("n_b").as("nj"), col("s_b").as("sj"))
    val b = cum.select(col("_b").as("k"), col("cn").as("cnk"),
      col("cs").as("csk"))
    val seg = a.join(b, col("j") <= col("k"))
      .select(col("j"), col("k"),
        ((col("csk") - col("csj") + col("sj")).cast("double") /
          (col("cnk") - col("cnj") + col("nj")).cast("double")).as("m"))
    // iso(i) = max_{j<=i} min_{k>=i} m(j,k): bounded triple join
    val i = cum.select(col("_b").as("i"))
    val iso = seg.join(i, col("j") <= col("i") && col("i") <= col("k"))
      .groupBy("i", "j").agg(min("m").as("mn"))
      .groupBy("i").agg(max("mn").as("iso_p"))
    perBin.join(iso, perBin("_b") === iso("i"))
      .select(col("_b").as("bucket"), col("n_b"),
        (col("sp_b").cast("double") /
          (lit(10000.0) * col("n_b").cast("double"))).as("mean_score"),
        (col("s_b").cast("double") / col("n_b").cast("double"))
          .as("frac_pos"),
        col("iso_p"))
  }

  /** Split conformal prediction interval for a linear point predictor
    * — the distribution-free uncertainty wrapper model evals want
    * around any regressor: hash-split into train/calibration/test,
    * OLS-fit y ~ x on train, take q̂ = the ⌈(n_cal+1)(1−α)⌉-th
    * smallest |residual| on calibration, and report the empirical
    * test coverage of ŷ ± q̂ (guaranteed ≥ 1−α in expectation by
    * exchangeability — Vovk et al.'s split CP).
    *
    * Exactness contract: `xCol`/`yCol` must be integer-valued (the
    * caller pre-scales, e.g. price→cents), so the five OLS sums are
    * exact BIGINTs (order-free); slope/intercept are the same IEEE
    * double expressions an oracle replays from those sums. Residuals
    * snap to the 1/resQuant grid as BIGINTs, so the calibration
    * quantile is an exact rank-select on the DISTINCT residual domain
    * (window walks distinct values, never a fact sort) and the test
    * coverage comparison is integer.
    *
    * Scale: three scans (train sums, calibration histogram, test
    * coverage), each one hash aggregate; driver state is 5 sums +
    * the residual histogram head (distinct-value-bounded). Overflow:
    * Σx·y stays under 2^63 for |x·y| ≤ 5e8 up to ~10^10 rows.
    */
  def conformalInterval(df: DataFrame, keyCol: String, xCol: String,
                        yCol: String, alpha: Double,
                        trainFrac: Double = 0.6, calFrac: Double = 0.2,
                        resQuant: Double = 100.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    val nb = SampleOps.SplitBuckets
    val trainCut = math.floor(trainFrac * nb).toLong
    val calCut = math.floor((trainFrac + calFrac) * nb).toLong
    val base = df.select(
      SampleOps.splitBucket(col(keyCol)).as("_b"),
      col(xCol).cast("long").as("_x"), col(yCol).cast("long").as("_y"))
    val tr = base.where(col("_b") < trainCut)
      .agg(count(lit(1)).as("n"), sum("_x").as("sx"), sum("_y").as("sy"),
        sum(col("_x") * col("_x")).as("sxx"),
        sum(col("_x") * col("_y")).as("sxy"))
      .head() // 5 scalars, bounded
    val n = tr.getLong(0)
    require(n > 0, "conformalInterval: empty training split")
    val (sx, sy, sxx, sxy) =
      (tr.getLong(1), tr.getLong(2), tr.getLong(3), tr.getLong(4))
    // same double expression the oracle computes from the same bigints
    val slope = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
    val icept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
    val rq = floor(abs(col("_y").cast("double") -
        (lit(icept) + lit(slope) * col("_x").cast("double"))) *
      lit(resQuant) + lit(0.5)).cast("long")
    val scored = base.withColumn("_rq", rq)
    val cal = scored.where(col("_b") >= trainCut && col("_b") < calCut)
    val nCal = cal.count()
    require(nCal > 0, "conformalInterval: empty calibration split")
    val k = math.min(nCal,
      math.ceil((nCal + 1).toDouble * (1.0 - alpha)).toLong)
    val qhat = cal.groupBy("_rq").agg(count(lit(1)).as("_n"))
      .withColumn("_cum", sum("_n").over(Window.orderBy("_rq")))
      .where(col("_cum") >= k)
      .agg(min("_rq")).head().getLong(0) // rank-select scalar
    scored.where(col("_b") >= calCut)
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("_rq") <= qhat, 1L).otherwise(0L)).as("n_covered"))
      .select(lit(n).as("n_train"), lit(nCal).as("n_cal"), col("n_test"),
        lit(slope).as("slope"), lit(icept).as("intercept"),
        lit(qhat).as("qhat"), col("n_covered"),
        (col("n_covered").cast("double") / col("n_test").cast("double"))
          .as("coverage"))
  }
}
