package graft

import org.apache.spark.sql.functions._

import graft.Queries.{Q, qround}
import graft.operators.DiagnosticsOps

/** Round-13 experiment-analysis / model-diagnostics surface
  * ([[operators.DiagnosticsOps]]): the classical test battery over the
  * events metric stream plus corpus-diversity estimators. Same Q
  * contract as [[Queries]] (Spark fn + DuckDB oracle, column names
  * aligned, quantization via qround).
  */
object QueriesDiagnostics {

  private def qrSql(expr: String, d: Int): String = {
    val s = "1" + "0" * d
    s"floor(($expr) * $s.0 + 0.5) / $s.0"
  }

  /** One-way ANOVA of event value by event type
    * (DiagnosticsOps.anovaOneway, 1e-2 grid): exact grid moments per
    * group, group-ordered fold of S_g²/n_g, closed-form F + eta².
    */
  private val anovaOnewayQ = Q(
    (s, d) => DiagnosticsOps.anovaOneway(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "value", quantDigits = 2)
      .select(col("k"), col("n"), col("dof1"), col("dof2"),
        qround(col("ss_between"), 6).as("ss_between"),
        qround(col("ss_within"), 6).as("ss_within"),
        qround(col("f"), 8).as("f"),
        qround(col("eta_sq"), 8).as("eta_sq")),
    s"""WITH e AS (
       |  SELECT event_type AS g,
       |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
       |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
       |per AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS ss
       |  FROM e GROUP BY 1),
       |a AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
       |    CAST(sum(s) AS BIGINT) AS ts, CAST(sum(ss) AS BIGINT) AS tss,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list({'g': g,
       |          't': CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
       |            / CAST(n AS DOUBLE)} ORDER BY g),
       |        x_ -> x_.t)), (a_, b_) -> a_ + b_) AS sb
       |  FROM per)
       |SELECT k, n, k - 1 AS dof1, n - k AS dof2,
       |  ${qrSql("(sb - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE)" +
         " / CAST(n AS DOUBLE)) / 10000.0", 6)} AS ss_between,
       |  ${qrSql("(CAST(tss AS DOUBLE) - sb) / 10000.0", 6)}
       |    AS ss_within,
       |  ${qrSql("((sb - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE)" +
         " / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1))" +
         " / ((CAST(tss AS DOUBLE) - sb) / (CAST(n AS DOUBLE)" +
         " - CAST(k AS DOUBLE)))", 8)} AS f,
       |  ${qrSql("(sb - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE)" +
         " / CAST(n AS DOUBLE)) / (CAST(tss AS DOUBLE)" +
         " - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE)" +
         " / CAST(n AS DOUBLE))", 8)} AS eta_sq
       |FROM a""".stripMargin)

  /** Welch's unequal-variance t between view and purchase values
    * (DiagnosticsOps.welchT, 1e-4 grid) with Welch-Satterthwaite dof.
    */
  private val welchTQ = Q(
    (s, d) => DiagnosticsOps.welchT(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "view", "purchase", "value", quantDigits = 4)
      .select(col("n_a"), col("n_b"),
        qround(col("mean_a"), 8).as("mean_a"),
        qround(col("mean_b"), 8).as("mean_b"),
        qround(col("t"), 8).as("t"), qround(col("dof"), 4).as("dof")),
    s"""WITH e AS (
       |  SELECT event_type AS c,
       |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v
       |  FROM events
       |  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
       |a AS (
       |  SELECT
       |    CAST(sum(CASE WHEN c = 'view' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS na,
       |    CAST(sum(CASE WHEN c = 'view' THEN v ELSE 0 END) AS BIGINT)
       |      AS sa,
       |    CAST(sum(CASE WHEN c = 'view' THEN v * v ELSE 0 END)
       |      AS BIGINT) AS ssa,
       |    CAST(sum(CASE WHEN c = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS nb,
       |    CAST(sum(CASE WHEN c = 'purchase' THEN v ELSE 0 END)
       |      AS BIGINT) AS sb,
       |    CAST(sum(CASE WHEN c = 'purchase' THEN v * v ELSE 0 END)
       |      AS BIGINT) AS ssb
       |  FROM e),
       |v AS (
       |  SELECT na, sb, nb, sa,
       |    CAST(sa AS DOUBLE) / 10000.0 / CAST(na AS DOUBLE) AS ma,
       |    CAST(sb AS DOUBLE) / 10000.0 / CAST(nb AS DOUBLE) AS mb,
       |    (CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
       |        / CAST(na AS DOUBLE)) / 100000000.0
       |      / (CAST(na AS DOUBLE) - 1) / CAST(na AS DOUBLE) AS sa2,
       |    (CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
       |        / CAST(nb AS DOUBLE)) / 100000000.0
       |      / (CAST(nb AS DOUBLE) - 1) / CAST(nb AS DOUBLE) AS sb2
       |  FROM a)
       |SELECT na AS n_a, nb AS n_b,
       |  ${qrSql("ma", 8)} AS mean_a, ${qrSql("mb", 8)} AS mean_b,
       |  ${qrSql("(ma - mb) / sqrt(sa2 + sb2)", 8)} AS t,
       |  ${qrSql("(sa2 + sb2) * (sa2 + sb2) / (sa2 * sa2" +
         " / (CAST(na AS DOUBLE) - 1) + sb2 * sb2" +
         " / (CAST(nb AS DOUBLE) - 1))", 4)} AS dof
       |FROM v""".stripMargin)

  /** Brown-Forsythe variance-homogeneity W of event value across
    * event types (DiagnosticsOps.leveneTest, 1e-2 grid): exact median
    * rank-select on the per-group histogram, integer deviations.
    */
  private val leveneTestQ = Q(
    (s, d) => DiagnosticsOps.leveneTest(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "value", quantDigits = 2)
      .select(col("k"), col("n"), col("dof1"), col("dof2"),
        qround(col("w"), 8).as("w")),
    s"""WITH e AS (
       |  SELECT event_type AS g,
       |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
       |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
       |h AS (
       |  SELECT g, v, CAST(count(*) AS BIGINT) AS c
       |  FROM e GROUP BY 1, 2),
       |cu AS (
       |  SELECT g, v, c,
       |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
       |  FROM h),
       |med AS (
       |  SELECT g, CAST(min(v) AS BIGINT) AS med
       |  FROM cu WHERE cum >= (n + 1) // 2 GROUP BY 1),
       |per AS (
       |  SELECT h.g, CAST(sum(c) AS BIGINT) AS n,
       |    CAST(sum(c * abs(v - med)) AS BIGINT) AS s,
       |    CAST(sum(c * abs(v - med) * abs(v - med)) AS BIGINT) AS ss
       |  FROM h JOIN med ON h.g = med.g GROUP BY 1),
       |a AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
       |    CAST(sum(s) AS BIGINT) AS ts, CAST(sum(ss) AS BIGINT) AS tss,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list({'g': g,
       |          't': CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
       |            / CAST(n AS DOUBLE)} ORDER BY g),
       |        x_ -> x_.t)), (a_, b_) -> a_ + b_) AS sb
       |  FROM per)
       |SELECT k, n, k - 1 AS dof1, n - k AS dof2,
       |  ${qrSql("((sb - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE)" +
         " / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1))" +
         " / ((CAST(tss AS DOUBLE) - sb) / (CAST(n AS DOUBLE)" +
         " - CAST(k AS DOUBLE)))", 8)} AS w
       |FROM a""".stripMargin)

  /** McNemar paired-flip test (DiagnosticsOps.mcnemarTest): per user,
    * did-they-purchase in the first vs second half of the observed day
    * span (the did_estimate split), continuity-corrected χ² over the
    * discordant pairs.
    */
  private val mcnemarTestQ = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts_ns"), col("event_type"))
      val b = ev.agg(
        min(expr("ts_ns div 86400000000000L")).as("_lo"),
        max(expr("ts_ns div 86400000000000L")).as("_hi"))
      val base = ev.crossJoin(broadcast(b)).select(
        col("user_id"),
        (col("event_type") === "purchase" &&
          expr("ts_ns div 86400000000000L") <
            expr("(_lo + _hi + 1) div 2")).as("pre"),
        (col("event_type") === "purchase" &&
          expr("ts_ns div 86400000000000L") >=
            expr("(_lo + _hi + 1) div 2")).as("post"))
      DiagnosticsOps.mcnemarTest(base, "user_id", "pre", "post")
        .select(col("n_pairs"), col("b"), col("c"),
          qround(col("chi2"), 8).as("chi2"))
    },
    s"""WITH bnd AS (
       |  SELECT min(epoch_ns(ts) // 86400000000000) AS lo,
       |    max(epoch_ns(ts) // 86400000000000) AS hi
       |  FROM events),
       |per AS (
       |  SELECT user_id,
       |    CAST(max(CASE WHEN event_type = 'purchase'
       |      AND epoch_ns(ts) // 86400000000000 < (lo + hi + 1) // 2
       |      THEN 1 ELSE 0 END) AS BIGINT) AS x,
       |    CAST(max(CASE WHEN event_type = 'purchase'
       |      AND epoch_ns(ts) // 86400000000000 >= (lo + hi + 1) // 2
       |      THEN 1 ELSE 0 END) AS BIGINT) AS y
       |  FROM events CROSS JOIN bnd
       |  WHERE user_id IS NOT NULL
       |  GROUP BY 1),
       |a AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS b,
       |    CAST(sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS c
       |  FROM per)
       |SELECT n_pairs, b, c,
       |  ${qrSql("(abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1)" +
         " * (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1)" +
         " / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE))", 8)} AS chi2
       |FROM a""".stripMargin)

  /** 1-D Wasserstein drift between view and purchase value
    * distributions (DiagnosticsOps.wassersteinDrift, 1e-4 grid):
    * exact |cumA·Nb − cumB·Na|·Δv BIGINT sum, one final division.
    */
  private val wassersteinDriftQ = Q(
    (s, d) => DiagnosticsOps.wassersteinDrift(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "view", "purchase", "value", quantDigits = 4)
      .select(col("n_a"), col("n_b"), qround(col("w1"), 8).as("w1")),
    s"""WITH e AS (
       |  SELECT event_type AS c,
       |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v
       |  FROM events
       |  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
       |g AS (
       |  SELECT v,
       |    CAST(sum(CASE WHEN c = 'view' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS ca,
       |    CAST(sum(CASE WHEN c = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS cb
       |  FROM e GROUP BY 1),
       |cum AS (
       |  SELECT v, ca, cb,
       |    CAST(sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cuma,
       |    CAST(sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cumb,
       |    lead(v) OVER (ORDER BY v) - v AS gap
       |  FROM g),
       |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
       |             CAST(sum(cb) AS BIGINT) AS n_b FROM g)
       |SELECT n_a, n_b,
       |  ${qrSql("CAST(sum(abs(cuma * n_b - cumb * n_a)" +
         " * coalesce(gap, 0)) AS DOUBLE) / (CAST(n_a AS DOUBLE)" +
         " * CAST(n_b AS DOUBLE) * 10000.0)", 8)} AS w1
       |FROM cum CROSS JOIN t GROUP BY n_a, n_b""".stripMargin)

  /** Hellinger distance between the same two cohorts over the distinct
    * value grid (DiagnosticsOps.hellingerDrift): value-ordered
    * √(ca·cb) fold, H = √(1 − BC).
    */
  private val hellingerDriftQ = Q(
    (s, d) => DiagnosticsOps.hellingerDrift(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "view", "purchase", "value", quantDigits = 4)
      .select(col("n_a"), col("n_b"), qround(col("bc"), 8).as("bc"),
        qround(col("hellinger"), 8).as("hellinger")),
    s"""WITH e AS (
       |  SELECT event_type AS c,
       |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v
       |  FROM events
       |  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
       |g AS (
       |  SELECT v,
       |    CAST(sum(CASE WHEN c = 'view' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS ca,
       |    CAST(sum(CASE WHEN c = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS cb
       |  FROM e GROUP BY 1),
       |a AS (
       |  SELECT CAST(sum(ca) AS BIGINT) AS n_a,
       |    CAST(sum(cb) AS BIGINT) AS n_b,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list({'v': v,
       |          't': sqrt(CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))}
       |        ORDER BY v), x_ -> x_.t)), (a_, b_) -> a_ + b_) AS sbc
       |  FROM g)
       |SELECT n_a, n_b,
       |  ${qrSql("sbc / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))",
         8)} AS bc,
       |  ${qrSql("sqrt(greatest(0.0, 1.0 - sbc" +
         " / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))))", 8)}
       |    AS hellinger
       |FROM a""".stripMargin)

  // ---------------------------------------------- series diagnostics

  /** Spark-side (event_type × hour) series frame shared by the series
    * diagnostics below — DiagnosticsOps.seriesCounts aggregates it to
    * per-window counts.
    */
  private def hourly(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d).select(col("event_type"),
      expr("ts_ns div 3600000000000L").as("win"))

  /** Oracle CTE `sr`: the same (event_type × hour) count series. */
  private val srSql: String =
    """sr AS (
      |  SELECT event_type AS g, epoch_ns(ts) // 3600000000000 AS h,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2)"""
      .stripMargin

  /** Oracle CTE chain `b`/`gg`/`s`/`acf` mirroring
    * [[operators.StatsOps.autocorrelation]] over `sr` at lags
    * 1..maxLag — the same unrolled-lead shape as the long-standing
    * `autocorrelation` oracle, machine-generated per lag count.
    */
  private def acfSql(maxLag: Int): String = {
    val lags = 1 to maxLag
    val leads = lags.map(l => s"    lead(y, $l) OVER w AS l$l")
      .mkString(",\n")
    val aggs = lags.map(l =>
      s"""    CAST(sum(y * l$l) AS BIGINT) AS sxy$l,
         |    CAST(sum(CASE WHEN l$l IS NOT NULL THEN y END) AS BIGINT)
         |      AS sh$l,
         |    CAST(sum(l$l) AS BIGINT) AS st$l, count(l$l) AS cnt$l"""
        .stripMargin).mkString(",\n")
    val stack = lags.map(l =>
      s"  SELECT g, n, sx, sxx, $l AS lag, sxy$l AS sxy, sh$l AS sh," +
        s" st$l AS st, cnt$l AS cnt FROM gg")
      .mkString("\n  UNION ALL\n")
    s"""b AS (
       |  SELECT g, y,
       |$leads
       |  FROM sr WINDOW w AS (PARTITION BY g ORDER BY h)),
       |gg AS (
       |  SELECT g, count(*) AS n, CAST(sum(y) AS BIGINT) AS sx,
       |    CAST(sum(y * y) AS BIGINT) AS sxx,
       |$aggs
       |  FROM b GROUP BY 1),
       |s AS (
       |$stack),
       |acf AS (
       |  SELECT g, n, lag, cnt,
       |    (CAST(sxy AS DOUBLE)
       |       - (CAST(sx AS DOUBLE) / n)
       |         * (CAST(sh AS DOUBLE) + CAST(st AS DOUBLE))
       |       + CAST(cnt AS DOUBLE) * (CAST(sx AS DOUBLE) / n)
       |         * (CAST(sx AS DOUBLE) / n))
       |      / nullif(CAST(sxx AS DOUBLE)
       |         - CAST(n AS DOUBLE) * (CAST(sx AS DOUBLE) / n)
       |           * (CAST(sx AS DOUBLE) / n), 0.0) AS acf
       |  FROM s)""".stripMargin
  }

  /** Wald-Wolfowitz runs test of each event type's hourly counts
    * around the series median (DiagnosticsOps.runsTest): exact
    * integer run census, closed-form E[R]/Var[R], normal z.
    */
  private val runsTestQ = Q(
    (s, d) => DiagnosticsOps.runsTest(hourly(s, d), "event_type", "win")
      .select(col("event_type"), col("n_above"), col("n_below"),
        col("runs"), qround(col("e_runs"), 8).as("e_runs"),
        qround(col("z"), 8).as("z")),
    s"""WITH $srSql,
       |yh AS (SELECT g, y, CAST(count(*) AS BIGINT) AS c
       |       FROM sr GROUP BY 1, 2),
       |cu AS (
       |  SELECT g, y, c,
       |    CAST(sum(c) OVER (PARTITION BY g ORDER BY y
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
       |  FROM yh),
       |med AS (SELECT g, CAST(min(y) AS BIGINT) AS med
       |        FROM cu WHERE cum >= (n + 1) // 2 GROUP BY 1),
       |sg AS (
       |  SELECT sr.g, h, (y > med) AS s
       |  FROM sr JOIN med ON sr.g = med.g WHERE y <> med),
       |r AS (SELECT g, s,
       |        lag(s) OVER (PARTITION BY g ORDER BY h) AS p
       |      FROM sg),
       |a AS (
       |  SELECT g,
       |    CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN s THEN 0 ELSE 1 END) AS BIGINT) AS n2,
       |    CAST(sum(CASE WHEN p IS NOT NULL AND s <> p
       |      THEN 1 ELSE 0 END) + 1 AS BIGINT) AS runs
       |  FROM r GROUP BY 1)
       |SELECT g AS event_type, n1 AS n_above, n2 AS n_below, runs,
       |  CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 1 THEN
       |    ${qrSql("2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)" +
         " / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1", 8)}
       |  END AS e_runs,
       |  CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 1
       |    AND 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
       |      * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
       |         - (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
       |      / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
       |         * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
       |         * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1)) > 0
       |  THEN
       |    ${qrSql("(CAST(runs AS DOUBLE)" +
         " - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)" +
         " / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1))" +
         " / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)" +
         " * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)" +
         " - (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))" +
         " / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))" +
         " * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))" +
         " * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1)))", 8)}
       |  END AS z
       |FROM a""".stripMargin)

  /** Friedman blocked-rank test: day blocks × event-type treatments,
    * cell value = the day's summed 1e-2-grid event value
    * (DiagnosticsOps.friedmanTest): doubled midranks, tie-corrected
    * χ²_F over complete blocks.
    */
  private val friedmanTestQ = Q(
    (s, d) => DiagnosticsOps.friedmanTest(
        Tables.events(s, d).select(
          expr("ts_ns div 86400000000000L").as("day"),
          col("event_type"), col("value")),
        "day", "event_type", "value", quantDigits = 2)
      .select(col("n_blocks"), col("k"), col("dof"),
        qround(col("chi2"), 8).as("chi2"),
        qround(col("chi2_corr"), 8).as("chi2_corr")),
    s"""WITH cells AS (
       |  SELECT epoch_ns(ts) // 86400000000000 AS b, event_type AS t,
       |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
       |      AS BIGINT) AS y
       |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
       |  GROUP BY 1, 2),
       |kk AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS k FROM cells),
       |comp AS (SELECT b FROM cells GROUP BY 1
       |         HAVING count(*) = (SELECT k FROM kk)),
       |used AS (SELECT cells.b, cells.t, cells.y
       |         FROM cells JOIN comp USING (b)),
       |bh AS (SELECT b, y, CAST(count(*) AS BIGINT) AS tc
       |       FROM used GROUP BY 1, 2),
       |rk AS (
       |  SELECT b, y,
       |    2 * CAST(sum(tc) OVER (PARTITION BY b ORDER BY y
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) - tc + 1 AS dr,
       |    tc * tc * tc - tc AS t3
       |  FROM bh),
       |r2 AS (SELECT t, CAST(sum(dr) AS BIGINT) AS r2
       |       FROM used JOIN rk USING (b, y) GROUP BY 1),
       |ti AS (SELECT CAST(sum(t3) AS BIGINT) AS t3,
       |         CAST(count(DISTINCT b) AS BIGINT) AS n_blocks
       |       FROM rk),
       |sums AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list({'t': t,
       |          'x': CAST(r2 AS DOUBLE) / 2 * (CAST(r2 AS DOUBLE) / 2)}
       |        ORDER BY t), x_ -> x_.x)), (a_, b_) -> a_ + b_) AS sr2
       |  FROM r2)
       |SELECT n_blocks, k, k - 1 AS dof,
       |  CASE WHEN n_blocks > 0 AND k > 1 THEN
       |    ${qrSql("12.0 / (CAST(n_blocks AS DOUBLE)" +
         " * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1)) * sr2" +
         " - 3.0 * CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) + 1)",
         8)}
       |  END AS chi2,
       |  CASE WHEN n_blocks > 0 AND k > 1
       |    AND 1.0 - CAST(t3 AS DOUBLE) / (CAST(n_blocks AS DOUBLE)
       |      * CAST(k AS DOUBLE)
       |      * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1)) > 0
       |  THEN
       |    ${qrSql("(12.0 / (CAST(n_blocks AS DOUBLE)" +
         " * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1)) * sr2" +
         " - 3.0 * CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) + 1))" +
         " / (1.0 - CAST(t3 AS DOUBLE) / (CAST(n_blocks AS DOUBLE)" +
         " * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE)" +
         " * CAST(k AS DOUBLE) - 1)))", 8)}
       |  END AS chi2_corr
       |FROM sums CROSS JOIN ti""".stripMargin)

  /** AR(1) Yule-Walker fit of each event type's hourly count series
    * (DiagnosticsOps.ar1Fit): φ = c₁/c₀ over exact BIGINT moments,
    * innovation variance c₀(1 − φ²).
    */
  private val ar1FitQ = Q(
    (s, d) => DiagnosticsOps.ar1Fit(hourly(s, d), "event_type", "win")
      .select(col("event_type"), col("t"),
        qround(col("mean"), 8).as("mean"),
        qround(col("phi"), 8).as("phi"),
        qround(col("innov_var"), 6).as("innov_var")),
    s"""WITH $srSql,
       |b AS (SELECT g, y,
       |        lead(y) OVER (PARTITION BY g ORDER BY h) AS y1
       |      FROM sr),
       |ag AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS t,
       |    CAST(sum(y) AS BIGINT) AS s,
       |    CAST(sum(y * y) AS BIGINT) AS ss,
       |    CAST(sum(y * y1) AS BIGINT) AS s1,
       |    CAST(sum(CASE WHEN y1 IS NOT NULL THEN y END) AS BIGINT)
       |      AS sh,
       |    CAST(sum(y1) AS BIGINT) AS st,
       |    CAST(count(y1) AS BIGINT) AS c1
       |  FROM b GROUP BY 1),
       |v AS (
       |  SELECT g, t,
       |    CAST(s AS DOUBLE) / CAST(t AS DOUBLE) AS yb,
       |    CAST(ss AS DOUBLE) / CAST(t AS DOUBLE)
       |      - CAST(s AS DOUBLE) / CAST(t AS DOUBLE)
       |        * (CAST(s AS DOUBLE) / CAST(t AS DOUBLE)) AS c0,
       |    (CAST(s1 AS DOUBLE)
       |       - CAST(s AS DOUBLE) / CAST(t AS DOUBLE)
       |         * (CAST(sh AS DOUBLE) + CAST(st AS DOUBLE))
       |       + CAST(c1 AS DOUBLE)
       |         * (CAST(s AS DOUBLE) / CAST(t AS DOUBLE))
       |         * (CAST(s AS DOUBLE) / CAST(t AS DOUBLE)))
       |      / CAST(t AS DOUBLE) AS c1v
       |  FROM ag)
       |SELECT g AS event_type, t, ${qrSql("yb", 8)} AS mean,
       |  ${qrSql("c1v / nullif(c0, 0.0)", 8)} AS phi,
       |  ${qrSql("c0 * (1.0 - c1v / nullif(c0, 0.0)" +
         " * (c1v / nullif(c0, 0.0)))", 6)} AS innov_var
       |FROM v""".stripMargin)

  /** Ljung-Box whiteness Q at lags 1..6 of each event type's hourly
    * counts (DiagnosticsOps.ljungBox on StatsOps.autocorrelation):
    * lag-ordered ρ²/(T−k) fold, dof = computable lags.
    */
  private val ljungBoxQ = Q(
    (s, d) => DiagnosticsOps.ljungBox(hourly(s, d), "event_type", "win",
        maxLag = 6)
      .select(col("event_type"), col("t"), col("dof"),
        qround(col("q"), 6).as("q")),
    s"""WITH $srSql,
       |${acfSql(6)},
       |tq AS (
       |  SELECT g, CAST(max(n) AS BIGINT) AS t,
       |    CAST(count(*) AS BIGINT) AS dof,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list({'l': lag,
       |          'x': acf * acf / CAST(cnt AS DOUBLE)} ORDER BY lag),
       |        x_ -> x_.x)), (a_, b_) -> a_ + b_) AS sq
       |  FROM acf WHERE acf IS NOT NULL GROUP BY 1)
       |SELECT g AS event_type, t, dof,
       |  ${qrSql("CAST(t AS DOUBLE) * (CAST(t AS DOUBLE) + 2) * sq",
         6)} AS q
       |FROM tq""".stripMargin)

  /** Dominant period (lag of max ACF in [2, 24]) of each event type's
    * hourly counts (DiagnosticsOps.dominantPeriod) — the daily cycle
    * detector; (acf desc, lag asc) rank over the lag domain.
    */
  private val dominantPeriodQ = Q(
    (s, d) => DiagnosticsOps.dominantPeriod(hourly(s, d), "event_type",
        "win", maxLag = 24)
      .select(col("event_type"), col("n"), col("period"),
        qround(col("acf"), 8).as("acf")),
    s"""WITH $srSql,
       |${acfSql(24)},
       |sel AS (
       |  SELECT g, n, lag, acf,
       |    row_number() OVER (PARTITION BY g ORDER BY acf DESC, lag)
       |      AS r
       |  FROM acf WHERE lag >= 2 AND acf IS NOT NULL)
       |SELECT g AS event_type, CAST(n AS BIGINT) AS n,
       |  CAST(lag AS BIGINT) AS period, ${qrSql("acf", 8)} AS acf
       |FROM sel WHERE r = 1""".stripMargin)

  /** Lead/lag cross-correlation between view and purchase hourly
    * counts at lags −6..6 (DiagnosticsOps.crossCorrelation): window
    * domain × lags self-join, exact BIGINT moments, closed-form r.
    */
  private val crossCorrelationQ = Q(
    (s, d) => DiagnosticsOps.crossCorrelation(
        Tables.events(s, d).select(col("event_type"),
          expr("ts_ns div 3600000000000L").as("win")),
        "event_type", "view", "purchase", "win", maxLag = 6)
      .select(col("lag"), col("n_pairs"),
        qround(col("ccf"), 8).as("ccf")),
    s"""WITH dom AS (
       |  SELECT epoch_ns(ts) // 3600000000000 AS h,
       |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS xa,
       |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS xb
       |  FROM events WHERE event_type IN ('view', 'purchase')
       |  GROUP BY 1),
       |lg AS (SELECT CAST(range AS BIGINT) AS lag FROM range(-6, 7)),
       |p AS (
       |  SELECT lag, t.xa AS a, u.xb AS b
       |  FROM dom t CROSS JOIN lg JOIN dom u ON u.h = t.h + lag),
       |ag AS (
       |  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
       |    CAST(sum(a * a) AS BIGINT) AS saa,
       |    CAST(sum(b * b) AS BIGINT) AS sbb,
       |    CAST(sum(a * b) AS BIGINT) AS sab
       |  FROM p GROUP BY 1)
       |SELECT lag, n_pairs,
       |  ${qrSql("(CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE)" +
         " * CAST(sb AS DOUBLE) / CAST(n_pairs AS DOUBLE))" +
         " / nullif(sqrt((CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE)" +
         " * CAST(sa AS DOUBLE) / CAST(n_pairs AS DOUBLE))" +
         " * (CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE)" +
         " * CAST(sb AS DOUBLE) / CAST(n_pairs AS DOUBLE))), 0.0)",
         8)} AS ccf
       |FROM ag""".stripMargin)

  /** Page-Hinkley mean-shift monitor per event type's hourly counts
    * (DiagnosticsOps.pageHinkley, δ=0.1, λ=10): hour-ordered LIST-
    * state fold (DuckDB struct lambdas rebind acc fields — the
    * holt_winters lesson), alarm census against the running minimum.
    */
  private val pageHinkleyQ = Q(
    (s, d) => DiagnosticsOps.pageHinkley(hourly(s, d), "event_type",
        "win", delta = 0.1, lambda = 10.0)
      .select(col("event_type"), col("n_windows"),
        qround(col("ph_final"), 6).as("ph_final"),
        qround(col("max_excess"), 6).as("max_excess"),
        col("alarm_windows")),
    s"""WITH $srSql,
       |arrs AS (
       |  SELECT g, list({'h': h, 'y': CAST(y AS DOUBLE)} ORDER BY h)
       |    AS arr
       |  FROM sr GROUP BY 1),
       |st AS (
       |  SELECT g, len(arr) AS n_windows,
       |    list_reduce(list_prepend(
       |      [CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
       |       CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
       |       CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
       |      list_transform(arr, e_ -> [e_.y, CAST(0.0 AS DOUBLE),
       |        CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
       |        CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)])),
       |      (acc, x_) -> [
       |        acc[1] + 1.0,
       |        acc[2] + x_[1],
       |        acc[3] + (x_[1] - (acc[2] + x_[1]) / (acc[1] + 1.0)
       |          - CAST(0.1 AS DOUBLE)),
       |        least(acc[4], acc[3] + (x_[1]
       |          - (acc[2] + x_[1]) / (acc[1] + 1.0)
       |          - CAST(0.1 AS DOUBLE))),
       |        greatest(acc[5], acc[3] + (x_[1]
       |          - (acc[2] + x_[1]) / (acc[1] + 1.0)
       |          - CAST(0.1 AS DOUBLE)) - acc[4]),
       |        acc[6] + CASE WHEN acc[3] + (x_[1]
       |          - (acc[2] + x_[1]) / (acc[1] + 1.0)
       |          - CAST(0.1 AS DOUBLE)) - acc[4]
       |          > CAST(10.0 AS DOUBLE) THEN 1.0 ELSE 0.0 END]) AS st
       |  FROM arrs)
       |SELECT g AS event_type, CAST(n_windows AS BIGINT) AS n_windows,
       |  ${qrSql("st[3]", 6)} AS ph_final,
       |  ${qrSql("st[5]", 6)} AS max_excess,
       |  CAST(st[6] AS BIGINT) AS alarm_windows
       |FROM st""".stripMargin)

  /** Granger-lite F for view→purchase on the hourly count series
    * (DiagnosticsOps.grangerLite): restricted y~y₋₁ vs full
    * y~y₋₁+x₋₁ closed-form OLS over exact BIGINT moments.
    */
  private val grangerLiteQ = Q(
    (s, d) => DiagnosticsOps.grangerLite(
        Tables.events(s, d).select(col("event_type"),
          expr("ts_ns div 3600000000000L").as("win")),
        "event_type", "view", "purchase", "win")
      .select(col("t"), qround(col("beta_cause"), 8).as("beta_cause"),
        qround(col("rss_restricted"), 6).as("rss_restricted"),
        qround(col("rss_full"), 6).as("rss_full"),
        qround(col("f"), 8).as("f")),
    s"""WITH dom AS (
       |  SELECT epoch_ns(ts) // 3600000000000 AS h,
       |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS x,
       |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS yv
       |  FROM events WHERE event_type IN ('view', 'purchase')
       |  GROUP BY 1),
       |r AS (
       |  SELECT yv, lag(yv, 1) OVER (ORDER BY h) AS p,
       |    lag(x, 1) OVER (ORDER BY h) AS q
       |  FROM dom),
       |rr AS (SELECT yv, p, q FROM r WHERE p IS NOT NULL),
       |ag AS (
       |  SELECT CAST(count(*) AS BIGINT) AS t,
       |    CAST(sum(yv) AS BIGINT) AS sy, CAST(sum(p) AS BIGINT) AS sp,
       |    CAST(sum(q) AS BIGINT) AS sq,
       |    CAST(sum(yv * yv) AS BIGINT) AS syy,
       |    CAST(sum(p * p) AS BIGINT) AS spp,
       |    CAST(sum(q * q) AS BIGINT) AS sqq,
       |    CAST(sum(p * q) AS BIGINT) AS spq,
       |    CAST(sum(p * yv) AS BIGINT) AS spy,
       |    CAST(sum(q * yv) AS BIGINT) AS sqy
       |  FROM rr),
       |c AS (
       |  SELECT t,
       |    CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)
       |      / CAST(t AS DOUBLE) AS cpp,
       |    CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)
       |      / CAST(t AS DOUBLE) AS cqq,
       |    CAST(spq AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sq AS DOUBLE)
       |      / CAST(t AS DOUBLE) AS cpq,
       |    CAST(spy AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sy AS DOUBLE)
       |      / CAST(t AS DOUBLE) AS cpy,
       |    CAST(sqy AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sy AS DOUBLE)
       |      / CAST(t AS DOUBLE) AS cqy,
       |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
       |      / CAST(t AS DOUBLE) AS cyy
       |  FROM ag),
       |m AS (
       |  SELECT t, cpp, cqq, cpq, cpy, cqy, cyy,
       |    cyy - CASE WHEN cpp > 0 THEN cpy * cpy / cpp
       |          ELSE 0.0 END AS rssr,
       |    cpp * cqq - cpq * cpq AS det
       |  FROM c),
       |m2 AS (
       |  SELECT t, cpy, cqy, cyy, rssr, det,
       |    (cpy * cqq - cqy * cpq) / det AS bp,
       |    (cqy * cpp - cpy * cpq) / det AS bq
       |  FROM m),
       |m3 AS (
       |  SELECT t, rssr, det, bq,
       |    cyy - bp * cpy - bq * cqy AS rssf
       |  FROM m2)
       |SELECT t,
       |  CASE WHEN t > 3 AND det > 0 AND rssf > 0
       |    THEN ${qrSql("bq", 8)} END AS beta_cause,
       |  CASE WHEN t > 3 AND det > 0 AND rssf > 0
       |    THEN ${qrSql("rssr", 6)} END AS rss_restricted,
       |  CASE WHEN t > 3 AND det > 0 AND rssf > 0
       |    THEN ${qrSql("rssf", 6)} END AS rss_full,
       |  CASE WHEN t > 3 AND det > 0 AND rssf > 0
       |    THEN ${qrSql("(rssr - rssf) / (rssf / (CAST(t AS DOUBLE)" +
         " - 3))", 8)} END AS f
       |FROM m3""".stripMargin)

  /** Two-sample Cramér–von Mises ω² between view and purchase value
    * distributions (DiagnosticsOps.cvmDrift, 1e-4 grid): squared CDF
    * gap integrated under the pooled distribution, value-ordered fold.
    */
  private val cvmDriftQ = Q(
    (s, d) => DiagnosticsOps.cvmDrift(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "view", "purchase", "value", quantDigits = 4)
      .select(col("n_a"), col("n_b"), qround(col("t"), 8).as("t")),
    s"""WITH e AS (
       |  SELECT event_type AS c,
       |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v
       |  FROM events
       |  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
       |g AS (
       |  SELECT v,
       |    CAST(sum(CASE WHEN c = 'view' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS ca,
       |    CAST(sum(CASE WHEN c = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS cb
       |  FROM e GROUP BY 1),
       |t0 AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
       |              CAST(sum(cb) AS BIGINT) AS n_b FROM g),
       |cum AS (
       |  SELECT v, ca, cb,
       |    CAST(sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cuma,
       |    CAST(sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cumb
       |  FROM g),
       |a AS (
       |  SELECT max(n_a) AS n_a, max(n_b) AS n_b,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list({'v': v, 'x':
       |        (CAST(cuma AS DOUBLE) * CAST(n_b AS DOUBLE)
       |           - CAST(cumb AS DOUBLE) * CAST(n_a AS DOUBLE))
       |          / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
       |        * ((CAST(cuma AS DOUBLE) * CAST(n_b AS DOUBLE)
       |            - CAST(cumb AS DOUBLE) * CAST(n_a AS DOUBLE))
       |          / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
       |        * (CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE))}
       |        ORDER BY v), x_ -> x_.x)), (a_, b_) -> a_ + b_) AS s
       |  FROM cum CROSS JOIN t0)
       |SELECT n_a, n_b,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN
       |    ${qrSql("CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)" +
         " / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))" +
         " * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))) * s", 8)}
       |  END AS t
       |FROM a""".stripMargin)

  /** 1-D energy distance between the same cohorts
    * (DiagnosticsOps.energyDrift): 2·Σ(F_a−F_b)²·Δv/scale over the
    * grid — the metric companion to cvm_drift's pooled-weighted form.
    */
  private val energyDriftQ = Q(
    (s, d) => DiagnosticsOps.energyDrift(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "view", "purchase", "value", quantDigits = 4)
      .select(col("n_a"), col("n_b"),
        qround(col("energy"), 8).as("energy")),
    s"""WITH e AS (
       |  SELECT event_type AS c,
       |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v
       |  FROM events
       |  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
       |g AS (
       |  SELECT v,
       |    CAST(sum(CASE WHEN c = 'view' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS ca,
       |    CAST(sum(CASE WHEN c = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS cb
       |  FROM e GROUP BY 1),
       |t0 AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
       |              CAST(sum(cb) AS BIGINT) AS n_b FROM g),
       |cum AS (
       |  SELECT v,
       |    CAST(sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cuma,
       |    CAST(sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cumb,
       |    lead(v) OVER (ORDER BY v) - v AS gap
       |  FROM g),
       |a AS (
       |  SELECT max(n_a) AS n_a, max(n_b) AS n_b,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list({'v': v, 'x':
       |        (CAST(cuma AS DOUBLE) * CAST(n_b AS DOUBLE)
       |           - CAST(cumb AS DOUBLE) * CAST(n_a AS DOUBLE))
       |          / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
       |        * ((CAST(cuma AS DOUBLE) * CAST(n_b AS DOUBLE)
       |            - CAST(cumb AS DOUBLE) * CAST(n_a AS DOUBLE))
       |          / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
       |        * CAST(coalesce(gap, 0) AS DOUBLE)}
       |        ORDER BY v), x_ -> x_.x)), (a_, b_) -> a_ + b_) AS s
       |  FROM cum CROSS JOIN t0)
       |SELECT n_a, n_b,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN
       |    ${qrSql("2.0 * s / 10000.0", 8)}
       |  END AS energy
       |FROM a""".stripMargin)

  /** Shared oracle CTE for the paired first-half/second-half per-user
    * value deltas (1e-2 grid) used by sign_test and
    * wilcoxon_signed_rank.
    */
  private val pairedSql: String =
    """bnd AS (
      |  SELECT min(epoch_ns(ts) // 86400000000000) AS lo,
      |    max(epoch_ns(ts) // 86400000000000) AS hi
      |  FROM events),
      |per AS (
      |  SELECT user_id,
      |    CAST(sum(coalesce(CASE
      |      WHEN epoch_ns(ts) // 86400000000000 >= (lo + hi + 1) // 2
      |      THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) END, 0))
      |      AS BIGINT)
      |    - CAST(sum(coalesce(CASE
      |      WHEN epoch_ns(ts) // 86400000000000 < (lo + hi + 1) // 2
      |      THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) END, 0))
      |      AS BIGINT) AS d
      |  FROM events CROSS JOIN bnd
      |  WHERE user_id IS NOT NULL
      |  GROUP BY 1)""".stripMargin

  /** Spark-side paired frame matching [[pairedSql]]. */
  private def pairedFrame(s: org.apache.spark.sql.SparkSession,
                          d: String) = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts_ns"), col("value"))
    val b = ev.agg(
      min(expr("ts_ns div 86400000000000L")).as("_lo"),
      max(expr("ts_ns div 86400000000000L")).as("_hi"))
    ev.crossJoin(broadcast(b)).select(col("user_id"),
      when(expr("ts_ns div 86400000000000L") <
        expr("(_lo + _hi + 1) div 2"), col("value")).as("pre"),
      when(expr("ts_ns div 86400000000000L") >=
        expr("(_lo + _hi + 1) div 2"), col("value")).as("post"))
  }

  /** Paired sign test of per-user value mass, first vs second half of
    * the observed span (DiagnosticsOps.signTest): b/c census and the
    * continuity-corrected normal z.
    */
  private val signTestQ = Q(
    (s, d) => DiagnosticsOps.signTest(pairedFrame(s, d), "user_id",
        "pre", "post", quantDigits = 2)
      .select(col("b"), col("c"), col("n_zero"),
        qround(col("z"), 8).as("z")),
    s"""WITH $pairedSql,
       |a AS (
       |  SELECT
       |    CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
       |    CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
       |    CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_zero
       |  FROM per)
       |SELECT b, c, n_zero,
       |  CASE WHEN b + c > 0 THEN
       |    ${qrSql("(CASE WHEN CAST(b AS DOUBLE) - CAST(c AS DOUBLE) > 0" +
         " THEN 1.0 WHEN CAST(b AS DOUBLE) - CAST(c AS DOUBLE) < 0" +
         " THEN -1.0 ELSE 0.0 END)" +
         " * (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1)" +
         " / sqrt(CAST(b AS DOUBLE) + CAST(c AS DOUBLE))", 8)}
       |  END AS z
       |FROM a""".stripMargin)

  /** Wilcoxon signed-rank on the same paired deltas
    * (DiagnosticsOps.wilcoxonSignedRank): doubled midranks of |d|,
    * exact tie-corrected variance, normal z.
    */
  private val wilcoxonSignedRankQ = Q(
    (s, d) => DiagnosticsOps.wilcoxonSignedRank(pairedFrame(s, d),
        "user_id", "pre", "post", quantDigits = 2)
      .select(col("n"), qround(col("w_plus"), 4).as("w_plus"),
        qround(col("z"), 8).as("z")),
    s"""WITH $pairedSql,
       |nz AS (SELECT abs(d) AS ad, d > 0 AS pos FROM per WHERE d <> 0),
       |h AS (SELECT ad, CAST(count(*) AS BIGINT) AS t,
       |        CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
       |          AS tp
       |      FROM nz GROUP BY 1),
       |rk AS (
       |  SELECT t, tp,
       |    2 * CAST(sum(t) OVER (ORDER BY ad ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) - t + 1 AS dr
       |  FROM h),
       |a AS (
       |  SELECT CAST(sum(t) AS BIGINT) AS n,
       |    CAST(sum(dr * tp) AS BIGINT) AS w2,
       |    CAST(sum(t * t * t - t) AS BIGINT) AS t3
       |  FROM rk)
       |SELECT n, ${qrSql("CAST(w2 AS DOUBLE) / 2", 4)} AS w_plus,
       |  CASE WHEN n > 0
       |    AND CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
       |      * (2.0 * CAST(n AS DOUBLE) + 1) / 6
       |      - CAST(t3 AS DOUBLE) / 12 > 0
       |  THEN
       |    ${qrSql("(CAST(w2 AS DOUBLE) - CAST(n AS DOUBLE)" +
         " * (CAST(n AS DOUBLE) + 1) / 2)" +
         " / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)" +
         " * (2.0 * CAST(n AS DOUBLE) + 1) / 6" +
         " - CAST(t3 AS DOUBLE) / 12)", 8)}
       |  END AS z
       |FROM a""".stripMargin)

  /** Cochran's Q: did each user's purchase incidence differ across
    * the three tertiles of the observed span
    * (DiagnosticsOps.cochranQ over a dense user × tertile frame):
    * all-integer closed form, one division.
    */
  private val cochranQQ = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts_ns"), col("event_type"))
      val b = ev.agg(
        min(expr("ts_ns div 86400000000000L")).as("_lo"),
        max(expr("ts_ns div 86400000000000L")).as("_hi"))
      val tid = expr(
        "((ts_ns div 86400000000000L) - _lo) * 3 div (_hi - _lo + 1)")
      def hit(i: Int) = max(when(tid === i &&
        col("event_type") === "purchase", 1L).otherwise(0L))
      val per = ev.where(col("user_id").isNotNull)
        .crossJoin(broadcast(b))
        .groupBy("user_id")
        .agg(hit(0).as("x0"), hit(1).as("x1"), hit(2).as("x2"))
      val melted = per.select(col("user_id"), expr(
        "stack(3, 0L, x0 = 1, 1L, x1 = 1, 2L, x2 = 1) as (treat, x)"))
      DiagnosticsOps.cochranQ(melted, "user_id", "treat", "x")
        .select(col("n_blocks"), col("k"), col("dof"),
          qround(col("q"), 8).as("q"))
    },
    s"""WITH bnd AS (
       |  SELECT min(epoch_ns(ts) // 86400000000000) AS lo,
       |    max(epoch_ns(ts) // 86400000000000) AS hi
       |  FROM events),
       |per AS (
       |  SELECT user_id,
       |    CAST(max(CASE WHEN (epoch_ns(ts) // 86400000000000 - lo) * 3
       |        // (hi - lo + 1) = 0 AND event_type = 'purchase'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS x0,
       |    CAST(max(CASE WHEN (epoch_ns(ts) // 86400000000000 - lo) * 3
       |        // (hi - lo + 1) = 1 AND event_type = 'purchase'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS x1,
       |    CAST(max(CASE WHEN (epoch_ns(ts) // 86400000000000 - lo) * 3
       |        // (hi - lo + 1) = 2 AND event_type = 'purchase'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS x2
       |  FROM events CROSS JOIN bnd
       |  WHERE user_id IS NOT NULL
       |  GROUP BY 1),
       |a AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_blocks,
       |    CAST(3 AS BIGINT) AS k,
       |    CAST(sum(x0) + sum(x1) + sum(x2) AS BIGINT) AS n,
       |    CAST(sum(x0) * sum(x0) + sum(x1) * sum(x1)
       |      + sum(x2) * sum(x2) AS BIGINT) AS st2,
       |    CAST(sum((x0 + x1 + x2) * (x0 + x1 + x2)) AS BIGINT) AS su2
       |  FROM per)
       |SELECT n_blocks, k, k - 1 AS dof,
       |  CASE WHEN k > 1 AND k * n - su2 > 0 THEN
       |    ${qrSql("CAST((k - 1) * (k * st2 - n * n) AS DOUBLE)" +
         " / CAST(k * n - su2 AS DOUBLE)", 8)}
       |  END AS q
       |FROM a""".stripMargin)

  /** Kendall τ-b between the view and purchase hourly count series
    * (DiagnosticsOps.kendallTau): O(T log T) inversion census on the
    * Spark side, verified against the oracle's direct O(T²) pair
    * count.
    */
  private val kendallTauQ = Q(
    (s, d) => DiagnosticsOps.kendallTau(
        Tables.events(s, d).select(col("event_type"),
          expr("ts_ns div 3600000000000L").as("win")),
        "event_type", "view", "purchase", "win")
      .select(col("t"), col("concordant"), col("discordant"),
        qround(col("tau_b"), 8).as("tau_b"),
        qround(col("gamma"), 8).as("gamma"),
        qround(col("somers_dyx"), 8).as("somers_dyx"),
        qround(col("somers_dxy"), 8).as("somers_dxy")),
    s"""WITH dom AS (
       |  SELECT epoch_ns(ts) // 3600000000000 AS h,
       |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS x,
       |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS yv
       |  FROM events WHERE event_type IN ('view', 'purchase')
       |  GROUP BY 1),
       |pr AS (
       |  SELECT
       |    CAST(sum(CASE WHEN (a.x < b.x AND a.yv < b.yv)
       |      OR (a.x > b.x AND a.yv > b.yv) THEN 1 ELSE 0 END)
       |      AS BIGINT) AS c,
       |    CAST(sum(CASE WHEN (a.x < b.x AND a.yv > b.yv)
       |      OR (a.x > b.x AND a.yv < b.yv) THEN 1 ELSE 0 END)
       |      AS BIGINT) AS d
       |  FROM dom a JOIN dom b ON a.h < b.h),
       |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM dom),
       |n1 AS (SELECT CAST(coalesce(sum(c * (c - 1) // 2), 0) AS BIGINT)
       |         AS n1
       |       FROM (SELECT count(*) AS c FROM dom GROUP BY x)),
       |n2 AS (SELECT CAST(coalesce(sum(c * (c - 1) // 2), 0) AS BIGINT)
       |         AS n2
       |       FROM (SELECT count(*) AS c FROM dom GROUP BY yv))
       |SELECT t, c AS concordant, d AS discordant,
       |  CASE WHEN t > 1
       |    AND sqrt(CAST(t * (t - 1) // 2 - n1 AS DOUBLE)
       |      * CAST(t * (t - 1) // 2 - n2 AS DOUBLE)) > 0
       |  THEN
       |    ${qrSql("(CAST(c AS DOUBLE) - CAST(d AS DOUBLE))" +
         " / sqrt(CAST(t * (t - 1) // 2 - n1 AS DOUBLE)" +
         " * CAST(t * (t - 1) // 2 - n2 AS DOUBLE))", 8)}
       |  END AS tau_b,
       |  ${qrSql("(CAST(c AS DOUBLE) - CAST(d AS DOUBLE))" +
         " / nullif(CAST(c AS DOUBLE) + CAST(d AS DOUBLE), 0.0)", 8)}
       |    AS gamma,
       |  ${qrSql("(CAST(c AS DOUBLE) - CAST(d AS DOUBLE))" +
         " / nullif(CAST(t * (t - 1) // 2 - n1 AS DOUBLE), 0.0)", 8)}
       |    AS somers_dyx,
       |  ${qrSql("(CAST(c AS DOUBLE) - CAST(d AS DOUBLE))" +
         " / nullif(CAST(t * (t - 1) // 2 - n2 AS DOUBLE), 0.0)", 8)}
       |    AS somers_dxy
       |FROM pr CROSS JOIN tt CROSS JOIN n1 CROSS JOIN n2"""
      .stripMargin)

  /** Streaming Page-Hinkley twin on the batch frame
    * (streaming.StreamingOps.pageHinkleyStream — commutative
    * (window → count) map state, batch-equality pinned in
    * StreamingOpsSpec): same oracle as the batch page_hinkley.
    */
  private val streamPageHinkleyQ = Q(
    (s, d) => graft.streaming.StreamingOps.pageHinkleyStream(s,
        hourly(s, d), "event_type", "win", delta = 0.1, lambda = 10.0)
      .select(col("event_type"), col("n_windows"),
        qround(col("ph_final"), 6).as("ph_final"),
        qround(col("max_excess"), 6).as("max_excess"),
        col("alarm_windows")),
    pageHinkleyQ.sql)

  /** Two-cohort log-rank survival test: even- vs odd-user-id cohorts
    * under kaplan_meier's lifetime/censoring model
    * (SequenceOps.logRankTest, censorDays=1): O−E over the death-time
    * domain, hypergeometric variance, z and χ².
    */
  private val logrankTestQ = Q(
    (s, d) => operators.SequenceOps.logRankTest(
        Tables.events(s, d).select(col("user_id"), col("ts_ns"),
          pmod(col("user_id"), lit(2)).cast("string").as("grp")),
        "user_id", "ts_ns", "grp", "0", "1", censorDays = 1)
      .select(col("n_a"), col("n_b"), col("o_a"),
        qround(col("e_a"), 6).as("e_a"), qround(col("v"), 6).as("v"),
        qround(col("z"), 8).as("z"),
        qround(col("chi2"), 8).as("chi2")),
    s"""WITH pk AS (
       |  SELECT user_id,
       |    min(epoch_ns(ts) // 86400000000000) AS d0,
       |    max(epoch_ns(ts) // 86400000000000) AS d1,
       |    CAST(max(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS ia
       |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
       |e2 AS (SELECT max(d1) AS endd FROM pk),
       |lv AS (SELECT d1 - d0 AS t, d1 <= endd - 1 AS dead, ia
       |       FROM pk CROSS JOIN e2),
       |tot AS (SELECT CAST(sum(ia) AS BIGINT) AS n_a,
       |               CAST(sum(1 - ia) AS BIGINT) AS n_b FROM lv),
       |h AS (
       |  SELECT t,
       |    CAST(sum(CASE WHEN dead AND ia = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS da,
       |    CAST(sum(CASE WHEN NOT dead AND ia = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN dead AND ia = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS db,
       |    CAST(sum(CASE WHEN NOT dead AND ia = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS cb
       |  FROM lv GROUP BY 1),
       |ar AS (
       |  SELECT t, da, db, n_a, n_b,
       |    n_a - CAST(sum(da + ca) OVER (ORDER BY t
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) + da + ca AS n1,
       |    n_b - CAST(sum(db + cb) OVER (ORDER BY t
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) + db + cb AS n2
       |  FROM h CROSS JOIN tot),
       |dt AS (SELECT * FROM ar WHERE da + db > 0),
       |ag AS (
       |  SELECT max(n_a) AS n_a, max(n_b) AS n_b,
       |    CAST(sum(da) AS BIGINT) AS o_a,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list({'t': t, 'x':
       |        (CAST(da AS DOUBLE) + CAST(db AS DOUBLE))
       |          * CAST(n1 AS DOUBLE)
       |          / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))}
       |        ORDER BY t), x_ -> x_.x)), (a_, b_) -> a_ + b_) AS e_a,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list({'t': t, 'x':
       |        CASE WHEN CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) > 1
       |        THEN (CAST(da AS DOUBLE) + CAST(db AS DOUBLE))
       |          * (CAST(n1 AS DOUBLE)
       |             / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
       |          * (CAST(n2 AS DOUBLE)
       |             / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
       |          * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)
       |              - (CAST(da AS DOUBLE) + CAST(db AS DOUBLE)))
       |             / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1))
       |        ELSE 0.0 END}
       |        ORDER BY t), x_ -> x_.x)), (a_, b_) -> a_ + b_) AS v
       |  FROM dt)
       |SELECT n_a, n_b, o_a, ${qrSql("e_a", 6)} AS e_a,
       |  ${qrSql("v", 6)} AS v,
       |  CASE WHEN v > 0 THEN
       |    ${qrSql("(CAST(o_a AS DOUBLE) - e_a) / sqrt(v)", 8)}
       |  END AS z,
       |  CASE WHEN v > 0 THEN
       |    ${qrSql("(CAST(o_a AS DOUBLE) - e_a)" +
         " * (CAST(o_a AS DOUBLE) - e_a) / v", 8)}
       |  END AS chi2
       |FROM ag""".stripMargin)

  /** Mood's median test of event value across event types
    * (DiagnosticsOps.medianTest, 1e-2 grid): exact pooled-median rank
    * select, 2×k census, group-ordered χ² fold.
    */
  private val medianTestQ = Q(
    (s, d) => DiagnosticsOps.medianTest(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "value", quantDigits = 2)
      .select(col("k"), col("n"), col("dof"),
        qround(col("chi2"), 8).as("chi2")),
    s"""WITH e AS (
       |  SELECT event_type AS g,
       |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
       |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
       |h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
       |      FROM e GROUP BY 1, 2),
       |p AS (SELECT v, CAST(sum(c) AS BIGINT) AS pc FROM h GROUP BY 1),
       |tq AS (SELECT CAST(sum(pc) AS BIGINT) AS nn FROM p),
       |med AS (
       |  SELECT CAST(min(v) AS BIGINT) AS med
       |  FROM (SELECT v, CAST(sum(pc) OVER (ORDER BY v
       |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM p)
       |    CROSS JOIN tq
       |  WHERE cum >= (nn + 1) // 2),
       |cells AS (
       |  SELECT g,
       |    CAST(sum(CASE WHEN v > med THEN c ELSE 0 END) AS BIGINT)
       |      AS a,
       |    CAST(sum(CASE WHEN v <= med THEN c ELSE 0 END) AS BIGINT)
       |      AS b
       |  FROM h CROSS JOIN med GROUP BY 1),
       |m AS (SELECT CAST(sum(a) AS BIGINT) AS ta,
       |             CAST(sum(b) AS BIGINT) AS tb FROM cells),
       |ag AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum(a + b) AS BIGINT) AS n,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list({'g': g, 'x':
       |        (CAST(a AS DOUBLE) - (CAST(a AS DOUBLE)
       |           + CAST(b AS DOUBLE)) * CAST(ta AS DOUBLE)
       |           / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE)))
       |        * (CAST(a AS DOUBLE) - (CAST(a AS DOUBLE)
       |           + CAST(b AS DOUBLE)) * CAST(ta AS DOUBLE)
       |           / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE)))
       |        / ((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
       |           * CAST(ta AS DOUBLE)
       |           / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE)))
       |        + (CAST(b AS DOUBLE) - (CAST(a AS DOUBLE)
       |           + CAST(b AS DOUBLE)) * CAST(tb AS DOUBLE)
       |           / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE)))
       |        * (CAST(b AS DOUBLE) - (CAST(a AS DOUBLE)
       |           + CAST(b AS DOUBLE)) * CAST(tb AS DOUBLE)
       |           / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE)))
       |        / ((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
       |           * CAST(tb AS DOUBLE)
       |           / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE)))}
       |        ORDER BY g), x_ -> x_.x)), (a_, b_) -> a_ + b_)
       |      AS chi2
       |  FROM cells CROSS JOIN m)
       |SELECT k, n, k - 1 AS dof,
       |  CASE WHEN k > 1 THEN ${qrSql("chi2", 8)} END AS chi2
       |FROM ag""".stripMargin)

  /** Polynomial-kernel (degree-2) MMD between view and purchase value
    * distributions (DiagnosticsOps.mmdDrift, γ=100, 1e-4 grid):
    * exact-moment matching in closed form.
    */
  private val mmdDriftQ = Q(
    (s, d) => DiagnosticsOps.mmdDrift(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "view", "purchase", "value", gamma = 100.0,
        quantDigits = 4)
      .select(col("n_a"), col("n_b"),
        qround(col("mmd2"), 10).as("mmd2")),
    s"""WITH e AS (
       |  SELECT event_type AS c,
       |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v
       |  FROM events
       |  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
       |a AS (
       |  SELECT
       |    CAST(sum(CASE WHEN c = 'view' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS na,
       |    CAST(sum(CASE WHEN c = 'view' THEN v ELSE 0 END) AS BIGINT)
       |      AS sa,
       |    CAST(sum(CASE WHEN c = 'view' THEN v * v ELSE 0 END)
       |      AS BIGINT) AS ssa,
       |    CAST(sum(CASE WHEN c = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS nb,
       |    CAST(sum(CASE WHEN c = 'purchase' THEN v ELSE 0 END)
       |      AS BIGINT) AS sb,
       |    CAST(sum(CASE WHEN c = 'purchase' THEN v * v ELSE 0 END)
       |      AS BIGINT) AS ssb
       |  FROM e),
       |v AS (
       |  SELECT na, nb,
       |    CAST(sa AS DOUBLE) / 10000.0 / CAST(na AS DOUBLE)
       |      - CAST(sb AS DOUBLE) / 10000.0 / CAST(nb AS DOUBLE) AS d1,
       |    CAST(ssa AS DOUBLE) / 100000000.0 / CAST(na AS DOUBLE)
       |      - CAST(ssb AS DOUBLE) / 100000000.0 / CAST(nb AS DOUBLE)
       |      AS d2
       |  FROM a)
       |SELECT na AS n_a, nb AS n_b,
       |  CASE WHEN na > 0 AND nb > 0 THEN
       |    ${qrSql("2.0 / 100.0 * (d1 * d1)" +
         " + d2 * d2 / (100.0 * 100.0)", 10)}
       |  END AS mmd2
       |FROM v""".stripMargin)

  /** Cohen's d / Hedges' g between view and purchase values
    * (DiagnosticsOps.cohensD, 1e-4 grid): pooled-SD effect size with
    * the small-sample correction.
    */
  private val cohensDQ = Q(
    (s, d) => DiagnosticsOps.cohensD(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "view", "purchase", "value", quantDigits = 4)
      .select(col("n_a"), col("n_b"),
        qround(col("pooled_sd"), 8).as("pooled_sd"),
        qround(col("d"), 8).as("d"),
        qround(col("hedges_g"), 8).as("hedges_g")),
    s"""WITH e AS (
       |  SELECT event_type AS c,
       |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v
       |  FROM events
       |  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
       |a AS (
       |  SELECT
       |    CAST(sum(CASE WHEN c = 'view' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS na,
       |    CAST(sum(CASE WHEN c = 'view' THEN v ELSE 0 END) AS BIGINT)
       |      AS sa,
       |    CAST(sum(CASE WHEN c = 'view' THEN v * v ELSE 0 END)
       |      AS BIGINT) AS ssa,
       |    CAST(sum(CASE WHEN c = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS nb,
       |    CAST(sum(CASE WHEN c = 'purchase' THEN v ELSE 0 END)
       |      AS BIGINT) AS sb,
       |    CAST(sum(CASE WHEN c = 'purchase' THEN v * v ELSE 0 END)
       |      AS BIGINT) AS ssb
       |  FROM e),
       |v AS (
       |  SELECT na, nb,
       |    CAST(sa AS DOUBLE) / 10000.0 / CAST(na AS DOUBLE) AS ma,
       |    CAST(sb AS DOUBLE) / 10000.0 / CAST(nb AS DOUBLE) AS mb,
       |    sqrt(((CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE)
       |        * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)) / 100000000.0
       |      + (CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE)
       |        * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) / 100000000.0)
       |      / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2)) AS sp
       |  FROM a)
       |SELECT na AS n_a, nb AS n_b,
       |  CASE WHEN na > 1 AND nb > 1 AND sp > 0
       |    THEN ${qrSql("sp", 8)} END AS pooled_sd,
       |  CASE WHEN na > 1 AND nb > 1 AND sp > 0
       |    THEN ${qrSql("(ma - mb) / sp", 8)} END AS d,
       |  CASE WHEN na > 1 AND nb > 1 AND sp > 0
       |    THEN ${qrSql("(ma - mb) / sp * (1.0 - 3.0" +
         " / (4.0 * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) - 9))",
         8)} END AS hedges_g
       |FROM v""".stripMargin)

  /** Cochran-Armitage trend of the purchase share across the three
    * span tertiles (DiagnosticsOps.cochranArmitage): dose = tertile
    * index per event, outcome = is-purchase, all-integer censuses.
    */
  private val trendTestQ = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("ts_ns"), col("event_type"))
      val b = ev.agg(
        min(expr("ts_ns div 86400000000000L")).as("_lo"),
        max(expr("ts_ns div 86400000000000L")).as("_hi"))
      val dosed = ev.crossJoin(broadcast(b)).select(
        expr("((ts_ns div 86400000000000L) - _lo) * 3" +
          " div (_hi - _lo + 1)").as("dose"),
        (col("event_type") === "purchase").as("outcome"))
      DiagnosticsOps.cochranArmitage(dosed, "dose", "outcome")
        .select(col("k"), col("n"), col("successes"),
          qround(col("z"), 8).as("z"))
    },
    s"""WITH bnd AS (
       |  SELECT min(epoch_ns(ts) // 86400000000000) AS lo,
       |    max(epoch_ns(ts) // 86400000000000) AS hi
       |  FROM events),
       |r AS (
       |  SELECT (epoch_ns(ts) // 86400000000000 - lo) * 3
       |      // (hi - lo + 1) AS s,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
       |  FROM events CROSS JOIN bnd WHERE event_type IS NOT NULL),
       |a AS (
       |  SELECT CAST(count(DISTINCT s) AS BIGINT) AS k,
       |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS r,
       |    CAST(sum(s * y) AS BIGINT) AS sr,
       |    CAST(sum(s) AS BIGINT) AS sn,
       |    CAST(sum(s * s) AS BIGINT) AS sn2
       |  FROM r)
       |SELECT k, n, r AS successes,
       |  CASE WHEN k > 1
       |    AND sqrt(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
       |      * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
       |      * (CAST(sn2 AS DOUBLE) - CAST(sn AS DOUBLE)
       |        * CAST(sn AS DOUBLE) / CAST(n AS DOUBLE))) > 0
       |  THEN
       |    ${qrSql("(CAST(sr AS DOUBLE) - CAST(r AS DOUBLE)" +
         " / CAST(n AS DOUBLE) * CAST(sn AS DOUBLE))" +
         " / sqrt(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)" +
         " * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))" +
         " * (CAST(sn2 AS DOUBLE) - CAST(sn AS DOUBLE)" +
         " * CAST(sn AS DOUBLE) / CAST(n AS DOUBLE)))", 8)}
       |  END AS z
       |FROM a""".stripMargin)

  /** Language-mix diversity per document source
    * (DiagnosticsOps.diversityIndex): Shannon H, Pielou evenness,
    * exact Simpson + effective language count.
    */
  private val diversityIndexQ = Q(
    (s, d) => DiagnosticsOps.diversityIndex(
        Tables.documents(s, d).select(col("source"), col("lang")),
        "source", "lang")
      .select(col("source"), col("n"), col("k"),
        qround(col("shannon"), 8).as("shannon"),
        qround(col("evenness"), 8).as("evenness"),
        qround(col("simpson"), 8).as("simpson"),
        qround(col("inv_simpson"), 8).as("inv_simpson")),
    s"""WITH c AS (
       |  SELECT source AS g, lang AS cat, CAST(count(*) AS BIGINT) AS n
       |  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
       |  GROUP BY 1, 2),
       |t AS (SELECT g, CAST(sum(n) AS BIGINT) AS tt FROM c GROUP BY 1),
       |a AS (
       |  SELECT c.g, max(tt) AS n, CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum(c.n * c.n) AS BIGINT) AS s2,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list({'c': cat, 'x':
       |        (CAST(c.n AS DOUBLE) / CAST(tt AS DOUBLE))
       |          * ln(CAST(c.n AS DOUBLE) / CAST(tt AS DOUBLE))
       |          * (-1.0)} ORDER BY cat), x_ -> x_.x)),
       |      (a_, b_) -> a_ + b_) AS h
       |  FROM c JOIN t ON c.g = t.g GROUP BY 1)
       |SELECT g AS source, n, k, ${qrSql("h", 8)} AS shannon,
       |  CASE WHEN k > 1
       |    THEN ${qrSql("h / ln(CAST(k AS DOUBLE))", 8)} END
       |    AS evenness,
       |  ${qrSql("CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE)" +
         " * CAST(n AS DOUBLE))", 8)} AS simpson,
       |  ${qrSql("1.0 / (CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE)" +
         " * CAST(n AS DOUBLE)))", 8)} AS inv_simpson
       |FROM a""".stripMargin)

  /** Post-hoc minimum detectable effect for the ab_test experiment
    * (DiagnosticsOps.abPower at α=0.05 two-sided / 80% power): same
    * hash-split arms and heavy-purchaser conversion as ab_test.
    */
  private val abPowerQ = Q(
    (s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(when(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)) >= 15, 1L).otherwise(0L).as("converted"))
      val armed = operators.SampleOps.hashSplit(perUser, "user_id",
        Seq(0.5, 0.5), Seq("a", "b"))
      DiagnosticsOps.abPower(armed, "split", "a", "b", "converted")
        .select(col("n_a"), col("n_b"),
          qround(col("pooled_rate"), 8).as("pooled_rate"),
          qround(col("mde_abs"), 8).as("mde_abs"),
          qround(col("mde_rel"), 8).as("mde_rel"))
    },
    s"""WITH u AS (
       |  SELECT user_id,
       |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1
       |      ELSE 0 END) >= 15 THEN 1 ELSE 0 END AS conv
       |  FROM events GROUP BY 1),
       |arms AS (
       |  SELECT CASE WHEN (((user_id % ${operators.TextOps.HashMod})
       |      * ${operators.SketchOps.KmvMult})
       |      % ${operators.TextOps.HashMod})
       |      % ${operators.SampleOps.SplitBuckets} < 5000
       |    THEN 'a' ELSE 'b' END AS arm, conv
       |  FROM u),
       |g AS (
       |  SELECT
       |    CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_a,
       |    CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_b,
       |    CAST(sum(conv) AS BIGINT) AS x
       |  FROM arms),
       |v AS (
       |  SELECT n_a, n_b, CAST(x AS DOUBLE)
       |    / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pp
       |  FROM g)
       |SELECT n_a, n_b,
       |  CASE WHEN n_a > 0 AND n_b > 0
       |    THEN ${qrSql("pp", 8)} END AS pooled_rate,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN
       |    ${qrSql("(1.959963984540054 + 0.8416212335729143)" +
         " * sqrt(pp * (1.0 - pp) * (1.0 / CAST(n_a AS DOUBLE)" +
         " + 1.0 / CAST(n_b AS DOUBLE)))", 8)}
       |  END AS mde_abs,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN
       |    ${qrSql("(1.959963984540054 + 0.8416212335729143)" +
         " * sqrt(pp * (1.0 - pp) * (1.0 / CAST(n_a AS DOUBLE)" +
         " + 1.0 / CAST(n_b AS DOUBLE))) / nullif(pp, 0.0)", 8)}
       |  END AS mde_rel
       |FROM v""".stripMargin)

  /** Chow structural-break F at the span's midpoint hour per event
    * type (DiagnosticsOps.chowTest): pooled vs two-segment OLS SSEs
    * over exact BIGINT moments, one conditional-sum pass. The break
    * hour is the (lo+hi+1) div 2 midpoint, resolved from a 1-row
    * bounds aggregate at plan-build time (bounded collect).
    */
  private val chowTestQ = Q(
    (s, d) => {
      val ev = hourly(s, d)
      val b = ev.agg(min(col("win")).as("lo"), max(col("win")).as("hi"))
        .head()
      // empty input: min/max are null — any mid works, the series
      // aggregate below has no groups to emit
      val mid = if (b.isNullAt(0) || b.isNullAt(1)) 0L
        else (b.getLong(0) + b.getLong(1) + 1) / 2
      DiagnosticsOps.chowTest(ev, "event_type", "win", mid)
        .select(col("event_type"), col("n"), col("n_1"), col("n_2"),
          col("break_win"), qround(col("sse_pooled"), 6).as("sse_pooled"),
          qround(col("sse_split"), 6).as("sse_split"),
          qround(col("f"), 8).as("f"))
    },
    s"""WITH $srSql,
       |bnd AS (SELECT (min(h) + max(h) + 1) // 2 AS mid FROM sr),
       |a AS (
       |  SELECT g,
       |    CAST(sum(CASE WHEN h < mid THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n1,
       |    CAST(sum(CASE WHEN h < mid THEN h ELSE 0 END) AS BIGINT)
       |      AS sx1,
       |    CAST(sum(CASE WHEN h < mid THEN y ELSE 0 END) AS BIGINT)
       |      AS sy1,
       |    CAST(sum(CASE WHEN h < mid THEN h * h ELSE 0 END) AS BIGINT)
       |      AS sxx1,
       |    CAST(sum(CASE WHEN h < mid THEN h * y ELSE 0 END) AS BIGINT)
       |      AS sxy1,
       |    CAST(sum(CASE WHEN h < mid THEN y * y ELSE 0 END) AS BIGINT)
       |      AS syy1,
       |    CAST(sum(CASE WHEN h >= mid THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n2,
       |    CAST(sum(CASE WHEN h >= mid THEN h ELSE 0 END) AS BIGINT)
       |      AS sx2,
       |    CAST(sum(CASE WHEN h >= mid THEN y ELSE 0 END) AS BIGINT)
       |      AS sy2,
       |    CAST(sum(CASE WHEN h >= mid THEN h * h ELSE 0 END)
       |      AS BIGINT) AS sxx2,
       |    CAST(sum(CASE WHEN h >= mid THEN h * y ELSE 0 END)
       |      AS BIGINT) AS sxy2,
       |    CAST(sum(CASE WHEN h >= mid THEN y * y ELSE 0 END)
       |      AS BIGINT) AS syy2,
       |    max(mid) AS mid
       |  FROM sr CROSS JOIN bnd GROUP BY 1),
       |s2 AS (
       |  SELECT g, n1, n2, mid,
       |    CASE WHEN n1 > 2 AND CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE)
       |        * CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) > 0
       |    THEN (CAST(syy1 AS DOUBLE) - CAST(sy1 AS DOUBLE)
       |        * CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE))
       |      - (CAST(sxy1 AS DOUBLE) - CAST(sx1 AS DOUBLE)
       |          * CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE))
       |        * (CAST(sxy1 AS DOUBLE) - CAST(sx1 AS DOUBLE)
       |          * CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE))
       |        / (CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE)
       |          * CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)) END AS e1,
       |    CASE WHEN n2 > 2 AND CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE)
       |        * CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE) > 0
       |    THEN (CAST(syy2 AS DOUBLE) - CAST(sy2 AS DOUBLE)
       |        * CAST(sy2 AS DOUBLE) / CAST(n2 AS DOUBLE))
       |      - (CAST(sxy2 AS DOUBLE) - CAST(sx2 AS DOUBLE)
       |          * CAST(sy2 AS DOUBLE) / CAST(n2 AS DOUBLE))
       |        * (CAST(sxy2 AS DOUBLE) - CAST(sx2 AS DOUBLE)
       |          * CAST(sy2 AS DOUBLE) / CAST(n2 AS DOUBLE))
       |        / (CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE)
       |          * CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE)) END AS e2,
       |    CASE WHEN n1 + n2 > 2
       |      AND CAST(sxx1 + sxx2 AS DOUBLE) - CAST(sx1 + sx2 AS DOUBLE)
       |        * CAST(sx1 + sx2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) > 0
       |    THEN (CAST(syy1 + syy2 AS DOUBLE) - CAST(sy1 + sy2 AS DOUBLE)
       |        * CAST(sy1 + sy2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
       |      - (CAST(sxy1 + sxy2 AS DOUBLE) - CAST(sx1 + sx2 AS DOUBLE)
       |          * CAST(sy1 + sy2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
       |        * (CAST(sxy1 + sxy2 AS DOUBLE) - CAST(sx1 + sx2 AS DOUBLE)
       |          * CAST(sy1 + sy2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
       |        / (CAST(sxx1 + sxx2 AS DOUBLE) - CAST(sx1 + sx2 AS DOUBLE)
       |          * CAST(sx1 + sx2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
       |    END AS ep
       |  FROM a)
       |SELECT g AS event_type, n1 + n2 AS n, n1 AS n_1, n2 AS n_2,
       |  mid AS break_win, ${qrSql("ep", 6)} AS sse_pooled,
       |  ${qrSql("e1 + e2", 6)} AS sse_split,
       |  CASE WHEN n1 + n2 > 4 AND e1 + e2 > 0 THEN
       |    ${qrSql("(ep - (e1 + e2)) / 2 / ((e1 + e2)" +
         " / (CAST(n1 + n2 AS DOUBLE) - 4))", 8)}
       |  END AS f
       |FROM s2""".stripMargin)

  /** TOST equivalence of view vs purchase mean values under a ±5.0
    * margin (DiagnosticsOps.tostEquivalence, 1e-4 grid): both
    * one-sided Welch z's must clear the one-sided 0.05 critical
    * value.
    */
  private val tostEquivalenceQ = Q(
    (s, d) => DiagnosticsOps.tostEquivalence(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "view", "purchase", "value", delta = 5.0,
        quantDigits = 4)
      .select(col("n_a"), col("n_b"), qround(col("diff"), 8).as("diff"),
        qround(col("se"), 8).as("se"),
        qround(col("z_lower"), 8).as("z_lower"),
        qround(col("z_upper"), 8).as("z_upper"), col("equivalent")),
    s"""WITH e AS (
       |  SELECT event_type AS c,
       |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS v
       |  FROM events
       |  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
       |a AS (
       |  SELECT
       |    CAST(sum(CASE WHEN c = 'view' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS na,
       |    CAST(sum(CASE WHEN c = 'view' THEN v ELSE 0 END) AS BIGINT)
       |      AS sa,
       |    CAST(sum(CASE WHEN c = 'view' THEN v * v ELSE 0 END)
       |      AS BIGINT) AS ssa,
       |    CAST(sum(CASE WHEN c = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS nb,
       |    CAST(sum(CASE WHEN c = 'purchase' THEN v ELSE 0 END)
       |      AS BIGINT) AS sb,
       |    CAST(sum(CASE WHEN c = 'purchase' THEN v * v ELSE 0 END)
       |      AS BIGINT) AS ssb
       |  FROM e),
       |v AS (
       |  SELECT na, nb,
       |    CAST(sa AS DOUBLE) / 10000.0 / CAST(na AS DOUBLE)
       |      - CAST(sb AS DOUBLE) / 10000.0 / CAST(nb AS DOUBLE)
       |      AS diff,
       |    sqrt((CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE)
       |        * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
       |        / 100000000.0 / (CAST(na AS DOUBLE) - 1)
       |        / CAST(na AS DOUBLE)
       |      + (CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE)
       |        * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
       |        / 100000000.0 / (CAST(nb AS DOUBLE) - 1)
       |        / CAST(nb AS DOUBLE)) AS se
       |  FROM a)
       |SELECT na AS n_a, nb AS n_b,
       |  CASE WHEN na > 1 AND nb > 1 AND se > 0
       |    THEN ${qrSql("diff", 8)} END AS diff,
       |  CASE WHEN na > 1 AND nb > 1 AND se > 0
       |    THEN ${qrSql("se", 8)} END AS se,
       |  CASE WHEN na > 1 AND nb > 1 AND se > 0
       |    THEN ${qrSql("(diff + 5.0) / se", 8)} END AS z_lower,
       |  CASE WHEN na > 1 AND nb > 1 AND se > 0
       |    THEN ${qrSql("(5.0 - diff) / se", 8)} END AS z_upper,
       |  CASE WHEN na > 1 AND nb > 1 AND se > 0
       |    THEN (diff + 5.0) / se > 1.6448536269514722
       |      AND (5.0 - diff) / se > 1.6448536269514722 END
       |    AS equivalent
       |FROM v""".stripMargin)

  /** Chapman capture-recapture estimate of the document population
    * from two independent 25% hash samples
    * (SketchOps.captureRecapture): the abundance readout, with the
    * true count alongside for the eval story.
    */
  private val captureRecaptureQ = Q(
    (s, d) => operators.SketchOps.captureRecapture(
        Tables.documents(s, d).select(col("doc_id")), "doc_id")
      .select(col("n_true"), col("n1"), col("n2"), col("m"),
        qround(col("n_chapman"), 6).as("n_chapman")),
    s"""WITH h AS (
       |  SELECT
       |    (doc_id % 1000000007) * 2654435761 % 1000000007 AS a0,
       |    (doc_id % 1000000007) * 2246822519 % 1000000007 AS b0
       |  FROM documents WHERE doc_id IS NOT NULL),
       |h2 AS (
       |  SELECT
       |    (xor(a0, a0 >> 15) * 2654435761) % 1000000007 AS a2,
       |    (xor(b0, b0 >> 15) * 2246822519) % 1000000007 AS b2
       |  FROM h),
       |gt AS (
       |  SELECT xor(a2, a2 >> 15) % 100 < 25 AS g1,
       |         xor(b2, b2 >> 15) % 100 < 25 AS g2
       |  FROM h2),
       |g AS (
       |  SELECT
       |    CAST(count(*) AS BIGINT) AS n_true,
       |    CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN g2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |    CAST(sum(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS m
       |  FROM gt)
       |SELECT n_true, n1, n2, m,
       |  ${qrSql("(CAST(n1 AS DOUBLE) + 1) * (CAST(n2 AS DOUBLE) + 1)" +
         " / (CAST(m AS DOUBLE) + 1) - 1", 6)} AS n_chapman
       |FROM g""".stripMargin)

  /** O'Brien-Fleming group-sequential monitor over the ab_test
    * experiment (DiagnosticsOps.groupSequential): same hash-assigned
    * arms and heavy-purchaser conversion, subjects accruing by first
    * event day, cumulative z vs C/√t boundary per look — the
    * always-valid-inference leg of the A/B surface.
    */
  private val sequentialTestQ = Q(
    (s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(when(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)) >= 15, 1L).otherwise(0L).as("converted"),
          min(expr("ts_ns div 86400000000000L")).as("day"))
      val armed = graft.operators.SampleOps.hashSplit(perUser, "user_id",
        Seq(0.5, 0.5), Seq("a", "b"))
      DiagnosticsOps.groupSequential(armed, "split", "a", "b",
          "converted", "day")
        .select(col("look"), col("k"), col("n_a"), col("x_a"),
          col("n_b"), col("x_b"),
          qround(col("info_frac"), 8).as("info_frac"),
          qround(col("z"), 8).as("z"),
          qround(col("boundary"), 8).as("boundary"),
          col("crossed"))
    },
    s"""WITH u AS (
       |  SELECT user_id,
       |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1
       |      ELSE 0 END) >= 15 THEN 1 ELSE 0 END AS conv,
       |    min(epoch_ns(ts) // 86400000000000) AS day
       |  FROM events GROUP BY 1),
       |arms AS (
       |  SELECT CASE WHEN (((user_id % 1000000007)
       |      * 2654435761) % 1000000007) % 10000 < 5000
       |    THEN 'a' ELSE 'b' END AS arm, conv, day
       |  FROM u),
       |inc AS (
       |  SELECT day AS look,
       |    CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS ia,
       |    CAST(sum(CASE WHEN arm = 'a' THEN conv ELSE 0 END) AS BIGINT)
       |      AS xa,
       |    CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS ib,
       |    CAST(sum(CASE WHEN arm = 'b' THEN conv ELSE 0 END) AS BIGINT)
       |      AS xb
       |  FROM arms GROUP BY 1),
       |tot AS (SELECT CAST(sum(ia) + sum(ib) AS BIGINT) AS nn FROM inc),
       |cum AS (
       |  SELECT look,
       |    CAST(row_number() OVER (ORDER BY look) AS BIGINT) AS k,
       |    CAST(sum(ia) OVER w AS BIGINT) AS n_a,
       |    CAST(sum(xa) OVER w AS BIGINT) AS x_a,
       |    CAST(sum(ib) OVER w AS BIGINT) AS n_b,
       |    CAST(sum(xb) OVER w AS BIGINT) AS x_b
       |  FROM inc
       |  WINDOW w AS (ORDER BY look
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |v AS (
       |  SELECT look, k, n_a, x_a, n_b, x_b,
       |    CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
       |    CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
       |    (CAST(x_a AS DOUBLE) + CAST(x_b AS DOUBLE))
       |      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pp,
       |    (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
       |      / CAST(nn AS DOUBLE) AS tf
       |  FROM cum CROSS JOIN tot),
       |z0 AS (
       |  SELECT look, k, n_a, x_a, n_b, x_b, tf,
       |    sqrt(pp * (1.0 - pp) * (1.0 / CAST(n_a AS DOUBLE)
       |      + 1.0 / CAST(n_b AS DOUBLE))) AS se,
       |    pa, pb,
       |    CAST(2.04 AS DOUBLE) / sqrt(tf) AS bnd
       |  FROM v)
       |SELECT look, k, n_a, x_a, n_b, x_b,
       |  ${qrSql("tf", 8)} AS info_frac,
       |  CASE WHEN n_a > 0 AND n_b > 0 AND se > 0
       |    THEN ${qrSql("(pa - pb) / se", 8)} END AS z,
       |  ${qrSql("bnd", 8)} AS boundary,
       |  CASE WHEN n_a > 0 AND n_b > 0 AND se > 0
       |    THEN abs((pa - pb) / se) >= bnd ELSE false END AS crossed
       |FROM z0""".stripMargin)

  /** mSPRT always-valid monitor over the same accruing experiment as
    * sequential_test (DiagnosticsOps.msprtTest, τ = 0.1, α = 0.05):
    * the mixture likelihood ratio per look and the running-min
    * always-valid p-value — valid at ANY stopping time, no final
    * horizon needed. The oracle replays the census, Λ's closed form
    * (ln/exp parity already proven), and the running MIN (selection,
    * order-free).
    */
  private val msprtTestQ = Q(
    (s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(when(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)) >= 15, 1L).otherwise(0L).as("converted"),
          min(expr("ts_ns div 86400000000000L")).as("day"))
      val armed = graft.operators.SampleOps.hashSplit(perUser, "user_id",
        Seq(0.5, 0.5), Seq("a", "b"))
      DiagnosticsOps.msprtTest(armed, "split", "a", "b",
          "converted", "day")
        .select(col("look"), col("k"), col("n_a"), col("x_a"),
          col("n_b"), col("x_b"),
          qround(col("lambda"), 8).as("lambda"),
          qround(col("p_always_valid"), 8).as("p_always_valid"),
          col("rejected"))
    },
    s"""WITH u AS (
       |  SELECT user_id,
       |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1
       |      ELSE 0 END) >= 15 THEN 1 ELSE 0 END AS conv,
       |    min(epoch_ns(ts) // 86400000000000) AS day
       |  FROM events GROUP BY 1),
       |arms AS (
       |  SELECT CASE WHEN (((user_id % 1000000007)
       |      * 2654435761) % 1000000007) % 10000 < 5000
       |    THEN 'a' ELSE 'b' END AS arm, conv, day
       |  FROM u),
       |inc AS (
       |  SELECT day AS look,
       |    CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS ia,
       |    CAST(sum(CASE WHEN arm = 'a' THEN conv ELSE 0 END) AS BIGINT)
       |      AS xa,
       |    CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS ib,
       |    CAST(sum(CASE WHEN arm = 'b' THEN conv ELSE 0 END) AS BIGINT)
       |      AS xb
       |  FROM arms GROUP BY 1),
       |cum AS (
       |  SELECT look,
       |    CAST(row_number() OVER (ORDER BY look) AS BIGINT) AS k,
       |    CAST(sum(ia) OVER w AS BIGINT) AS n_a,
       |    CAST(sum(xa) OVER w AS BIGINT) AS x_a,
       |    CAST(sum(ib) OVER w AS BIGINT) AS n_b,
       |    CAST(sum(xb) OVER w AS BIGINT) AS x_b
       |  FROM inc
       |  WINDOW w AS (ORDER BY look
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |v AS (
       |  SELECT look, k, n_a, x_a, n_b, x_b,
       |    CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
       |    CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
       |    (CAST(x_a AS DOUBLE) + CAST(x_b AS DOUBLE))
       |      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pp
       |  FROM cum),
       |z0 AS (
       |  SELECT look, k, n_a, x_a, n_b, x_b, pa, pb,
       |    pp * (1.0 - pp) * (1.0 / CAST(n_a AS DOUBLE)
       |      + 1.0 / CAST(n_b AS DOUBLE)) AS vv
       |  FROM v),
       |z1 AS (
       |  SELECT look, k, n_a, x_a, n_b, x_b,
       |    CASE WHEN n_a > 0 AND n_b > 0 AND vv > 0
       |      THEN sqrt(vv / (vv + 0.010000000000000002))
       |        * exp(0.010000000000000002 * (pa - pb) * (pa - pb)
       |          / (2.0 * vv * (vv + 0.010000000000000002)))
       |      END AS lam
       |  FROM z0),
       |z2 AS (
       |  SELECT look, k, n_a, x_a, n_b, x_b, lam,
       |    min(CASE WHEN lam IS NOT NULL
       |      THEN least(1.0, 1.0 / lam) END)
       |      OVER (ORDER BY look
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
       |  FROM z1)
       |SELECT look, k, n_a, x_a, n_b, x_b,
       |  CASE WHEN lam IS NOT NULL THEN ${qrSql("lam", 8)} END AS lambda,
       |  CASE WHEN p IS NOT NULL THEN ${qrSql("p", 8)} END
       |    AS p_always_valid,
       |  coalesce(p <= 0.05, false) AS rejected
       |FROM z2""".stripMargin)

  /** Streaming twin of msprt_test (StreamingOps.accrualStream): the
    * per-user (lifetime purchases, first-seen day) state folds
    * commutatively, the monitor math composes statelessly on the
    * snapshot — one batch through the state op is bit-equal to the
    * batch census, so the oracle is shared. This is always-valid
    * inference in its natural deployment form: the stream feeds the
    * monitor that stays valid at every peek.
    */
  private val streamMsprtQ = Q(
    (s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("is_purchase"),
        expr("ts_ns div 86400000000000L").as("day"))
      val perUser = graft.streaming.StreamingOps
        .accrualStream(s, ev, "user_id", "is_purchase", "day")
        .select(col("user_id"),
          when(col("n_success") >= 15, 1L).otherwise(0L).as("converted"),
          col("first_look").as("day"))
      val armed = graft.operators.SampleOps.hashSplit(perUser, "user_id",
        Seq(0.5, 0.5), Seq("a", "b"))
      DiagnosticsOps.msprtTest(armed, "split", "a", "b",
          "converted", "day")
        .select(col("look"), col("k"), col("n_a"), col("x_a"),
          col("n_b"), col("x_b"),
          qround(col("lambda"), 8).as("lambda"),
          qround(col("p_always_valid"), 8).as("p_always_valid"),
          col("rejected"))
    },
    msprtTestQ.sql)

  /** Gumbel method-of-moments fit of per-day maxima of each event
    * type's hourly counts (SequenceOps.gumbelFit): β = s√6/π,
    * μ = m − γβ, and the P99-day burst forecast.
    */
  private val gumbelFitQ = Q(
    (s, d) => operators.SequenceOps.gumbelFit(hourly(s, d),
        "event_type", "win", blockDiv = 24L)
      .select(col("event_type"), col("n_blocks"),
        qround(col("mean_max"), 8).as("mean_max"),
        qround(col("beta"), 8).as("beta"),
        qround(col("mu"), 8).as("mu"),
        qround(col("p99"), 8).as("p99")),
    s"""WITH $srSql,
       |mx AS (SELECT g, h // 24 AS b, CAST(max(y) AS BIGINT) AS m
       |       FROM sr GROUP BY 1, 2),
       |a AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_blocks,
       |    CAST(sum(m) AS BIGINT) AS s, CAST(sum(m * m) AS BIGINT) AS ss
       |  FROM mx GROUP BY 1),
       |v AS (
       |  SELECT g, n_blocks,
       |    CAST(s AS DOUBLE) / CAST(n_blocks AS DOUBLE) AS mean,
       |    sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)
       |        * CAST(s AS DOUBLE) / CAST(n_blocks AS DOUBLE))
       |      / (CAST(n_blocks AS DOUBLE) - 1)) AS sd
       |  FROM a)
       |SELECT g AS event_type, n_blocks,
       |  CASE WHEN n_blocks > 0 THEN ${qrSql("mean", 8)} END
       |    AS mean_max,
       |  CASE WHEN n_blocks > 1 AND sd > 0 THEN
       |    ${qrSql("sd * 2.449489742783178 / 3.141592653589793", 8)}
       |  END AS beta,
       |  CASE WHEN n_blocks > 1 AND sd > 0 THEN
       |    ${qrSql("mean - 0.5772156649015329 * (sd" +
         " * 2.449489742783178 / 3.141592653589793)", 8)}
       |  END AS mu,
       |  CASE WHEN n_blocks > 1 AND sd > 0 THEN
       |    ${qrSql("mean - 0.5772156649015329 * (sd" +
         " * 2.449489742783178 / 3.141592653589793)" +
         " - sd * 2.449489742783178 / 3.141592653589793" +
         " * (-4.600149226776579)", 8)}
       |  END AS p99
       |FROM v""".stripMargin)

  val all: Map[String, Q] = Map(
    "anova_oneway" -> anovaOnewayQ,
    "welch_t" -> welchTQ,
    "levene_test" -> leveneTestQ,
    "mcnemar_test" -> mcnemarTestQ,
    "wasserstein_drift" -> wassersteinDriftQ,
    "hellinger_drift" -> hellingerDriftQ,
    "runs_test" -> runsTestQ,
    "friedman_test" -> friedmanTestQ,
    "ar1_fit" -> ar1FitQ,
    "ljung_box" -> ljungBoxQ,
    "dominant_period" -> dominantPeriodQ,
    "cross_correlation" -> crossCorrelationQ,
    "page_hinkley" -> pageHinkleyQ,
    "granger_lite" -> grangerLiteQ,
    "cvm_drift" -> cvmDriftQ,
    "energy_drift" -> energyDriftQ,
    "sign_test" -> signTestQ,
    "wilcoxon_signed_rank" -> wilcoxonSignedRankQ,
    "cochran_q" -> cochranQQ,
    "kendall_tau" -> kendallTauQ,
    "stream_page_hinkley" -> streamPageHinkleyQ,
    "logrank_test" -> logrankTestQ,
    "median_test" -> medianTestQ,
    "mmd_drift" -> mmdDriftQ,
    "cohens_d" -> cohensDQ,
    "trend_test" -> trendTestQ,
    "diversity_index" -> diversityIndexQ,
    "ab_power" -> abPowerQ,
    "chow_test" -> chowTestQ,
    "tost_equivalence" -> tostEquivalenceQ,
    "capture_recapture" -> captureRecaptureQ,
    "sequential_test" -> sequentialTestQ,
    "msprt_test" -> msprtTestQ,
    "stream_msprt" -> streamMsprtQ,
    "gumbel_fit" -> gumbelFitQ)
}
