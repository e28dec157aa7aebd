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

  val all: Map[String, Q] = Map(
    "anova_oneway" -> anovaOnewayQ,
    "welch_t" -> welchTQ,
    "levene_test" -> leveneTestQ,
    "mcnemar_test" -> mcnemarTestQ,
    "wasserstein_drift" -> wassersteinDriftQ,
    "hellinger_drift" -> hellingerDriftQ)
}
