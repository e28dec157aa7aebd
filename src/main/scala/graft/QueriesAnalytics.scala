package graft

import org.apache.spark.sql.functions._

import graft.Queries.{Q, qround}
import graft.operators.StatsOps

/** Round-12 analytics surface: rank-based dependence/testing
  * (Spearman, Kruskal-Wallis, Cramér's V) and the time-series /
  * maintenance families added this round. Same Q contract as
  * [[Queries]] (Spark fn + DuckDB oracle, column names aligned,
  * quantization via qround).
  */
object QueriesAnalytics {

  private def qrSql(expr: String, d: Int): String = {
    val s = "1" + "0" * d
    s"floor(($expr) * $s.0 + 0.5) / $s.0"
  }

  /** Per-event-type Spearman ρ between value and the hour bucket of
    * the event time (StatsOps.spearmanCorr) — "is value drifting
    * monotonically over the observation window?" robust to outliers.
    * Value rides the 1e-2 grid, time the hour grid, so the joint
    * domain both engines rank over is identical and bounded.
    */
  private val spearmanTrendQ = Q(
    (s, d) => StatsOps.spearmanCorr(
        Tables.events(s, d).select(col("event_type"), col("value"),
          expr("CAST(ts_ns div 3600000000000L AS DOUBLE)").as("hour")),
        "event_type", "value", "hour",
        quantXDigits = 2, quantYDigits = 0)
      .select(col("event_type"), col("n"), qround(col("rho"), 8).as("rho")),
    """WITH e AS (
      |  SELECT event_type AS g,
      |    floor(value * 100.0 + 0.5) / 100.0 AS qx,
      |    floor(CAST(epoch_ns(ts) // 3600000000000 AS DOUBLE) * 1.0 + 0.5)
      |      / 1.0 AS qy
      |  FROM events
      |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
      |joint AS (
      |  SELECT g, qx, qy, CAST(count(*) AS BIGINT) AS c
      |  FROM e GROUP BY 1, 2, 3),
      |mx AS (
      |  SELECT g, qx,
      |    2 * CAST(sum(t) OVER (PARTITION BY g ORDER BY qx
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) - t + 1 AS dx
      |  FROM (SELECT g, qx, CAST(sum(c) AS BIGINT) AS t
      |        FROM joint GROUP BY 1, 2)),
      |my AS (
      |  SELECT g, qy,
      |    2 * CAST(sum(t) OVER (PARTITION BY g ORDER BY qy
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) - t + 1 AS dy
      |  FROM (SELECT g, qy, CAST(sum(c) AS BIGINT) AS t
      |        FROM joint GROUP BY 1, 2)),
      |p AS (
      |  SELECT joint.g, c, dx, dy FROM joint
      |  JOIN mx ON joint.g = mx.g AND joint.qx = mx.qx
      |  JOIN my ON joint.g = my.g AND joint.qy = my.qy),
      |a AS (
      |  SELECT g AS event_type, CAST(sum(c) AS BIGINT) AS n,
      |    CAST(sum(c * dx) AS BIGINT) AS sx,
      |    CAST(sum(c * dy) AS BIGINT) AS sy,
      |    CAST(sum(c * dx * dx) AS BIGINT) AS sxx,
      |    CAST(sum(c * dy * dy) AS BIGINT) AS syy,
      |    CAST(sum(c * dx * dy) AS BIGINT) AS sxy
      |  FROM p GROUP BY 1)
      |SELECT event_type, n,
      |  CASE WHEN (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) <> 0.0
      |    THEN floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |        * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |      * 100000000.0 + 0.5) / 100000000.0
      |  END AS rho
      |FROM a""".stripMargin)

  /** Kruskal-Wallis H across ALL event types on value
    * (StatsOps.kruskalWallis) — the k-group rank test beside the
    * two-cohort mann_whitney, same 1e-4 grid, same doubled-midrank
    * exactness, tie-corrected.
    */
  private val kruskalWallisQ = Q(
    (s, d) => StatsOps.kruskalWallis(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "value", quantDigits = 4)
      .select(col("k"), col("n"), col("dof"), qround(col("h"), 8).as("h"),
        qround(col("h_corr"), 8).as("h_corr")),
    """WITH e AS (
      |  SELECT event_type AS g,
      |    floor(value * 10000.0 + 0.5) / 10000.0 AS q
      |  FROM events
      |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
      |joint AS (
      |  SELECT g, q, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
      |vm AS (
      |  SELECT q,
      |    2 * CAST(sum(t) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) - t + 1 AS dr,
      |    CAST(t AS DOUBLE) * CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
      |      - CAST(t AS DOUBLE) AS t3
      |  FROM (SELECT q, CAST(sum(c) AS BIGINT) AS t
      |        FROM joint GROUP BY 1)),
      |ties AS (
      |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list_transform(list({'q': q, 't3': t3} ORDER BY q),
      |      x_ -> x_.t3)), (a_, b_) -> a_ + b_) AS tiesum
      |  FROM vm),
      |grp AS (
      |  SELECT g, CAST(sum(c) AS BIGINT) AS ng,
      |    CAST(sum(c * dr) AS BIGINT) AS r2
      |  FROM joint JOIN vm USING (q) GROUP BY 1),
      |a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k,
      |    CAST(sum(ng) AS BIGINT) AS n,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(list({'g': g,
      |          'term': (CAST(r2 AS DOUBLE) / 2.0)
      |            * (CAST(r2 AS DOUBLE) / 2.0) / CAST(ng AS DOUBLE)}
      |          ORDER BY g),
      |        x_ -> x_.term)), (a_, b_) -> a_ + b_) AS sr
      |  FROM grp),
      |h AS (
      |  SELECT k, n, k - 1 AS dof,
      |    12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * sr
      |      - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS hstat,
      |    1.0 - tiesum / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
      |      * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) AS corr
      |  FROM a CROSS JOIN ties)
      |SELECT k, n, dof,
      |  floor(hstat * 100000000.0 + 0.5) / 100000000.0 AS h,
      |  CASE WHEN corr > 0
      |    THEN floor(hstat / corr * 100000000.0 + 0.5) / 100000000.0
      |  END AS h_corr
      |FROM h""".stripMargin)

  /** Cramér's V between document language and source
    * (StatsOps.cramersV) — the bounded effect-size number for "how
    * tied is source to language", over ALL r×c cells including
    * unobserved ones.
    */
  private val cramersVQ = Q(
    (s, d) => StatsOps.cramersV(
        Tables.documents(s, d).select(col("lang"), col("source")),
        "lang", "source")
      .select(col("n"), col("r"), col("c"), col("dof"),
        qround(col("chi2"), 8).as("chi2"), qround(col("v"), 8).as("v")),
    """WITH joint AS (
      |  SELECT CAST(lang AS VARCHAR) AS x, CAST(source AS VARCHAR) AS y,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM documents
      |  WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
      |mx AS (SELECT x, CAST(sum(c) AS BIGINT) AS nx
      |       FROM joint GROUP BY 1),
      |my AS (SELECT y, CAST(sum(c) AS BIGINT) AS ny
      |       FROM joint GROUP BY 1),
      |tot AS (
      |  SELECT (SELECT CAST(sum(c) AS BIGINT) FROM joint) AS n,
      |    (SELECT CAST(count(*) AS BIGINT) FROM mx) AS r,
      |    (SELECT CAST(count(*) AS BIGINT) FROM my) AS c2),
      |cells AS (
      |  SELECT mx.x, my.y, nx, ny,
      |    CAST(coalesce(joint.c, 0) AS BIGINT) AS o
      |  FROM mx CROSS JOIN my
      |  LEFT JOIN joint ON joint.x = mx.x AND joint.y = my.y),
      |a AS (
      |  SELECT n, r, c2,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(list({'x': x, 'y': y,
      |          'term': (o - CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)
      |              / CAST(n AS DOUBLE))
      |            * (o - CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)
      |              / CAST(n AS DOUBLE))
      |            / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)
      |              / CAST(n AS DOUBLE))} ORDER BY x, y),
      |        x_ -> x_.term)), (a_, b_) -> a_ + b_) AS chi2
      |  FROM cells CROSS JOIN tot
      |  GROUP BY n, r, c2)
      |SELECT n, r, c2 AS c, (r - 1) * (c2 - 1) AS dof,
      |  floor(chi2 * 100000000.0 + 0.5) / 100000000.0 AS chi2,
      |  floor(sqrt(chi2 / (CAST(n AS DOUBLE)
      |      * CAST(least(r - 1, c2 - 1) AS DOUBLE)))
      |    * 100000000.0 + 0.5) / 100000000.0 AS v
      |FROM a""".stripMargin)

  /** Hour-of-day seasonal decomposition of event value per type
    * (SequenceOps.seasonalDecompose): per (type, hour) the seasonal
    * mean and index on the 1e-2 grid, plus the pooled residual
    * variance once the daily wave is removed.
    */
  private val seasonalDecomposeQ = Q(
    (s, d) => operators.SequenceOps.seasonalDecompose(
        Tables.events(s, d).select(col("event_type"),
          expr("(ts_ns div 3600000000000L) % 24").as("hour"),
          col("value")),
        "event_type", "hour", "value", quantDigits = 2)
      .select(col("event_type"), col("hour"), col("n"),
        qround(col("season_mean"), 8).as("season_mean"),
        qround(col("seasonal_idx"), 8).as("seasonal_idx"),
        qround(col("resid_var"), 6).as("resid_var")),
    """WITH e AS (
      |  SELECT event_type AS g,
      |    (epoch_ns(ts) // 3600000000000) % 24 AS hour,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
      |  FROM events
      |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
      |ps AS (
      |  SELECT g, hour, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(v) AS BIGINT) AS sv,
      |    CAST(sum(v * v) AS BIGINT) AS svv
      |  FROM e GROUP BY 1, 2),
      |pg AS (
      |  SELECT g, CAST(sum(n) AS BIGINT) AS ng,
      |    CAST(sum(sv) AS BIGINT) AS svg,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(list({'h': hour,
      |          'term': (CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE)
      |            * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)) / 10000.0}
      |          ORDER BY hour),
      |        x_ -> x_.term)), (a_, b_) -> a_ + b_) AS ssr
      |  FROM ps GROUP BY 1)
      |SELECT ps.g AS event_type, hour, n,
      |  floor(CAST(sv AS DOUBLE) / (100.0 * CAST(n AS DOUBLE))
      |    * 100000000.0 + 0.5) / 100000000.0 AS season_mean,
      |  floor((CAST(sv AS DOUBLE) / (100.0 * CAST(n AS DOUBLE))
      |      - CAST(svg AS DOUBLE) / (100.0 * CAST(ng AS DOUBLE)))
      |    * 100000000.0 + 0.5) / 100000000.0 AS seasonal_idx,
      |  floor(ssr / CAST(ng AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
      |    AS resid_var
      |FROM ps JOIN pg USING (g)""".stripMargin)

  /** SAX symbolization (SequenceOps.saxEncode) of each event type's
    * hourly profile: PAA over 24 hourly windows, z-scored against the
    * series, alphabet a..d at the N(0,1) quartile breakpoints. The
    * oracle replays the identical integer sums and IEEE mean/std/z
    * expressions; symbols are pure comparisons.
    */
  private val saxEncodeQ = Q(
    (s, d) => operators.SequenceOps.saxEncode(
        Tables.events(s, d).select(col("event_type"),
          expr("(ts_ns div 3600000000000L) % 24").as("hour"),
          col("value")),
        "event_type", "hour", "value", quantDigits = 2)
      .select(col("event_type"), col("hour"), col("n_w"),
        qround(col("paa"), 8).as("paa"),
        qround(col("z"), 8).as("z"), col("symbol")),
    """WITH e AS (
      |  SELECT event_type AS g,
      |    (epoch_ns(ts) // 3600000000000) % 24 AS hour,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
      |  FROM events
      |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
      |pw AS (
      |  SELECT g, hour, CAST(count(*) AS BIGINT) AS n_w,
      |    CAST(sum(v) AS BIGINT) AS svw,
      |    CAST(sum(v * v) AS BIGINT) AS svvw
      |  FROM e GROUP BY 1, 2),
      |pg AS (
      |  SELECT g, CAST(sum(n_w) AS BIGINT) AS n,
      |    CAST(sum(svw) AS BIGINT) AS sv,
      |    CAST(sum(svvw) AS BIGINT) AS svv
      |  FROM pw GROUP BY 1),
      |z AS (
      |  SELECT g, hour, n_w,
      |    CAST(svw AS DOUBLE) / (100.0 * CAST(n_w AS DOUBLE)) AS paa,
      |    CASE WHEN sqrt((CAST(svv AS DOUBLE) / (100.0 * 100.0)
      |          - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
      |            / (100.0 * 100.0 * CAST(n AS DOUBLE)))
      |        / CAST(n AS DOUBLE)) > 0.0 THEN
      |      (CAST(svw AS DOUBLE) / (100.0 * CAST(n_w AS DOUBLE))
      |        - CAST(sv AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)))
      |      / sqrt((CAST(svv AS DOUBLE) / (100.0 * 100.0)
      |          - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
      |            / (100.0 * 100.0 * CAST(n AS DOUBLE)))
      |        / CAST(n AS DOUBLE)) END AS zz
      |  FROM pw JOIN pg USING (g))
      |SELECT g AS event_type, hour, n_w,
      |  floor(paa * 100000000.0 + 0.5) / 100000000.0 AS paa,
      |  floor(zz * 100000000.0 + 0.5) / 100000000.0 AS z,
      |  CASE WHEN zz IS NULL THEN NULL
      |       WHEN zz < -0.6745 THEN 'a' WHEN zz < 0.0 THEN 'b'
      |       WHEN zz < 0.6745 THEN 'c' ELSE 'd' END AS symbol
      |FROM z""".stripMargin)

  /** Hurst exponent per event type (SequenceOps.hurstExponent):
    * aggregated-variance method over block sizes 1..32 — complete
    * blocks only, exact bigint block sums, 1e-6-quantized log-log OLS.
    */
  private val hurstExponentQ = Q(
    (s, d) => operators.SequenceOps.hurstExponent(
        Tables.events(s, d).select(col("event_type"), col("ts_ns"),
          col("event_id"), col("value")),
        "event_type", "ts_ns", "event_id", "value")
      .select(col("event_type"), col("n_scales"),
        qround(col("slope"), 8).as("slope"),
        qround(col("hurst"), 8).as("hurst")),
    """WITH e AS (
      |  SELECT event_type AS g,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY ts, event_id) - 1 AS BIGINT) AS i
      |  FROM events
      |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
      |b AS (
      |  SELECT g, m, i // m AS blk, CAST(count(*) AS BIGINT) AS nr,
      |    CAST(sum(v) AS BIGINT) AS sv
      |  FROM e CROSS JOIN (SELECT unnest([1, 2, 4, 8, 16, 32]) AS m) ms
      |  GROUP BY 1, 2, 3),
      |pm AS (
      |  SELECT g, m, CAST(count(*) AS BIGINT) AS nb,
      |    CAST(sum(sv) AS BIGINT) AS s1,
      |    CAST(sum(sv * sv) AS BIGINT) AS s2
      |  FROM b WHERE nr = m GROUP BY 1, 2),
      |vv AS (
      |  SELECT g, m, nb,
      |    CAST(s2 AS DOUBLE) / (CAST(nb AS DOUBLE) * 100.0 * 100.0
      |      * CAST(m AS DOUBLE) * CAST(m AS DOUBLE))
      |    - (CAST(s1 AS DOUBLE)
      |        / (CAST(nb AS DOUBLE) * 100.0 * CAST(m AS DOUBLE)))
      |      * (CAST(s1 AS DOUBLE)
      |        / (CAST(nb AS DOUBLE) * 100.0 * CAST(m AS DOUBLE)))
      |      AS var
      |  FROM pm WHERE nb >= 2),
      |lg AS (
      |  SELECT g,
      |    CAST(floor(ln(1.0 * m) * 1000000.0 + 0.5) AS BIGINT) AS lx,
      |    CAST(floor(ln(var) * 1000000.0 + 0.5) AS BIGINT) AS ly
      |  FROM vv WHERE var > 0),
      |f AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS n_scales,
      |    CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
      |    CAST(sum(lx * lx) AS BIGINT) AS sxx,
      |    CAST(sum(lx * ly) AS BIGINT) AS sxy
      |  FROM lg GROUP BY 1 HAVING count(*) >= 2)
      |SELECT g AS event_type, n_scales,
      |  floor((CAST(n_scales AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (CAST(n_scales AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |    * 100000000.0 + 0.5) / 100000000.0 AS slope,
      |  floor((1.0 + (CAST(n_scales AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (CAST(n_scales AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 2.0)
      |    * 100000000.0 + 0.5) / 100000000.0 AS hurst
      |FROM f""".stripMargin)

  /** Hill tail index (StatsOps.hillTailIndex, k = 100) of
    * l_extendedprice: TakeOrdered top-(k+1), 1e-6-quantized logs as
    * exact bigints, closed-form H and alpha.
    */
  private val tailIndexQ = Q(
    (s, d) => StatsOps.hillTailIndex(
        Tables.lineitem(s, d).select(col("l_extendedprice")),
        "l_extendedprice", k = 100)
      .select(col("k"), qround(col("ln_xref"), 6).as("ln_xref"),
        qround(col("hill_h"), 8).as("hill_h"),
        qround(col("alpha"), 8).as("alpha")),
    """WITH top AS (
      |  SELECT CAST(floor(ln(CAST(l_extendedprice AS DOUBLE))
      |      * 1000000.0 + 0.5) AS BIGINT) AS lq
      |  FROM lineitem
      |  WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0
      |  ORDER BY CAST(l_extendedprice AS DOUBLE) DESC LIMIT 101),
      |a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(lq) AS BIGINT)
      |      AS s, CAST(min(lq) AS BIGINT) AS lref
      |  FROM top)
      |SELECT n - 1 AS k,
      |  floor(CAST(lref AS DOUBLE) / 1000000.0 * 1000000.0 + 0.5)
      |    / 1000000.0 AS ln_xref,
      |  floor(CAST(s - n * lref AS DOUBLE) / 1000000.0
      |      / CAST(n - 1 AS DOUBLE) * 100000000.0 + 0.5)
      |    / 100000000.0 AS hill_h,
      |  floor(1.0 / (CAST(s - n * lref AS DOUBLE) / 1000000.0
      |      / CAST(n - 1 AS DOUBLE)) * 100000000.0 + 0.5)
      |    / 100000000.0 AS alpha
      |FROM a WHERE n >= 3""".stripMargin)

  /** Fano-factor burstiness (SequenceOps.burstiness) of each event
    * type's hourly arrival counts — exact integer window counts,
    * closed-form dispersion ratio.
    */
  private val burstinessQ = Q(
    (s, d) => operators.SequenceOps.burstiness(
        Tables.events(s, d).select(col("event_type"),
          expr("ts_ns div 3600000000000L").as("win")),
        "event_type", "win")
      .select(col("event_type"), col("n_windows"),
        qround(col("mean_count"), 8).as("mean_count"),
        qround(col("fano"), 8).as("fano")),
    """WITH c AS (
      |  SELECT event_type AS g, epoch_ns(ts) // 3600000000000 AS win,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events WHERE event_type IS NOT NULL
      |  GROUP BY 1, 2),
      |a AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS n_windows,
      |    CAST(sum(c) AS BIGINT) AS sc,
      |    CAST(sum(c * c) AS BIGINT) AS scc
      |  FROM c GROUP BY 1)
      |SELECT g AS event_type, n_windows,
      |  floor(CAST(sc AS DOUBLE) / CAST(n_windows AS DOUBLE)
      |    * 100000000.0 + 0.5) / 100000000.0 AS mean_count,
      |  floor((CAST(scc AS DOUBLE) / CAST(n_windows AS DOUBLE)
      |      - (CAST(sc AS DOUBLE) / CAST(n_windows AS DOUBLE))
      |        * (CAST(sc AS DOUBLE) / CAST(n_windows AS DOUBLE)))
      |    / (CAST(sc AS DOUBLE) / CAST(n_windows AS DOUBLE))
      |    * 100000000.0 + 0.5) / 100000000.0 AS fano
      |FROM a""".stripMargin)

  /** Per-dimension MI feature ranking (SimilarityOps.featureMi):
    * exact (dim × bucket × label) censuses on the 1e-1 grid, fixed
    * (bucket, label)-ordered folds per dim.
    */
  private val featureMiQ = Q(
    (s, d) => operators.SimilarityOps.featureMi(
        Tables.embeddings(s, d), "embedding", "label")
      .select(col("dim"), col("n"), qround(col("mi"), 8).as("mi")),
    """WITH e AS (
      |  SELECT label AS l, i - 1 AS d,
      |    CAST(floor(CAST(emb[i] AS DOUBLE) * 10.0 + 0.5) AS BIGINT)
      |      AS b
      |  FROM (SELECT label, embedding AS emb,
      |          unnest(generate_series(1, len(embedding))) AS i
      |        FROM embeddings
      |        WHERE embedding IS NOT NULL AND label IS NOT NULL)),
      |j AS (SELECT d, b, l, CAST(count(*) AS BIGINT) AS c
      |      FROM e GROUP BY 1, 2, 3),
      |xm AS (SELECT d, b, CAST(sum(c) AS BIGINT) AS cx
      |       FROM j GROUP BY 1, 2),
      |ym AS (SELECT d, l, CAST(sum(c) AS BIGINT) AS cy
      |       FROM j GROUP BY 1, 2),
      |t AS (SELECT d, CAST(sum(c) AS BIGINT) AS n FROM j GROUP BY 1),
      |terms AS (
      |  SELECT j.d, j.b, j.l, n,
      |    CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
      |      * ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
      |        / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))) AS tt
      |  FROM j JOIN xm USING (d, b) JOIN ym USING (d, l)
      |  JOIN t USING (d))
      |SELECT CAST(d AS BIGINT) AS dim, max(n) AS n,
      |  floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list(tt ORDER BY b, l)), (a_, b_) -> a_ + b_)
      |    * 100000000.0 + 0.5) / 100000000.0 AS mi
      |FROM terms GROUP BY d""".stripMargin)

  /** Exact decision stump over melted event features
    * (ClassifierOps.stumpTrain): label = purchase, features = value
    * grid / hour-of-day / day-of-week; Gini gains from cumulative
    * integer censuses, deterministic argmax.
    */
  private val stumpTrainQ = Q(
    (s, d) => operators.ClassifierOps.stumpTrain(
        Tables.events(s, d).where(col("value").isNotNull)
          .select(when(col("event_type") === "purchase", 1L)
            .otherwise(0L).as("y"), col("value"), col("ts_ns"))
          .selectExpr("y",
            """stack(3,
              |  'value_q', cast(floor(value * 10.0 + 0.5) as long),
              |  'hod', (ts_ns div 3600000000000L) % 24,
              |  'dow', (ts_ns div 86400000000000L) % 7)
              |  AS (feature, xq)""".stripMargin),
        "feature", "xq", "y")
      .select(col("feature"), col("threshold"),
        qround(col("gain"), 8).as("gain"),
        qround(col("acc"), 8).as("acc"), col("n")),
    """WITH b AS (
      |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
      |      AS y,
      |    CAST(floor(value * 10.0 + 0.5) AS BIGINT) AS vq,
      |    (epoch_ns(ts) // 3600000000000) % 24 AS hod,
      |    (epoch_ns(ts) // 86400000000000) % 7 AS dow
      |  FROM events WHERE value IS NOT NULL),
      |m AS (
      |  SELECT 'value_q' AS f, vq AS x, y FROM b
      |  UNION ALL SELECT 'hod', hod, y FROM b
      |  UNION ALL SELECT 'dow', dow, y FROM b),
      |cells AS (
      |  SELECT f, x, CAST(sum(y) AS BIGINT) AS p,
      |    CAST(count(*) AS BIGINT) AS t
      |  FROM m GROUP BY 1, 2),
      |tot AS (SELECT f, CAST(sum(p) AS BIGINT) AS bp,
      |        CAST(sum(t) AS BIGINT) AS bt FROM cells GROUP BY 1),
      |cum AS (
      |  SELECT f, x, p, t,
      |    CAST(sum(p) OVER (PARTITION BY f ORDER BY x
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp,
      |    CAST(sum(t) OVER (PARTITION BY f ORDER BY x
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ct
      |  FROM cells),
      |sc AS (
      |  SELECT cum.f, x, cp - p AS lp, ct - t AS lt,
      |    bp - (cp - p) AS rp, bt - (ct - t) AS rt, bp, bt
      |  FROM cum JOIN tot ON cum.f = tot.f
      |  WHERE ct - t > 0),
      |gg AS (
      |  SELECT f AS feature, x AS threshold,
      |    (1.0
      |      - (CAST(bp AS DOUBLE) / CAST(bt AS DOUBLE))
      |        * (CAST(bp AS DOUBLE) / CAST(bt AS DOUBLE))
      |      - (CAST(bt - bp AS DOUBLE) / CAST(bt AS DOUBLE))
      |        * (CAST(bt - bp AS DOUBLE) / CAST(bt AS DOUBLE)))
      |    - (CAST(lt AS DOUBLE) / CAST(bt AS DOUBLE)) * (1.0
      |      - (CAST(lp AS DOUBLE) / CAST(lt AS DOUBLE))
      |        * (CAST(lp AS DOUBLE) / CAST(lt AS DOUBLE))
      |      - (CAST(lt - lp AS DOUBLE) / CAST(lt AS DOUBLE))
      |        * (CAST(lt - lp AS DOUBLE) / CAST(lt AS DOUBLE)))
      |    - (CAST(rt AS DOUBLE) / CAST(bt AS DOUBLE)) * (1.0
      |      - (CAST(rp AS DOUBLE) / CAST(rt AS DOUBLE))
      |        * (CAST(rp AS DOUBLE) / CAST(rt AS DOUBLE))
      |      - (CAST(rt - rp AS DOUBLE) / CAST(rt AS DOUBLE))
      |        * (CAST(rt - rp AS DOUBLE) / CAST(rt AS DOUBLE)))
      |      AS gain,
      |    (CAST(greatest(lp, lt - lp) AS DOUBLE)
      |      + CAST(greatest(rp, rt - rp) AS DOUBLE))
      |      / CAST(bt AS DOUBLE) AS acc,
      |    bt AS n
      |  FROM sc)
      |SELECT feature, threshold,
      |  floor(gain * 100000000.0 + 0.5) / 100000000.0 AS gain,
      |  floor(acc * 100000000.0 + 0.5) / 100000000.0 AS acc, n
      |FROM gg ORDER BY gain DESC, feature, threshold LIMIT 1"""
      .stripMargin)

  /** Unrolled Bradley-Terry MM chain for the bradley_terry oracle —
    * each step one MATERIALIZED matvec-like update whose opponent
    * fold is ORDER BY o, mirroring the driver's ascending-entity loop.
    */
  private def btIterSql(iters: Int): String = {
    val steps = (1 to iters).map { t =>
      s"""p$t AS MATERIALIZED (
         |  SELECT nm.s,
         |    CAST(wct.wins AS DOUBLE)
         |      / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |        list(CAST(nm.n AS DOUBLE) / (ps.p + po.p)
         |          ORDER BY nm.o)), (a_, b_) -> a_ + b_) AS p
         |  FROM nm JOIN p${t - 1} ps ON nm.s = ps.s
         |  JOIN p${t - 1} po ON nm.o = po.s
         |  JOIN wct ON nm.s = wct.s
         |  GROUP BY nm.s, wct.wins)""".stripMargin
    }
    s"""p0 AS MATERIALIZED (
       |  SELECT s, CAST(1.0 AS DOUBLE) AS p
       |  FROM (SELECT DISTINCT s FROM nm)),
       |${steps.mkString(",\n")}""".stripMargin
  }

  /** Best two-segment split of each event type's hourly arrival
    * series (SequenceOps.changepointSplit): exact bigint prefix SSEs,
    * deterministic rank-1 argmax.
    */
  private val changepointSplitQ = Q(
    (s, d) => operators.SequenceOps.changepointSplit(
        Tables.events(s, d).select(col("event_type"),
          expr("ts_ns div 3600000000000L").as("win")),
        "event_type", "win")
      .select(col("event_type"), col("split_at"),
        qround(col("sse_reduction"), 8).as("sse_reduction"),
        qround(col("mean_left"), 8).as("mean_left"),
        qround(col("mean_right"), 8).as("mean_right")),
    """WITH s AS (
      |  SELECT event_type AS g, epoch_ns(ts) // 3600000000000 AS h,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(y) AS BIGINT) AS sv,
      |        CAST(sum(y * y) AS BIGINT) AS ss
      |      FROM s GROUP BY 1),
      |c AS (
      |  SELECT g, h, y,
      |    CAST(count(*) OVER wd AS BIGINT) AS cn,
      |    CAST(sum(y) OVER wd AS BIGINT) AS cs,
      |    CAST(sum(y * y) OVER wd AS BIGINT) AS css
      |  FROM s WINDOW wd AS (PARTITION BY g ORDER BY h
      |    ROWS UNBOUNDED PRECEDING)),
      |cand AS (
      |  SELECT c.g, h, cn - 1 AS lnn, cs - y AS ls,
      |    css - y * y AS lss, n, sv, ss
      |  FROM c JOIN t ON c.g = t.g WHERE cn - 1 > 0),
      |sc AS (
      |  SELECT g, h,
      |    (CAST(ss AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
      |        / CAST(n AS DOUBLE))
      |    - (CAST(lss AS DOUBLE)
      |        - CAST(ls AS DOUBLE) * CAST(ls AS DOUBLE)
      |          / CAST(lnn AS DOUBLE))
      |    - (CAST(ss - lss AS DOUBLE)
      |        - CAST(sv - ls AS DOUBLE) * CAST(sv - ls AS DOUBLE)
      |          / CAST(n - lnn AS DOUBLE)) AS red,
      |    CAST(ls AS DOUBLE) / CAST(lnn AS DOUBLE) AS ml,
      |    CAST(sv - ls AS DOUBLE) / CAST(n - lnn AS DOUBLE) AS mr
      |  FROM cand),
      |rk AS (SELECT g, h, red, ml, mr,
      |         row_number() OVER (PARTITION BY g ORDER BY red DESC, h)
      |           AS r
      |       FROM sc)
      |SELECT g AS event_type, h AS split_at,
      |  floor(red * 100000000.0 + 0.5) / 100000000.0 AS sse_reduction,
      |  floor(ml * 100000000.0 + 0.5) / 100000000.0 AS mean_left,
      |  floor(mr * 100000000.0 + 0.5) / 100000000.0 AS mean_right
      |FROM rk WHERE r = 1""".stripMargin)

  /** Holt linear smoothing of hourly arrivals per event type
    * (SequenceOps.holtLinear, alpha 0.3 / beta 0.1): one fixed-order
    * IEEE recurrence per series over the hour domain.
    */
  private val holtWintersQ = Q(
    (s, d) => operators.SequenceOps.holtLinear(
        Tables.events(s, d).select(col("event_type"),
          expr("ts_ns div 3600000000000L").as("win")),
        "event_type", "win")
      .select(col("event_type"), col("n_windows"),
        qround(col("level"), 8).as("level"),
        qround(col("trend"), 8).as("trend"),
        qround(col("forecast"), 8).as("forecast"),
        qround(col("sse"), 6).as("sse")),
    """WITH s AS (
      |  SELECT event_type AS g, epoch_ns(ts) // 3600000000000 AS h,
      |    CAST(count(*) AS DOUBLE) AS y
      |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
      |arrs AS (
      |  SELECT g, list({'h': h, 'y': y} ORDER BY h) AS arr
      |  FROM s GROUP BY 1),
      |st AS (
      |  -- list-valued fold state: DuckDB STRUCT lambdas rebind acc
      |  -- fields sequentially as they are computed (field 'b' would
      |  -- see the NEW 'l'); list element references stay immutable
      |  SELECT g, len(arr) AS n_windows,
      |    list_reduce(list_prepend(
      |      [arr[2].y, arr[2].y - arr[1].y, CAST(0.0 AS DOUBLE)],
      |      list_transform(arr[3:], e_ -> [e_.y,
      |        CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)])),
      |      (acc, x_) -> [
      |        CAST(0.3 AS DOUBLE) * x_[1]
      |          + (1.0 - CAST(0.3 AS DOUBLE)) * (acc[1] + acc[2]),
      |        CAST(0.1 AS DOUBLE) * ((CAST(0.3 AS DOUBLE) * x_[1]
      |            + (1.0 - CAST(0.3 AS DOUBLE)) * (acc[1] + acc[2]))
      |          - acc[1]) + (1.0 - CAST(0.1 AS DOUBLE)) * acc[2],
      |        acc[3] + (x_[1] - (acc[1] + acc[2]))
      |          * (x_[1] - (acc[1] + acc[2]))]) AS st
      |  FROM arrs WHERE len(arr) >= 3)
      |SELECT g AS event_type, CAST(n_windows AS BIGINT) AS n_windows,
      |  floor(st[1] * 100000000.0 + 0.5) / 100000000.0 AS level,
      |  floor(st[2] * 100000000.0 + 0.5) / 100000000.0 AS trend,
      |  floor((st[1] + st[2]) * 100000000.0 + 0.5) / 100000000.0
      |    AS forecast,
      |  floor(st[3] * 1000000.0 + 0.5) / 1000000.0 AS sse
      |FROM st""".stripMargin)

  /** Unrolled EM chain for the gmm1d_em oracle: per step one
    * MATERIALIZED fold CTE (ascending-value list_reduce sums of the
    * log-space responsibilities) and one parameter-update CTE with
    * the same clamps as the driver loop.
    */
  private def gmmIterSql(iters: Int): String = {
    val vD = "CAST(h.v AS DOUBLE)"
    def dExpr(p: String) =
      s"""(ln(1.0 - $p.w1) - ($vD - $p.m2) * ($vD - $p.m2)
         |        / (2.0 * $p.s2) - 0.5 * ln($p.s2))
         |      - (ln($p.w1) - ($vD - $p.m1) * ($vD - $p.m1)
         |        / (2.0 * $p.s1) - 0.5 * ln($p.s1))""".stripMargin
    def fold(term: String) =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list($term ORDER BY h.v)), (a_, b_) -> a_ + b_)"""
        .stripMargin
    val steps = (1 to iters).map { t =>
      val r1 = s"(1.0 / (1.0 + exp(${dExpr("p")})))"
      s"""raw$t AS MATERIALIZED (
         |  SELECT h.g,
         |    ${fold(s"CAST(h.c AS DOUBLE) * $r1")} AS a,
         |    ${fold(s"CAST(h.c AS DOUBLE) * $r1 * $vD")} AS av,
         |    ${fold(s"CAST(h.c AS DOUBLE) * $r1 * $vD * $vD")} AS avv
         |  FROM hist h JOIN p${t - 1} p ON h.g = p.g GROUP BY h.g),
         |p$t AS MATERIALIZED (
         |  SELECT r.g,
         |    greatest(a, 1.0e-6) / CAST(n AS DOUBLE) AS w1,
         |    av / greatest(a, 1.0e-6) AS m1,
         |    CASE WHEN avv / greatest(a, 1.0e-6)
         |        - (av / greatest(a, 1.0e-6))
         |          * (av / greatest(a, 1.0e-6)) <= 0 THEN 0.25
         |      ELSE avv / greatest(a, 1.0e-6)
         |        - (av / greatest(a, 1.0e-6))
         |          * (av / greatest(a, 1.0e-6)) END AS s1,
         |    (CAST(s AS DOUBLE) - av)
         |      / greatest(CAST(n AS DOUBLE) - a, 1.0e-6) AS m2,
         |    CASE WHEN (CAST(ss AS DOUBLE) - avv)
         |          / greatest(CAST(n AS DOUBLE) - a, 1.0e-6)
         |        - ((CAST(s AS DOUBLE) - av)
         |            / greatest(CAST(n AS DOUBLE) - a, 1.0e-6))
         |          * ((CAST(s AS DOUBLE) - av)
         |            / greatest(CAST(n AS DOUBLE) - a, 1.0e-6)) <= 0
         |      THEN 0.25
         |      ELSE (CAST(ss AS DOUBLE) - avv)
         |          / greatest(CAST(n AS DOUBLE) - a, 1.0e-6)
         |        - ((CAST(s AS DOUBLE) - av)
         |            / greatest(CAST(n AS DOUBLE) - a, 1.0e-6))
         |          * ((CAST(s AS DOUBLE) - av)
         |            / greatest(CAST(n AS DOUBLE) - a, 1.0e-6)) END AS s2
         |  FROM raw$t r JOIN base USING (g))""".stripMargin
    }
    steps.mkString(",\n")
  }

  /** Two-component 1-D Gaussian mixture per event type
    * (StatsOps.gmm1dEm, 1e-1 grid, 5 EM steps): exact rank-selected
    * init, log-space responsibilities, ascending-value folds.
    */
  private val gmm1dEmQ = Q(
    (s, d) => StatsOps.gmm1dEm(Tables.events(s, d), "event_type",
        "value")
      .select(col("event_type"), col("n"),
        qround(col("w1"), 8).as("w1"), qround(col("mu1"), 8).as("mu1"),
        qround(col("sigma1"), 8).as("sigma1"),
        qround(col("mu2"), 8).as("mu2"),
        qround(col("sigma2"), 8).as("sigma2")),
    s"""WITH hist AS MATERIALIZED (
       |  SELECT event_type AS g,
       |    CAST(floor(value * 10.0 + 0.5) AS BIGINT) AS v,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM events WHERE event_type IS NOT NULL
       |    AND value IS NOT NULL
       |  GROUP BY 1, 2),
       |base AS (
       |  SELECT g, CAST(sum(c) AS BIGINT) AS n,
       |    CAST(sum(c * v) AS BIGINT) AS s,
       |    CAST(sum(c * v * v) AS BIGINT) AS ss
       |  FROM hist GROUP BY 1),
       |cum AS (
       |  SELECT g, v,
       |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM hist),
       |q1 AS (SELECT cum.g, min(v) AS mu1 FROM cum JOIN base USING (g)
       |       WHERE cum >= (base.n + 3) // 4 GROUP BY 1),
       |q3 AS (SELECT cum.g, min(v) AS mu2 FROM cum JOIN base USING (g)
       |       WHERE cum >= (3 * base.n + 3) // 4 GROUP BY 1),
       |p0 AS MATERIALIZED (
       |  SELECT base.g, CAST(0.5 AS DOUBLE) AS w1,
       |    CAST(q1.mu1 AS DOUBLE) AS m1, CAST(q3.mu2 AS DOUBLE) AS m2,
       |    CASE WHEN CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
       |        - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
       |          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) <= 0
       |      THEN 0.25
       |      ELSE CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
       |        - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
       |          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) END AS s1,
       |    CASE WHEN CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
       |        - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
       |          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) <= 0
       |      THEN 0.25
       |      ELSE CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
       |        - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
       |          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) END AS s2
       |  FROM base JOIN q1 USING (g) JOIN q3 USING (g)),
       |${gmmIterSql(5)}
       |SELECT p5.g AS event_type, n,
       |  floor(w1 * 100000000.0 + 0.5) / 100000000.0 AS w1,
       |  floor(m1 / 10.0 * 100000000.0 + 0.5) / 100000000.0 AS mu1,
       |  floor(sqrt(s1) / 10.0 * 100000000.0 + 0.5) / 100000000.0
       |    AS sigma1,
       |  floor(m2 / 10.0 * 100000000.0 + 0.5) / 100000000.0 AS mu2,
       |  floor(sqrt(s2) / 10.0 * 100000000.0 + 0.5) / 100000000.0
       |    AS sigma2
       |FROM p5 JOIN base USING (g)""".stripMargin)

  /** Max drawdown of hourly mean value per event type
    * (SequenceOps.maxDrawdown): exact-ratio window means, one
    * (peak, drawdown, trough) fold in time order.
    */
  private val maxDrawdownQ = Q(
    (s, d) => operators.SequenceOps.maxDrawdown(
        Tables.events(s, d).select(col("event_type"),
          expr("ts_ns div 3600000000000L").as("win"), col("value")),
        "event_type", "win", "value")
      .select(col("event_type"), col("n_windows"),
        qround(col("peak"), 8).as("peak"),
        qround(col("max_drawdown"), 8).as("max_drawdown"),
        col("trough_at")),
    """WITH s AS (
      |  SELECT event_type AS g, epoch_ns(ts) // 3600000000000 AS h,
      |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
      |        AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) AS y
      |  FROM events WHERE event_type IS NOT NULL
      |    AND value IS NOT NULL
      |  GROUP BY 1, 2),
      |arrs AS (
      |  SELECT g, list({'h': h, 'y': y} ORDER BY h) AS arr
      |  FROM s GROUP BY 1),
      |st AS (
      |  SELECT g, len(arr) AS n_windows,
      |    list_reduce(list_prepend(
      |      [arr[1].y, CAST(0.0 AS DOUBLE), CAST(arr[1].h AS DOUBLE)],
      |      list_transform(arr[2:], e_ -> [e_.y,
      |        CAST(0.0 AS DOUBLE), CAST(e_.h AS DOUBLE)])),
      |      (acc, x_) -> [
      |        greatest(acc[1], x_[1]),
      |        greatest(acc[2], greatest(acc[1], x_[1]) - x_[1]),
      |        CASE WHEN greatest(acc[1], x_[1]) - x_[1] > acc[2]
      |          THEN x_[3] ELSE acc[3] END]) AS st
      |  FROM arrs WHERE len(arr) >= 2)
      |SELECT g AS event_type, CAST(n_windows AS BIGINT) AS n_windows,
      |  floor(st[1] * 100000000.0 + 0.5) / 100000000.0 AS peak,
      |  floor(st[2] * 100000000.0 + 0.5) / 100000000.0
      |    AS max_drawdown,
      |  CAST(st[3] AS BIGINT) AS trough_at
      |FROM st""".stripMargin)

  /** Rank-biased overlap between the two hash-halves' top-20 term
    * rankings (TextOps.rboTerms, p = 0.9): deterministic rankings,
    * k²-bounded depth join, pow-free weight fold.
    */
  private val rboTermsQ = Q(
    (s, d) => operators.TextOps.rboTerms(
        Tables.documents(s, d)
          .where(col("doc_id").isNotNull && col("text").isNotNull)
          .withColumn("cohort",
            when(expr("(((doc_id % 1000000007L) * 2654435761L)" +
              " % 1000000007L) % 10000") < 5000, "A").otherwise("B")),
        "cohort", "A", "B", "text")
      .select(col("n_common"), qround(col("rbo"), 8).as("rbo"),
        qround(col("overlap_at_k"), 8).as("overlap_at_k")),
    """WITH dd AS (
      |  SELECT CASE WHEN (((doc_id % 1000000007) * 2654435761)
      |      % 1000000007) % 10000 < 5000
      |    THEN 'A' ELSE 'B' END AS c, text
      |  FROM documents WHERE doc_id IS NOT NULL
      |    AND text IS NOT NULL),
      |tk AS (SELECT c, unnest(string_split(text, ' ')) AS w FROM dd),
      |cnt AS (SELECT c, w, CAST(count(*) AS BIGINT) AS n
      |        FROM tk GROUP BY 1, 2),
      |rk AS (SELECT c, w,
      |         row_number() OVER (PARTITION BY c ORDER BY n DESC, w)
      |           AS r
      |       FROM cnt),
      |kk AS (SELECT * FROM rk WHERE r <= 20),
      |j AS (
      |  SELECT a.w, greatest(a.r, b.r) AS m
      |  FROM (SELECT w, r FROM kk WHERE c = 'A') a
      |  JOIN (SELECT w, r FROM kk WHERE c = 'B') b USING (w)),
      |ds AS (
      |  SELECT d, CAST(coalesce(x0, 0) AS BIGINT) AS x
      |  FROM (SELECT unnest(generate_series(1, 20)) AS d) dd2
      |  LEFT JOIN (
      |    SELECT d2 AS d, CAST(count(*) AS BIGINT) AS x0
      |    FROM j CROSS JOIN
      |      (SELECT unnest(generate_series(1, 20)) AS d2)
      |    WHERE m <= d2 GROUP BY 1) o USING (d)),
      |one AS (
      |  SELECT list({'d': d, 'x': x} ORDER BY d) AS arr,
      |    max(CASE WHEN d = 20 THEN x END) AS xk
      |  FROM ds)
      |SELECT CAST(coalesce(xk, 0) AS BIGINT) AS n_common,
      |  floor((CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE))
      |    * (list_reduce(list_prepend(
      |        [CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
      |        list_transform(arr, e_ -> [CAST(e_.x AS DOUBLE),
      |          CAST(e_.d AS DOUBLE)])),
      |        (acc, x_) -> [acc[1] * CAST(0.9 AS DOUBLE),
      |          acc[2] + acc[1] * x_[1] / x_[2]]))[2]
      |    * 100000000.0 + 0.5) / 100000000.0 AS rbo,
      |  floor(CAST(coalesce(xk, 0) AS DOUBLE) / 20.0
      |    * 100000000.0 + 0.5) / 100000000.0 AS overlap_at_k
      |FROM one""".stripMargin)

  /** Restricted mean survival time at τ = 7 days over user lifetimes
    * (SequenceOps.rmst, censorDays = 1): the KM step integral as one
    * τ-clipped fixed-order fold.
    */
  private val rmstQ = Q(
    (s, d) => operators.SequenceOps.rmst(
        Tables.events(s, d).select(col("user_id"), col("ts_ns")),
        "user_id", "ts_ns", censorDays = 1, tauDays = 7)
      .select(col("n_death_times"), col("tau_days"),
        qround(col("rmst"), 8).as("rmst"),
        qround(col("s_final"), 8).as("s_final")),
    """WITH pk AS (
      |  SELECT user_id,
      |    min(epoch_ns(ts) // 86400000000000) AS d0,
      |    max(epoch_ns(ts) // 86400000000000) AS d1
      |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      |e2 AS (SELECT (SELECT max(d1) FROM pk) AS endd),
      |lv AS (SELECT d1 - d0 AS t, d1 <= endd - 1 AS dead
      |       FROM pk CROSS JOIN e2),
      |h AS (
      |  SELECT t,
      |    CAST(sum(CASE WHEN dead THEN 1 ELSE 0 END) AS BIGINT) AS d,
      |    CAST(sum(CASE WHEN dead THEN 0 ELSE 1 END) AS BIGINT) AS c
      |  FROM lv GROUP BY 1),
      |tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS nn FROM h),
      |dm AS (
      |  SELECT t, d,
      |    nn - CAST(sum(d + c) OVER (ORDER BY t
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) + d + c AS n
      |  FROM h CROSS JOIN tot),
      |one AS (SELECT list({'t': t, 'd': d, 'n': n} ORDER BY t) AS arr
      |        FROM dm WHERE d > 0),
      |f AS (
      |  SELECT len(arr) AS ndt,
      |    list_reduce(list_prepend(
      |      [CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE),
      |       CAST(0.0 AS DOUBLE)],
      |      list_transform(arr, e_ -> [CAST(e_.t AS DOUBLE),
      |        CAST(e_.d AS DOUBLE), CAST(e_.n AS DOUBLE)])),
      |      (acc, x_) -> [
      |        x_[1],
      |        acc[2] * (CAST(1.0 AS DOUBLE) - x_[2] / x_[3]),
      |        acc[3] + acc[2] * (least(x_[1], CAST(7.0 AS DOUBLE))
      |          - least(acc[1], CAST(7.0 AS DOUBLE)))]) AS st
      |  FROM one)
      |SELECT CAST(ndt AS BIGINT) AS n_death_times,
      |  CAST(7 AS BIGINT) AS tau_days,
      |  floor((st[3] + st[2] * (CAST(7.0 AS DOUBLE)
      |      - least(st[1], CAST(7.0 AS DOUBLE))))
      |    * 100000000.0 + 0.5) / 100000000.0 AS rmst,
      |  floor(st[2] * 100000000.0 + 0.5) / 100000000.0 AS s_final
      |FROM f""".stripMargin)

  /** Mann-Kendall monotone-trend test on hourly arrivals per event
    * type (StatsOps.mannKendall): exact bigint pair census over the
    * hour domain, tie-corrected variance, continuity-corrected z.
    */
  private val mannKendallQ = Q(
    (s, d) => StatsOps.mannKendall(
        Tables.events(s, d).select(col("event_type"),
          expr("ts_ns div 3600000000000L").as("win")),
        "event_type", "win")
      .select(col("event_type"), col("m"), col("s"),
        qround(col("var_s"), 6).as("var_s"),
        qround(col("z"), 8).as("z")),
    """WITH sr AS (
      |  SELECT event_type AS g, epoch_ns(ts) // 3600000000000 AS h,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
      |pr AS (
      |  SELECT a.g,
      |    CAST(sum(CASE WHEN b.y > a.y THEN 1
      |      WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
      |  FROM sr a JOIN sr b ON a.g = b.g AND a.h < b.h
      |  GROUP BY 1),
      |ti AS (
      |  SELECT g,
      |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tc
      |  FROM (SELECT g, y, CAST(count(*) AS BIGINT) AS t
      |        FROM sr GROUP BY 1, 2)
      |  GROUP BY 1),
      |mm AS (SELECT g, CAST(count(*) AS BIGINT) AS m
      |       FROM sr GROUP BY 1)
      |SELECT pr.g AS event_type, m, s,
      |  floor(CAST(m * (m - 1) * (2 * m + 5) - tc AS DOUBLE) / 18.0
      |    * 1000000.0 + 0.5) / 1000000.0 AS var_s,
      |  floor(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
      |      / sqrt(CAST(m * (m - 1) * (2 * m + 5) - tc AS DOUBLE)
      |        / 18.0)
      |    WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
      |      / sqrt(CAST(m * (m - 1) * (2 * m + 5) - tc AS DOUBLE)
      |        / 18.0)
      |    ELSE 0.0 END * 100000000.0 + 0.5) / 100000000.0 AS z
      |FROM pr JOIN mm ON pr.g = mm.g JOIN ti ON pr.g = ti.g"""
      .stripMargin)

  /** Theil T inequality of document lengths with between/within
    * source decomposition (StatsOps.theilIndex): fixed-order entropy
    * folds over the value and group domains.
    */
  private val theilIndexQ = Q(
    (s, d) => StatsOps.theilIndex(
        Tables.documents(s, d), "source", "n_chars")
      .select(col("n"), qround(col("theil_total"), 8).as("theil_total"),
        qround(col("theil_between"), 8).as("theil_between"),
        qround(col("theil_within"), 8).as("theil_within")),
    """WITH f AS (
      |  SELECT source AS g, CAST(n_chars AS BIGINT) AS v
      |  FROM documents WHERE source IS NOT NULL
      |    AND n_chars IS NOT NULL AND n_chars > 0),
      |h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
      |      FROM f GROUP BY 1, 2),
      |gt AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
      |         CAST(sum(v) AS BIGINT) AS vg
      |       FROM f GROUP BY 1),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(v) AS BIGINT) AS vv
      |      FROM f),
      |tg AS (
      |  SELECT h.g,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list(CAST(c AS DOUBLE) * CAST(v AS DOUBLE)
      |          / CAST(vg AS DOUBLE)
      |        * ln(CAST(v AS DOUBLE) * CAST(ng AS DOUBLE)
      |          / CAST(vg AS DOUBLE)) ORDER BY v)),
      |      (a_, b_) -> a_ + b_) AS tgv
      |  FROM h JOIN gt USING (g) GROUP BY 1),
      |wi AS (
      |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list(CAST(vg AS DOUBLE) / CAST(vv AS DOUBLE) * tgv
      |      ORDER BY tg.g)), (a_, b_) -> a_ + b_) AS theil_within
      |  FROM tg JOIN gt USING (g) CROSS JOIN t),
      |bt AS (
      |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list(CAST(vg AS DOUBLE) / CAST(vv AS DOUBLE)
      |      * ln((CAST(vg AS DOUBLE) / CAST(vv AS DOUBLE))
      |        / (CAST(ng AS DOUBLE) / CAST(n AS DOUBLE)))
      |      ORDER BY g)), (a_, b_) -> a_ + b_) AS theil_between
      |  FROM gt CROSS JOIN t),
      |tl AS (
      |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list(CAST(c AS DOUBLE) * CAST(v AS DOUBLE)
      |        / CAST(vv AS DOUBLE)
      |      * ln(CAST(v AS DOUBLE) * CAST(n AS DOUBLE)
      |        / CAST(vv AS DOUBLE)) ORDER BY v)),
      |      (a_, b_) -> a_ + b_) AS theil_total
      |  FROM (SELECT v, CAST(count(*) AS BIGINT) AS c
      |        FROM f GROUP BY 1) hv
      |  CROSS JOIN t)
      |SELECT n,
      |  floor(theil_total * 100000000.0 + 0.5) / 100000000.0
      |    AS theil_total,
      |  floor(theil_between * 100000000.0 + 0.5) / 100000000.0
      |    AS theil_between,
      |  floor(theil_within * 100000000.0 + 0.5) / 100000000.0
      |    AS theil_within
      |FROM t CROSS JOIN tl CROSS JOIN bt CROSS JOIN wi"""
      .stripMargin)

  /** Greedy two-state burst detection on hourly arrivals per event
    * type (SequenceOps.burstDetect, gamma = 2): Poisson state costs,
    * one time-ordered fold per series.
    */
  private val burstDetectQ = Q(
    (s, d) => operators.SequenceOps.burstDetect(
        Tables.events(s, d).select(col("event_type"),
          expr("ts_ns div 3600000000000L").as("win")),
        "event_type", "win")
      .select(col("event_type"), col("n_windows"), col("n_bursts"),
        col("burst_windows")),
    """WITH s AS (
      |  SELECT event_type AS g, epoch_ns(ts) // 3600000000000 AS h,
      |    CAST(count(*) AS DOUBLE) AS y
      |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
      |lam AS (SELECT g, sum(y) / CAST(count(*) AS DOUBLE) AS l0
      |        FROM s GROUP BY 1),
      |arrs AS (
      |  SELECT s.g, list({'h': h, 'y': y, 'l0': l0} ORDER BY h) AS arr
      |  FROM s JOIN lam ON s.g = lam.g GROUP BY 1),
      |st AS (
      |  SELECT g, len(arr) AS nw,
      |    list_reduce(list_prepend(
      |      [CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
      |       CAST(0.0 AS DOUBLE)],
      |      list_transform(arr, e_ -> [e_.y, e_.l0,
      |        CAST(0.0 AS DOUBLE)])),
      |      (acc, x_) -> [
      |        CASE WHEN x_[2] * 2.0 - x_[1] * ln(x_[2] * 2.0)
      |            + CASE WHEN acc[1] < 0.5 THEN CAST(2.0 AS DOUBLE)
      |              ELSE CAST(0.0 AS DOUBLE) END
      |          < x_[2] - x_[1] * ln(x_[2])
      |          THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END,
      |        acc[2] + CASE WHEN acc[1] < 0.5
      |            AND x_[2] * 2.0 - x_[1] * ln(x_[2] * 2.0)
      |              + CASE WHEN acc[1] < 0.5 THEN CAST(2.0 AS DOUBLE)
      |                ELSE CAST(0.0 AS DOUBLE) END
      |            < x_[2] - x_[1] * ln(x_[2])
      |          THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END,
      |        acc[3] + CASE WHEN x_[2] * 2.0 - x_[1] * ln(x_[2] * 2.0)
      |              + CASE WHEN acc[1] < 0.5 THEN CAST(2.0 AS DOUBLE)
      |                ELSE CAST(0.0 AS DOUBLE) END
      |            < x_[2] - x_[1] * ln(x_[2])
      |          THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END])
      |      AS st
      |  FROM arrs)
      |SELECT g AS event_type, CAST(nw AS BIGINT) AS n_windows,
      |  CAST(st[2] AS BIGINT) AS n_bursts,
      |  CAST(st[3] AS BIGINT) AS burst_windows
      |FROM st""".stripMargin)

  /** Streaming burst-detection twin (StreamingOps.burstStream) driven
    * on a batch frame: the (window → count) histogram state merges
    * commutatively across micro-batches and the greedy Poisson fold
    * is recomputed from the merged histogram, so the last emission
    * equals the batch operator bit-exactly — shared oracle with
    * burst_detect's SQL.
    */
  private val streamBurstQ = Q(
    (s, d) => graft.streaming.StreamingOps.burstStream(s,
        Tables.events(s, d).select(col("event_type"),
          expr("ts_ns div 3600000000000L").as("win")),
        "event_type", "win")
      .select(col("event_type"), col("n_windows"), col("n_bursts"),
        col("burst_windows")),
    burstDetectQ.sql)

  /** Lorenz decile shares of document length per source
    * (StatsOps.lorenzDeciles): integer decile boundaries, exact
    * multiplicity clamps on the cumulative histogram.
    */
  private val lorenzDecilesQ = Q(
    (s, d) => StatsOps.lorenzDeciles(
        Tables.documents(s, d), "source", "n_chars")
      .select(col("source"), col("decile"), col("n_items"),
        qround(col("share"), 8).as("share")),
    """WITH f AS (
      |  SELECT source AS g, CAST(n_chars AS BIGINT) AS v
      |  FROM documents WHERE source IS NOT NULL
      |    AND n_chars IS NOT NULL),
      |h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
      |      FROM f GROUP BY 1, 2),
      |cc AS (
      |  SELECT g, v, c,
      |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM h),
      |t AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(v) AS BIGINT) AS sv
      |      FROM f GROUP BY 1),
      |x AS (
      |  SELECT cc.g, d,
      |    greatest(CAST(0 AS BIGINT),
      |      least(cum, (d * n) // 10)
      |      - greatest(cum - c, ((d - 1) * n) // 10)) AS ke,
      |    v, sv
      |  FROM cc JOIN t USING (g)
      |  CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS d))
      |SELECT g AS source, CAST(d AS BIGINT) AS decile,
      |  CAST(sum(ke) AS BIGINT) AS n_items,
      |  floor(CAST(sum(ke * v) AS DOUBLE) / CAST(max(sv) AS DOUBLE)
      |    * 100000000.0 + 0.5) / 100000000.0 AS share
      |FROM x GROUP BY 1, 2""".stripMargin)

  /** Vocabulary head coverage per source (TextOps.vocabCoverage,
    * 80%): exact integer rank selection over the deterministic
    * (freq desc, term) vocabulary ranking.
    */
  private val vocabCoverageQ = Q(
    (s, d) => operators.TextOps.vocabCoverage(
        Tables.documents(s, d), "source", "text")
      .select(col("source"), col("n_tokens"), col("vocab_size"),
        col("k_head"), qround(col("head_share"), 8).as("head_share")),
    """WITH tk AS (
      |  SELECT source AS g, unnest(string_split(text, ' ')) AS w
      |  FROM documents WHERE source IS NOT NULL
      |    AND text IS NOT NULL),
      |c AS (SELECT g, w, CAST(count(*) AS BIGINT) AS c
      |      FROM tk GROUP BY 1, 2),
      |r AS (
      |  SELECT g, c,
      |    row_number() OVER (PARTITION BY g ORDER BY c DESC, w) AS r,
      |    CAST(sum(c) OVER (PARTITION BY g ORDER BY c DESC, w
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM c),
      |t AS (SELECT g, CAST(sum(c) AS BIGINT) AS tot,
      |        CAST(count(*) AS BIGINT) AS vs
      |      FROM c GROUP BY 1)
      |SELECT r.g AS source, max(tot) AS n_tokens,
      |  max(vs) AS vocab_size, CAST(min(r) AS BIGINT) AS k_head,
      |  floor(CAST(min(cum) AS DOUBLE) / CAST(max(tot) AS DOUBLE)
      |    * 100000000.0 + 0.5) / 100000000.0 AS head_share
      |FROM r JOIN t USING (g)
      |WHERE cum >= (tot * 800 + 999) // 1000
      |GROUP BY 1""".stripMargin)

  /** Streaming per-user max drawdown over the raw quantized value
    * sequence (StreamingOps.drawdownStream) — all-integer state, so
    * the batch-frame fold below is exactly what the stream emits.
    */
  private val streamDrawdownQ = Q(
    (s, d) => graft.streaming.StreamingOps.drawdownStream(s,
        Tables.events(s, d).where(col("value").isNotNull)
          .select(col("user_id"), col("ts_ns"), col("event_id"),
            floor(col("value") * 100.0 + 0.5).cast("long").as("vq")),
        "user_id", "ts_ns", "event_id", "vq"),
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) AS tsn, event_id,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vq
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      |one AS (
      |  SELECT user_id,
      |    list({'t': tsn, 'e': event_id, 'v': vq}
      |      ORDER BY tsn, event_id) AS arr
      |  FROM e GROUP BY 1),
      |f AS (
      |  SELECT user_id, CAST(len(arr) AS BIGINT) AS n,
      |    list_reduce(list_prepend(
      |      [arr[1].v, CAST(0 AS BIGINT), arr[1].t],
      |      list_transform(arr[2:], e_ -> [e_.v, CAST(0 AS BIGINT),
      |        e_.t])),
      |      (acc, x_) -> [
      |        greatest(acc[1], x_[1]),
      |        greatest(acc[2], greatest(acc[1], x_[1]) - x_[1]),
      |        CASE WHEN greatest(acc[1], x_[1]) - x_[1] > acc[2]
      |          THEN x_[3] ELSE acc[3] END]) AS st
      |  FROM one)
      |SELECT user_id, n, st[1] AS peak, st[2] AS max_drawdown,
      |  st[3] AS trough_at
      |FROM f""".stripMargin)

  /** Difference-in-differences on event values
    * (StatsOps.didEstimate): treatment = user hash gate, post =
    * second half of the observed day span; four exact cell means,
    * closed-form effect.
    */
  private val didEstimateQ = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts_ns"), col("value"))
      val b = ev.agg(
        min(expr("ts_ns div 86400000000000L")).as("_lo"),
        max(expr("ts_ns div 86400000000000L")).as("_hi"))
      val base = ev.crossJoin(broadcast(b)).select(
        (expr("(((user_id % 1000000007L) * 2654435761L)" +
          " % 1000000007L) % 10000") < 5000).as("treat"),
        (expr("ts_ns div 86400000000000L") >=
          expr("(_lo + _hi + 1) div 2")).as("post"),
        col("value"))
      StatsOps.didEstimate(base, "treat", "post", "value")
        .select(col("n_t0"), col("n_t1"), col("n_c0"), col("n_c1"),
          qround(col("mean_treat_pre"), 8).as("mean_treat_pre"),
          qround(col("mean_treat_post"), 8).as("mean_treat_post"),
          qround(col("mean_ctrl_pre"), 8).as("mean_ctrl_pre"),
          qround(col("mean_ctrl_post"), 8).as("mean_ctrl_post"),
          qround(col("did"), 8).as("did"))
    },
    """WITH b AS (
      |  SELECT min(epoch_ns(ts) // 86400000000000) AS lo,
      |    max(epoch_ns(ts) // 86400000000000) AS hi
      |  FROM events),
      |f AS (
      |  SELECT
      |    (((user_id % 1000000007) * 2654435761) % 1000000007)
      |      % 10000 < 5000 AS tr,
      |    epoch_ns(ts) // 86400000000000 >= (lo + hi + 1) // 2 AS po,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vq
      |  FROM events CROSS JOIN b
      |  WHERE user_id IS NOT NULL AND value IS NOT NULL),
      |a AS (
      |  SELECT
      |    CAST(sum(CASE WHEN tr AND NOT po THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_t0,
      |    CAST(sum(CASE WHEN tr AND NOT po THEN vq ELSE 0 END)
      |      AS BIGINT) AS s_t0,
      |    CAST(sum(CASE WHEN tr AND po THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_t1,
      |    CAST(sum(CASE WHEN tr AND po THEN vq ELSE 0 END)
      |      AS BIGINT) AS s_t1,
      |    CAST(sum(CASE WHEN NOT tr AND NOT po THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_c0,
      |    CAST(sum(CASE WHEN NOT tr AND NOT po THEN vq ELSE 0 END)
      |      AS BIGINT) AS s_c0,
      |    CAST(sum(CASE WHEN NOT tr AND po THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_c1,
      |    CAST(sum(CASE WHEN NOT tr AND po THEN vq ELSE 0 END)
      |      AS BIGINT) AS s_c1
      |  FROM f)
      |SELECT n_t0, n_t1, n_c0, n_c1,
      |  floor(CAST(s_t0 AS DOUBLE) / 100.0 / CAST(n_t0 AS DOUBLE)
      |    * 100000000.0 + 0.5) / 100000000.0 AS mean_treat_pre,
      |  floor(CAST(s_t1 AS DOUBLE) / 100.0 / CAST(n_t1 AS DOUBLE)
      |    * 100000000.0 + 0.5) / 100000000.0 AS mean_treat_post,
      |  floor(CAST(s_c0 AS DOUBLE) / 100.0 / CAST(n_c0 AS DOUBLE)
      |    * 100000000.0 + 0.5) / 100000000.0 AS mean_ctrl_pre,
      |  floor(CAST(s_c1 AS DOUBLE) / 100.0 / CAST(n_c1 AS DOUBLE)
      |    * 100000000.0 + 0.5) / 100000000.0 AS mean_ctrl_post,
      |  floor(((CAST(s_t1 AS DOUBLE) / 100.0 / CAST(n_t1 AS DOUBLE)
      |      - CAST(s_t0 AS DOUBLE) / 100.0 / CAST(n_t0 AS DOUBLE))
      |    - (CAST(s_c1 AS DOUBLE) / 100.0 / CAST(n_c1 AS DOUBLE)
      |      - CAST(s_c0 AS DOUBLE) / 100.0 / CAST(n_c0 AS DOUBLE)))
      |    * 100000000.0 + 0.5) / 100000000.0 AS did
      |FROM a""".stripMargin)

  /** Entropy-rate readout over the user event-type Markov chain
    * (SequenceOps.transitionEntropy): exact censuses, fixed-order
    * entropy folds, info gain = H(next) − H(next|prev).
    */
  private val transitionEntropyQ = Q(
    (s, d) => operators.SequenceOps.transitionEntropy(
        Tables.events(s, d).select(col("user_id"), col("ts_ns"),
          col("event_id"), col("event_type")),
        "user_id", "ts_ns", "event_id", "event_type")
      .select(col("n_transitions"),
        qround(col("h_next"), 8).as("h_next"),
        qround(col("h_cond"), 8).as("h_cond"),
        qround(col("info_gain"), 8).as("info_gain")),
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) AS tsn, event_id, event_type
      |  FROM events
      |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      |p AS (
      |  SELECT coalesce(lag(event_type) OVER
      |      (PARTITION BY user_id ORDER BY tsn, event_id), '_start')
      |      AS pv,
      |    event_type AS nx
      |  FROM e),
      |g AS (SELECT pv, nx, CAST(count(*) AS BIGINT) AS n
      |      FROM p GROUP BY 1, 2),
      |tp AS (SELECT pv, CAST(sum(n) AS BIGINT) AS tp FROM g GROUP BY 1),
      |tn AS (SELECT nx, CAST(sum(n) AS BIGINT) AS tn FROM g GROUP BY 1),
      |nn AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM g),
      |hc AS (
      |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)
      |      * ln(CAST(tp.tp AS DOUBLE) / CAST(n AS DOUBLE))
      |      ORDER BY pv, nx)), (a_, b_) -> a_ + b_) AS h_cond
      |  FROM g JOIN tp USING (pv) CROSS JOIN nn),
      |hn AS (
      |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list(CAST(tn.tn AS DOUBLE) / CAST(nn AS DOUBLE)
      |      * ln(CAST(nn AS DOUBLE) / CAST(tn.tn AS DOUBLE))
      |      ORDER BY nx)), (a_, b_) -> a_ + b_) AS h_next
      |  FROM tn CROSS JOIN nn)
      |SELECT nn AS n_transitions,
      |  floor(h_next * 100000000.0 + 0.5) / 100000000.0 AS h_next,
      |  floor(h_cond * 100000000.0 + 0.5) / 100000000.0 AS h_cond,
      |  floor((h_next - h_cond) * 100000000.0 + 0.5) / 100000000.0
      |    AS info_gain
      |FROM nn CROSS JOIN hn CROSS JOIN hc""".stripMargin)

  /** Interpolated Kneser-Ney bigram perplexity on the hash split
    * (TextOps.kneserNeyPerplexity): type-count continuation model,
    * D = 0.75, mirrored IEEE log-prob per test bigram.
    */
  private val kneserNeyQ = Q(
    (s, d) => operators.TextOps.kneserNeyPerplexity(
        Tables.documents(s, d), "doc_id", "text")
      .select(col("n_test_bigrams"),
        qround(col("avg_logp"), 8).as("avg_logp"),
        qround(col("perplexity"), 6).as("perplexity")),
    """WITH trw AS (
      |  SELECT string_split(text, ' ') AS ws FROM documents
      |  WHERE (((doc_id % 1000000007) * 2654435761) % 1000000007)
      |    % 10000 < 8000),
      |tew AS (
      |  SELECT string_split(text, ' ') AS ws FROM documents
      |  WHERE (((doc_id % 1000000007) * 2654435761) % 1000000007)
      |    % 10000 >= 8000),
      |trb AS (
      |  SELECT ws[i] AS w1, ws[i + 1] AS w2
      |  FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
      |        FROM trw WHERE len(ws) >= 2)),
      |pairs AS (
      |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS np
      |  FROM trb GROUP BY 1, 2),
      |ctx AS (SELECT w1, CAST(sum(np) AS BIGINT) AS c1,
      |          CAST(count(*) AS BIGINT) AS n1f
      |        FROM pairs GROUP BY 1),
      |bwd AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1b
      |        FROM pairs GROUP BY 1),
      |tt AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM pairs),
      |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS nv
      |      FROM (SELECT unnest(ws) AS w FROM trw)),
      |teb AS (
      |  SELECT ws[i] AS w1, ws[i + 1] AS w2
      |  FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
      |        FROM tew WHERE len(ws) >= 2)),
      |tst AS (
      |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS nt
      |  FROM teb GROUP BY 1, 2),
      |sc AS (
      |  SELECT tst.nt,
      |    CAST(floor(ln(
      |      CASE WHEN coalesce(ctx.c1, 0) > 0 THEN
      |        greatest(CAST(coalesce(pairs.np, 0) AS DOUBLE) - 0.75,
      |          0.0) / CAST(ctx.c1 AS DOUBLE)
      |        + 0.75 * CAST(ctx.n1f AS DOUBLE) / CAST(ctx.c1 AS DOUBLE)
      |          * ((CAST(coalesce(bwd.n1b, 0) AS DOUBLE) + 1.0)
      |            / (CAST(tt.tt AS DOUBLE) + CAST(v.nv AS DOUBLE)
      |              + 1.0))
      |      ELSE (CAST(coalesce(bwd.n1b, 0) AS DOUBLE) + 1.0)
      |        / (CAST(tt.tt AS DOUBLE) + CAST(v.nv AS DOUBLE) + 1.0)
      |      END) * 1000000.0 + 0.5) AS BIGINT) AS lq
      |  FROM tst LEFT JOIN pairs USING (w1, w2)
      |       LEFT JOIN ctx USING (w1) LEFT JOIN bwd USING (w2)
      |       CROSS JOIN tt CROSS JOIN v)
      |SELECT CAST(sum(nt) AS BIGINT) AS n_test_bigrams,
      |  floor(CAST(sum(nt * lq) AS DOUBLE) / 1000000.0
      |      / CAST(sum(nt) AS DOUBLE) * 100000000.0 + 0.5)
      |    / 100000000.0 AS avg_logp,
      |  floor(exp(-(CAST(sum(nt * lq) AS DOUBLE) / 1000000.0
      |      / CAST(sum(nt) AS DOUBLE))) * 1000000.0 + 0.5)
      |    / 1000000.0 AS perplexity
      |FROM sc""".stripMargin)

  /** Quantile-normalize document lengths onto the global distribution
    * (StatsOps.quantileNormalize): integer rank mapping
    * ceil(cum·N/n), domain×broadcast-domain non-equi join.
    */
  private val quantileNormalizeQ = Q(
    (s, d) => StatsOps.quantileNormalize(
        Tables.documents(s, d), "source", "n_chars")
      .select(col("source"), col("n"),
        qround(col("mean_raw"), 8).as("mean_raw"),
        qround(col("mean_mapped"), 8).as("mean_mapped")),
    """WITH f AS (
      |  SELECT source AS g,
      |    CAST(floor(CAST(n_chars AS DOUBLE) * 1.0 + 0.5) AS BIGINT)
      |      AS v
      |  FROM documents WHERE source IS NOT NULL
      |    AND n_chars IS NOT NULL),
      |gd AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
      |       FROM f GROUP BY 1, 2),
      |gcum AS (
      |  SELECT g, v, c,
      |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM gd),
      |ng AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM f),
      |gl AS (SELECT v AS tv, CAST(count(*) AS BIGINT) AS tc
      |       FROM f GROUP BY 1),
      |glc AS (
      |  SELECT tv, tc, CAST(sum(tc) OVER (ORDER BY tv
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tcum
      |  FROM gl),
      |mp AS (
      |  SELECT g, v, c, n, (cum * nn + n - 1) // n AS r
      |  FROM gcum JOIN ng USING (g) CROSS JOIN nn),
      |j AS (
      |  SELECT mp.g, c, v, tv, n
      |  FROM mp JOIN glc ON r > tcum - tc AND r <= tcum)
      |SELECT g AS source, CAST(max(n) AS BIGINT) AS n,
      |  floor(CAST(sum(c * v) AS DOUBLE) / 1.0 / CAST(max(n) AS DOUBLE)
      |    * 100000000.0 + 0.5) / 100000000.0 AS mean_raw,
      |  floor(CAST(sum(c * tv) AS DOUBLE) / 1.0
      |      / CAST(max(n) AS DOUBLE)
      |    * 100000000.0 + 0.5) / 100000000.0 AS mean_mapped
      |FROM j GROUP BY 1""".stripMargin)

  /** Exact 10%-trimmed mean of event values per type
    * (StatsOps.trimmedMean): per-value surviving multiplicities are
    * pure integer clamps on the cumulative histogram.
    */
  private val trimmedMeanQ = Q(
    (s, d) => StatsOps.trimmedMean(
        Tables.events(s, d), "event_type", "value")
      .select(col("event_type"), col("n"), col("k"),
        qround(col("mean_raw"), 8).as("mean_raw"),
        qround(col("trimmed_mean"), 8).as("trimmed_mean")),
    """WITH f AS (
      |  SELECT event_type AS g,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
      |  FROM events WHERE event_type IS NOT NULL
      |    AND value IS NOT NULL),
      |h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
      |      FROM f GROUP BY 1, 2),
      |cc AS (
      |  SELECT g, v, c,
      |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM h),
      |nt AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1),
      |kk AS (
      |  SELECT g, v, c, cum, nt.n, (nt.n * 100000) // 1000000 AS k
      |  FROM cc JOIN nt USING (g)),
      |kept AS (
      |  SELECT g, v, c, n, k,
      |    greatest(CAST(0 AS BIGINT),
      |      least(cum, n - k) - greatest(cum - c, k)) AS ke
      |  FROM kk)
      |SELECT g AS event_type, CAST(max(n) AS BIGINT) AS n,
      |  CAST(max(k) AS BIGINT) AS k,
      |  floor(CAST(sum(c * v) AS DOUBLE) / 100.0
      |      / CAST(max(n) AS DOUBLE)
      |    * 100000000.0 + 0.5) / 100000000.0 AS mean_raw,
      |  floor(CAST(sum(ke * v) AS DOUBLE) / 100.0
      |      / CAST(sum(ke) AS DOUBLE)
      |    * 100000000.0 + 0.5) / 100000000.0 AS trimmed_mean
      |FROM kept GROUP BY 1""".stripMargin)

  /** Bradley-Terry source ratings (ClassifierOps.bradleyTerry) from
    * hash-paired document head-to-heads (winner = longer doc,
    * deterministic tie-break): exact win-matrix census, 10 MM steps
    * with ascending-entity folds.
    */
  private val bradleyTerryQ = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
        .where(col("doc_id").isNotNull && col("n_chars").isNotNull)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val nd = docs.agg(count(lit(1)).as("_nd"))
      val beats = col("n_chars") > col("_c2") ||
        (col("n_chars") === col("_c2") && col("doc_id") < col("_pid"))
      val matches = docs.crossJoin(broadcast(nd))
        .select(col("doc_id"), col("source"), col("n_chars"),
          expr("((doc_id % 1000000007L) * 2654435761L) % 1000000007L" +
            " % _nd").as("_pid"))
        .join(docs.select(col("doc_id").as("_pid"),
          col("source").as("_s2"), col("n_chars").as("_c2")),
          Seq("_pid"))
        .where(col("source") =!= col("_s2"))
        .select(when(beats, col("source")).otherwise(col("_s2"))
            .as("winner"),
          when(beats, col("_s2")).otherwise(col("source")).as("loser"))
      operators.ClassifierOps.bradleyTerry(matches, "winner", "loser")
        .select(col("winner").as("source"), col("wins"),
          col("n_matches"), qround(col("rating"), 8).as("rating"))
    },
    s"""WITH docs AS (
       |  SELECT doc_id, source, n_chars FROM documents
       |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM docs),
       |mt AS (
       |  SELECT CASE WHEN p.n_chars > q.n_chars
       |      OR (p.n_chars = q.n_chars AND p.doc_id < q.doc_id)
       |    THEN p.source ELSE q.source END AS w,
       |    CASE WHEN p.n_chars > q.n_chars
       |      OR (p.n_chars = q.n_chars AND p.doc_id < q.doc_id)
       |    THEN q.source ELSE p.source END AS l
       |  FROM (SELECT d.doc_id, d.source, d.n_chars,
       |          ((d.doc_id % 1000000007) * 2654435761) % 1000000007
       |            % nd.n AS pid
       |        FROM docs d CROSS JOIN nd) p
       |  JOIN docs q ON p.pid = q.doc_id
       |  WHERE p.source <> q.source),
       |cells AS (SELECT w, l, CAST(count(*) AS BIGINT) AS c
       |          FROM mt GROUP BY 1, 2),
       |nm AS (
       |  SELECT s, o, CAST(sum(c) AS BIGINT) AS n FROM (
       |    SELECT w AS s, l AS o, c FROM cells
       |    UNION ALL SELECT l, w, c FROM cells) GROUP BY 1, 2),
       |wct AS (
       |  SELECT s, CAST(sum(wn) AS BIGINT) AS wins FROM (
       |    SELECT w AS s, c AS wn FROM cells
       |    UNION ALL SELECT l, 0 FROM cells) GROUP BY 1),
       |${btIterSql(10)},
       |z AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |        list(p ORDER BY s)), (a_, b_) -> a_ + b_) AS z
       |      FROM p10),
       |mts AS (SELECT s, CAST(sum(n) AS BIGINT) AS n_matches
       |        FROM nm GROUP BY 1)
       |SELECT p10.s AS source, wins, n_matches,
       |  floor(p10.p / z.z * 100000000.0 + 0.5) / 100000000.0
       |    AS rating
       |FROM p10 CROSS JOIN z
       |JOIN wct ON p10.s = wct.s
       |JOIN mts ON p10.s = mts.s""".stripMargin)

  /** pass@k over per-user event "attempts" (ClassifierOps.passAtK):
    * correct = value >= 50 on the exact grid; per-task k-term product
    * folds, 1e-9 integer means.
    */
  private val passAtKQ = Q(
    (s, d) => operators.ClassifierOps.passAtK(
        Tables.events(s, d).where(col("value").isNotNull)
          .select(col("user_id"),
            when(expr("floor(value * 100.0 + 0.5)") >= 5000, 1L)
              .otherwise(0L).as("correct")),
        "user_id", "correct")
      .select(col("k"), col("n_tasks"),
        qround(col("mean_pass"), 8).as("mean_pass")),
    """WITH s AS (
      |  SELECT user_id AS task,
      |    CASE WHEN floor(value * 100.0 + 0.5) >= 5000 THEN 1 ELSE 0
      |      END AS y
      |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
      |t AS (SELECT task, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(y) AS BIGINT) AS c
      |      FROM s GROUP BY 1),
      |p AS (
      |  SELECT k, task,
      |    CASE WHEN n - c < k THEN 1.0
      |      ELSE 1.0 - list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
      |        list_transform(generate_series(0, k - 1),
      |          i_ -> CAST(n - c - i_ AS DOUBLE)
      |            / CAST(n - i_ AS DOUBLE))),
      |        (a_, b_) -> a_ * b_) END AS pass
      |  FROM t CROSS JOIN (SELECT unnest([1, 5, 10]) AS k)
      |  WHERE n >= k),
      |q AS (SELECT k, CAST(floor(pass * 1000000000.0 + 0.5) AS BIGINT)
      |        AS pq
      |      FROM p)
      |SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT)
      |    AS n_tasks,
      |  floor(CAST(sum(pq) AS DOUBLE) / 1000000000.0
      |      / CAST(count(*) AS DOUBLE) * 100000000.0 + 0.5)
      |    / 100000000.0 AS mean_pass
      |FROM q GROUP BY 1""".stripMargin)

  /** Unrolled power-iteration chain for the pca_power oracle — one
    * MATERIALIZED matvec + normalize pair per step (memory: unrolled
    * chains must be MATERIALIZED; recursive CTEs mis-evaluate
    * correlated refs), each fold ascending-index to mirror the
    * driver-side while loops bit-for-bit.
    */
  private def pcaIterSql(iters: Int, mat: String = "cm",
                         pfx: String = "v"): String = {
    val steps = (1 to iters).map { t =>
      s"""${pfx}u$t AS MATERIALIZED (
         |  SELECT $mat.i AS i, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list($mat.c * p.v ORDER BY $mat.j)), (a_, b_) -> a_ + b_) AS u
         |  FROM $mat JOIN $pfx${t - 1} p ON $mat.j = p.i GROUP BY $mat.i),
         |${pfx}n$t AS MATERIALIZED (
         |  SELECT sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(u * u ORDER BY i)), (a_, b_) -> a_ + b_)) AS nm
         |  FROM ${pfx}u$t),
         |$pfx$t AS MATERIALIZED (SELECT i, u / nm AS v
         |  FROM ${pfx}u$t, ${pfx}n$t)""".stripMargin
    }
    s"""${pfx}0 AS MATERIALIZED (
       |  SELECT i, CASE WHEN i = 0 THEN CAST(1.0 AS DOUBLE)
       |    ELSE CAST(0.0 AS DOUBLE) END AS v
       |  FROM (SELECT unnest(generate_series(0, 63)) AS i)),
       |${steps.mkString(",\n")}""".stripMargin
  }

  private val pcaBaseSql =
    """e AS (
      |  SELECT vec_id, i - 1 AS di,
      |    CAST(floor(CAST(emb[i] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)
      |      AS xq
      |  FROM (SELECT vec_id, embedding AS emb,
      |          unnest(generate_series(1, len(embedding))) AS i
      |        FROM embeddings WHERE embedding IS NOT NULL)),
      |g AS MATERIALIZED (
      |  SELECT a.di AS i, b.di AS j, CAST(sum(a.xq * b.xq) AS BIGINT)
      |    AS s
      |  FROM e a JOIN e b USING (vec_id) GROUP BY 1, 2),
      |m AS (SELECT di, CAST(sum(xq) AS BIGINT) AS sx FROM e GROUP BY 1),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings
      |       WHERE embedding IS NOT NULL),
      |cm AS MATERIALIZED (
      |  SELECT g.i, g.j,
      |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
      |      - (CAST(ma.sx AS DOUBLE) / CAST(n AS DOUBLE))
      |        * (CAST(mb.sx AS DOUBLE) / CAST(n AS DOUBLE)) AS c
      |  FROM g JOIN m ma ON g.i = ma.di JOIN m mb ON g.j = mb.di
      |  CROSS JOIN nn)""".stripMargin

  /** Top principal component of the embedding corpus
    * (SimilarityOps.pcaPower): exact-bigint Gram on the 1e-4 grid,
    * 8 fixed-order power steps, deterministic sign from v0 = e0.
    */
  private val pcaPowerQ = Q(
    (s, d) => operators.SimilarityOps.pcaPower(
        Tables.embeddings(s, d), "vec_id", "embedding")
      .select(col("dim").cast("long").as("dim"),
        qround(col("loading"), 8).as("loading"),
        qround(col("lambda"), 8).as("lambda"), col("n")),
    s"""WITH $pcaBaseSql,
       |${pcaIterSql(8)},
       |w AS (
       |  SELECT cm.i AS i, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list(cm.c * p.v ORDER BY cm.j)), (a_, b_) -> a_ + b_) AS wv
       |  FROM cm JOIN v8 p ON cm.j = p.i GROUP BY cm.i),
       |lam AS (
       |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list(v.v * w.wv ORDER BY v.i)), (a_, b_) -> a_ + b_)
       |    / 100000000.0 AS lambda
       |  FROM v8 v JOIN w ON v.i = w.i)
       |SELECT CAST(v.i AS BIGINT) AS dim,
       |  floor(v.v * 100000000.0 + 0.5) / 100000000.0 AS loading,
       |  floor(lambda * 100000000.0 + 0.5) / 100000000.0 AS lambda, n
       |FROM v8 v, lam, nn""".stripMargin)

  /** Top TWO principal components via Hotelling deflation
    * (SimilarityOps.pcaPower, components = 2): C ← C − λ₁v₁v₁ᵀ after
    * the first power loop, then the same e0-seeded loop finds the
    * second axis — mirrored by a second unrolled CTE chain over the
    * deflated matrix.
    */
  private val pcaDeflateQ = Q(
    (s, d) => operators.SimilarityOps.pcaPower(
        Tables.embeddings(s, d), "vec_id", "embedding",
        components = 2)
      .select(col("component").cast("long").as("component"),
        col("dim").cast("long").as("dim"),
        qround(col("loading"), 8).as("loading"),
        qround(col("lambda"), 8).as("lambda"), col("n")),
    s"""WITH $pcaBaseSql,
       |${pcaIterSql(8)},
       |w1f AS (
       |  SELECT cm.i AS i, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list(cm.c * p.v ORDER BY cm.j)), (a_, b_) -> a_ + b_) AS wv
       |  FROM cm JOIN v8 p ON cm.j = p.i GROUP BY cm.i),
       |lam1 AS (
       |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list(v.v * w.wv ORDER BY v.i)), (a_, b_) -> a_ + b_) AS lg
       |  FROM v8 v JOIN w1f w ON v.i = w.i),
       |cm2 AS MATERIALIZED (
       |  SELECT cm.i, cm.j, cm.c - lam1.lg * vi.v * vj.v AS c
       |  FROM cm JOIN v8 vi ON cm.i = vi.i
       |  JOIN v8 vj ON cm.j = vj.i CROSS JOIN lam1),
       |${pcaIterSql(8, "cm2", "d")},
       |w2f AS (
       |  SELECT cm2.i AS i, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list(cm2.c * p.v ORDER BY cm2.j)), (a_, b_) -> a_ + b_) AS wv
       |  FROM cm2 JOIN d8 p ON cm2.j = p.i GROUP BY cm2.i),
       |lam2 AS (
       |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list(v.v * w.wv ORDER BY v.i)), (a_, b_) -> a_ + b_) AS lg
       |  FROM d8 v JOIN w2f w ON v.i = w.i)
       |SELECT CAST(1 AS BIGINT) AS component, CAST(v.i AS BIGINT) AS dim,
       |  floor(v.v * 100000000.0 + 0.5) / 100000000.0 AS loading,
       |  floor(lam1.lg / 100000000.0 * 100000000.0 + 0.5)
       |    / 100000000.0 AS lambda, n
       |FROM v8 v, lam1, nn
       |UNION ALL
       |SELECT CAST(2 AS BIGINT), CAST(v.i AS BIGINT),
       |  floor(v.v * 100000000.0 + 0.5) / 100000000.0,
       |  floor(lam2.lg / 100000000.0 * 100000000.0 + 0.5)
       |    / 100000000.0, n
       |FROM d8 v, lam2, nn""".stripMargin)

  /** Pinball-loss quantile backtest per event type
    * (ClassifierOps.pinballEval): hash split, exact train-side rank
    * selection on the 1e-2 grid, integer-scaled test losses.
    */
  private val pinballEvalQ = Q(
    (s, d) => operators.ClassifierOps.pinballEval(
        Tables.events(s, d), "event_type", "event_id", "value")
      .select(col("event_type"), qround(col("q"), 8).as("q"),
        qround(col("qhat"), 8).as("qhat"), col("n_test"),
        qround(col("pinball"), 8).as("pinball")),
    """WITH f AS (
      |  SELECT event_type AS g,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vq,
      |    (((event_id % 1000000007) * 2654435761) % 1000000007)
      |      % 10000 AS b
      |  FROM events
      |  WHERE event_type IS NOT NULL AND event_id IS NOT NULL
      |    AND value IS NOT NULL),
      |tr AS (SELECT g, vq FROM f WHERE b < 8000),
      |te AS (SELECT g, vq FROM f WHERE b >= 8000),
      |h AS (SELECT g, vq, CAST(count(*) AS BIGINT) AS c
      |      FROM tr GROUP BY 1, 2),
      |cum AS (
      |  SELECT g, vq,
      |    CAST(sum(c) OVER (PARTITION BY g ORDER BY vq
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM h),
      |nt AS (SELECT g, CAST(count(*) AS BIGINT) AS nt
      |       FROM tr GROUP BY 1),
      |p AS (
      |  SELECT cum.g, k, min(vq) AS qhat
      |  FROM cum JOIN nt ON cum.g = nt.g
      |  CROSS JOIN (SELECT unnest([1, 5, 9]) AS k)
      |  WHERE cum >= (k * nt + 9) // 10
      |  GROUP BY 1, 2),
      |l AS (
      |  SELECT te.g, k, qhat,
      |    greatest(k * (vq - qhat), (k - 10) * (vq - qhat)) AS ls
      |  FROM te JOIN p ON te.g = p.g)
      |SELECT g AS event_type,
      |  floor(CAST(k AS DOUBLE) / 10.0 * 100000000.0 + 0.5)
      |    / 100000000.0 AS q,
      |  floor(CAST(qhat AS DOUBLE) / 100.0 * 100000000.0 + 0.5)
      |    / 100000000.0 AS qhat,
      |  CAST(count(*) AS BIGINT) AS n_test,
      |  floor(CAST(sum(ls) AS DOUBLE) / 10.0 / 100.0
      |      / CAST(count(*) AS DOUBLE) * 100000000.0 + 0.5)
      |    / 100000000.0 AS pinball
      |FROM l GROUP BY g, k, qhat""".stripMargin)

  /** SQ8 scalar quantization reconstruction error per label
    * (SimilarityOps.scalarQuantize8): per-dim min/max grid, mirrored
    * IEEE encode/decode, 1e-12 integer error sums.
    */
  private val sq8EncodeQ = Q(
    (s, d) => operators.SimilarityOps.scalarQuantize8(
        Tables.embeddings(s, d), "vec_id", "embedding", "label")
      .select(col("label"), col("n_dims"),
        qround(col("mse"), 12).as("mse")),
    """WITH e AS (
      |  SELECT label, i - 1 AS d, CAST(emb[i] AS DOUBLE) AS x
      |  FROM (SELECT label, embedding AS emb,
      |          unnest(generate_series(1, len(embedding))) AS i
      |        FROM embeddings WHERE embedding IS NOT NULL)),
      |st AS (SELECT d, min(x) AS lo, max(x) AS hi FROM e GROUP BY 1),
      |j AS (
      |  SELECT label, x, lo, hi,
      |    CASE WHEN hi - lo > 0 THEN
      |      least(CAST(255 AS BIGINT), greatest(CAST(0 AS BIGINT),
      |        CAST(floor((x - lo) / (hi - lo) * 255.0 + 0.5)
      |          AS BIGINT)))
      |    ELSE 0 END AS code
      |  FROM e JOIN st USING (d)),
      |r AS (
      |  SELECT label,
      |    CAST(floor(
      |      (x - (lo + CAST(code AS DOUBLE) / 255.0 * (hi - lo)))
      |      * (x - (lo + CAST(code AS DOUBLE) / 255.0 * (hi - lo)))
      |      * 1000000000000.0 + 0.5) AS BIGINT) AS eq
      |  FROM j)
      |SELECT label, CAST(count(*) AS BIGINT) AS n_dims,
      |  floor(CAST(sum(eq) AS DOUBLE) / 1000000000000.0
      |      / CAST(count(*) AS DOUBLE) * 1000000000000.0 + 0.5)
      |    / 1000000000000.0 AS mse
      |FROM r GROUP BY 1""".stripMargin)

  /** Fleiss' kappa over three deterministic hash-noised raters
    * (ClassifierOps.fleissKappa): base category = n_chars mod 3, each
    * rater flips to the next category on a 20% hash gate — exact
    * integer censuses end-to-end, closed-form kappa.
    */
  private val fleissKappaQ = Q(
    (s, d) => operators.ClassifierOps.fleissKappa(
        Tables.documents(s, d)
          .where(col("doc_id").isNotNull && col("n_chars").isNotNull)
          .select(col("doc_id"), col("n_chars"),
            explode(expr("sequence(1, 3)")).as("r"))
          .select(col("doc_id").as("item"),
            expr("""CASE WHEN (((((doc_id % 1000000007L) * 31 + r)
              % 1000000007L) * 2654435761L) % 1000000007L) % 10 < 2
              THEN (n_chars % 3 + 1) % 3
              ELSE n_chars % 3 END""").as("cat")),
        "item", "cat", raters = 3)
      .select(col("n_items"), col("n_dropped"),
        qround(col("p_bar"), 8).as("p_bar"),
        qround(col("p_e"), 8).as("p_e"),
        qround(col("kappa"), 8).as("kappa")),
    """WITH r AS (
      |  SELECT doc_id AS i,
      |    CASE WHEN (((((doc_id % 1000000007) * 31 + rr)
      |      % 1000000007) * 2654435761) % 1000000007) % 10 < 2
      |      THEN (n_chars % 3 + 1) % 3
      |      ELSE n_chars % 3 END AS cat
      |  FROM documents
      |  CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS rr)
      |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
      |cells AS (
      |  SELECT i, cat, CAST(count(*) AS BIGINT) AS c
      |  FROM r GROUP BY 1, 2),
      |pi AS (
      |  SELECT i, CAST(sum(c * (c - 1)) AS BIGINT) AS pn,
      |    CAST(sum(c) AS BIGINT) AS nr
      |  FROM cells GROUP BY 1),
      |kept AS (SELECT * FROM pi WHERE nr = 3),
      |drp AS (
      |  SELECT CAST(sum(CASE WHEN nr <> 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dropped FROM pi),
      |b AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_items,
      |    CAST(sum(pn) AS BIGINT) AS np
      |  FROM kept),
      |ne AS (
      |  SELECT COALESCE(CAST(sum(sc * sc) AS BIGINT), 0) AS ne FROM (
      |    SELECT CAST(sum(c) AS BIGINT) AS sc
      |    FROM cells JOIN kept USING (i) GROUP BY cat))
      |SELECT n_items, n_dropped,
      |  floor(CAST(np AS DOUBLE) / CAST(n_items * 6 AS DOUBLE)
      |    * 100000000.0 + 0.5) / 100000000.0 AS p_bar,
      |  floor(CAST(ne AS DOUBLE) / (CAST(n_items * 3 AS DOUBLE)
      |      * CAST(n_items * 3 AS DOUBLE))
      |    * 100000000.0 + 0.5) / 100000000.0 AS p_e,
      |  floor((CAST(np AS DOUBLE) / CAST(n_items * 6 AS DOUBLE)
      |      - CAST(ne AS DOUBLE) / (CAST(n_items * 3 AS DOUBLE)
      |        * CAST(n_items * 3 AS DOUBLE)))
      |    / (1.0 - CAST(ne AS DOUBLE) / (CAST(n_items * 3 AS DOUBLE)
      |        * CAST(n_items * 3 AS DOUBLE)))
      |    * 100000000.0 + 0.5) / 100000000.0 AS kappa
      |FROM b, drp, ne""".stripMargin)

  /** Krippendorff's alpha (nominal) over the same synthetic rater
    * battery as fleiss_kappa but with rater 3 MISSING for ~30% of
    * documents (the case Fleiss cannot handle): items keep their 2-3
    * available ratings (ClassifierOps.krippendorffAlpha); per-item
    * D_o terms snap to the 1e-9 grid for an order-free exact sum over
    * the item domain.
    */
  private val krippendorffAlphaQ = Q(
    (s, d) => operators.ClassifierOps.krippendorffAlpha(
        Tables.documents(s, d)
          .where(col("doc_id").isNotNull && col("n_chars").isNotNull)
          .select(col("doc_id"), col("n_chars"),
            explode(expr("sequence(1, 3)")).as("r"))
          .where(col("r") < 3 || expr(
            "(((doc_id % 1000000007L) * 2654435761L) % 1000000007L)" +
              " % 10 < 7"))
          .select(col("doc_id").as("item"),
            expr("""CASE WHEN (((((doc_id % 1000000007L) * 31 + r)
              % 1000000007L) * 2654435761L) % 1000000007L) % 10 < 2
              THEN (n_chars % 3 + 1) % 3
              ELSE n_chars % 3 END""").as("cat")),
        "item", "cat")
      .select(col("n_values"), col("n_dropped"),
        qround(col("alpha"), 8).as("alpha")),
    """WITH r AS (
      |  SELECT doc_id AS i,
      |    CASE WHEN (((((doc_id % 1000000007) * 31 + rr)
      |      % 1000000007) * 2654435761) % 1000000007) % 10 < 2
      |      THEN (n_chars % 3 + 1) % 3
      |      ELSE n_chars % 3 END AS cat
      |  FROM documents
      |  CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS rr)
      |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
      |    AND (rr < 3 OR (((doc_id % 1000000007) * 2654435761)
      |      % 1000000007) % 10 < 7)),
      |cells AS (
      |  SELECT i, cat, CAST(count(*) AS BIGINT) AS nic
      |  FROM r GROUP BY 1, 2),
      |items AS (SELECT i, CAST(sum(nic) AS BIGINT) AS m
      |          FROM cells GROUP BY 1),
      |usable AS (SELECT * FROM items WHERE m >= 2),
      |drp AS (SELECT CAST(sum(CASE WHEN m < 2 THEN 1 ELSE 0 END)
      |          AS BIGINT) AS n_dropped FROM items),
      |used AS (SELECT cells.i, cat, nic, m
      |         FROM cells JOIN usable USING (i)),
      |dos AS (
      |  SELECT CAST(sum(CAST(floor(CAST(nic AS DOUBLE)
      |      * (CAST(m AS DOUBLE) - CAST(nic AS DOUBLE))
      |      / (CAST(m AS DOUBLE) - 1) * 1000000000.0 + 0.5)
      |      AS BIGINT)) AS BIGINT) AS doq,
      |    CAST(sum(nic) AS BIGINT) AS n_values
      |  FROM used),
      |nc AS (SELECT cat, CAST(sum(nic) AS BIGINT) AS nc
      |       FROM used GROUP BY 1),
      |det AS (SELECT CAST(sum(nc) AS BIGINT) AS n FROM nc),
      |des AS (
      |  SELECT max(n) AS n,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(list({'c': cat, 'x':
      |        CAST(nc AS DOUBLE) * (CAST(n AS DOUBLE)
      |          - CAST(nc AS DOUBLE))} ORDER BY cat),
      |        x_ -> x_.x)), (a_, b_) -> a_ + b_) AS de
      |  FROM nc CROSS JOIN det)
      |SELECT n_values, n_dropped,
      |  CASE WHEN n_values > 1
      |    AND de / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) > 0
      |  THEN
      |    floor((1.0 - CAST(doq AS DOUBLE) / 1000000000.0
      |        / CAST(n_values AS DOUBLE)
      |      / (de / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))))
      |      * 100000000.0 + 0.5) / 100000000.0
      |  END AS alpha
      |FROM dos CROSS JOIN des CROSS JOIN drp""".stripMargin)

  /** Seasonal strength of the hourly-profile decomposition per event
    * type (SequenceOps.seasonalStrength on the seasonal_decompose
    * model): F_s = max(0, 1 − Var(resid)/Var(total)) from the same
    * exact grid moments.
    */
  private val seasonalStrengthQ = Q(
    (s, d) => operators.SequenceOps.seasonalStrength(
        Tables.events(s, d).select(col("event_type"),
          expr("(ts_ns div 3600000000000L) % 24").as("hour"),
          col("value")),
        "event_type", "hour", "value", quantDigits = 2)
      .select(col("event_type"), col("n"),
        qround(col("var_total"), 6).as("var_total"),
        qround(col("var_resid"), 6).as("var_resid"),
        qround(col("strength"), 8).as("strength")),
    """WITH e AS (
      |  SELECT event_type AS g, epoch_ns(ts) // 3600000000000 % 24
      |      AS hod,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
      |ps AS (
      |  SELECT g, hod, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(v) AS BIGINT) AS sv,
      |    CAST(sum(v * v) AS BIGINT) AS svv
      |  FROM e GROUP BY 1, 2),
      |pg AS (
      |  SELECT g, CAST(sum(n) AS BIGINT) AS n,
      |    CAST(sum(sv) AS BIGINT) AS svg,
      |    CAST(sum(svv) AS BIGINT) AS svvg,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(list({'h': hod, 'x':
      |        (CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE)
      |          * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
      |        / 10000.0} ORDER BY hod), x_ -> x_.x)),
      |      (a_, b_) -> a_ + b_) AS ssr
      |  FROM ps GROUP BY 1),
      |v2 AS (
      |  SELECT g, n,
      |    (CAST(svvg AS DOUBLE) - CAST(svg AS DOUBLE)
      |      * CAST(svg AS DOUBLE) / CAST(n AS DOUBLE)) / 10000.0
      |      / CAST(n AS DOUBLE) AS vt,
      |    ssr / CAST(n AS DOUBLE) AS vr
      |  FROM pg)
      |SELECT g AS event_type, n,
      |  floor(vt * 1000000.0 + 0.5) / 1000000.0 AS var_total,
      |  floor(vr * 1000000.0 + 0.5) / 1000000.0 AS var_resid,
      |  CASE WHEN vt > 0 THEN
      |    floor(greatest(0.0, 1.0 - vr / vt) * 100000000.0 + 0.5)
      |      / 100000000.0
      |  END AS strength
      |FROM v2""".stripMargin)

  /** Flesch reading-ease per source (TextOps.fleschReadability):
    * exact word/sentence/vowel-group censuses, per-doc score snapped
    * to a 1e-6 bigint before the group mean.
    */
  private val fleschQ = Q(
    (s, d) => operators.TextOps.fleschReadability(
        Tables.documents(s, d), "text", "source")
      .select(col("source"), col("n_docs"),
        qround(col("mean_flesch"), 8).as("mean_flesch"),
        qround(col("syl_per_word"), 8).as("syl_per_word")),
    """WITH t AS (
      |  SELECT source AS g,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
      |    greatest(CAST(1 AS BIGINT),
      |      CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
      |      AS s,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
      |      AS BIGINT) AS syl
      |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
      |q AS (
      |  SELECT g,
      |    CAST(floor((206.835
      |      - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
      |      - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)))
      |      * 1000000.0 + 0.5) AS BIGINT) AS fq,
      |    syl, w
      |  FROM t),
      |a AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(fq) AS BIGINT) AS sf,
      |    CAST(sum(syl) AS BIGINT) AS ssyl,
      |    CAST(sum(w) AS BIGINT) AS sw
      |  FROM q GROUP BY 1)
      |SELECT g AS source, n_docs,
      |  floor(CAST(sf AS DOUBLE) / 1000000.0 / CAST(n_docs AS DOUBLE)
      |    * 100000000.0 + 0.5) / 100000000.0 AS mean_flesch,
      |  floor(CAST(ssyl AS DOUBLE) / CAST(sw AS DOUBLE)
      |    * 100000000.0 + 0.5) / 100000000.0 AS syl_per_word
      |FROM a""".stripMargin)

  /** Nelson-Aalen cumulative hazard over user lifetimes
    * (SequenceOps.nelsonAalen, censorDays = 1) — kaplan_meier's
    * additive sibling, same day-bounded domain and fixed-order folds.
    */
  private val nelsonAalenQ = Q(
    (s, d) => operators.SequenceOps.nelsonAalen(
        Tables.events(s, d).select(col("user_id"), col("ts_ns")),
        "user_id", "ts_ns", censorDays = 1)
      .select(col("t"), col("d"), col("n_at_risk"),
        qround(col("h"), 8).as("h"), qround(col("var_h"), 8).as("var_h")),
    """WITH pk AS (
      |  SELECT user_id,
      |    min(epoch_ns(ts) // 86400000000000) AS d0,
      |    max(epoch_ns(ts) // 86400000000000) AS d1
      |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      |e2 AS (SELECT (SELECT max(d1) FROM pk) AS endd),
      |lv AS (SELECT d1 - d0 AS t, d1 <= endd - 1 AS dead
      |       FROM pk CROSS JOIN e2),
      |h AS (
      |  SELECT t,
      |    CAST(sum(CASE WHEN dead THEN 1 ELSE 0 END) AS BIGINT) AS d,
      |    CAST(sum(CASE WHEN dead THEN 0 ELSE 1 END) AS BIGINT) AS c
      |  FROM lv GROUP BY 1),
      |tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS nn FROM h),
      |dm AS (
      |  SELECT t, d, c,
      |    nn - CAST(sum(d + c) OVER (ORDER BY t
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) + d + c AS n
      |  FROM h CROSS JOIN tot),
      |one AS (SELECT list({'t': t, 'd': d, 'n': n} ORDER BY t) AS arr
      |        FROM dm),
      |curve AS (
      |  SELECT unnest(list_transform(generate_series(1, len(arr)),
      |    i_ -> {'t': arr[i_].t, 'd': arr[i_].d, 'n': arr[i_].n,
      |      'h': list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |        list_transform(arr[1:i_],
      |          x_ -> CAST(x_.d AS DOUBLE) / CAST(x_.n AS DOUBLE))),
      |        (a_, b_) -> a_ + b_),
      |      'vh': list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |        list_transform(arr[1:i_],
      |          x_ -> CAST(x_.d AS DOUBLE)
      |            / (CAST(x_.n AS DOUBLE) * CAST(x_.n AS DOUBLE)))),
      |        (a_, b_) -> a_ + b_)}), recursive := true)
      |  FROM one)
      |SELECT t, d, n AS n_at_risk,
      |  floor(h * 100000000.0 + 0.5) / 100000000.0 AS h,
      |  floor(vh * 100000000.0 + 0.5) / 100000000.0 AS var_h
      |FROM curve WHERE d > 0""".stripMargin)

  /** HyperLogLog distinct users per event type (SketchOps.hllDistinct,
    * p = 6 → 64 registers) joined against the exact count: register
    * math is exact-integer (Knuth hash, bin-string trailing zeros),
    * the harmonic sum is exact-dyadic, so both engines agree to the
    * bit before the 1e-4 output snap.
    */
  private val hllSketchQ = Q(
    (s, d) => {
      val ev = Tables.events(s, d).where(col("event_type").isNotNull)
      operators.SketchOps.hllDistinct(ev, "user_id", Seq("event_type"))
        .join(ev.where(col("user_id").isNotNull).groupBy("event_type")
          .agg(count_distinct(col("user_id")).as("n_exact")), "event_type")
        .select(col("event_type"), col("n_exact"), col("zero_regs"),
          qround(col("hll_est"), 4).as("hll_est"))
    },
    """WITH h0 AS (
      |  SELECT event_type AS g,
      |    ((((user_id % 1000000007) + 1000000007) % 1000000007)
      |      * 2654435761) % 1000000007 AS h0
      |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      |hm AS (
      |  SELECT g, (xor(h0, h0 >> 15) * 2654435761) % 1000000007 AS g2
      |  FROM h0),
      |h AS (SELECT g, xor(g2, g2 >> 15) AS h FROM hm),
      |r AS (
      |  SELECT g, h % 64 AS reg,
      |    CASE WHEN h // 64 = 0 THEN 26
      |      ELSE length(bin(h // 64)) - length(rtrim(bin(h // 64), '0'))
      |        + 1 END AS rho
      |  FROM h),
      |m AS (SELECT g, reg, CAST(max(rho) AS BIGINT) AS mr
      |      FROM r GROUP BY 1, 2),
      |a AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS v,
      |    sum(1.0 / CAST((CAST(1 AS BIGINT) << CAST(mr AS INTEGER))
      |      AS DOUBLE)) AS sp
      |  FROM m GROUP BY 1),
      |x AS (
      |  SELECT g, 64 - v AS zero_regs,
      |    0.709 * 4096.0 / (sp + CAST(64 - v AS DOUBLE)) AS raw
      |  FROM a),
      |e AS (
      |  SELECT g, zero_regs,
      |    CASE WHEN raw <= 160.0 AND zero_regs > 0
      |      THEN 64.0 * ln(64.0 / CAST(zero_regs AS DOUBLE))
      |      ELSE raw END AS est
      |  FROM x),
      |ex AS (
      |  SELECT event_type AS g,
      |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
      |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      |  GROUP BY 1)
      |SELECT e.g AS event_type, n_exact, zero_regs,
      |  floor(est * 10000.0 + 0.5) / 10000.0 AS hll_est
      |FROM e JOIN ex ON e.g = ex.g""".stripMargin)

  /** HLL set algebra between the view-user and purchase-user sets
    * (SketchOps.hllSetOps): union by register max, intersection by
    * inclusion-exclusion, Jaccard — one register-domain pass, the
    * sketch answer to "how much do these cohorts overlap".
    */
  private val hllUnionQ = Q(
    (s, d) => operators.SketchOps.hllSetOps(
        Tables.events(s, d).select(col("event_type"), col("user_id")),
        "user_id", "event_type", "view", "purchase")
      .select(col("m"), qround(col("est_a"), 4).as("est_a"),
        qround(col("est_b"), 4).as("est_b"),
        qround(col("est_union"), 4).as("est_union"),
        qround(col("est_intersection"), 4).as("est_intersection"),
        qround(col("jaccard_est"), 8).as("jaccard_est")),
    """WITH h0 AS (
      |  SELECT event_type AS c,
      |    ((((user_id % 1000000007) + 1000000007) % 1000000007)
      |      * 2654435761) % 1000000007 AS h0
      |  FROM events WHERE user_id IS NOT NULL
      |    AND event_type IN ('view', 'purchase')),
      |hm AS (
      |  SELECT c, (xor(h0, h0 >> 15) * 2654435761) % 1000000007 AS g2
      |  FROM h0),
      |h AS (SELECT c, xor(g2, g2 >> 15) AS h FROM hm),
      |r AS (
      |  SELECT c, h % 64 AS reg,
      |    CASE WHEN h // 64 = 0 THEN 26
      |      ELSE length(bin(h // 64)) - length(rtrim(bin(h // 64), '0'))
      |        + 1 END AS rho
      |  FROM h),
      |m AS (
      |  SELECT reg,
      |    CAST(max(CASE WHEN c = 'view' THEN rho END) AS BIGINT) AS ma,
      |    CAST(max(CASE WHEN c = 'purchase' THEN rho END) AS BIGINT)
      |      AS mb
      |  FROM r GROUP BY 1),
      |a AS (
      |  SELECT CAST(count(ma) AS BIGINT) AS va,
      |    sum(CASE WHEN ma IS NOT NULL THEN 1.0
      |      / CAST((CAST(1 AS BIGINT) << CAST(ma AS INTEGER)) AS DOUBLE)
      |      END) AS spa,
      |    CAST(count(mb) AS BIGINT) AS vb,
      |    sum(CASE WHEN mb IS NOT NULL THEN 1.0
      |      / CAST((CAST(1 AS BIGINT) << CAST(mb AS INTEGER)) AS DOUBLE)
      |      END) AS spb,
      |    CAST(count(*) AS BIGINT) AS vu,
      |    sum(1.0 / CAST((CAST(1 AS BIGINT)
      |      << CAST(greatest(coalesce(ma, 0), coalesce(mb, 0))
      |        AS INTEGER)) AS DOUBLE)) AS spu
      |  FROM m),
      |e AS (
      |  SELECT
      |    CASE WHEN 0.709 * 4096.0 / (spa + CAST(64 - va AS DOUBLE))
      |        <= 160.0 AND 64 - va > 0
      |      THEN 64.0 * ln(64.0 / CAST(64 - va AS DOUBLE))
      |      ELSE 0.709 * 4096.0 / (spa + CAST(64 - va AS DOUBLE)) END
      |      AS ea,
      |    CASE WHEN 0.709 * 4096.0 / (spb + CAST(64 - vb AS DOUBLE))
      |        <= 160.0 AND 64 - vb > 0
      |      THEN 64.0 * ln(64.0 / CAST(64 - vb AS DOUBLE))
      |      ELSE 0.709 * 4096.0 / (spb + CAST(64 - vb AS DOUBLE)) END
      |      AS eb,
      |    CASE WHEN 0.709 * 4096.0 / (spu + CAST(64 - vu AS DOUBLE))
      |        <= 160.0 AND 64 - vu > 0
      |      THEN 64.0 * ln(64.0 / CAST(64 - vu AS DOUBLE))
      |      ELSE 0.709 * 4096.0 / (spu + CAST(64 - vu AS DOUBLE)) END
      |      AS eu
      |  FROM a)
      |SELECT CAST(64 AS BIGINT) AS m,
      |  floor(ea * 10000.0 + 0.5) / 10000.0 AS est_a,
      |  floor(eb * 10000.0 + 0.5) / 10000.0 AS est_b,
      |  floor(eu * 10000.0 + 0.5) / 10000.0 AS est_union,
      |  floor(greatest(0.0, ea + eb - eu) * 10000.0 + 0.5) / 10000.0
      |    AS est_intersection,
      |  floor(greatest(0.0, ea + eb - eu) / nullif(eu, 0.0)
      |    * 100000000.0 + 0.5) / 100000000.0 AS jaccard_est
      |FROM e""".stripMargin)

  /** Streaming HLL twin (StreamingOps.hllStream) — distinct users per
    * DAY with register-max state carried across micro-batches;
    * register max is commutative+idempotent so the batch fold here is
    * exactly what the stream emits after its last batch.
    */
  private val streamHllQ = Q(
    (s, d) => graft.streaming.StreamingOps.hllStream(s,
        Tables.events(s, d).select(
          expr("ts_ns div 86400000000000L").as("day"), col("user_id")),
        "day", "user_id")
      .select(col("day"), col("zero_regs"),
        qround(col("hll_est"), 4).as("hll_est")),
    """WITH h0 AS (
      |  SELECT epoch_ns(ts) // 86400000000000 AS g,
      |    ((((user_id % 1000000007) + 1000000007) % 1000000007)
      |      * 2654435761) % 1000000007 AS h0
      |  FROM events WHERE user_id IS NOT NULL),
      |hm AS (
      |  SELECT g, (xor(h0, h0 >> 15) * 2654435761) % 1000000007 AS g2
      |  FROM h0),
      |h AS (SELECT g, xor(g2, g2 >> 15) AS h FROM hm),
      |r AS (
      |  SELECT g, h % 64 AS reg,
      |    CASE WHEN h // 64 = 0 THEN 26
      |      ELSE length(bin(h // 64)) - length(rtrim(bin(h // 64), '0'))
      |        + 1 END AS rho
      |  FROM h),
      |m AS (SELECT g, reg, CAST(max(rho) AS BIGINT) AS mr
      |      FROM r GROUP BY 1, 2),
      |a AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS v,
      |    sum(1.0 / CAST((CAST(1 AS BIGINT) << CAST(mr AS INTEGER))
      |      AS DOUBLE)) AS sp
      |  FROM m GROUP BY 1),
      |x AS (
      |  SELECT g, 64 - v AS zero_regs,
      |    0.709 * 4096.0 / (sp + CAST(64 - v AS DOUBLE)) AS raw
      |  FROM a)
      |SELECT g AS day, zero_regs,
      |  floor(CASE WHEN raw <= 160.0 AND zero_regs > 0
      |      THEN 64.0 * ln(64.0 / CAST(zero_regs AS DOUBLE))
      |      ELSE raw END * 10000.0 + 0.5) / 10000.0 AS hll_est
      |FROM x""".stripMargin)

  /** Referential-integrity audit (ValidateOps.fkOrphans) over the
    * star schema's four FK edges plus the events→customer edge (which
    * has a real orphan: user_id 0 has no custkey 0). Dimension parents
    * broadcast; the lineitem→orders edge takes the shuffle anti-join.
    */
  private val fkOrphansQ = Q(
    (s, d) => operators.ValidateOps.fkOrphans(Seq(
      ("lineitem_orders", Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey"),
      ("lineitem_part", Tables.lineitem(s, d), "l_partkey",
        broadcast(Tables.part(s, d)), "p_partkey"),
      ("lineitem_supplier", Tables.lineitem(s, d), "l_suppkey",
        broadcast(Tables.supplier(s, d)), "s_suppkey"),
      ("orders_customer", Tables.orders(s, d), "o_custkey",
        broadcast(Tables.customer(s, d)), "c_custkey"),
      ("events_customer", Tables.events(s, d), "user_id",
        broadcast(Tables.customer(s, d)), "c_custkey"))),
    """SELECT 'lineitem_orders' AS relation,
      |  CAST(count(*) AS BIGINT) AS child_rows,
      |  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS null_keys,
      |  CAST(count(*) FILTER (WHERE l_orderkey IS NOT NULL
      |    AND o_orderkey IS NULL) AS BIGINT) AS orphan_rows,
      |  CAST(count(DISTINCT CASE WHEN o_orderkey IS NULL
      |    THEN l_orderkey END) AS BIGINT) AS orphan_keys
      |FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
      |UNION ALL
      |SELECT 'lineitem_part',
      |  CAST(count(*) AS BIGINT),
      |  CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT),
      |  CAST(count(*) FILTER (WHERE l_partkey IS NOT NULL
      |    AND p_partkey IS NULL) AS BIGINT),
      |  CAST(count(DISTINCT CASE WHEN p_partkey IS NULL
      |    THEN l_partkey END) AS BIGINT)
      |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
      |UNION ALL
      |SELECT 'lineitem_supplier',
      |  CAST(count(*) AS BIGINT),
      |  CAST(sum(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT),
      |  CAST(count(*) FILTER (WHERE l_suppkey IS NOT NULL
      |    AND s_suppkey IS NULL) AS BIGINT),
      |  CAST(count(DISTINCT CASE WHEN s_suppkey IS NULL
      |    THEN l_suppkey END) AS BIGINT)
      |FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
      |UNION ALL
      |SELECT 'orders_customer',
      |  CAST(count(*) AS BIGINT),
      |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT),
      |  CAST(count(*) FILTER (WHERE o_custkey IS NOT NULL
      |    AND c_custkey IS NULL) AS BIGINT),
      |  CAST(count(DISTINCT CASE WHEN c_custkey IS NULL
      |    THEN o_custkey END) AS BIGINT)
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      |UNION ALL
      |SELECT 'events_customer',
      |  CAST(count(*) AS BIGINT),
      |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT),
      |  CAST(count(*) FILTER (WHERE user_id IS NOT NULL
      |    AND c_custkey IS NULL) AS BIGINT),
      |  CAST(count(DISTINCT CASE WHEN c_custkey IS NULL
      |    THEN user_id END) AS BIGINT)
      |FROM events LEFT JOIN customer ON user_id = c_custkey""".stripMargin)

  /** Bivariate Mahalanobis outlier census per event type
    * (StatsOps.mahalanobisOutliers) over (value, hour-of-day): exact
    * integer moment sums on the 1e-2 grid, mirrored IEEE d²
    * expression, χ²₂ 99% threshold.
    */
  private val mahalanobisQ = Q(
    (s, d) => StatsOps.mahalanobisOutliers(
        Tables.events(s, d).select(col("event_type"), col("value"),
          expr("CAST((ts_ns div 3600000000000L) % 24 AS DOUBLE)")
            .as("hod")),
        "event_type", "value", "hod")
      .select(col("event_type"), col("n"), col("n_out"),
        qround(col("max_d2"), 6).as("max_d2")),
    """WITH f AS (
      |  SELECT event_type AS g,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS x,
      |    CAST(floor(CAST((epoch_ns(ts) // 3600000000000) % 24
      |      AS DOUBLE) * 1.0 + 0.5) AS BIGINT) AS y
      |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
      |st AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM f GROUP BY 1),
      |s2 AS (
      |  SELECT g, n,
      |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
      |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
      |    CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
      |      - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS cxx,
      |    CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
      |      - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
      |        * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS cyy,
      |    CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
      |      - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |        * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS cxy
      |  FROM st),
      |j AS (
      |  SELECT f.g,
      |    CASE WHEN cxx * cyy - cxy * cxy > 0 THEN
      |      ((CAST(x AS DOUBLE) - mx) * (CAST(x AS DOUBLE) - mx) * cyy
      |       - (CAST(x AS DOUBLE) - mx) * (CAST(y AS DOUBLE) - my)
      |         * cxy * 2.0
      |       + (CAST(y AS DOUBLE) - my) * (CAST(y AS DOUBLE) - my)
      |         * cxx)
      |      / (cxx * cyy - cxy * cxy)
      |    ELSE 0.0 END AS d2
      |  FROM f JOIN s2 ON f.g = s2.g)
      |SELECT g AS event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN d2 > 9.21034 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_out,
      |  floor(max(d2) * 1000000.0 + 0.5) / 1000000.0 AS max_d2
      |FROM j GROUP BY 1""".stripMargin)

  /** Seasonal-naive forecast backtest per event type
    * (SequenceOps.forecastBacktest, season = 24 observations): exact
    * integer MAE/RMSE on the 1e-2 grid and the scale-free MASE ratio
    * against one-step persistence on the SAME eval rows.
    */
  private val forecastBacktestQ = Q(
    (s, d) => operators.SequenceOps.forecastBacktest(
        Tables.events(s, d).select(col("event_type"), col("ts_ns"),
          col("event_id"), col("value")),
        "event_type", "ts_ns", "event_id", "value", season = 24,
        quantDigits = 2)
      .select(col("event_type"), col("n_eval"),
        qround(col("mae"), 8).as("mae"), qround(col("rmse"), 8).as("rmse"),
        qround(col("mae_naive"), 8).as("mae_naive"),
        qround(col("mase"), 8).as("mase")),
    """WITH e AS (
      |  SELECT event_type AS g, epoch_ns(ts) AS tn, event_id,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL),
      |l AS (
      |  SELECT g, v,
      |    lag(v, 24) OVER (PARTITION BY g ORDER BY tn, event_id) AS ps,
      |    lag(v, 1) OVER (PARTITION BY g ORDER BY tn, event_id) AS pn
      |  FROM e),
      |f AS (SELECT * FROM l WHERE ps IS NOT NULL AND pn IS NOT NULL),
      |a AS (
      |  SELECT g AS event_type, CAST(count(*) AS BIGINT) AS n_eval,
      |    CAST(sum(abs(v - ps)) AS BIGINT) AS saes,
      |    CAST(sum((v - ps) * (v - ps)) AS BIGINT) AS sses,
      |    CAST(sum(abs(v - pn)) AS BIGINT) AS saen
      |  FROM f GROUP BY 1)
      |SELECT event_type, n_eval,
      |  floor(CAST(saes AS DOUBLE) / (100.0 * CAST(n_eval AS DOUBLE))
      |    * 100000000.0 + 0.5) / 100000000.0 AS mae,
      |  floor(sqrt(CAST(sses AS DOUBLE)
      |      / (10000.0 * CAST(n_eval AS DOUBLE)))
      |    * 100000000.0 + 0.5) / 100000000.0 AS rmse,
      |  floor(CAST(saen AS DOUBLE) / (100.0 * CAST(n_eval AS DOUBLE))
      |    * 100000000.0 + 0.5) / 100000000.0 AS mae_naive,
      |  CASE WHEN saen <> 0
      |    THEN floor(CAST(saes AS DOUBLE) / CAST(saen AS DOUBLE)
      |      * 100000000.0 + 0.5) / 100000000.0 END AS mase
      |FROM a""".stripMargin)

  /** Kaplan-Meier user-lifetime survival curve
    * (SequenceOps.kaplanMeier): integer day lifetimes from the event
    * stream, still-active-yesterday keys right-censored (this stream keeps nearly every user active to the window end, so a 1-day horizon is what leaves a real death set), survival as a
    * fixed-order product fold over the day-bounded domain — one row
    * per death time.
    */
  private val kaplanMeierQ = Q(
    (s, d) => operators.SequenceOps.kaplanMeier(
        Tables.events(s, d).select(col("user_id"), col("ts_ns")),
        "user_id", "ts_ns", censorDays = 1)
      .select(col("t"), col("d"), col("n_at_risk"),
        qround(col("s"), 8).as("s")),
    """WITH pk AS (
      |  SELECT user_id,
      |    min(epoch_ns(ts) // 86400000000000) AS d0,
      |    max(epoch_ns(ts) // 86400000000000) AS d1
      |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      |e2 AS (SELECT (SELECT max(d1) FROM pk) AS endd),
      |lv AS (SELECT d1 - d0 AS t, d1 <= endd - 1 AS dead
      |       FROM pk CROSS JOIN e2),
      |h AS (
      |  SELECT t,
      |    CAST(sum(CASE WHEN dead THEN 1 ELSE 0 END) AS BIGINT) AS d,
      |    CAST(sum(CASE WHEN dead THEN 0 ELSE 1 END) AS BIGINT) AS c
      |  FROM lv GROUP BY 1),
      |tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS nn FROM h),
      |dm AS (
      |  SELECT t, d, c,
      |    nn - CAST(sum(d + c) OVER (ORDER BY t
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) + d + c AS n
      |  FROM h CROSS JOIN tot),
      |one AS (SELECT list({'t': t, 'd': d, 'n': n} ORDER BY t) AS arr
      |        FROM dm),
      |curve AS (
      |  SELECT unnest(list_transform(generate_series(1, len(arr)),
      |    i_ -> {'t': arr[i_].t, 'd': arr[i_].d, 'n': arr[i_].n,
      |      's': list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
      |        list_transform(arr[1:i_],
      |          x_ -> 1.0 - CAST(x_.d AS DOUBLE) / CAST(x_.n AS DOUBLE))),
      |        (a_, b_) -> a_ * b_)}), recursive := true)
      |  FROM one)
      |SELECT t, d, n AS n_at_risk,
      |  floor(s * 100000000.0 + 0.5) / 100000000.0 AS s
      |FROM curve WHERE d > 0""".stripMargin)

  /** Small-file compaction plan (IoOps.compactionPlan) over a
    * simulated per-(returnflag, orderkey-shard) file inventory —
    * largest-first cumulative-sum bin packing into ~4MB rewrite
    * groups, exact integers on the metadata-scale inventory.
    */
  private val compactionPlanQ = Q(
    (s, d) => {
      val inv = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("part"),
          (col("l_orderkey") % 50).as("file_id"))
        .agg(sum(expr("CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)"))
          .as("bytes"))
      sources.IoOps.compactionPlan(inv, Seq("part"), "file_id", "bytes",
          targetBytes = 4000000L)
        .select(col("part"), col("group_id"), col("n_files"), col("bytes"))
    },
    """WITH inv AS (
      |  SELECT l_returnflag AS part, l_orderkey % 50 AS file_id,
      |    CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
      |      AS BIGINT) AS bytes
      |  FROM lineitem GROUP BY 1, 2),
      |w AS (
      |  SELECT part, file_id, bytes,
      |    CAST(sum(bytes) OVER (PARTITION BY part
      |      ORDER BY bytes DESC, file_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM inv)
      |SELECT part, (cum - bytes) // 4000000 AS group_id,
      |  CAST(count(*) AS BIGINT) AS n_files,
      |  CAST(sum(bytes) AS BIGINT) AS bytes
      |FROM w GROUP BY 1, 2""".stripMargin)

  /** Zone-map data-skipping advisor (IoOps.skipStats): month
    * partitions of lineitem, ship-day zone maps, and the exact
    * skip/scan accounting for a one-month ship-day predicate — the
    * "does this layout prune" readout (here it does: the partition
    * key derives from the filter column).
    */
  private val skipStatsQ = Q(
    (s, d) => sources.IoOps.skipStats(
        Tables.lineitem(s, d).select(
          expr("year(l_shipdate) * 12 + month(l_shipdate)")
            .as("ship_month"),
          expr("datediff(l_shipdate, DATE'1992-01-01')").as("ship_day")),
        "ship_month", "ship_day", lo = 1200L, hi = 1230L)
      .select(col("lo"), col("hi"), col("n_partitions"), col("n_rows"),
        col("parts_skipped"), col("rows_skipped"), col("rows_scanned"),
        qround(col("scan_share"), 8).as("scan_share")),
    """WITH p AS (
      |  SELECT year(l_shipdate) * 12 + month(l_shipdate) AS m,
      |    CAST(count(*) AS BIGINT) AS n,
      |    min(date_diff('day', DATE '1992-01-01', l_shipdate)) AS mn,
      |    max(date_diff('day', DATE '1992-01-01', l_shipdate)) AS mx
      |  FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1)
      |SELECT CAST(1200 AS BIGINT) AS lo, CAST(1230 AS BIGINT) AS hi,
      |  CAST(count(*) AS BIGINT) AS n_partitions,
      |  CAST(sum(n) AS BIGINT) AS n_rows,
      |  CAST(sum(CASE WHEN mx < 1200 OR mn > 1230 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS parts_skipped,
      |  CAST(sum(CASE WHEN mx < 1200 OR mn > 1230 THEN n ELSE 0 END)
      |    AS BIGINT) AS rows_skipped,
      |  CAST(sum(n) - sum(CASE WHEN mx < 1200 OR mn > 1230 THEN n
      |    ELSE 0 END) AS BIGINT) AS rows_scanned,
      |  floor(CAST(sum(n) - sum(CASE WHEN mx < 1200 OR mn > 1230
      |        THEN n ELSE 0 END) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
      |    * 100000000.0 + 0.5) / 100000000.0 AS scan_share
      |FROM p""".stripMargin)

  val all: Map[String, Q] = Map(
    "spearman_trend" -> spearmanTrendQ,
    "kruskal_wallis" -> kruskalWallisQ,
    "cramers_v" -> cramersVQ,
    "seasonal_decompose" -> seasonalDecomposeQ,
    "sax_encode" -> saxEncodeQ,
    "hurst_exponent" -> hurstExponentQ,
    "tail_index" -> tailIndexQ,
    "burstiness" -> burstinessQ,
    "hll_sketch" -> hllSketchQ,
    "hll_union" -> hllUnionQ,
    "fk_orphans" -> fkOrphansQ,
    "mahalanobis_outliers" -> mahalanobisQ,
    "flesch_readability" -> fleschQ,
    "nelson_aalen" -> nelsonAalenQ,
    "fleiss_kappa" -> fleissKappaQ,
    "krippendorff_alpha" -> krippendorffAlphaQ,
    "seasonal_strength" -> seasonalStrengthQ,
    "pinball_eval" -> pinballEvalQ,
    "sq8_encode" -> sq8EncodeQ,
    "pca_power" -> pcaPowerQ,
    "stream_hll" -> streamHllQ,
    "feature_mi" -> featureMiQ,
    "stump_train" -> stumpTrainQ,
    "pass_at_k" -> passAtKQ,
    "bradley_terry" -> bradleyTerryQ,
    "quantile_normalize" -> quantileNormalizeQ,
    "trimmed_mean" -> trimmedMeanQ,
    "kneser_ney" -> kneserNeyQ,
    "changepoint_split" -> changepointSplitQ,
    "holt_winters" -> holtWintersQ,
    "gmm1d_em" -> gmm1dEmQ,
    "max_drawdown" -> maxDrawdownQ,
    "rbo_terms" -> rboTermsQ,
    "transition_entropy" -> transitionEntropyQ,
    "rmst" -> rmstQ,
    "pca_deflate" -> pcaDeflateQ,
    "did_estimate" -> didEstimateQ,
    "stream_drawdown" -> streamDrawdownQ,
    "mann_kendall" -> mannKendallQ,
    "burst_detect" -> burstDetectQ,
    "stream_burst" -> streamBurstQ,
    "lorenz_deciles" -> lorenzDecilesQ,
    "vocab_coverage" -> vocabCoverageQ,
    "theil_index" -> theilIndexQ,
    "forecast_backtest" -> forecastBacktestQ,
    "kaplan_meier" -> kaplanMeierQ,
    "compaction_plan" -> compactionPlanQ,
    "skip_stats" -> skipStatsQ)
}
