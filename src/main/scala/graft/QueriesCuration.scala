package graft

import org.apache.spark.sql.functions._

import graft.Queries.{Q, qround}
import graft.operators.{DiagnosticsOps, SampleOps, SequenceOps, SketchOps, StatsOps}

/** Round-10 curation / data-quality query surface: table profiling,
  * Tukey-fence outlier filtering, exact heavy hitters priced as a
  * sketch, bounded-lookback EWMA smoothing, and blocked record
  * linkage. Same Q contract as [[Queries]] (Spark fn + DuckDB oracle,
  * column names aligned, quantization via qround).
  */
object QueriesCuration {

  /** Column-level profile of the fact table, cardinality-aware:
    * dimension-scale columns (returnflag, linenumber, quantity) take
    * the melted single-pass EXACT distinct count; the key-like
    * l_orderkey — where map-side combine collapses nothing and exact
    * countDistinct would ship ~rows values — takes the deterministic
    * KMV sketch (O(k) partial state, exchange bounded at
    * partitions×k). The oracle recomputes exact columns independently
    * (the melt's stringification is injective on these types) and
    * replays the KMV estimate in SQL: k smallest distinct portable
    * hashes, n_hat = (k−1)·M / h_(k), floored to BIGINT.
    */
  private val profileCols =
    Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
  private val profileApprox = Set("l_orderkey")
  private val profileK = 1024

  private val profileTableQ = Q(
    (s, d) => StatsOps.profileTable(
      Tables.lineitem(s, d).select(profileCols.map(col): _*), profileCols,
      approxCols = profileApprox, k = profileK),
    profileCols.map {
      case c if profileApprox(c) =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_null,
           |  (SELECT CASE WHEN count(*) < $profileK
           |     THEN CAST(count(*) AS BIGINT)
           |     ELSE CAST(floor((${profileK - 1}.0 * 1000000007.0)
           |       / max(h)) AS BIGINT) END
           |   FROM (SELECT h FROM (
           |       SELECT DISTINCT (($c % 1000000007) * 2654435761)
           |         % 1000000007 AS h
           |       FROM lineitem WHERE $c IS NOT NULL)
           |     ORDER BY h LIMIT $profileK)) AS n_distinct,
           |  FALSE AS exact FROM lineitem""".stripMargin
      case c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  TRUE AS exact FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n"))

  /** Tukey-fence outlier counts per event type: cutoffs are the exact
    * interpolated quartiles quantized to the 1e-4 grid (the same grid
    * grouped_quantiles is gate-proven on), then `q1 − 1.5·IQR` /
    * `q3 + 1.5·IQR` arithmetic on those quantized doubles — identical
    * in both engines, so the fence DECISION is bit-exact.
    */
  private val iqrOutliersQ = Q(
    (s, d) => StatsOps.iqrOutliers(
        Tables.events(s, d).select(col("event_type"), col("event_id"),
          col("value")),
        Seq("event_type"), "value")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
        qround(min(col("_lo")), 4).as("lo"),
        qround(max(col("_hi")), 4).as("hi")),
    """WITH q AS (
      |  SELECT event_type,
      |    floor(quantile_cont(value, 0.25) * 10000.0 + 0.5) / 10000.0
      |      AS q1,
      |    floor(quantile_cont(value, 0.75) * 10000.0 + 0.5) / 10000.0
      |      AS q3
      |  FROM events GROUP BY 1),
      |f AS (
      |  SELECT event_type, q1 - 1.5 * (q3 - q1) AS lo,
      |    q3 + 1.5 * (q3 - q1) AS hi FROM q)
      |SELECT e.event_type, count(*) AS n,
      |  CAST(sum(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers,
      |  floor(min(lo) * 10000.0 + 0.5) / 10000.0 AS lo,
      |  floor(max(hi) * 10000.0 + 0.5) / 10000.0 AS hi
      |FROM events e JOIN f USING (event_type)
      |GROUP BY 1""".stripMargin)

  /** Exact heavy hitters (frequency > n/(k+1)) of the document-length
    * bucket per language, priced by the two-pass Misra-Gries shape
    * (SketchOps.heavyHitters). The oracle computes the same frequent
    * set with a direct GROUP BY + HAVING — exact on both sides, so the
    * sketch pass is proven lossless, not just plausible.
    */
  private val hhK = 5

  private val heavyHittersQ = Q(
    (s, d) => SketchOps.heavyHitters(
      Tables.documents(s, d)
        .select(col("lang"), expr("n_chars div 100L").as("len_bucket")),
      Seq("lang"), "len_bucket", k = hhK),
    s"""WITH b AS (
       |  SELECT lang, n_chars // 100 AS value FROM documents
       |  WHERE n_chars IS NOT NULL),
       |t AS (SELECT lang, count(*) AS n_group FROM b GROUP BY 1),
       |c AS (SELECT lang, value, count(*) AS cnt FROM b GROUP BY 1, 2)
       |SELECT c.lang, c.value, c.cnt, t.n_group
       |FROM c JOIN t USING (lang)
       |WHERE c.cnt * ${hhK + 1} > t.n_group""".stripMargin)

  /** Bounded-lookback EWMA (α = 0.5, exact power-of-two decay) of the
    * event value per user — every α^i·x term is an exact IEEE binary
    * scaling and both engines fold the frame list left-to-right, so
    * the smoothed series replays bit-identically before qround.
    */
  private val ewmaSmoothQ = Q(
    (s, d) => SequenceOps.ewmaSmooth(
        Tables.events(s, d).select(col("user_id"), col("ts_ns"),
          col("event_id"), col("value")),
        "user_id", "ts_ns", "event_id", "value", alpha = 0.5, lookback = 8)
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        qround(col("ewma"), 6).as("ewma")),
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, value
      |  FROM events),
      |w AS (
      |  SELECT user_id, ts_ns, event_id,
      |    list(value) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
      |      ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS vs
      |  FROM e)
      |SELECT user_id, ts_ns, event_id,
      |  floor((list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(generate_series(1, len(vs)), i_ ->
      |        power(CAST(0.5 AS DOUBLE), len(vs) - i_) * vs[i_])),
      |      (a_, b_) -> a_ + b_)
      |    / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(generate_series(1, len(vs)), i_ ->
      |        power(CAST(0.5 AS DOUBLE), len(vs) - i_))),
      |      (a_, b_) -> a_ + b_)) * 1000000.0 + 0.5) / 1000000.0 AS ewma
      |FROM w""".stripMargin)

  /** Blocked record linkage: customer×supplier candidate pairs blocked
    * on a COMPOSITE key — nation + the first 6 digits of the name's
    * numeric suffix (an id-neighborhood prefix, the normalized-name
    * blocking every production linkage pipeline layers over a coarse
    * region key) — scored with the native Jaro-Winkler kernel and
    * kept at ≥ 0.8 on the QUANTIZED score so the threshold decision
    * compares identical doubles in both engines.
    *
    * Scale contract: a bare nation block (25 values) is within-block
    * all-pairs — both sides grow with the data, so candidates grow
    * quadratically per block (measured 11.8× at 10× data in the r9
    * rehearsal). The 6-digit prefix caps each block at ≤1000 ids per
    * side REGARDLESS of corpus size: more data populates more
    * prefixes, never bigger blocks, so candidate volume is O(k·n)
    * (measured 10.1× at 10× data). The prefix is recall-lossless at
    * this threshold — every ≥0.8 pair on these names shares the
    * 6-digit neighborhood (verified at sf0.01 and sf0.1) — because a
    * JW that survives the differing Customer#/Supplier# heads needs a
    * near-identical digit tail. DuckDB ships the same JW semantics
    * (`jaro_winkler_similarity`: boost 0.7, prefix 4, p = 0.1 —
    * verified empirically), which is exactly what
    * functions.JaroWinkler implements.
    */
  private val recordLinkageQ = Q(
    (s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"),
          col("c_nationkey").cast("long").as("_nk"),
          substring(col("c_name"), 10, 6).as("_blk"))
      val sp = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"),
          col("s_nationkey").cast("long").as("_nk"),
          substring(col("s_name"), 10, 6).as("_blk"))
      c.join(sp, Seq("_nk", "_blk"))
        .withColumn("jw",
          qround(graft.functions.JaroWinkler(col("c_name"), col("s_name")), 8))
        .where(col("jw") >= 0.8)
        .select(col("c_custkey"), col("s_suppkey"),
          col("_nk").as("nationkey"), col("jw"))
    },
    """SELECT c_custkey, s_suppkey,
      |  CAST(c_nationkey AS BIGINT) AS nationkey,
      |  floor(jaro_winkler_similarity(c_name, s_name) * 100000000.0 + 0.5)
      |    / 100000000.0 AS jw
      |FROM customer JOIN supplier ON c_nationkey = s_nationkey
      |  AND substr(c_name, 10, 6) = substr(s_name, 10, 6)
      |WHERE floor(jaro_winkler_similarity(c_name, s_name) * 100000000.0
      |  + 0.5) / 100000000.0 >= 0.8""".stripMargin)

  /** Entity resolution end-to-end: the record_linkage scorer at a
    * looser threshold (0.75) feeds connectedComponents, so
    * transitively-linked customer/supplier names collapse into one
    * entity cluster — the step after pairwise linkage every MDM
    * pipeline runs. Node ids interleave the two key spaces (cust·2,
    * supp·2+1); output is the per-cluster membership census. The
    * oracle recomputes the converged components with the recursive
    * closure (the dedup_clusters technique) on the same edge list.
    * Candidates come from record_linkage's composite
    * (nation, 6-digit-id-prefix) block — the scale contract lives on
    * that query's scaladoc; at this looser 0.75 threshold the block
    * additionally DEFINES the candidate contract (blocking always
    * trades recall for the O(k·n) candidate bound, and both engines
    * apply the identical block).
    */
  private val linkageClustersQ = Q(
    (s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"),
          col("c_nationkey").cast("long").as("_nk"),
          substring(col("c_name"), 10, 6).as("_blk"))
      val sp = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"),
          col("s_nationkey").cast("long").as("_nk"),
          substring(col("s_name"), 10, 6).as("_blk"))
      val pairs = c.join(sp, Seq("_nk", "_blk"))
        .withColumn("jw", qround(
          graft.functions.JaroWinkler(col("c_name"), col("s_name")), 8))
        .where(col("jw") >= 0.75)
        .select((col("c_custkey") * 2).as("n1"),
          (col("s_suppkey") * 2 + 1).as("n2"))
      graft.operators.DedupOps.connectedComponents(pairs, "n1", "n2")
        .groupBy(col("lbl").as("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          sum(when(col("id") % 2 === 0, 1L).otherwise(0L))
            .as("n_customers"),
          sum(when(col("id") % 2 === 1, 1L).otherwise(0L))
            .as("n_suppliers"))
    },
    """WITH RECURSIVE pairs AS (
      |  SELECT c_custkey * 2 AS n1, s_suppkey * 2 + 1 AS n2
      |  FROM customer JOIN supplier ON c_nationkey = s_nationkey
      |    AND substr(c_name, 10, 6) = substr(s_name, 10, 6)
      |  WHERE floor(jaro_winkler_similarity(c_name, s_name)
      |    * 100000000.0 + 0.5) / 100000000.0 >= 0.75),
      |e AS MATERIALIZED (SELECT n1 AS a, n2 AS b FROM pairs
      |      UNION SELECT n2, n1 FROM pairs),
      |reach(a, b) AS (
      |  SELECT DISTINCT a, a FROM e
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
      |lab AS (SELECT a AS id, min(b) AS cluster_id FROM reach GROUP BY a)
      |SELECT cluster_id, count(*) AS n_members,
      |  CAST(sum(CASE WHEN id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_customers,
      |  CAST(sum(CASE WHEN id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_suppliers
      |FROM lab GROUP BY 1""".stripMargin)

  /** Order-independent content checksums for the two fact tables —
    * the "did anything change" snapshot primitive (IoOps
    * .datasetFingerprint). Row hashes are exact modular integer
    * arithmetic over the key columns; Σ mod p commutes, so the
    * fingerprint is identical under any row order, partitioning, or
    * engine. Spark accumulates in DECIMAL(38,0) ≡ DuckDB HUGEINT.
    */
  private val M = operators.TextOps.HashMod
  private val B = operators.TextOps.HashBase

  private val datasetFingerprintQ = Q(
    (s, d) => sources.IoOps.datasetFingerprint(Seq(
      "lineitem" -> Tables.lineitem(s, d).select(
        expr(s"((l_orderkey % $M) * $B + l_linenumber) % $M")
          .as("_row_hash")),
      "orders" -> Tables.orders(s, d).select(
        expr(s"((o_orderkey % $M) * $B + (o_custkey % $M)) % $M")
          .as("_row_hash")))),
    s"""SELECT 'lineitem' AS table_name, count(*) AS n_rows,
       |  CAST(sum(((l_orderkey % $M) * $B + l_linenumber) % $M) % $M
       |    AS BIGINT) AS fingerprint
       |FROM lineitem
       |UNION ALL
       |SELECT 'orders', count(*),
       |  CAST(sum(((o_orderkey % $M) * $B + (o_custkey % $M)) % $M) % $M
       |    AS BIGINT)
       |FROM orders""".stripMargin)

  /** Tokenizer vocabulary coverage per language: OOV rate against the
    * global top-500 word vocabulary (count desc, word asc — a
    * deterministic total order both engines replay). Counts exact, one
    * exact division.
    */
  private val oovRateQ = Q(
    (s, d) => operators.TextOps.oovRate(
        Tables.documents(s, d).select(col("lang"), col("text")),
        "lang", "text", vocabSize = 500)
      .select(col("lang"), col("n_tokens"), col("n_oov"),
        qround(col("oov_rate"), 8).as("oov_rate")),
    """WITH t AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |v AS (
      |  SELECT w FROM (
      |    SELECT w, count(*) AS c FROM t GROUP BY 1
      |    ORDER BY c DESC, w LIMIT 500))
      |SELECT lang, count(*) AS n_tokens,
      |  CAST(sum(CASE WHEN w NOT IN (SELECT w FROM v) THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_oov,
      |  floor((CAST(sum(CASE WHEN w NOT IN (SELECT w FROM v)
      |      THEN 1 ELSE 0 END) AS DOUBLE) / count(*))
      |    * 100000000.0 + 0.5) / 100000000.0 AS oov_rate
      |FROM t GROUP BY 1""".stripMargin)

  /** Streaming EWMA driven on a batch frame: identical output to the
    * batch window operator (StreamingOps.ewmaStream carries the same
    * ring buffer across micro-batches; here every key arrives in one
    * group so the fold equals the batch frame exactly — shared oracle
    * with ewma_smooth's SQL).
    */
  private val streamEwmaQ = Q(
    (s, d) => graft.streaming.StreamingOps.ewmaStream(s,
        Tables.events(s, d).select(col("user_id"), col("ts_ns"),
          col("event_id"), col("value")),
        "user_id", "ts_ns", "event_id", "value", alpha = 0.5, lookback = 8)
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        qround(col("ewma"), 6).as("ewma")),
    ewmaSmoothQ.sql)

  /** Zarr v2 interchange round-trip (sources.ZarrSource): the event
    * counts of the TOP-512 users by exact rank (count desc, user_id
    * asc tie-break) — a FIXED-N vector, so the 1-D writer's
    * driver-side collect is provably ≤ 512 elements no matter how
    * the user population grows with the fact (the former per-user
    * vector grew with the corpus; VERDICT r12 #3) — are written as a
    * chunked, zlib-compressed zarr 1-D array and read back through
    * the distributed chunk decoder; matching the oracle computed
    * directly on the source parquet proves writer + reader lossless
    * end to end. Values are integer-valued doubles, so the readback
    * sum is exact.
    */
  private val zarrRoundtripQ = Q(
    (s, d) => {
      val counts = Tables.events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("user_id")).limit(512)
        .orderBy(col("user_id"))
        .select(col("n").cast("double"))
        .collect().map(_.getDouble(0))
      val path = s"/tmp/graft_zarr_${java.util.UUID.randomUUID.toString
        .replace("-", "").take(12)}"
      sources.ZarrSource.writeVar1D(counts, path, chunk = 128)
      sources.ZarrSource.readVar(s, path)
        .agg(count(lit(1)).as("n_vals"),
          sum(col("value")).cast("long").as("sum_vals"),
          min(col("value")).cast("long").as("min_val"),
          max(col("value")).cast("long").as("max_val"))
    },
    """WITH c AS (
      |  SELECT user_id, count(*) AS n FROM events GROUP BY 1),
      |t AS (
      |  SELECT user_id, n FROM c
      |  ORDER BY n DESC, user_id LIMIT 512)
      |SELECT count(*) AS n_vals, CAST(sum(n) AS BIGINT) AS sum_vals,
      |  CAST(min(n) AS BIGINT) AS min_val,
      |  CAST(max(n) AS BIGINT) AS max_val
      |FROM t""".stripMargin)

  /** Trailing rolling median per user (SequenceOps.rollingMedian):
    * discrete lower-median pick from the sorted bounded frame —
    * engine-exact, qround only for the parquet/oracle float identity.
    */
  private val rollingMedianQ = Q(
    (s, d) => SequenceOps.rollingMedian(
        Tables.events(s, d).select(col("user_id"), col("ts_ns"),
          col("event_id"), col("value")),
        "user_id", "ts_ns", "event_id", "value", lookback = 8)
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        qround(col("rolling_median"), 6).as("rolling_median")),
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, value
      |  FROM events),
      |w AS (
      |  SELECT user_id, ts_ns, event_id,
      |    list(value) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
      |      ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS vs
      |  FROM e)
      |SELECT user_id, ts_ns, event_id,
      |  floor(list_sort(vs)[CAST(ceil(len(vs) / 2.0) AS INT)]
      |    * 1000000.0 + 0.5) / 1000000.0 AS rolling_median
      |FROM w""".stripMargin)

  /** Streaming twin on a batch frame (StreamingOps.rollingMedianStream):
    * discrete picks, no floats — shares rolling_median's oracle.
    */
  private val streamRollingMedianQ = Q(
    (s, d) => graft.streaming.StreamingOps.rollingMedianStream(s,
        Tables.events(s, d).select(col("user_id"), col("ts_ns"),
          col("event_id"), col("value")),
        "user_id", "ts_ns", "event_id", "value", lookback = 8)
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        qround(col("rolling_median"), 6).as("rolling_median")),
    rollingMedianQ.sql)

  /** Feature-drift monitor (StatsOps.populationStability): PSI of the
    * value distribution between view and purchase events over 10
    * equal-width bins — exact integer bin counts, add-one smoothing
    * over ALL bins, fixed-order fold; the oracle replays the identical
    * arithmetic.
    */
  private val psiBins = 10

  private val datasetDriftQ = Q(
    (s, d) => StatsOps.populationStability(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "view", "purchase", "value", bins = psiBins)
      .select(col("n_a"), col("n_b"), qround(col("psi"), 8).as("psi")),
    s"""WITH e AS (
       |  SELECT event_type AS c, value FROM events
       |  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
       |m AS (SELECT floor(min(value) * 10000.0 + 0.5) / 10000.0 AS lo,
       |             floor(max(value) * 10000.0 + 0.5) / 10000.0 AS hi
       |      FROM e),
       |b AS (
       |  SELECT c, CASE WHEN hi = lo THEN 0
       |    ELSE GREATEST(0,
       |      LEAST(CAST(floor((value - lo) / ((hi - lo) / $psiBins.0))
       |        AS INT), ${psiBins - 1})) END AS bin
       |  FROM e CROSS JOIN m),
       |obs AS (
       |  SELECT bin,
       |    CAST(sum(CASE WHEN c = 'view' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS ca,
       |    CAST(sum(CASE WHEN c = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS cb
       |  FROM b GROUP BY 1),
       |full_ AS (
       |  SELECT g.bin, coalesce(obs.ca, 0) AS ca, coalesce(obs.cb, 0) AS cb
       |  FROM (SELECT unnest(generate_series(0, ${psiBins - 1})) AS bin) g
       |  LEFT JOIN obs USING (bin)),
       |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
       |             CAST(sum(cb) AS BIGINT) AS n_b,
       |             list({'bin': bin, 'ca': ca, 'cb': cb} ORDER BY bin)
       |               AS arr
       |      FROM full_)
       |SELECT n_a, n_b,
       |  floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(arr, x_ ->
       |      ((CAST(x_.ca + 1 AS DOUBLE) / (n_a + $psiBins))
       |        - (CAST(x_.cb + 1 AS DOUBLE) / (n_b + $psiBins)))
       |      * ln((CAST(x_.ca + 1 AS DOUBLE) / (n_a + $psiBins))
       |          / (CAST(x_.cb + 1 AS DOUBLE) / (n_b + $psiBins))))),
       |    (a_, b_) -> a_ + b_) * 100000000.0 + 0.5) / 100000000.0 AS psi
       |FROM t""".stripMargin)

  /** Exact two-sample KS drift (StatsOps.ksDrift): sup-distance of the
    * view vs purchase value ECDFs on the 1e-4 quantized grid — exact
    * cumulative integers, one division pair per distinct grid value.
    */
  private val ksDriftQ = Q(
    (s, d) => StatsOps.ksDrift(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "view", "purchase", "value")
      .select(col("n_a"), col("n_b"), qround(col("ks"), 8).as("ks")),
    """WITH e AS (
      |  SELECT event_type AS c,
      |    floor(value * 10000.0 + 0.5) / 10000.0 AS q
      |  FROM events
      |  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
      |g AS (
      |  SELECT q,
      |    CAST(sum(CASE WHEN c = 'view' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ca,
      |    CAST(sum(CASE WHEN c = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS cb
      |  FROM e GROUP BY 1),
      |cum AS (
      |  SELECT q,
      |    CAST(sum(ca) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cuma,
      |    CAST(sum(cb) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cumb
      |  FROM g),
      |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
      |             CAST(sum(cb) AS BIGINT) AS n_b FROM g)
      |SELECT n_a, n_b,
      |  floor(max(abs(CAST(cuma AS DOUBLE) / n_a
      |    - CAST(cumb AS DOUBLE) / n_b)) * 100000000.0 + 0.5)
      |    / 100000000.0 AS ks
      |FROM cum CROSS JOIN t
      |GROUP BY n_a, n_b""".stripMargin)

  /** Chi-squared homogeneity drift (StatsOps.chi2Drift): is the
    * user-bucket mix (user_id mod 7) the same for view vs purchase
    * events? Exact integer cell counts; each cell term is the same
    * short IEEE expression in both engines; fixed-order fold over the
    * category-sorted list.
    */
  private val chi2DriftQ = Q(
    (s, d) => StatsOps.chi2Drift(
        Tables.events(s, d).select(col("event_type"),
          (col("user_id") % 7).as("ucat")),
        "event_type", "view", "purchase", "ucat")
      .select(col("n_a"), col("n_b"), col("dof"),
        qround(col("chi2"), 8).as("chi2")),
    """WITH e AS (
      |  SELECT event_type AS c, CAST(user_id % 7 AS VARCHAR) AS cat
      |  FROM events
      |  WHERE event_type IN ('view', 'purchase') AND user_id IS NOT NULL),
      |counts AS (
      |  SELECT cat,
      |    CAST(sum(CASE WHEN c = 'view' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ca,
      |    CAST(sum(CASE WHEN c = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS cb
      |  FROM e GROUP BY 1),
      |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
      |             CAST(sum(cb) AS BIGINT) AS n_b,
      |             count(*) - 1 AS dof,
      |             list({'cat': cat, 'ca': ca, 'cb': cb} ORDER BY cat)
      |               AS arr
      |      FROM counts)
      |SELECT n_a, n_b, dof,
      |  floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list_transform(arr, x_ ->
      |      (x_.ca - CAST(x_.ca + x_.cb AS DOUBLE) * n_a / (n_a + n_b))
      |      * (x_.ca - CAST(x_.ca + x_.cb AS DOUBLE) * n_a / (n_a + n_b))
      |      / (CAST(x_.ca + x_.cb AS DOUBLE) * n_a / (n_a + n_b))
      |      + (x_.cb - CAST(x_.ca + x_.cb AS DOUBLE) * n_b / (n_a + n_b))
      |      * (x_.cb - CAST(x_.ca + x_.cb AS DOUBLE) * n_b / (n_a + n_b))
      |      / (CAST(x_.ca + x_.cb AS DOUBLE) * n_b / (n_a + n_b)))),
      |    (a_, b_) -> a_ + b_) * 100000000.0 + 0.5) / 100000000.0 AS chi2
      |FROM t""".stripMargin)

  /** Jensen-Shannon drift (StatsOps.jsDivergence): bounded symmetric
    * divergence of the source mix between English and Spanish
    * documents, add-one smoothed over the union source domain.
    */
  private val jsDivergenceQ = Q(
    (s, d) => StatsOps.jsDivergence(
        Tables.documents(s, d).select(col("lang"), col("source")),
        "lang", "en", "es", "source")
      .select(col("n_a"), col("n_b"), qround(col("jsd"), 8).as("jsd")),
    """WITH e AS (
      |  SELECT lang AS c, source AS cat FROM documents
      |  WHERE lang IN ('en', 'es') AND source IS NOT NULL),
      |counts AS (
      |  SELECT cat,
      |    CAST(sum(CASE WHEN c = 'en' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ca,
      |    CAST(sum(CASE WHEN c = 'es' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS cb
      |  FROM e GROUP BY 1),
      |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
      |             CAST(sum(cb) AS BIGINT) AS n_b,
      |             count(*) AS k,
      |             list({'cat': cat, 'ca': ca, 'cb': cb} ORDER BY cat)
      |               AS arr
      |      FROM counts)
      |SELECT n_a, n_b,
      |  floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list_transform(arr, x_ ->
      |      ((CAST(x_.ca + 1 AS DOUBLE) / (n_a + k))
      |         * ln((CAST(x_.ca + 1 AS DOUBLE) / (n_a + k))
      |             / (((CAST(x_.ca + 1 AS DOUBLE) / (n_a + k))
      |                 + (CAST(x_.cb + 1 AS DOUBLE) / (n_b + k))) / 2.0))
      |       + (CAST(x_.cb + 1 AS DOUBLE) / (n_b + k))
      |         * ln((CAST(x_.cb + 1 AS DOUBLE) / (n_b + k))
      |             / (((CAST(x_.ca + 1 AS DOUBLE) / (n_a + k))
      |                 + (CAST(x_.cb + 1 AS DOUBLE) / (n_b + k))) / 2.0)))
      |      / 2.0)),
      |    (a_, b_) -> a_ + b_) * 100000000.0 + 0.5) / 100000000.0 AS jsd
      |FROM t""".stripMargin)

  /** Plug-in mutual information (StatsOps.mutualInformation) between
    * document language and source, with the three entropies it
    * decomposes into. Exact joint counts; marginals re-aggregated from
    * the joint table; every Σ a fixed-order fold over its sorted list.
    */
  private val mutualInformationQ = Q(
    (s, d) => StatsOps.mutualInformation(
        Tables.documents(s, d).select(col("lang"), col("source")),
        "lang", "source")
      .select(col("n"), qround(col("h_x"), 8).as("h_x"),
        qround(col("h_y"), 8).as("h_y"),
        qround(col("h_xy"), 8).as("h_xy"),
        qround(col("mi"), 8).as("mi")),
    """WITH j AS (
      |  SELECT lang AS x, source AS y, CAST(count(*) AS BIGINT) AS c
      |  FROM documents
      |  WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
      |xm AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM j GROUP BY 1),
      |ym AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM j GROUP BY 1),
      |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM j),
      |hx AS (SELECT -list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list(CAST(cx AS DOUBLE) / n * ln(CAST(cx AS DOUBLE) / n)
      |         ORDER BY x)),
      |    (a_, b_) -> a_ + b_) AS h_x FROM xm CROSS JOIN t),
      |hy AS (SELECT -list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list(CAST(cy AS DOUBLE) / n * ln(CAST(cy AS DOUBLE) / n)
      |         ORDER BY y)),
      |    (a_, b_) -> a_ + b_) AS h_y FROM ym CROSS JOIN t),
      |hxy AS (SELECT -list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list(CAST(c AS DOUBLE) / n * ln(CAST(c AS DOUBLE) / n)
      |         ORDER BY x, y)),
      |    (a_, b_) -> a_ + b_) AS h_xy FROM j CROSS JOIN t),
      |mi AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list(CAST(c AS DOUBLE) / n
      |         * ln(CAST(c AS DOUBLE) * n / (CAST(cx AS DOUBLE) * cy))
      |         ORDER BY x, y)),
      |    (a_, b_) -> a_ + b_) AS mi
      |  FROM j JOIN xm USING (x) JOIN ym USING (y) CROSS JOIN t)
      |SELECT n,
      |  floor(h_x * 100000000.0 + 0.5) / 100000000.0 AS h_x,
      |  floor(h_y * 100000000.0 + 0.5) / 100000000.0 AS h_y,
      |  floor(h_xy * 100000000.0 + 0.5) / 100000000.0 AS h_xy,
      |  floor(mi * 100000000.0 + 0.5) / 100000000.0 AS mi
      |FROM t CROSS JOIN hx CROSS JOIN hy CROSS JOIN hxy
      |CROSS JOIN mi""".stripMargin)

  /** Cliff's delta (StatsOps.cliffsDelta) for view-vs-purchase event
    * values — the effect-size companion sharing mann_whitney's
    * distinct-quantized-value domain; pair counts stay exact BIGINTs.
    */
  private val cliffsDeltaQ = Q(
    (s, d) => StatsOps.cliffsDelta(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "view", "purchase", "value")
      .select(col("n_a"), col("n_b"), col("n_greater"), col("n_less"),
        col("n_ties"), qround(col("delta"), 8).as("delta")),
    """WITH e AS (
      |  SELECT event_type AS c,
      |    floor(value * 10000.0 + 0.5) / 10000.0 AS q
      |  FROM events
      |  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
      |g AS (
      |  SELECT q,
      |    CAST(sum(CASE WHEN c = 'view' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ca,
      |    CAST(sum(CASE WHEN c = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS cb
      |  FROM e GROUP BY 1),
      |cum AS (
      |  SELECT q, ca, cb,
      |    CAST(sum(cb) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cumb
      |  FROM g),
      |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
      |             CAST(sum(cb) AS BIGINT) AS n_b,
      |             CAST(sum(ca * cumb) AS BIGINT) AS s,
      |             CAST(sum(ca * cb) AS BIGINT) AS t_
      |      FROM cum)
      |SELECT n_a, n_b, s - t_ AS n_greater, n_a * n_b - s AS n_less,
      |  t_ AS n_ties,
      |  floor((CAST(s - t_ AS DOUBLE) - CAST(n_a * n_b - s AS DOUBLE))
      |      / CAST(n_a * n_b AS DOUBLE) * 100000000.0 + 0.5)
      |    / 100000000.0 AS delta
      |FROM t""".stripMargin)

  /** Mann-Whitney U drift (StatsOps.mannWhitney): rank-sum test of
    * view vs purchase values on the 1e-4 quantized grid — doubled
    * midranks keep the rank sum an exact bigint; the tie sum replays
    * as the same fixed-order fold in both engines.
    */
  private val mannWhitneyQ = Q(
    (s, d) => StatsOps.mannWhitney(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "view", "purchase", "value")
      .select(col("n_a"), col("n_b"), qround(col("u_a"), 6).as("u_a"),
        qround(col("z"), 8).as("z")),
    """WITH e AS (
      |  SELECT event_type AS c,
      |    floor(value * 10000.0 + 0.5) / 10000.0 AS q
      |  FROM events
      |  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL),
      |g AS (
      |  SELECT q,
      |    CAST(sum(CASE WHEN c = 'view' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ca,
      |    CAST(sum(CASE WHEN c = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS cb
      |  FROM e GROUP BY 1),
      |cum AS (
      |  SELECT q, ca, cb,
      |    CAST(sum(ca + cb) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS cm
      |  FROM g),
      |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
      |             CAST(sum(cb) AS BIGINT) AS n_b,
      |             CAST(sum(ca * (2 * cm - (ca + cb) + 1)) AS BIGINT)
      |               AS r2,
      |             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |               list(CAST(ca + cb AS DOUBLE) * CAST(ca + cb AS DOUBLE)
      |                      * CAST(ca + cb AS DOUBLE)
      |                    - CAST(ca + cb AS DOUBLE) ORDER BY q)),
      |               (a_, b_) -> a_ + b_) AS ties
      |      FROM cum),
      |m AS (SELECT n_a, n_b,
      |  (CAST(r2 AS DOUBLE)
      |    - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1)) / 2.0 AS u,
      |  CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0 AS mu,
      |  CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
      |    * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1)
      |       - ties / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
      |                 * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1)))
      |    AS sig2
      |  FROM t)
      |SELECT n_a, n_b,
      |  floor(u * 1000000.0 + 0.5) / 1000000.0 AS u_a,
      |  floor((CASE WHEN sig2 > 0 THEN (u - mu) / sqrt(sig2)
      |         ELSE 0.0 END) * 100000000.0 + 0.5) / 100000000.0 AS z
      |FROM m""".stripMargin)

  /** Per-user value autocorrelation at lags 1..3
    * (StatsOps.autocorrelation): values fixed-point-scaled to the 1e-4
    * grid so every accumulated sum is an exact bigint; each ACF is one
    * closed-form double expression both engines evaluate identically.
    */
  private val autocorrelationQ = Q(
    (s, d) => StatsOps.autocorrelation(
        Tables.events(s, d).where(col("value").isNotNull)
          .select(col("user_id"), col("ts_ns"), col("event_id"),
            floor(col("value") * 10000.0 + 0.5).as("xq")),
        Seq("user_id"), "ts_ns", "event_id", "xq", maxLag = 3)
      .select(col("user_id"), col("lag"), col("n"), col("n_pairs"),
        qround(col("acf"), 8).as("acf")),
    """WITH b AS (
      |  SELECT user_id,
      |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS x,
      |    lead(CAST(floor(value * 10000.0 + 0.5) AS BIGINT), 1)
      |      OVER w AS l1,
      |    lead(CAST(floor(value * 10000.0 + 0.5) AS BIGINT), 2)
      |      OVER w AS l2,
      |    lead(CAST(floor(value * 10000.0 + 0.5) AS BIGINT), 3)
      |      OVER w AS l3
      |  FROM events WHERE value IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |g AS (
      |  SELECT user_id, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(x * l1) AS BIGINT) AS sxy1,
      |    CAST(sum(CASE WHEN l1 IS NOT NULL THEN x END) AS BIGINT) AS sh1,
      |    CAST(sum(l1) AS BIGINT) AS st1, count(l1) AS cnt1,
      |    CAST(sum(x * l2) AS BIGINT) AS sxy2,
      |    CAST(sum(CASE WHEN l2 IS NOT NULL THEN x END) AS BIGINT) AS sh2,
      |    CAST(sum(l2) AS BIGINT) AS st2, count(l2) AS cnt2,
      |    CAST(sum(x * l3) AS BIGINT) AS sxy3,
      |    CAST(sum(CASE WHEN l3 IS NOT NULL THEN x END) AS BIGINT) AS sh3,
      |    CAST(sum(l3) AS BIGINT) AS st3, count(l3) AS cnt3
      |  FROM b GROUP BY 1),
      |s AS (
      |  SELECT user_id, n, sx, sxx, 1 AS lag, sxy1 AS sxy, sh1 AS sh,
      |         st1 AS st, cnt1 AS cnt FROM g
      |  UNION ALL
      |  SELECT user_id, n, sx, sxx, 2, sxy2, sh2, st2, cnt2 FROM g
      |  UNION ALL
      |  SELECT user_id, n, sx, sxx, 3, sxy3, sh3, st3, cnt3 FROM g)
      |SELECT user_id, lag, n, cnt AS n_pairs,
      |  floor((CAST(sxy AS DOUBLE)
      |     - (CAST(sx AS DOUBLE) / n)
      |       * (CAST(sh AS DOUBLE) + CAST(st AS DOUBLE))
      |     + CAST(cnt AS DOUBLE) * (CAST(sx AS DOUBLE) / n)
      |       * (CAST(sx AS DOUBLE) / n))
      |    / nullif(CAST(sxx AS DOUBLE)
      |       - CAST(n AS DOUBLE) * (CAST(sx AS DOUBLE) / n)
      |         * (CAST(sx AS DOUBLE) / n), 0.0)
      |    * 100000000.0 + 0.5) / 100000000.0 AS acf
      |FROM s""".stripMargin)

  /** Two-sided CUSUM changepoint summary (SequenceOps.cusumChange) per
    * user on the 1e-4 fixed-point grid: target 50.0 with slack 5.0
    * (refUp 55.0 / refDown 45.0), threshold 200.0 — every cumulative
    * statistic an exact bigint, output hash-exact with no quantization.
    */
  private val cusumChangeQ = Q(
    (s, d) => SequenceOps.cusumChange(
        Tables.events(s, d).where(col("value").isNotNull)
          .select(col("user_id"), col("ts_ns"), col("event_id"),
            floor(col("value") * 10000.0 + 0.5).as("xq")),
        Seq("user_id"), "ts_ns", "event_id", "xq",
        refUp = 550000L, refDown = 450000L, threshold = 2000000L),
    """WITH b AS (
      |  SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
      |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS x
      |  FROM events WHERE value IS NOT NULL),
      |p AS (
      |  SELECT user_id, ts_ns, event_id,
      |    CAST(sum(x - 550000) OVER w AS BIGINT) AS p,
      |    CAST(sum(450000 - x) OVER w AS BIGINT) AS r
      |  FROM b
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id
      |               ROWS UNBOUNDED PRECEDING)),
      |s AS (
      |  SELECT user_id, ts_ns,
      |    p - least(0, CAST(min(p) OVER w2 AS BIGINT)) AS sp,
      |    r - least(0, CAST(min(r) OVER w2 AS BIGINT)) AS sn
      |  FROM p
      |  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_ns, event_id
      |                ROWS UNBOUNDED PRECEDING))
      |SELECT user_id, count(*) AS n,
      |  CAST(max(sp) AS BIGINT) AS max_pos,
      |  CAST(max(sn) AS BIGINT) AS max_neg,
      |  CAST(min(CASE WHEN sp > 2000000 THEN ts_ns END) AS BIGINT)
      |    AS first_alarm_pos,
      |  CAST(min(CASE WHEN sn > 2000000 THEN ts_ns END) AS BIGINT)
      |    AS first_alarm_neg
      |FROM s GROUP BY 1""".stripMargin)

  /** The STREAMING CUSUM on the batch frame — all-integer state makes
    * each group's one fold equal the batch closed form bit-for-bit
    * (shared oracle SQL with cusum_change).
    */
  private val streamCusumQ = Q(
    (s, d) => graft.streaming.StreamingOps.cusumStream(s,
        Tables.events(s, d).where(col("value").isNotNull)
          .select(col("user_id"), col("ts_ns"), col("event_id"),
            floor(col("value") * 10000.0 + 0.5).as("xq")),
        "user_id", "ts_ns", "event_id", "xq",
        refUp = 550000L, refDown = 450000L, threshold = 2000000L),
    cusumChangeQ.sql)

  /** Budget concentration per source (StatsOps.concentration): Gini +
    * HHI of document lengths — ranks from a deterministic (value, id)
    * sort, four exact bigint sums, two closed-form double indices.
    */
  private val giniConcentrationQ = Q(
    (s, d) => StatsOps.concentration(
        Tables.documents(s, d).select(col("source"), col("n_chars"),
          col("doc_id")),
        Seq("source"), "n_chars", "doc_id")
      .select(col("source"), col("n"), col("sum_v"),
        qround(col("gini"), 8).as("gini"), qround(col("hhi"), 8).as("hhi")),
    """WITH b AS (
      |  SELECT source, n_chars AS v, doc_id,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS BIGINT) AS rn
      |  FROM documents),
      |g AS (
      |  SELECT source, count(*) AS n, CAST(sum(v) AS BIGINT) AS sv,
      |    CAST(sum(v * v) AS BIGINT) AS svv,
      |    CAST(sum(rn * v) AS BIGINT) AS srv
      |  FROM b GROUP BY 1)
      |SELECT source, n, sv AS sum_v,
      |  floor((2.0 * CAST(srv AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * CAST(sv AS DOUBLE))
      |    - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE))
      |    * 100000000.0 + 0.5) / 100000000.0 AS gini,
      |  floor((CAST(svv AS DOUBLE)
      |      / (CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)))
      |    * 100000000.0 + 0.5) / 100000000.0 AS hhi
      |FROM g""".stripMargin)

  /** Deterministic per-language bottom-k document sample
    * (SampleOps.bottomKSample): the 5 smallest multiplicative key
    * hashes per lang — reproducible across runs and engines, and the
    * row_number <= k shape rides partial WindowGroupLimit.
    */
  private val bottomkSampleQ = Q(
    (s, d) => SampleOps.bottomKSample(
        Tables.documents(s, d).select(col("lang"), col("doc_id")),
        Seq("lang"), "doc_id", k = 5)
      .select(col("lang"), col("doc_id"), col("sample_rank")),
    """SELECT lang, doc_id, CAST(sample_rank AS INT) AS sample_rank
      |FROM (
      |  SELECT lang, doc_id,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY ((doc_id % 1000000007) * 2654435761) % 1000000007,
      |               doc_id) AS sample_rank
      |  FROM documents)
      |WHERE sample_rank <= 5""".stripMargin)

  /** Benford first-digit conformance per event type
    * (StatsOps.benfordCheck) on the 1e-4 fixed-point grid: leading
    * digits from the decimal string of the scaled bigint (no
    * log10-of-double edge cases), expected shares as shared
    * shortest-roundtrip literals, chi2 the fixed-order nine-term sum.
    */
  private val benfordCheckQ = Q(
    (s, d) => StatsOps.benfordCheck(
        Tables.events(s, d).where(col("value").isNotNull)
          .select(col("event_type"),
            floor(col("value") * 10000.0 + 0.5).as("xq")),
        Seq("event_type"), "xq")
      .select((col("event_type") +: (1 to 9).map(i => col(s"o$i")) :+
        col("n") :+ qround(col("chi2"), 8).as("chi2")): _*),
    {
      val obsCols = (1 to 9).map(i =>
        s"""CAST(sum(CASE WHEN dg = $i THEN 1 ELSE 0 END) AS BIGINT)
           |      AS o$i""".stripMargin).mkString(",\n    ")
      val nSum = (1 to 9).map(i => s"o$i").mkString(" + ")
      val chi2 = (1 to 9).map { i =>
        val p = math.log10(1.0 + 1.0 / i)
        s"(o$i - ndbl * $p) * (o$i - ndbl * $p) / (ndbl * $p)"
      }.mkString("\n    + ")
      s"""WITH b AS (
         |  SELECT event_type,
         |    CAST(substr(CAST(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)
         |      AS VARCHAR), 1, 1) AS INT) AS dg
         |  FROM events
         |  WHERE value IS NOT NULL AND floor(value * 10000.0 + 0.5) > 0),
         |g AS (
         |  SELECT event_type,
         |    $obsCols
         |  FROM b GROUP BY 1),
         |m AS (SELECT *, CAST($nSum AS DOUBLE) AS ndbl FROM g)
         |SELECT event_type, ${(1 to 9).map(i => s"o$i").mkString(", ")},
         |  CAST(ndbl AS BIGINT) AS n,
         |  floor(($chi2) * 100000000.0 + 0.5) / 100000000.0 AS chi2
         |FROM m""".stripMargin
    })

  /** Incremental aggregate maintenance (StatsOps.aggState/
    * mergeAggStates): state from even event_ids, delta from odd ones,
    * merged — the oracle aggregates the WHOLE fact directly, proving
    * partial-state combination is exact (the claim that makes
    * yesterday's-state ⊎ today's-delta safe at 100 TB).
    */
  private val incrementalAggQ = Q(
    (s, d) => {
      val e = Tables.events(s, d).where(col("value").isNotNull)
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 10000.0 + 0.5).as("xq"))
      val state = StatsOps.aggState(
        e.where(col("event_id") % 2 === 0), Seq("event_type"), "xq")
      val delta = StatsOps.aggState(
        e.where(col("event_id") % 2 === 1), Seq("event_type"), "xq")
      StatsOps.mergeAggStates(state, delta, Seq("event_type"))
    },
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(xq) AS BIGINT) AS sum_v,
      |  CAST(min(xq) AS BIGINT) AS min_v,
      |  CAST(max(xq) AS BIGINT) AS max_v,
      |  CAST(sum(xq * xq) AS BIGINT) AS sum_sq
      |FROM (SELECT event_type,
      |        CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS xq
      |      FROM events WHERE value IS NOT NULL)
      |GROUP BY 1""".stripMargin)

  /** The STREAMING aggregate state on the batch frame — the five-slot
    * monoid is fully commutative, so state is order-free and the fold
    * equals the batch operator bit-for-bit (shared oracle SQL with
    * incremental_agg).
    */
  private val streamAggStateQ = Q(
    (s, d) => graft.streaming.StreamingOps.aggStateStream(s,
        Tables.events(s, d).where(col("value").isNotNull)
          .select(col("event_type"),
            floor(col("value") * 10000.0 + 0.5).as("xq")),
        "event_type", "xq"),
    incrementalAggQ.sql)

  /** Token-level drift (TextOps.termShift): top-30 terms by absolute
    * log-frequency-ratio between English and Spanish documents —
    * exact counts, two single divisions + one ln per term, ranked
    * before quantization on both sides (identical cutoff).
    */
  private val termShiftQ = Q(
    (s, d) => graft.operators.TextOps.termShift(
        Tables.documents(s, d).select(col("lang"), col("text")),
        "lang", "en", "es", "text", k = 30)
      .select(col("term"), col("cnt_a"), col("cnt_b"),
        qround(col("shift"), 8).as("shift")),
    """WITH t AS (
      |  SELECT lang AS c, unnest(string_split(text, ' ')) AS w
      |  FROM documents WHERE lang IN ('en', 'es')),
      |counts AS (
      |  SELECT w,
      |    CAST(sum(CASE WHEN c = 'en' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ca,
      |    CAST(sum(CASE WHEN c = 'es' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS cb
      |  FROM t GROUP BY 1),
      |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
      |               CAST(sum(cb) AS BIGINT) AS n_b,
      |               count(*) AS v FROM counts),
      |sh AS (
      |  SELECT w AS term, ca AS cnt_a, cb AS cnt_b,
      |    ln((CAST(ca + 1 AS DOUBLE) / (n_a + v))
      |       / (CAST(cb + 1 AS DOUBLE) / (n_b + v))) AS shift_raw
      |  FROM counts CROSS JOIN tot)
      |SELECT term, cnt_a, cnt_b,
      |  floor(shift_raw * 100000000.0 + 0.5) / 100000000.0 AS shift
      |FROM sh
      |ORDER BY abs(shift_raw) DESC, term
      |LIMIT 30""".stripMargin)

  /** Which part of the distribution moved: per-quantile deltas between
    * the view and purchase value distributions, each side's exact
    * interpolated quantile quantized to the gate-proven 1e-4 grid
    * BEFORE the subtraction (StatsOps.groupedQuantiles both engines
    * agree on; the delta of two quantized doubles is deterministic).
    */
  private val qdPs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
  private val qdNames = Seq("d_p10", "d_p25", "d_p50", "d_p75", "d_p90")

  private val quantileDriftQ = Q(
    (s, d) => {
      val q = StatsOps.groupedQuantiles(
        Tables.events(s, d).where(col("value").isNotNull &&
          col("event_type").isin("view", "purchase")),
        Seq("event_type"), "value", qdPs)
      val qq = q.select(col("event_type") +: col("n_group") +:
        qdPs.indices.map(ix => qround(col(s"q_$ix"), 4).as(s"_qq$ix")): _*)
      val aggCols =
        max(when(col("event_type") === "view", col("n_group"))).as("n_a") +:
        max(when(col("event_type") === "purchase", col("n_group")))
          .as("n_b") +:
        qdPs.indices.map { ix =>
          (max(when(col("event_type") === "view", col(s"_qq$ix"))) -
            max(when(col("event_type") === "purchase", col(s"_qq$ix"))))
            .as(qdNames(ix))
        }
      qq.agg(aggCols.head, aggCols.tail: _*)
    },
    s"""WITH qa AS (
       |  SELECT count(value) AS n_a,
       |${qdPs.zipWithIndex.map { case (p, ix) =>
          s"    floor(quantile_cont(value, $p) * 10000.0 + 0.5) / 10000.0 AS qa$ix"
        }.mkString(",\n")}
       |  FROM events WHERE value IS NOT NULL AND event_type = 'view'),
       |qb AS (
       |  SELECT count(value) AS n_b,
       |${qdPs.zipWithIndex.map { case (p, ix) =>
          s"    floor(quantile_cont(value, $p) * 10000.0 + 0.5) / 10000.0 AS qb$ix"
        }.mkString(",\n")}
       |  FROM events WHERE value IS NOT NULL AND event_type = 'purchase')
       |SELECT n_a, n_b,
       |${qdPs.indices.map(ix =>
          s"  qa$ix - qb$ix AS ${qdNames(ix)}").mkString(",\n")}
       |FROM qa CROSS JOIN qb""".stripMargin)

  /** Embedding-space drift (SimilarityOps.embeddingDrift): centroid
    * cosine + L2 between label-0 and label-1 vectors on the 1e-6
    * fixed-point grid — per-dim exact bigint sums in ONE scan,
    * dim-bounded folds after.
    */
  private val embeddingDriftQ = Q(
    (s, d) => graft.operators.SimilarityOps.embeddingDrift(
        Tables.embeddings(s, d).select(col("label"), col("embedding")),
        "label", 0, 1, "embedding")
      .select(col("n_a"), col("n_b"),
        qround(col("cosine"), 8).as("cosine"),
        qround(col("l2_dist"), 8).as("l2_dist")),
    """WITH e AS (
      |  SELECT c, i - 1 AS d,
      |    CAST(floor(CAST(emb[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
      |      AS xq
      |  FROM (SELECT label AS c, embedding AS emb,
      |          unnest(generate_series(1, len(embedding))) AS i
      |        FROM embeddings WHERE label IN (0, 1))),
      |g AS (
      |  SELECT d,
      |    CAST(sum(CASE WHEN c = 0 THEN xq ELSE 0 END) AS BIGINT) AS sa,
      |    CAST(sum(CASE WHEN c = 1 THEN xq ELSE 0 END) AS BIGINT) AS sb,
      |    CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
      |  FROM e GROUP BY 1),
      |t AS (SELECT d, na, nb,
      |    CAST(sa AS DOUBLE) / na AS ca,
      |    CAST(sb AS DOUBLE) / nb AS cb FROM g),
      |f AS (SELECT max(na) AS n_a, max(nb) AS n_b,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list(ca * cb ORDER BY d)), (a_, b_) -> a_ + b_) AS dot,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list(ca * ca ORDER BY d)), (a_, b_) -> a_ + b_) AS a2,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list(cb * cb ORDER BY d)), (a_, b_) -> a_ + b_) AS b2,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list((ca - cb) * (ca - cb) ORDER BY d)), (a_, b_) -> a_ + b_)
      |      AS dd
      |  FROM t)
      |SELECT n_a, n_b,
      |  floor(dot / (sqrt(a2) * sqrt(b2)) * 100000000.0 + 0.5)
      |    / 100000000.0 AS cosine,
      |  floor(sqrt(dd) / 1000000.0 * 100000000.0 + 0.5)
      |    / 100000000.0 AS l2_dist
      |FROM f""".stripMargin)

  /** Deterministic WEIGHTED per-language sample
    * (SampleOps.weightedSample, Efraimidis-Spirakis with hash draws):
    * five documents per lang, long documents proportionally likelier —
    * reproducible across runs, engines, and re-weightings.
    */
  private val weightedSampleQ = Q(
    (s, d) => SampleOps.weightedSample(
        Tables.documents(s, d).select(col("lang"), col("doc_id"),
          col("n_chars")),
        Seq("lang"), "doc_id", "n_chars", k = 5)
      .select(col("lang"), col("doc_id"), col("n_chars"),
        col("sample_rank"),
        qround(col("sample_score"), 8).as("sample_score")),
    """SELECT lang, doc_id, n_chars, CAST(sample_rank AS INT)
      |    AS sample_rank,
      |  floor(score * 100000000.0 + 0.5) / 100000000.0 AS sample_score
      |FROM (
      |  SELECT lang, doc_id, n_chars, score,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY score DESC, doc_id) AS sample_rank
      |  FROM (SELECT lang, doc_id, n_chars,
      |      ln(((((doc_id % 1000000007) * 2654435761) % 1000000007
      |            % 10000) + 0.5) / 10000)
      |        / CAST(n_chars AS DOUBLE) AS score
      |    FROM documents WHERE n_chars > 0))
      |WHERE sample_rank <= 5""".stripMargin)

  /** The one-pass monitor dashboard: every scalar drift statistic this
    * engine ships (PSI, KS, Mann-Whitney z, chi2, JSD — and since
    * round 14 the scale-bearing Wasserstein W1 and bounded Hellinger
    * legs from [[operators.DiagnosticsOps]]) over the same
    * view/purchase cohort pair, labeled and unioned — operator
    * composition, each leg identical to its standalone gate query.
    */
  private val driftReportQ = Q(
    (s, d) => {
      def leg(name: String, df: org.apache.spark.sql.DataFrame,
              stat: String) =
        df.select(lit(name).as("metric"), col("n_a"), col("n_b"),
          qround(col(stat), 8).as("statistic"))
      val ev = Tables.events(s, d).select(col("event_type"), col("value"))
      leg("psi", StatsOps.populationStability(ev, "event_type", "view",
          "purchase", "value", bins = psiBins), "psi")
        .unionByName(leg("ks", StatsOps.ksDrift(ev, "event_type",
          "view", "purchase", "value"), "ks"))
        .unionByName(leg("mwu_z", StatsOps.mannWhitney(ev, "event_type",
          "view", "purchase", "value"), "z"))
        .unionByName(leg("chi2", StatsOps.chi2Drift(
          Tables.events(s, d).select(col("event_type"),
            (col("user_id") % 7).as("ucat")),
          "event_type", "view", "purchase", "ucat"), "chi2"))
        .unionByName(leg("jsd", StatsOps.jsDivergence(
          Tables.documents(s, d).select(col("lang"), col("source")),
          "lang", "en", "es", "source"), "jsd"))
        .unionByName(leg("w1", graft.operators.DiagnosticsOps
          .wassersteinDrift(ev, "event_type", "view", "purchase",
            "value", quantDigits = 4), "w1"))
        .unionByName(leg("hellinger", graft.operators.DiagnosticsOps
          .hellingerDrift(ev, "event_type", "view", "purchase",
            "value", quantDigits = 4), "hellinger"))
    },
    Seq(("psi", datasetDriftQ.sql, "psi"), ("ks", ksDriftQ.sql, "ks"),
      ("mwu_z", mannWhitneyQ.sql, "z"), ("chi2", chi2DriftQ.sql, "chi2"),
      ("jsd", jsDivergenceQ.sql, "jsd"),
      ("w1", QueriesDiagnostics.all("wasserstein_drift").sql, "w1"),
      ("hellinger", QueriesDiagnostics.all("hellinger_drift").sql,
        "hellinger")).map { case (name, sql, stat) =>
      s"""SELECT '$name' AS metric, n_a, n_b, $stat AS statistic
         |FROM (
         |$sql
         |)""".stripMargin
    }.mkString("\nUNION ALL\n"))

  /** Declarative contract check (ValidateOps.expectations +
    * expectUnique): five rules over the events fact in ONE pass plus
    * an exact uniqueness aggregate, melted to a labeled report —
    * violations are exact integers, the report is rules-sized.
    */
  private val dataExpectationsQ = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
      graft.operators.ValidateOps.expectations(ev, Seq(
          "value_not_null" -> col("value").isNotNull,
          "value_nonnegative" ->
            (col("value").isNull || col("value") >= 0),
          "value_under_100" ->
            (col("value").isNull || col("value") <= 100),
          "event_type_known" -> col("event_type").isin(
            "view", "click", "purchase", "signup", "error"),
          "user_id_not_null" -> col("user_id").isNotNull))
        .unionByName(graft.operators.ValidateOps.expectUnique(
          ev, Seq("event_id"), "event_id_unique"))
    },
    """WITH g AS (
      |  SELECT count(*) AS n_rows,
      |    CAST(sum(CASE WHEN value IS NOT NULL THEN 0 ELSE 1 END)
      |      AS BIGINT) AS v0,
      |    CAST(sum(CASE WHEN value IS NULL OR value >= 0 THEN 0 ELSE 1
      |      END) AS BIGINT) AS v1,
      |    CAST(sum(CASE WHEN value IS NULL OR value <= 100 THEN 0 ELSE 1
      |      END) AS BIGINT) AS v2,
      |    CAST(sum(CASE WHEN event_type IN
      |      ('view', 'click', 'purchase', 'signup', 'error')
      |      THEN 0 ELSE 1 END) AS BIGINT) AS v3,
      |    CAST(sum(CASE WHEN user_id IS NOT NULL THEN 0 ELSE 1 END)
      |      AS BIGINT) AS v4,
      |    count(*) - count(DISTINCT event_id) AS v5
      |  FROM events)
      |SELECT 'value_not_null' AS rule, n_rows, v0 AS violations,
      |  v0 = 0 AS pass FROM g
      |UNION ALL SELECT 'value_nonnegative', n_rows, v1, v1 = 0 FROM g
      |UNION ALL SELECT 'value_under_100', n_rows, v2, v2 = 0 FROM g
      |UNION ALL SELECT 'event_type_known', n_rows, v3, v3 = 0 FROM g
      |UNION ALL SELECT 'user_id_not_null', n_rows, v4, v4 = 0 FROM g
      |UNION ALL SELECT 'event_id_unique', n_rows, v5, v5 = 0 FROM g"""
      .stripMargin)

  /** Quarantine routing (ValidateOps.quarantine): rows tagged with the
    * rules they violate, aggregated to a (violated-set, count)
    * census — the report that says what to fix first. Pure projection
    * riding the scan; the census is rule-combination-bounded.
    */
  private val quarantineSplitQ = Q(
    (s, d) => graft.operators.ValidateOps.quarantine(
        Tables.events(s, d), Seq(
          "value_under_100" ->
            (col("value").isNull || col("value") <= 100),
          "value_under_300" ->
            (col("value").isNull || col("value") <= 300),
          "even_user" -> (col("user_id") % 2 === 0)))
      .groupBy(col("violated"))
      .agg(count(lit(1)).as("cnt")),
    """SELECT concat_ws(',',
      |    CASE WHEN value IS NULL OR value <= 100 THEN NULL
      |         ELSE 'value_under_100' END,
      |    CASE WHEN value IS NULL OR value <= 300 THEN NULL
      |         ELSE 'value_under_300' END,
      |    CASE WHEN user_id % 2 = 0 THEN NULL ELSE 'even_user' END)
      |  AS violated, count(*) AS cnt
      |FROM events GROUP BY 1""".stripMargin)

  /** Schema evolution on read: two parquet parts written with
    * DIFFERENT schemas (the second adds an `extra` bigint), read back
    * with mergeSchema — the missing column arrives as null in old
    * rows. The oracle recomputes the merged aggregate from the
    * original fact. Exact integers throughout.
    */
  private val evolveSchemaQ = Q(
    (s, d) => {
      val base = Tables.events(s, d)
        .select(col("event_id"), col("user_id"))
      val path = s"/tmp/graft_evolve_${Queries.scratchTag(s, d)}"
      base.where(col("event_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$path/p1")
      base.where(col("event_id") % 2 === 1)
        .withColumn("extra", col("event_id") % 100)
        .write.mode("overwrite").parquet(s"$path/p2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$path/p1", s"$path/p2")
        .agg(count(lit(1)).as("n"),
          count(col("extra")).as("n_extra"),
          sum(col("extra")).as("sum_extra"))
    },
    """SELECT count(*) AS n,
      |  CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_extra,
      |  CAST(sum(CASE WHEN event_id % 2 = 1 THEN event_id % 100 END)
      |    AS BIGINT) AS sum_extra
      |FROM events""".stripMargin)

  /** Exact weighted quantiles (StatsOps.weightedQuantile): per-lang
    * byte-median document lengths — the length below which half the
    * corpus BYTES live (weight = n_chars), not half the documents.
    * All-integer cumulative weights; only the boundary compare is a
    * double, identical in both engines.
    */
  private val weightedMedianQ = Q(
    (s, d) => StatsOps.weightedQuantile(
        Tables.documents(s, d).select(col("lang"), col("n_chars")),
        Seq("lang"), "n_chars", "n_chars", ps = Seq(0.25, 0.5, 0.75))
      .select(col("lang"), col("total_w"), col("wq_0"), col("wq_1"),
        col("wq_2")),
    """WITH pv AS (
      |  SELECT lang, n_chars AS v, CAST(sum(n_chars) AS BIGINT) AS wv
      |  FROM documents WHERE n_chars > 0 GROUP BY 1, 2),
      |c AS (
      |  SELECT lang, v, wv,
      |    CAST(sum(wv) OVER (PARTITION BY lang ORDER BY v
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(sum(wv) OVER (PARTITION BY lang) AS BIGINT) AS tot
      |  FROM pv)
      |SELECT lang, CAST(sum(wv) AS BIGINT) AS total_w,
      |  CAST(min(CASE WHEN CAST(cum AS DOUBLE)
      |    >= 0.25 * CAST(tot AS DOUBLE) THEN v END) AS BIGINT) AS wq_0,
      |  CAST(min(CASE WHEN CAST(cum AS DOUBLE)
      |    >= 0.5 * CAST(tot AS DOUBLE) THEN v END) AS BIGINT) AS wq_1,
      |  CAST(min(CASE WHEN CAST(cum AS DOUBLE)
      |    >= 0.75 * CAST(tot AS DOUBLE) THEN v END) AS BIGINT) AS wq_2
      |FROM c GROUP BY 1""".stripMargin)

  /** Join-key skew report (StatsOps.skewReport): the ten heaviest
    * user_id keys in the events fact with exact share and
    * mean-load-ratio — the pre-flight read before picking a salting
    * factor. Deterministic tie-break: count desc, key (string) asc.
    */
  private val skewReportQ = Q(
    (s, d) => StatsOps.skewReport(
        Tables.events(s, d).select(col("user_id")), "user_id", topK = 10)
      .select(col("key"), col("cnt"), col("n_keys"), col("n_rows"),
        qround(col("share"), 8).as("share"),
        qround(col("skew_ratio"), 8).as("skew_ratio")),
    """WITH counts AS (
      |  SELECT CAST(user_id AS VARCHAR) AS key,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      |t AS (SELECT count(*) AS n_keys,
      |             CAST(sum(cnt) AS BIGINT) AS n_rows FROM counts)
      |SELECT key, cnt, n_keys, n_rows,
      |  floor(CAST(cnt AS DOUBLE) / n_rows * 100000000.0 + 0.5)
      |    / 100000000.0 AS share,
      |  floor(CAST(cnt AS DOUBLE) * n_keys / n_rows * 100000000.0 + 0.5)
      |    / 100000000.0 AS skew_ratio
      |FROM counts CROSS JOIN t
      |ORDER BY cnt DESC, key
      |LIMIT 10""".stripMargin)

  /** Two-proportion z-test (StatsOps.twoProportionZ) over a
    * deterministic hash-assigned 50/50 user split: per-user conversion
    * (15+ purchase events), arms from the shared multiplicative-hash
    * bucket gate — reproducible across runs and engines, no rand().
    * All four counts exact BIGINTs; the z closed form is written in
    * the same left-associated shape in both engines.
    */
  private val abTestQ = Q(
    (s, d) => {
      // conversion = a HEAVY purchaser (15+ purchase events): "any
      // purchase" converts every user at this event density and makes
      // the test degenerate (pooled rate 1 → se 0 → null z)
      val perUser = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(when(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)) >= 15, 1L).otherwise(0L).as("converted"))
      val armed = SampleOps.hashSplit(perUser, "user_id",
        Seq(0.5, 0.5), Seq("a", "b"))
      StatsOps.twoProportionZ(armed, "split", "a", "b", "converted")
        .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
          qround(col("rate_a"), 8).as("rate_a"),
          qround(col("rate_b"), 8).as("rate_b"),
          qround(col("lift"), 8).as("lift"),
          qround(col("z"), 8).as("z"))
    },
    s"""WITH u AS (
       |  SELECT user_id,
       |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1
       |      ELSE 0 END) >= 15 THEN 1 ELSE 0 END AS conv
       |  FROM events GROUP BY 1),
       |arms AS (
       |  SELECT CASE WHEN (((user_id % ${graft.operators.TextOps.HashMod})
       |      * ${SketchOps.KmvMult}) % ${graft.operators.TextOps.HashMod})
       |      % ${SampleOps.SplitBuckets} < 5000
       |    THEN 'a' ELSE 'b' END AS arm, conv
       |  FROM u),
       |g AS (
       |  SELECT
       |    CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_a,
       |    CAST(sum(CASE WHEN arm = 'a' THEN conv ELSE 0 END) AS BIGINT)
       |      AS x_a,
       |    CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_b,
       |    CAST(sum(CASE WHEN arm = 'b' THEN conv ELSE 0 END) AS BIGINT)
       |      AS x_b
       |  FROM arms),
       |v AS (
       |  SELECT n_a, x_a, n_b, x_b,
       |    CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
       |    CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
       |    CAST(x_a + x_b AS DOUBLE)
       |      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pp
       |  FROM g)
       |SELECT n_a, x_a, n_b, x_b,
       |  floor(pa * 100000000.0 + 0.5) / 100000000.0 AS rate_a,
       |  floor(pb * 100000000.0 + 0.5) / 100000000.0 AS rate_b,
       |  floor((pa - pb) * 100000000.0 + 0.5) / 100000000.0 AS lift,
       |  floor((pa - pb) / sqrt(pp * (1.0 - pp)
       |      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
       |    * 100000000.0 + 0.5) / 100000000.0 AS z
       |FROM v""".stripMargin)

  /** CUPED variance reduction (DiagnosticsOps.cupedAdjust): the
    * event stream splits at its time midpoint — the PRE-half per-user
    * event count is the covariate, the POST-half purchase count the
    * experiment metric — arms come from the same deterministic hash
    * split as ab_test, and θ/means/variance-reduction are closed-form
    * doubles off one hash aggregate of exact BIGINT moments. The
    * oracle replays the midpoint, the split, and every moment.
    */
  private val cupedAdjustQ = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
      val bnd = ev.agg(min(col("ts_ns")).as("lo"),
        max(col("ts_ns")).as("hi"))
      val perUser = ev.crossJoin(broadcast(bnd))
        .withColumn("mid", expr("(lo + hi) div 2"))
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("ts_ns") < col("mid"), 1L).otherwise(0L)).as("x"),
          sum(when(col("ts_ns") >= col("mid") &&
            col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      val armed = SampleOps.hashSplit(perUser, "user_id",
        Seq(0.5, 0.5), Seq("a", "b"))
      DiagnosticsOps.cupedAdjust(armed, "split", "a", "b", "x", "y")
        .select(col("n_a"), col("n_b"),
          qround(col("theta"), 8).as("theta"),
          qround(col("diff_raw"), 8).as("diff_raw"),
          qround(col("diff_cuped"), 8).as("diff_cuped"),
          qround(col("var_reduction"), 8).as("var_reduction"))
    },
    s"""WITH bnd AS (
       |  SELECT min(epoch_ns(ts)) AS lo, max(epoch_ns(ts)) AS hi
       |  FROM events),
       |u AS (
       |  SELECT user_id,
       |    CAST(sum(CASE WHEN epoch_ns(ts) < (lo + hi) // 2
       |      THEN 1 ELSE 0 END) AS BIGINT) AS x,
       |    CAST(sum(CASE WHEN epoch_ns(ts) >= (lo + hi) // 2
       |      AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS y
       |  FROM events CROSS JOIN bnd GROUP BY 1),
       |arms AS (
       |  SELECT CASE WHEN (((user_id % ${graft.operators.TextOps.HashMod})
       |      * ${SketchOps.KmvMult}) % ${graft.operators.TextOps.HashMod})
       |      % ${SampleOps.SplitBuckets} < 5000
       |    THEN 'a' ELSE 'b' END AS arm, x, y
       |  FROM u),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx,
       |    CAST(sum(y * y) AS BIGINT) AS syy,
       |    CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_a,
       |    CAST(sum(CASE WHEN arm = 'a' THEN x ELSE 0 END) AS BIGINT)
       |      AS sxa,
       |    CAST(sum(CASE WHEN arm = 'a' THEN y ELSE 0 END) AS BIGINT)
       |      AS sya,
       |    CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_b,
       |    CAST(sum(CASE WHEN arm = 'b' THEN x ELSE 0 END) AS BIGINT)
       |      AS sxb,
       |    CAST(sum(CASE WHEN arm = 'b' THEN y ELSE 0 END) AS BIGINT)
       |      AS syb
       |  FROM arms),
       |v AS (
       |  SELECT n_a, n_b,
       |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covxy,
       |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
       |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary,
       |    CAST(sya AS DOUBLE) / CAST(n_a AS DOUBLE)
       |      - CAST(syb AS DOUBLE) / CAST(n_b AS DOUBLE) AS draw,
       |    CAST(sxa AS DOUBLE) / CAST(n_a AS DOUBLE)
       |      - CAST(sxb AS DOUBLE) / CAST(n_b AS DOUBLE) AS dx
       |  FROM m),
       |w AS (
       |  SELECT n_a, n_b, draw,
       |    CASE WHEN varx > 0 THEN covxy / varx ELSE 0.0 END AS theta,
       |    CASE WHEN varx > 0 AND vary > 0
       |      THEN covxy * covxy / (varx * vary) ELSE 0.0 END AS vred,
       |    dx
       |  FROM v)
       |SELECT n_a, n_b,
       |  floor(theta * 100000000.0 + 0.5) / 100000000.0 AS theta,
       |  CASE WHEN n_a > 0 AND n_b > 0
       |    THEN floor(draw * 100000000.0 + 0.5) / 100000000.0 END
       |    AS diff_raw,
       |  CASE WHEN n_a > 0 AND n_b > 0
       |    THEN floor((draw - theta * dx) * 100000000.0 + 0.5)
       |      / 100000000.0 END AS diff_cuped,
       |  floor(vred * 100000000.0 + 0.5) / 100000000.0
       |    AS var_reduction
       |FROM w""".stripMargin)

  /** The STREAMING A/B readout on the batch frame
    * (StreamingOps.conversionStream): per-user purchase counts as ONE
    * long of order-free state, then the same threshold/arm/z
    * composition as the batch twin — shared oracle SQL.
    */
  private val streamAbTestQ = Q(
    (s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("is_purchase"))
      val perUser = graft.streaming.StreamingOps
        .conversionStream(s, ev, "user_id", "is_purchase")
        .select(col("user_id"),
          when(col("n_success") >= 15, 1L).otherwise(0L).as("converted"))
      val armed = SampleOps.hashSplit(perUser, "user_id",
        Seq(0.5, 0.5), Seq("a", "b"))
      StatsOps.twoProportionZ(armed, "split", "a", "b", "converted")
        .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
          qround(col("rate_a"), 8).as("rate_a"),
          qround(col("rate_b"), 8).as("rate_b"),
          qround(col("lift"), 8).as("lift"),
          qround(col("z"), 8).as("z"))
    },
    abTestQ.sql)

  /** Deterministic Poisson-bootstrap CI (StatsOps.bootstrapCi) for the
    * per-event-type mean value: 64 replicates in ONE hash aggregate
    * (2·64 longs of state per group), multiplicities from the shared
    * hash scheme + the Poisson(1) inverse-CDF grid, CI = discrete
    * 2.5%/97.5% picks over the replicate means. No rand() anywhere —
    * the oracle replays every draw.
    */
  private val bootstrapCiQ = Q(
    (s, d) => StatsOps.bootstrapCi(
        Tables.events(s, d).select(col("event_type"), col("event_id"),
          round(col("value") * 1000).cast("long").as("v")),
        Seq("event_type"), "v", "event_id", reps = 64)
      .select(col("event_type"), col("n"),
        qround(col("mean"), 8).as("mean"),
        qround(col("ci_lo"), 8).as("ci_lo"),
        qround(col("ci_hi"), 8).as("ci_hi")),
    {
      val M = graft.operators.TextOps.HashMod
      val A = SketchOps.KmvMult
      s"""WITH e AS (
         |  SELECT event_type, event_id,
         |    CAST(round(value * 1000) AS BIGINT) AS v
         |  FROM events WHERE value IS NOT NULL),
         |mb AS (
         |  SELECT event_type, b,
         |    CAST(sum(m * v) AS BIGINT) AS mv, CAST(sum(m) AS BIGINT) AS ms
         |  FROM (
         |    SELECT event_type, v, b,
         |      CASE WHEN bucket < 3679 THEN 0 WHEN bucket < 7358 THEN 1
         |           WHEN bucket < 9197 THEN 2 WHEN bucket < 9810 THEN 3
         |           WHEN bucket < 9963 THEN 4 WHEN bucket < 9994 THEN 5
         |           WHEN bucket < 9999 THEN 6 ELSE 7 END AS m
         |    FROM (
         |      SELECT e.event_type, e.v, r.b,
         |        (event_id % $M) * (r.b + 1) % $M * $A % $M % 10000
         |          AS bucket
         |      FROM e CROSS JOIN (SELECT unnest(generate_series(0, 63))
         |        AS b) r))
         |  GROUP BY 1, 2),
         |bm AS (
         |  SELECT event_type, CAST(mv AS DOUBLE) / CAST(ms AS DOUBLE)
         |    AS bmean
         |  FROM mb WHERE ms > 0),
         |rk AS (
         |  SELECT event_type, bmean,
         |    row_number() OVER (PARTITION BY event_type ORDER BY bmean)
         |      AS rk,
         |    count(*) OVER (PARTITION BY event_type) AS nr
         |  FROM bm),
         |base AS (
         |  SELECT event_type, count(*) AS n, CAST(sum(v) AS BIGINT) AS sv
         |  FROM e GROUP BY 1)
         |SELECT base.event_type, base.n,
         |  floor(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)
         |    * 100000000.0 + 0.5) / 100000000.0 AS mean,
         |  floor(min(CASE WHEN rk = CAST(ceil(nr * 0.025) AS BIGINT)
         |      THEN bmean END) * 100000000.0 + 0.5) / 100000000.0 AS ci_lo,
         |  floor(min(CASE WHEN rk = CAST(ceil(nr * 0.975) AS BIGINT)
         |      THEN bmean END) * 100000000.0 + 0.5) / 100000000.0 AS ci_hi
         |FROM base JOIN rk USING (event_type)
         |GROUP BY base.event_type, base.n, sv""".stripMargin
    })

  /** Masked imputation eval (StatsOps.imputeMedian): hide every 11th
    * event's value, repair from the surviving per-type discrete
    * median, score mean absolute error against the held-out truth —
    * the repair-quality readout run before trusting an imputer on
    * real gaps. All integers except the one MAE division.
    */
  private val imputeEvalQ = Q(
    (s, d) => {
      val base = Tables.events(s, d)
        .where(col("value").isNotNull)
        .select(col("event_type"), col("event_id"),
          round(col("value") * 1000).cast("long").as("_true"))
        .withColumn("_v", when(col("event_id") % 11 === 0,
          lit(null).cast("long")).otherwise(col("_true")))
      StatsOps.imputeMedian(base, Seq("event_type"), "_v",
          Seq("event_id"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("was_imputed"), 1L).otherwise(0L)).as("n_imputed"),
          sum(when(col("was_imputed"), abs(col("_v_filled") - col("_true")))
            .otherwise(0L)).as("_ae"))
        .select(col("event_type"), col("n"), col("n_imputed"),
          qround(try_divide(col("_ae").cast("double"),
            col("n_imputed").cast("double")), 8).as("mae"))
    },
    """WITH b AS (
      |  SELECT event_type, event_id,
      |    CAST(round(value * 1000) AS BIGINT) AS t,
      |    CASE WHEN event_id % 11 = 0 THEN NULL
      |         ELSE CAST(round(value * 1000) AS BIGINT) END AS v
      |  FROM events WHERE value IS NOT NULL),
      |med AS (
      |  SELECT event_type, v AS med FROM (
      |    SELECT event_type, v, event_id,
      |      row_number() OVER (PARTITION BY event_type
      |        ORDER BY v, event_id) AS rk,
      |      count(v) OVER (PARTITION BY event_type) AS ng
      |    FROM b WHERE v IS NOT NULL)
      |  WHERE rk = CAST(ceil(ng / 2.0) AS BIGINT)),
      |f AS (
      |  SELECT b.event_type, t, v, coalesce(v, med) AS fv,
      |    (v IS NULL AND med IS NOT NULL) AS wi
      |  FROM b LEFT JOIN med USING (event_type))
      |SELECT event_type, count(*) AS n,
      |  CAST(sum(CASE WHEN wi THEN 1 ELSE 0 END) AS BIGINT) AS n_imputed,
      |  floor(CAST(sum(CASE WHEN wi THEN abs(fv - t) ELSE 0 END)
      |      AS DOUBLE)
      |    / NULLIF(CAST(sum(CASE WHEN wi THEN 1 ELSE 0 END) AS DOUBLE),
      |      0.0)
      |    * 100000000.0 + 0.5) / 100000000.0 AS mae
      |FROM f GROUP BY 1""".stripMargin)

  /** k-anonymity audit (ValidateOps.kAnonymity) of the documents
    * table under the (lang, source, length-bucket) quasi-identifier —
    * the release-gate readout: how many rows sit in cohorts smaller
    * than k=5. Exact integer counts off one group-by pass.
    */
  /** t-closeness audit (ValidateOps.tCloseness) on the same release
    * quasi-ids as k_anonymity/l_diversity, with the 500-char length
    * band as the ORDERED sensitive attribute — per (lang, source)
    * group, the exact-integer EMD between the group's and the whole
    * table's band distribution, summarized in the shared 1-row audit
    * shape. All cumulative products clear denominators to BIGINTs;
    * the only doubles are each group's single EMD division and the
    * t-threshold branch both engines derive identically.
    */
  private val tClosenessQ = Q(
    (s, d) => graft.operators.ValidateOps.tCloseness(
        Tables.documents(s, d).select(col("lang"), col("source"),
          expr("n_chars div 500L").as("len_band")),
        Seq("lang", "source"), "len_band", t = 0.2)
      .select(col("t"), col("n_groups"), col("n_rows"), col("m"),
        qround(col("max_emd"), 8).as("max_emd"), col("groups_at_risk"),
        col("rows_at_risk"), qround(col("risk_share"), 8).as("risk_share")),
    """WITH j AS (
      |  SELECT lang, source, n_chars // 500 AS sv,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2, 3),
      |dom AS (SELECT sv, CAST(sum(c) AS BIGINT) AS tv
      |        FROM j GROUP BY 1),
      |domc AS (
      |  SELECT sv, CAST(sum(tv) OVER (ORDER BY sv
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumall
      |  FROM dom),
      |tot AS (SELECT CAST(sum(tv) AS BIGINT) AS nn,
      |               CAST(count(*) AS BIGINT) AS m FROM dom),
      |grp AS (SELECT lang, source, CAST(sum(c) AS BIGINT) AS ng
      |        FROM j GROUP BY 1, 2),
      |grid AS (
      |  SELECT grp.lang, grp.source, grp.ng, domc.sv, domc.cumall,
      |    CAST(coalesce(j.c, 0) AS BIGINT) AS c0
      |  FROM grp CROSS JOIN domc
      |  LEFT JOIN j ON j.lang = grp.lang AND j.source = grp.source
      |    AND j.sv = domc.sv),
      |cg AS (
      |  SELECT lang, source, ng, cumall,
      |    CAST(sum(c0) OVER (PARTITION BY lang, source ORDER BY sv
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumg
      |  FROM grid),
      |pg AS (
      |  SELECT lang, source, max(ng) AS ng, max(nn) AS nn2,
      |    max(m) AS m2,
      |    CAST(sum(abs(cumg * nn - cumall * ng)) AS BIGINT) AS sd
      |  FROM cg CROSS JOIN tot GROUP BY 1, 2),
      |pe AS (
      |  SELECT ng,
      |    CASE WHEN m2 > 1
      |      THEN CAST(sd AS DOUBLE) / (CAST(ng AS DOUBLE)
      |        * CAST(nn2 AS DOUBLE) * CAST(m2 - 1 AS DOUBLE))
      |      ELSE 0.0 END AS emd,
      |    m2
      |  FROM pg)
      |SELECT 0.2e0 AS t, CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(sum(ng) AS BIGINT) AS n_rows, CAST(max(m2) AS BIGINT) AS m,
      |  floor(max(emd) * 100000000.0 + 0.5) / 100000000.0 AS max_emd,
      |  CAST(sum(CASE WHEN emd > 0.2e0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS groups_at_risk,
      |  CAST(sum(CASE WHEN emd > 0.2e0 THEN ng ELSE 0 END) AS BIGINT)
      |    AS rows_at_risk,
      |  floor(CAST(sum(CASE WHEN emd > 0.2e0 THEN ng ELSE 0 END)
      |      AS DOUBLE) / CAST(sum(ng) AS DOUBLE) * 100000000.0 + 0.5)
      |    / 100000000.0 AS risk_share
      |FROM pe""".stripMargin)

  /** Laplace-noised histogram (ValidateOps.laplaceNoisedCount, ε = 1):
    * customers per nation with deterministic hash-seeded Laplace
    * noise — the mechanism-shape AUDIT VIEW of the release side of
    * the privacy family (NOT an ε-DP release: the default salt-0
    * draw is recomputable from the public key; production passes a
    * secret salt). The oracle replays the multiplicative hash, the
    * half-shifted uniform and the inverse CDF verbatim.
    */
  private val noisedCountQ = Q(
    (s, d) => graft.operators.ValidateOps.laplaceNoisedCount(
        Tables.customer(s, d).select(col("c_nationkey")),
        "c_nationkey", epsilon = 1.0)
      .select(col("c_nationkey").as("nationkey"), col("n"),
        qround(col("noise"), 8).as("noise"),
        qround(col("noised_n"), 8).as("noised_n")),
    s"""WITH g AS (
       |  SELECT c_nationkey AS k, CAST(count(*) AS BIGINT) AS n
       |  FROM customer GROUP BY 1),
       |u AS (
       |  SELECT k, n,
       |    (CAST(((k % 1000000007) * ${SketchOps.KmvMult})
       |        % 1000000007 AS DOUBLE) + 0.5) / 1000000007.0 - 0.5 AS uu
       |  FROM g)
       |SELECT k AS nationkey, n,
       |  floor((-1.0) * sign(uu) * ln(1.0 - 2.0 * abs(uu))
       |    * 100000000.0 + 0.5) / 100000000.0 AS noise,
       |  floor((CAST(n AS DOUBLE) + (-1.0) * sign(uu)
       |      * ln(1.0 - 2.0 * abs(uu))) * 100000000.0 + 0.5)
       |    / 100000000.0 AS noised_n
       |FROM u""".stripMargin)

  private val kAnonymityQ = Q(
    (s, d) => graft.operators.ValidateOps.kAnonymity(
        Tables.documents(s, d).select(col("lang"), col("source"),
          floor(col("n_chars") / 100).as("len_bucket")),
        Seq("lang", "source", "len_bucket"), k = 5L)
      .select(col("k"), col("n_groups"), col("n_rows"), col("min_k"),
        col("groups_at_risk"), col("rows_at_risk"),
        qround(col("risk_share"), 8).as("risk_share")),
    """WITH g AS (
      |  SELECT lang, source, CAST(floor(n_chars / 100) AS BIGINT)
      |      AS len_bucket, count(*) AS c
      |  FROM documents GROUP BY 1, 2, 3)
      |SELECT CAST(5 AS BIGINT) AS k, count(*) AS n_groups,
      |  CAST(sum(c) AS BIGINT) AS n_rows, CAST(min(c) AS BIGINT) AS min_k,
      |  CAST(sum(CASE WHEN c < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS groups_at_risk,
      |  CAST(sum(CASE WHEN c < 5 THEN c ELSE 0 END) AS BIGINT)
      |    AS rows_at_risk,
      |  floor(CAST(sum(CASE WHEN c < 5 THEN c ELSE 0 END) AS DOUBLE)
      |      / CAST(sum(c) AS DOUBLE) * 100000000.0 + 0.5) / 100000000.0
      |    AS risk_share
      |FROM g""".stripMargin)

  /** l-diversity audit (ValidateOps.lDiversity): k-anonymity's
    * homogeneity-attack companion on the same release quasi-ids —
    * per (lang, source) group, how many DISTINCT sensitive values
    * (the 50-char length band standing in for the sensitive column)
    * survive? Exact integers; the one ratio is qround-cosmetic.
    */
  private val lDiversityQ = Q(
    (s, d) => graft.operators.ValidateOps.lDiversity(
        Tables.documents(s, d).select(col("lang"), col("source"),
          (col("n_chars") % 50).as("len_band")),
        Seq("lang", "source"), "len_band", l = 3L)
      .select(col("l"), col("n_groups"), col("n_rows"), col("min_l"),
        col("groups_at_risk"), col("rows_at_risk"),
        qround(col("risk_share"), 8).as("risk_share")),
    """WITH g AS (
      |  SELECT lang, source, count(*) AS c,
      |    count(DISTINCT n_chars % 50) AS div
      |  FROM documents GROUP BY 1, 2)
      |SELECT CAST(3 AS BIGINT) AS l, count(*) AS n_groups,
      |  CAST(sum(c) AS BIGINT) AS n_rows, CAST(min(div) AS BIGINT) AS min_l,
      |  CAST(sum(CASE WHEN div < 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS groups_at_risk,
      |  CAST(sum(CASE WHEN div < 3 THEN c ELSE 0 END) AS BIGINT)
      |    AS rows_at_risk,
      |  floor(CAST(sum(CASE WHEN div < 3 THEN c ELSE 0 END) AS DOUBLE)
      |      / CAST(sum(c) AS DOUBLE) * 100000000.0 + 0.5) / 100000000.0
      |    AS risk_share
      |FROM g""".stripMargin)

  val all: Map[String, Q] = Map(
    "ab_test" -> abTestQ,
    "cuped_adjust" -> cupedAdjustQ,
    "l_diversity" -> lDiversityQ,
    "stream_abtest" -> streamAbTestQ,
    "bootstrap_ci" -> bootstrapCiQ,
    "impute_eval" -> imputeEvalQ,
    "k_anonymity" -> kAnonymityQ,
    "noised_count" -> noisedCountQ,
    "cliffs_delta" -> cliffsDeltaQ,
    "t_closeness" -> tClosenessQ,
    "rolling_median" -> rollingMedianQ,
    "chi2_drift" -> chi2DriftQ,
    "js_divergence" -> jsDivergenceQ,
    "mutual_information" -> mutualInformationQ,
    "mann_whitney" -> mannWhitneyQ,
    "autocorrelation" -> autocorrelationQ,
    "cusum_change" -> cusumChangeQ,
    "stream_cusum" -> streamCusumQ,
    "gini_concentration" -> giniConcentrationQ,
    "bottomk_sample" -> bottomkSampleQ,
    "benford_check" -> benfordCheckQ,
    "incremental_agg" -> incrementalAggQ,
    "term_shift" -> termShiftQ,
    "stream_agg_state" -> streamAggStateQ,
    "quantile_drift" -> quantileDriftQ,
    "embedding_drift" -> embeddingDriftQ,
    "weighted_sample" -> weightedSampleQ,
    "drift_report" -> driftReportQ,
    "data_expectations" -> dataExpectationsQ,
    "quarantine_split" -> quarantineSplitQ,
    "weighted_median" -> weightedMedianQ,
    "evolve_schema" -> evolveSchemaQ,
    "skew_report" -> skewReportQ,
    "dataset_drift" -> datasetDriftQ,
    "ks_drift" -> ksDriftQ,
    "stream_rolling_median" -> streamRollingMedianQ,
    "zarr_roundtrip" -> zarrRoundtripQ,
    "profile_table" -> profileTableQ,
    "iqr_outliers" -> iqrOutliersQ,
    "heavy_hitters" -> heavyHittersQ,
    "ewma_smooth" -> ewmaSmoothQ,
    "record_linkage" -> recordLinkageQ,
    "linkage_clusters" -> linkageClustersQ,
    "dataset_fingerprint" -> datasetFingerprintQ,
    "oov_rate" -> oovRateQ,
    "stream_ewma" -> streamEwmaQ)
}
