package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.functions.complex._

/** Driver-contract query surface (SURVEY.md §2): one entry per
  * implemented operator, each paired with the exact DuckDB SQL the
  * driver runs as the oracle on the same parquet tables.
  *
  * Numeric-parity rules used throughout (documented once here):
  *  - Row-wise arithmetic on the same parquet doubles is bit-exact
  *    across engines (identical IEEE ops) — no rounding.
  *  - Order-dependent reductions (sum/avg/stddev over doubles) carry
  *    ~n*eps relative noise; they are quantized with
  *    `floor(x*10^d + 0.5)/10^d` — the SAME primitive ops in both
  *    engines, unlike round() whose tie semantics differ (Spark
  *    HALF_UP on the shortest decimal repr vs DuckDB multiply+rint).
  *  - argmin/argmax tie-break deterministically on (value, position).
  *  - Integer aggregates (count, grouping sets) are exact; no rounding —
  *    but DuckDB's sum(INTEGER) returns HUGEINT (int128) while Spark's
  *    sum(int) is BIGINT, and the driver's hash is type-sensitive:
  *    every integer SUM in oracle SQL must CAST(... AS BIGINT)
  *    (count(*) is already BIGINT in both engines).
  *
  * The TPC-H-ish tables stand in for the reference's data model
  * (TESTDATA.md): lineitem = visibility fact table, l_linenumber-1 =
  * chan axis, l_shipdate = time axis, l_returnflag='R' = FLAG,
  * small tables = mxds "global" subtables.
  */
object Queries {

  final case class Q(fn: (SparkSession, String) => DataFrame, sql: String)

  /** floor(x*10^d + 0.5)/10^d — engine-portable quantization. */
  def qround(c: Column, d: Int): Column = {
    val s = math.pow(10, d)
    floor(c * lit(s) + lit(0.5)) / lit(s)
  }

  /** Scratch suffix for the I/O round-trip queries: unique PER SPARK
    * APPLICATION (applicationId) and per data dir, stable within the
    * process. Concurrent runs over the same data dir can no longer
    * race on one shared path (the old abs-of-hashCode hole — which
    * also mishandled Int.MinValue), while repeated invocations inside
    * one process (bench reps, plan sweeps) REUSE their path in
    * overwrite mode instead of leaking a fresh table copy per rep.
    * Alphanumeric-only so it is also valid inside a catalog table
    * name (bucketed_join).
    */
  private[graft] def scratchTag(s: SparkSession, d: String): String = {
    val app = s.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "")
    // local-mode applicationId is millisecond-resolution — two JVMs
    // launched in the same ms would collide; the OS pid disambiguates
    val pid = ProcessHandle.current().pid()
    s"${app}_p${pid}_${d.hashCode & 0x7fffffff}"
  }

  /** lineitem with the vis-fact derived columns used by most queries:
    * chan = 0-based channel axis, flag = the FLAG data variable.
    */
  private def li(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .withColumn("chan", (col("l_linenumber") - 1).cast("int"))
      .withColumn("flag", col("l_returnflag") === lit("R"))

  private val keyCols = Seq("l_orderkey", "l_linenumber")

  // ---------------------------------------------------------------- flags

  private val applyFlagsQ = Q(
    (s, d) => {
      val out = FlagOps.applyFlags(li(s, d), col("flag"),
        Seq("l_extendedprice", "l_quantity"))
      out.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
    },
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN NOT (l_returnflag = 'R') THEN l_extendedprice END AS l_extendedprice,
      |  CASE WHEN NOT (l_returnflag = 'R') THEN l_quantity END AS l_quantity
      |FROM lineitem""".stripMargin)

  private val autoClipQ = Q(
    (s, d) => FlagOps.autoClip(li(s, d), "flag", col("l_extendedprice"),
        clipMin = 1000.0, clipMax = 50000.0)
      .select("l_orderkey", "l_linenumber", "flag"),
    """SELECT l_orderkey, l_linenumber,
      |  (l_returnflag = 'R' OR l_extendedprice < 1000.0 OR l_extendedprice > 50000.0) AS flag
      |FROM lineitem""".stripMargin)

  private val manualFlagQ = Q(
    (s, d) => FlagOps.manualFlag(li(s, d), "flag", Seq(
        FlagOps.SelCmd(
          ranges = Map("l_quantity" -> (10, 20)),
          isin = Map("l_linestatus" -> Seq("F"))),
        FlagOps.SelCmd(isin = Map("l_returnflag" -> Seq("N")))))
      .select("l_orderkey", "l_linenumber", "flag"),
    """SELECT l_orderkey, l_linenumber,
      |  (l_returnflag = 'R'
      |   OR (l_quantity BETWEEN 10 AND 20 AND l_linestatus = 'F')
      |   OR l_returnflag = 'N') AS flag
      |FROM lineitem""".stripMargin)

  private val manualUnflagQ = Q(
    (s, d) => FlagOps.manualUnflag(li(s, d), "flag", Seq(
        FlagOps.SelCmd(ranges = Map("l_discount" -> (0.0, 0.03)))))
      .select("l_orderkey", "l_linenumber", "flag"),
    """SELECT l_orderkey, l_linenumber,
      |  (l_returnflag = 'R' AND NOT (l_discount BETWEEN 0.0 AND 0.03)) AS flag
      |FROM lineitem""".stripMargin)

  /** quack (the reference stubs it): flag rows within 30 days of their
    * scan's first or last timestamp; scan key = l_orderkey, time =
    * epoch days (integer — window min/max and comparisons exact).
    */
  private val quackFlagQ = Q(
    (s, d) => FlagOps.quack(
        li(s, d).withColumn("tday", unix_date(col("l_shipdate").cast("date")).cast("long")),
        "flag", Seq("l_orderkey"), "tday", widthNs = 30L, mode = "both")
      .select("l_orderkey", "l_linenumber", "flag"),
    """SELECT l_orderkey, l_linenumber,
      |  (l_returnflag = 'R'
      |   OR CAST(l_shipdate AS DATE) - DATE '1970-01-01'
      |      < min(CAST(l_shipdate AS DATE) - DATE '1970-01-01')
      |        OVER (PARTITION BY l_orderkey) + 30
      |   OR CAST(l_shipdate AS DATE) - DATE '1970-01-01'
      |      > max(CAST(l_shipdate AS DATE) - DATE '1970-01-01')
      |        OVER (PARTITION BY l_orderkey) - 30) AS flag
      |FROM lineitem""".stripMargin)

  /** extend (the reference stubs it): grow flags across the channel
    * axis — a cell is flagged when more than half of its 3-chan
    * neighborhood is flagged. Cells deduped to one per (key, chan)
    * first so the ROWS frame is deterministic.
    */
  private val extendFlagQ = Q(
    (s, d) => {
      val cells = li(s, d).groupBy("l_orderkey", "chan")
        .agg(expr("bool_or(flag)").as("flag"))
      FlagOps.extendFlags(cells, "flag", Seq("l_orderkey"), "chan",
          k = 1, threshold = 0.5)
        .select("l_orderkey", "chan", "flag")
    },
    """WITH cells AS (
      |  SELECT l_orderkey, l_linenumber - 1 AS chan,
      |    bool_or(l_returnflag = 'R') AS flag
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_orderkey, chan,
      |  (flag OR sum(CASE WHEN flag THEN 1.0 ELSE 0.0 END) OVER w
      |           / count(*) OVER w > 0.5) AS flag
      |FROM cells
      |WINDOW w AS (PARTITION BY l_orderkey ORDER BY chan
      |  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)""".stripMargin)

  /** shadow (the reference stubs it): projected baseline shorter than
    * the dish diameter. Row-wise IEEE math — bit-exact, no rounding.
    */
  private val shadowFlagQ = Q(
    (s, d) => FlagOps.shadow(
        li(s, d).withColumn("u", col("l_extendedprice") % 1000.0)
          .withColumn("v", col("l_quantity") * 20.0),
        "flag", col("u"), col("v"), dishDiameter = 100.0)
      .select("l_orderkey", "l_linenumber", "flag"),
    """SELECT l_orderkey, l_linenumber,
      |  (l_returnflag = 'R'
      |   OR (l_extendedprice % 1000.0) * (l_extendedprice % 1000.0)
      |      + (l_quantity * 20.0) * (l_quantity * 20.0) < 10000.0) AS flag
      |FROM lineitem""".stripMargin)

  /** elevation (the reference stubs it): sin(el) under sin(limit) at
    * the row's hour angle; constants emitted as %.17e literals so both
    * engines fold identical doubles.
    */
  private val elevationFlagQ = Q(
    (s, d) => FlagOps.elevationFlag(
        li(s, d).withColumn("ha",
          col("l_extendedprice") % 24.0 * (2 * math.Pi / 24) - math.Pi),
        "flag", col("ha"), latRad = 0.6, decRad = -0.2, limitRad = 0.3)
      .select("l_orderkey", "l_linenumber", "flag"),
    {
      def dl(x: Double) = f"$x%.17e"
      val a = math.sin(0.6) * math.sin(-0.2)
      val b = math.cos(0.6) * math.cos(-0.2)
      s"""SELECT l_orderkey, l_linenumber,
         |  (l_returnflag = 'R'
         |   OR ${dl(a)} + ${dl(b)} * cos(l_extendedprice % 24.0
         |        * ${dl(2 * math.Pi / 24)} - ${dl(math.Pi)})
         |      < ${dl(math.sin(0.3))}) AS flag
         |FROM lineitem""".stripMargin
    })

  /** auto_uvbin (the reference stubs it): radial-uv-bin amplitude
    * outliers. The per-bin threshold mean + 3*std is quantized to 1e-6
    * in both engines, so the flag decision compares identical doubles.
    */
  private val autoUvbinQ = Q(
    (s, d) => FlagOps.autoUvBin(
        li(s, d).withColumn("u", col("l_extendedprice") % 1000.0)
          .withColumn("v", col("l_quantity") * 20.0),
        "flag", col("u"), col("v"), amp = col("l_extendedprice"),
        binWidth = 100.0, nSigma = 2.0)
      .select("l_orderkey", "l_linenumber", "uvbin", "flag"),
    """WITH b AS (
      |  SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
      |    CAST(floor(sqrt((l_extendedprice % 1000.0) * (l_extendedprice % 1000.0)
      |      + (l_quantity * 20.0) * (l_quantity * 20.0)) / 100.0) AS BIGINT)
      |      AS uvbin
      |  FROM lineitem),
      |st AS (
      |  SELECT uvbin,
      |    floor((avg(l_extendedprice)
      |      + 2.0e0 * sqrt(greatest(0.0e0, avg(l_extendedprice * l_extendedprice)
      |                     - avg(l_extendedprice) * avg(l_extendedprice))))
      |      * 1000000.0 + 0.5) / 1000000.0 AS thr
      |  FROM b GROUP BY 1)
      |SELECT l_orderkey, l_linenumber, uvbin,
      |  (l_returnflag = 'R' OR l_extendedprice > thr) AS flag
      |FROM b JOIN st USING (uvbin)""".stripMargin)

  /** auto_rflag: hierarchical-MAD outlier flags. Medians are
    * order-insensitive, so Spark and DuckDB agree bit-for-bit and only
    * the final threshold needs the 1e-6 quantization.
    */
  private val autoRflagQ = Q(
    (s, d) => FlagOps.autoRflag(li(s, d), "flag",
        keyCols = Seq("l_suppkey"), chanCol = "chan",
        amp = col("l_extendedprice"), nSigma = 2.0)
      .select("l_orderkey", "l_linenumber", "flag"),
    """WITH v AS (
      |  SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag,
      |    CAST(l_linenumber - 1 AS INT) AS chan, l_extendedprice AS amp
      |  FROM lineitem),
      |med AS (SELECT l_suppkey, chan, median(amp) AS med
      |        FROM v GROUP BY 1, 2),
      |sig AS (
      |  SELECT v.l_suppkey, v.chan,
      |    median(abs(v.amp - med.med)) * 1.4826e0 AS sigma
      |  FROM v JOIN med USING (l_suppkey, chan) GROUP BY 1, 2),
      |cs AS (SELECT chan, median(sigma) AS chan_sigma FROM sig GROUP BY 1)
      |SELECT v.l_orderkey, v.l_linenumber,
      |  (v.l_returnflag = 'R' OR
      |   abs(v.amp - med.med) >
      |     floor(2.0e0 * greatest(sig.sigma, cs.chan_sigma) * 1000000.0 + 0.5)
      |       / 1000000.0) AS flag
      |FROM v JOIN med USING (l_suppkey, chan)
      |       JOIN sig USING (l_suppkey, chan)
      |       JOIN cs USING (chan)""".stripMargin)

  /** auto_tfcrop: quadratic bandpass fit + k-sigma crop. The power
    * sums ARE order-sensitive in their last ulps, so the operator
    * quantizes both the residual and the threshold (1e-4) before the
    * boolean comparison — mirrored exactly here.
    */
  private val autoTfcropQ = Q(
    (s, d) => FlagOps.autoTfcrop(li(s, d), "flag",
        keyCols = Seq("l_suppkey"), chanCol = "chan",
        amp = col("l_extendedprice"), nSigma = 2.0)
      .select("l_orderkey", "l_linenumber", "flag"),
    """WITH v AS (
      |  SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag,
      |    CAST(CAST(l_linenumber - 1 AS INT) AS DOUBLE) AS x,
      |    l_extendedprice AS y
      |  FROM lineitem),
      |sums AS (
      |  SELECT l_suppkey,
      |    CAST(count(*) AS DOUBLE) AS s0, sum(x) AS s1, sum(x*x) AS s2,
      |    sum(x*x*x) AS s3, sum(x*x*x*x) AS s4,
      |    sum(y) AS sy, sum(x*y) AS sxy, sum(x*x*y) AS sx2y
      |  FROM v GROUP BY 1),
      |cf AS (
      |  SELECT l_suppkey,
      |    (sy*(s2*s4-s3*s3) - s1*(sxy*s4-s3*sx2y) + s2*(sxy*s3-s2*sx2y))
      |      / (s0*(s2*s4-s3*s3) - s1*(s1*s4-s3*s2) + s2*(s1*s3-s2*s2)) AS ca,
      |    (s0*(sxy*s4-s3*sx2y) - sy*(s1*s4-s3*s2) + s2*(s1*sx2y-sxy*s2))
      |      / (s0*(s2*s4-s3*s3) - s1*(s1*s4-s3*s2) + s2*(s1*s3-s2*s2)) AS cb,
      |    (s0*(s2*sx2y-sxy*s3) - s1*(s1*sx2y-sxy*s2) + sy*(s1*s3-s2*s2))
      |      / (s0*(s2*s4-s3*s3) - s1*(s1*s4-s3*s2) + s2*(s1*s3-s2*s2)) AS cc
      |  FROM sums),
      |r AS (
      |  SELECT v.l_orderkey, v.l_linenumber, v.l_suppkey, v.l_returnflag,
      |    v.y - (cf.ca + cf.cb * v.x + cf.cc * v.x * v.x) AS resid
      |  FROM v JOIN cf USING (l_suppkey)),
      |sp AS (
      |  SELECT l_suppkey,
      |    sqrt(greatest(0.0e0, avg(resid * resid) - avg(resid) * avg(resid)))
      |      AS rsig
      |  FROM r GROUP BY 1)
      |SELECT r.l_orderkey, r.l_linenumber,
      |  (r.l_returnflag = 'R' OR
      |   floor(abs(r.resid) * 10000.0 + 0.5) / 10000.0 >
      |     floor(2.0e0 * sp.rsig * 10000.0 + 0.5) / 10000.0) AS flag
      |FROM r JOIN sp USING (l_suppkey)""".stripMargin)

  /** reframe: doppler-correct channel regridding with linear
    * interpolation; every arithmetic step is mirrored so the fractional
    * positions (and their floors) are bit-identical across engines.
    */
  private val reframeQ = Q(
    (s, d) => {
      val vis = li(s, d).withColumn("vel",
        (col("l_suppkey") % 50).cast("double") * lit(20000.0))
      AverageOps.reframe(vis, Seq("l_orderkey"), "chan",
          Seq("l_extendedprice"), "vel", f0 = 1.4e9, dfHz = 1e6)
        .select(col("l_orderkey"), col("l_linenumber"),
          qround(col("l_extendedprice_reframed"), 6).as("reframed"))
    },
    """WITH v AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(l_linenumber - 1 AS INT) AS chan, l_extendedprice,
      |    CAST(l_suppkey % 50 AS DOUBLE) * 20000.0 AS vel
      |  FROM lineitem),
      |b AS (
      |  SELECT *,
      |    CAST(floor(((1.4e9 + CAST(chan AS DOUBLE) * 1.0e6)
      |      / (1.0e0 - vel / 299792458.0e0) - 1.4e9) / 1.0e6) AS INT) AS c0,
      |    ((1.4e9 + CAST(chan AS DOUBLE) * 1.0e6)
      |      / (1.0e0 - vel / 299792458.0e0) - 1.4e9) / 1.0e6
      |      - CAST(floor(((1.4e9 + CAST(chan AS DOUBLE) * 1.0e6)
      |        / (1.0e0 - vel / 299792458.0e0) - 1.4e9) / 1.0e6) AS INT) AS w
      |  FROM v)
      |SELECT b.l_orderkey, b.l_linenumber,
      |  floor((CASE WHEN b.w = 0.0 THEN lo.l_extendedprice
      |         ELSE (1.0e0 - b.w) * lo.l_extendedprice
      |              + b.w * hi.l_extendedprice END)
      |    * 1000000.0 + 0.5) / 1000000.0 AS reframed
      |FROM b
      |LEFT JOIN v lo ON lo.l_orderkey = b.l_orderkey AND lo.chan = b.c0
      |LEFT JOIN v hi ON hi.l_orderkey = b.l_orderkey AND hi.chan = b.c0 + 1""".stripMargin)

  private val flagSummaryQ = Q(
    (s, d) => FlagOps.summary(li(s, d), col("flag"),
      Seq("l_returnflag", "l_linestatus")),
    // CAST: DuckDB sum(INTEGER) returns HUGEINT (int128); Spark emits
    // BIGINT — the driver hash is type-sensitive, so cast to int64.
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS flagged,
      |  count(*) AS total
      |FROM lineitem
      |GROUP BY GROUPING SETS ((), (l_returnflag), (l_linestatus))""".stripMargin)

  private val flagSummaryAntennaQ = Q(
    (s, d) => {
      val vis = li(s, d)
        .withColumn("antenna1", (col("l_orderkey") % 20).cast("int"))
        .withColumn("antenna2", (col("l_suppkey") % 20).cast("int"))
      FlagOps.summaryPerAntenna(vis, col("flag"), "antenna1", "antenna2")
    },
    """WITH legs AS (
      |  SELECT CAST(l_orderkey % 20 AS INT) AS antenna, l_returnflag = 'R' AS f FROM lineitem
      |  UNION ALL
      |  SELECT CAST(l_suppkey % 20 AS INT) AS antenna, l_returnflag = 'R' AS f FROM lineitem)
      |SELECT antenna, CAST(sum(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS flagged,
      |  count(*) AS total
      |FROM legs GROUP BY 1""".stripMargin)

  private val managerFlagsQ = Q(
    (s, d) => {
      val withBackup = FlagOps.managerAdd(li(s, d), "flag_backup", "flag")
      FlagOps.autoClip(withBackup, "flag", col("l_quantity"), 5.0, 45.0)
        .select("l_orderkey", "l_linenumber", "flag", "flag_backup")
    },
    """SELECT l_orderkey, l_linenumber,
      |  (l_returnflag = 'R' OR l_quantity < 5.0 OR l_quantity > 45.0) AS flag,
      |  (l_returnflag = 'R') AS flag_backup
      |FROM lineitem""".stripMargin)

  // ------------------------------------------------------------ averaging

  private val chanAverageQ = Q(
    (s, d) => {
      val out = AverageOps.chanAverage(li(s, d), "chan", width = 2,
        keys = Seq("l_returnflag"),
        weighted = Seq(AverageOps.Weighted("l_extendedprice", "l_quantity")),
        plain = Seq("l_discount"))
      out.select(col("l_returnflag"), col("chan"),
        qround(col("l_extendedprice"), 4).as("l_extendedprice"),
        qround(col("l_quantity"), 4).as("l_quantity"),
        qround(col("l_discount"), 6).as("l_discount"))
    },
    """WITH t AS (SELECT *, l_linenumber - 1 AS chan FROM lineitem
      |           WHERE l_linenumber - 1 < 6)
      |SELECT l_returnflag, CAST(floor(chan / 2.0) AS INT) AS chan,
      |  floor((sum(l_extendedprice * l_quantity) / sum(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS l_extendedprice,
      |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0 AS l_quantity,
      |  floor(avg(l_discount) * 1000000.0 + 0.5) / 1000000.0 AS l_discount
      |FROM t GROUP BY 1, 2""".stripMargin)

  private val timeAverageQ = Q(
    (s, d) => {
      val out = AverageOps.timeAverage(li(s, d), "l_shipdate", "7 days",
        keys = Seq("l_returnflag"), spanKeys = Nil,
        weighted = Seq(AverageOps.Weighted("l_extendedprice", "l_quantity")),
        plain = Seq("l_discount"))
      out.select(
        (unix_timestamp(col("time_bin.start")) / 604800).cast("long").as("time_bin_id"),
        col("l_returnflag"),
        qround(col("l_extendedprice"), 4).as("l_extendedprice"),
        qround(col("l_quantity"), 4).as("l_quantity"),
        qround(col("l_discount"), 6).as("l_discount"),
        col("n_rows"))
    },
    """SELECT CAST(floor(epoch(l_shipdate) / 604800.0) AS BIGINT) AS time_bin_id,
      |  l_returnflag,
      |  floor((sum(l_extendedprice * l_quantity) / sum(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS l_extendedprice,
      |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0 AS l_quantity,
      |  floor(avg(l_discount) * 1000000.0 + 0.5) / 1000000.0 AS l_discount,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY 1, 2""".stripMargin)

  private val timeAverageBinQ = Q(
    (s, d) => {
      val out = AverageOps.timeAverageBin(li(s, d), "l_shipdate", bin = 30,
        keys = Seq("l_returnflag"), spanKeys = Nil,
        weighted = Seq(AverageOps.Weighted("l_extendedprice", "l_quantity")))
      out.select(col("time_bin"), col("l_returnflag"),
        qround(col("l_extendedprice"), 4).as("l_extendedprice"),
        qround(col("l_quantity"), 4).as("l_quantity"),
        col("l_shipdate"))
    },
    """WITH idx AS (
      |  SELECT t, CAST(floor((row_number() OVER (ORDER BY t) - 1) / 30.0) AS INT) AS time_bin
      |  FROM (SELECT DISTINCT l_shipdate AS t FROM lineitem))
      |SELECT i.time_bin, l.l_returnflag,
      |  floor((sum(l.l_extendedprice * l.l_quantity) / sum(l.l_quantity)) * 10000.0 + 0.5) / 10000.0 AS l_extendedprice,
      |  floor(sum(l.l_quantity) * 10000.0 + 0.5) / 10000.0 AS l_quantity,
      |  min(l.l_shipdate) AS l_shipdate
      |FROM lineitem l JOIN idx i ON l.l_shipdate = i.t
      |GROUP BY 1, 2""".stripMargin)

  private val rebinQ = Q(
    (s, d) => {
      val out = AverageOps.rebin(li(s, d), "chan", factor = 3,
        keys = Seq("l_returnflag"), values = Seq("l_discount", "l_tax"))
      out.select(col("l_returnflag"), col("chan"),
        qround(col("l_discount"), 6).as("l_discount"),
        qround(col("l_tax"), 6).as("l_tax"))
    },
    """WITH t AS (SELECT *, l_linenumber - 1 AS chan FROM lineitem
      |           WHERE l_linenumber - 1 < 6)
      |SELECT l_returnflag, CAST(floor(chan / 3.0) AS INT) AS chan,
      |  floor(avg(l_discount) * 1000000.0 + 0.5) / 1000000.0 AS l_discount,
      |  floor(avg(l_tax) * 1000000.0 + 0.5) / 1000000.0 AS l_tax
      |FROM t GROUP BY 1, 2""".stripMargin)

  private val chanSmoothQ = Q(
    (s, d) => {
      // one cell per (key, chan), as in the reference's data model —
      // l_linenumber is NOT unique per order in the synthetic data
      val in = li(s, d).groupBy(col("l_orderkey"), col("chan"))
        .agg(avg(col("l_quantity")).as("l_quantity"))
      val out = AverageOps.chanSmooth(in, "chan", keys = Seq("l_orderkey"),
        values = Seq("l_quantity"), kernel = AverageOps.Kernels.boxcar(3))
      out.select(col("l_orderkey"), col("chan"),
        qround(col("l_quantity"), 6).as("l_quantity"))
    },
    """WITH t AS (SELECT l_orderkey, l_linenumber - 1 AS chan, avg(l_quantity) AS l_quantity
      |           FROM lineitem GROUP BY 1, 2)
      |SELECT l_orderkey, chan,
      |  CASE WHEN count(*) OVER w = 3
      |       THEN floor(((sum(l_quantity * (1.0/3.0)) OVER w) / (sum(1.0/3.0) OVER w)) * 1000000.0 + 0.5) / 1000000.0
      |  END AS l_quantity
      |FROM t
      |WINDOW w AS (PARTITION BY l_orderkey ORDER BY chan
      |             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)""".stripMargin)

  private val chanSmoothGaussianQ = Q(
    (s, d) => {
      val in = li(s, d).groupBy(col("l_orderkey"), col("chan"))
        .agg(avg(col("l_quantity")).as("l_quantity"))
      val out = AverageOps.chanSmooth(in, "chan", keys = Seq("l_orderkey"),
        values = Seq("l_quantity"),
        kernel = AverageOps.Kernels.gaussian(5, 1.5))
      out.select(col("l_orderkey"), col("chan"),
        qround(col("l_quantity"), 6).as("l_quantity"))
    }, {
      val k = AverageOps.Kernels.gaussian(5, 1.5)
      def fmt(x: Double) = "%.17e".format(x)
      // mirror the lead/lag weighted-dot shape: shifted terms, weights
      // zeroed where the tap is absent, null when fewer than 5 taps
      val shifts = (-2 to 2).map {
        case j if j < 0 => s"lag(l_quantity, ${-j}) OVER w"
        case 0 => "l_quantity"
        case j => s"lead(l_quantity, $j) OVER w"
      }
      val num = shifts.zipWithIndex.map { case (sh, i) =>
        s"CASE WHEN $sh IS NOT NULL THEN ${fmt(k(i))} * $sh ELSE 0.0 END"
      }.mkString(" + ")
      val den = shifts.zipWithIndex.map { case (sh, i) =>
        s"CASE WHEN $sh IS NOT NULL THEN ${fmt(k(i))} ELSE 0.0 END"
      }.mkString(" + ")
      val cnt = shifts.map(sh =>
        s"CASE WHEN $sh IS NOT NULL THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH t AS (SELECT l_orderkey, l_linenumber - 1 AS chan, avg(l_quantity) AS l_quantity
         |           FROM lineitem GROUP BY 1, 2)
         |SELECT l_orderkey, chan,
         |  CASE WHEN ($cnt) >= 5
         |       THEN floor((($num) / ($den)) * 1000000.0 + 0.5) / 1000000.0
         |  END AS l_quantity
         |FROM t
         |WINDOW w AS (PARTITION BY l_orderkey ORDER BY chan)""".stripMargin
    })

  // ------------------------------------------------------------ statistics

  private val statisticsQ = Q(
    (s, d) => {
      val out = StatsOps.statistics(li(s, d), "l_extendedprice",
        posCols = Seq("l_orderkey", "l_linenumber"))
      out.select(col("n"),
        qround(col("mean"), 4).as("mean"),
        qround(col("sigma"), 4).as("sigma"),
        qround(col("rms"), 4).as("rms"),
        col("min"), col("max"),
        qround(col("median"), 4).as("median"),
        qround(col("q1"), 4).as("q1"),
        qround(col("q3"), 4).as("q3"),
        qround(col("iqr"), 4).as("iqr"),
        qround(col("medabsdevmed"), 4).as("medabsdevmed"),
        col("minpos.l_orderkey").as("minpos_orderkey"),
        col("minpos.l_linenumber").as("minpos_linenumber"),
        col("maxpos.l_orderkey").as("maxpos_orderkey"),
        col("maxpos.l_linenumber").as("maxpos_linenumber"))
    },
    """WITH med AS (SELECT quantile_cont(l_extendedprice, 0.5) AS m FROM lineitem)
      |SELECT count(l_extendedprice) AS n,
      |  floor(avg(l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS mean,
      |  floor(stddev_samp(l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS sigma,
      |  floor(sqrt(avg(l_extendedprice * l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS rms,
      |  min(l_extendedprice) AS min, max(l_extendedprice) AS max,
      |  floor(quantile_cont(l_extendedprice, 0.5) * 10000.0 + 0.5) / 10000.0 AS median,
      |  floor(quantile_cont(l_extendedprice, 0.25) * 10000.0 + 0.5) / 10000.0 AS q1,
      |  floor(quantile_cont(l_extendedprice, 0.75) * 10000.0 + 0.5) / 10000.0 AS q3,
      |  floor((quantile_cont(l_extendedprice, 0.75) - quantile_cont(l_extendedprice, 0.25)) * 10000.0 + 0.5) / 10000.0 AS iqr,
      |  (SELECT floor(quantile_cont(abs(l.l_extendedprice - med.m), 0.5) * 10000.0 + 0.5) / 10000.0
      |     FROM lineitem l CROSS JOIN med) AS medabsdevmed,
      |  (SELECT l_orderkey FROM lineitem ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC LIMIT 1) AS minpos_orderkey,
      |  (SELECT l_linenumber FROM lineitem ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC LIMIT 1) AS minpos_linenumber,
      |  (SELECT l_orderkey FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC LIMIT 1) AS maxpos_orderkey,
      |  (SELECT l_linenumber FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC LIMIT 1) AS maxpos_linenumber
      |FROM lineitem""".stripMargin)

  private val momentsQ = Q(
    (s, d) => {
      val out = StatsOps.moments(li(s, d), keys = Seq("l_returnflag"),
        chanCol = "chan", intensity = "l_quantity")
      out.select(col("l_returnflag"),
        qround(col("mom_mean"), 6).as("mom_mean"),
        qround(col("mom_integrated"), 2).as("mom_integrated"),
        qround(col("mom_weighted_coord"), 6).as("mom_weighted_coord"),
        qround(col("mom_weighted_dispersion"), 6).as("mom_weighted_dispersion"),
        qround(col("mom_median"), 6).as("mom_median"),
        qround(col("mom_stddev"), 6).as("mom_stddev"),
        qround(col("mom_rms"), 6).as("mom_rms"),
        col("mom_max"), col("mom_min"),
        col("mom_max_coord"), col("mom_min_coord"),
        qround(col("mom_absmeandev"), 6).as("mom_absmeandev"))
    },
    """WITH t AS (SELECT l_returnflag, l_linenumber - 1 AS chan, l_quantity AS i
      |           FROM lineitem),
      |m AS (SELECT l_returnflag, avg(i) AS gmean FROM t GROUP BY 1)
      |SELECT t.l_returnflag,
      |  floor(avg(i) * 1000000.0 + 0.5) / 1000000.0 AS mom_mean,
      |  floor(sum(i) * 100.0 + 0.5) / 100.0 AS mom_integrated,
      |  floor((sum(i * chan) / sum(i)) * 1000000.0 + 0.5) / 1000000.0 AS mom_weighted_coord,
      |  floor(sqrt(sum(i * chan * chan) / sum(i) - (sum(i * chan) / sum(i)) * (sum(i * chan) / sum(i))) * 1000000.0 + 0.5) / 1000000.0 AS mom_weighted_dispersion,
      |  floor(quantile_cont(i, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS mom_median,
      |  floor(sqrt((sum(i * i) - sum(i) * sum(i) / count(i)) / (count(i) - 1)) * 1000000.0 + 0.5) / 1000000.0 AS mom_stddev,
      |  floor(sqrt(avg(i * i)) * 1000000.0 + 0.5) / 1000000.0 AS mom_rms,
      |  max(i) AS mom_max, min(i) AS mom_min,
      |  (array_agg(chan ORDER BY i DESC, chan DESC))[1] AS mom_max_coord,
      |  (array_agg(chan ORDER BY i ASC, chan ASC))[1] AS mom_min_coord,
      |  floor(avg(abs(i - m.gmean)) * 1000000.0 + 0.5) / 1000000.0 AS mom_absmeandev
      |FROM t JOIN m ON t.l_returnflag = m.l_returnflag
      |GROUP BY 1""".stripMargin)

  // ---------------------------------------------------------------- joins

  private def visHalves(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val base = li(s, d).select("l_orderkey", "chan", "l_quantity", "l_extendedprice")
    (base.where(col("chan") <= 3), base.where(col("chan") >= 3))
  }

  private val joinVisQ = Q(
    (s, d) => {
      val (a, b) = visHalves(s, d)
      JoinOps.joinVis(a, b, keys = Seq("l_orderkey", "chan"),
        values = Seq("l_quantity", "l_extendedprice"))
    },
    """WITH a AS (SELECT l_orderkey, l_linenumber - 1 AS chan, l_quantity, l_extendedprice
      |           FROM lineitem WHERE l_linenumber - 1 <= 3),
      |     b AS (SELECT l_orderkey, l_linenumber - 1 AS chan, l_quantity, l_extendedprice
      |           FROM lineitem WHERE l_linenumber - 1 >= 3)
      |SELECT COALESCE(a.l_orderkey, b.l_orderkey) AS l_orderkey,
      |       COALESCE(a.chan, b.chan) AS chan,
      |       COALESCE(a.l_quantity, b.l_quantity) AS l_quantity,
      |       COALESCE(a.l_extendedprice, b.l_extendedprice) AS l_extendedprice
      |FROM a FULL JOIN b ON a.l_orderkey = b.l_orderkey AND a.chan = b.chan""".stripMargin)

  private val joinConflictsQ = Q(
    (s, d) => {
      val (a, b0) = visHalves(s, d)
      // perturb overlap rows of b where quantity is odd -> known conflicts
      val b = b0.withColumn("l_quantity",
        when(col("l_quantity") % 2 === 1, col("l_quantity") + 1)
          .otherwise(col("l_quantity")))
      JoinOps.joinConflictsDF(a, b, keys = Seq("l_orderkey", "chan"),
        values = Seq("l_quantity", "l_extendedprice"))
    },
    """WITH a AS (SELECT l_orderkey, l_linenumber - 1 AS chan, l_quantity, l_extendedprice
      |           FROM lineitem WHERE l_linenumber - 1 <= 3),
      |     b AS (SELECT l_orderkey, l_linenumber - 1 AS chan,
      |                  CASE WHEN l_quantity % 2 = 1 THEN l_quantity + 1 ELSE l_quantity END AS l_quantity,
      |                  l_extendedprice
      |           FROM lineitem WHERE l_linenumber - 1 >= 3)
      |SELECT count(*) AS conflicts
      |FROM a JOIN b ON a.l_orderkey = b.l_orderkey AND a.chan = b.chan
      |WHERE (a.l_quantity IS NOT NULL AND b.l_quantity IS NOT NULL AND a.l_quantity <> b.l_quantity)
      |   OR (a.l_extendedprice IS NOT NULL AND b.l_extendedprice IS NOT NULL AND a.l_extendedprice <> b.l_extendedprice)""".stripMargin)

  private val splitDatasetQ = Q(
    (s, d) => JoinOps.semiJoinPrune(Tables.nation(s, d), Tables.customer(s, d),
      dimKey = "n_nationkey", factKey = "c_nationkey"),
    """SELECT n.* FROM nation n
      |WHERE n.n_nationkey IN (SELECT c_nationkey FROM customer)""".stripMargin)

  private val joinDatasetQ = Q(
    (s, d) => {
      val nation = Tables.nation(s, d)
      JoinOps.unionWithKeyRemap(nation, nation, "n_nationkey")._1
        .withColumn("n_nationkey", col("n_nationkey").cast("long"))
    },
    """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, n_regionkey FROM nation
      |UNION ALL
      |SELECT (SELECT CAST(max(n_nationkey) AS BIGINT) FROM nation)
      |         + dense_rank() OVER (ORDER BY n_nationkey) AS n_nationkey,
      |       n_name, n_regionkey FROM nation""".stripMargin)

  private val splitMxdsQ = Q(
    (s, d) => {
      // mxds-wide split: partitions per returnflag, supplier subtable
      // pruned to the suppliers referenced by the kept partition
      val li0 = Tables.lineitem(s, d)
      val parts = Seq("R", "A", "N").map(f =>
        s"xds_$f" -> li0.where(col("l_returnflag") === f)).toMap
      val m = Mxds(partitions = parts,
        subtables = Map("SUPPLIER" -> Tables.supplier(s, d)),
        subtableKeys = Map("SUPPLIER" -> (("s_suppkey", Seq("l_suppkey")))))
      m.split(Seq("xds_R")).subtables("SUPPLIER")
    },
    """SELECT s.* FROM supplier s
      |WHERE s.s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R')""".stripMargin)

  private val remapFactKeyQ = Q(
    (s, d) => {
      val nation = Tables.nation(s, d)
      val remap = JoinOps.unionWithKeyRemap(nation, nation, "n_nationkey")._2
      JoinOps.remapFactKey(
        Tables.customer(s, d).select("c_custkey", "c_nationkey"),
        "c_nationkey", remap)
    },
    """WITH remap AS (
      |  SELECT old_key,
      |         (SELECT CAST(max(n_nationkey) AS BIGINT) FROM nation)
      |           + dense_rank() OVER (ORDER BY old_key) AS new_key
      |  FROM (SELECT DISTINCT CAST(n_nationkey AS BIGINT) AS old_key FROM nation))
      |SELECT c.c_custkey, COALESCE(r.new_key, CAST(c.c_nationkey AS BIGINT)) AS c_nationkey
      |FROM customer c LEFT JOIN remap r ON c.c_nationkey = r.old_key""".stripMargin)

  // ------------------------------------------------------ scalar functions

  private val complexMathQ = Q(
    (s, d) => {
      val z = c(col("l_discount"), col("l_tax"))
      val w = c(col("l_quantity"), col("l_discount"))
      val zw = c_mul(z, c_conj(w))
      li(s, d).select(col("l_orderkey"), col("l_linenumber"),
        re(zw).as("zw_re"), im(zw).as("zw_im"),
        c_abs(z).as("z_abs"),
        qround(c_arg(z), 8).as("z_arg"))
    },
    """SELECT l_orderkey, l_linenumber,
      |  l_discount * l_quantity + l_tax * l_discount AS zw_re,
      |  l_tax * l_quantity - l_discount * l_discount AS zw_im,
      |  sqrt(l_discount * l_discount + l_tax * l_tax) AS z_abs,
      |  floor(atan2(l_tax, l_discount) * 100000000.0 + 0.5) / 100000000.0 AS z_arg
      |FROM lineitem""".stripMargin)

  // ------------------------------------------------------------ regression

  /** one cell per (series key, chan) — the vis-cube shape regression runs on */
  private def series(s: SparkSession, d: String): DataFrame =
    li(s, d).groupBy(col("l_orderkey"), col("chan"))
      .agg(avg(col("l_quantity")).as("y"))

  private val uvContFitQ = Q(
    (s, d) => {
      val fit = RegressionOps.uvContFit(series(s, d), Seq("l_orderkey"),
        "chan", source = "y", target = "contfit", fitorder = 1)
      fit.select(col("l_orderkey"), col("chan"),
        qround(col("contfit"), 6).as("contfit"))
    },
    """WITH t AS (SELECT l_orderkey, l_linenumber - 1 AS chan, avg(l_quantity) AS y
      |           FROM lineitem GROUP BY 1, 2),
      |f AS (SELECT l_orderkey, regr_slope(y, chan) AS b1, regr_intercept(y, chan) AS b0
      |      FROM t GROUP BY 1)
      |SELECT t.l_orderkey, t.chan,
      |  floor((f.b0 + f.b1 * t.chan) * 1000000.0 + 0.5) / 1000000.0 AS contfit
      |FROM t JOIN f ON t.l_orderkey = f.l_orderkey""".stripMargin)

  private val contSubQ = Q(
    (s, d) => {
      val out = RegressionOps.contSub(series(s, d), Seq("l_orderkey"), "chan",
        source = "y", lineName = "line", contName = "continuum", fitorder = 1)
      out.select(col("l_orderkey"), col("chan"),
        qround(col("line"), 6).as("line"),
        qround(col("continuum"), 6).as("continuum"))
    },
    """WITH t AS (SELECT l_orderkey, l_linenumber - 1 AS chan, avg(l_quantity) AS y
      |           FROM lineitem GROUP BY 1, 2),
      |f AS (SELECT l_orderkey, regr_slope(y, chan) AS b1, regr_intercept(y, chan) AS b0
      |      FROM t GROUP BY 1)
      |SELECT t.l_orderkey, t.chan,
      |  floor((f.b0 + f.b1 * t.chan) * 1000000.0 + 0.5) / 1000000.0 AS line,
      |  floor((t.y - (f.b0 + f.b1 * t.chan)) * 1000000.0 + 0.5) / 1000000.0 AS continuum
      |FROM t JOIN f ON t.l_orderkey = f.l_orderkey""".stripMargin)

  private val fitMetricsQ = Q(
    (s, d) => {
      val fit = RegressionOps.uvContFit(series(s, d), Seq("l_orderkey"),
        "chan", source = "y", target = "contfit", fitorder = 1)
      val m = RegressionOps.fitMetrics(fit, "chan", "y", "contfit")
      m.select(qround(col("rms_error"), 6).as("rms_error"),
        qround(col("min_abs_error"), 6).as("min_abs_error"),
        qround(col("max_abs_error"), 6).as("max_abs_error"))
    },
    """WITH t AS (SELECT l_orderkey, l_linenumber - 1 AS chan, avg(l_quantity) AS y
      |           FROM lineitem GROUP BY 1, 2),
      |f AS (SELECT l_orderkey, regr_slope(y, chan) AS b1, regr_intercept(y, chan) AS b0
      |      FROM t GROUP BY 1),
      |e AS (SELECT (f.b0 + f.b1 * t.chan) - t.y AS err
      |      FROM t JOIN f ON t.l_orderkey = f.l_orderkey)
      |SELECT floor(sqrt(avg(err * err)) * 1000000.0 + 0.5) / 1000000.0 AS rms_error,
      |  floor(min(abs(err)) * 1000000.0 + 0.5) / 1000000.0 AS min_abs_error,
      |  floor(max(abs(err)) * 1000000.0 + 0.5) / 1000000.0 AS max_abs_error
      |FROM e""".stripMargin)

  private val uvContFitComplexQ = Q(
    (s, d) => {
      // complex visibility: real/imag fitted as two independent
      // regressions sharing one pass (uv_cont_fit.py:75-79)
      val in = li(s, d).groupBy(col("l_orderkey"), col("chan"))
        .agg(avg(col("l_quantity")).as("re_"), avg(col("l_discount")).as("im_"))
      val fit = RegressionOps.polyFit(in, Seq("l_orderkey"), "chan",
        Seq("re_" -> "fit_re", "im_" -> "fit_im"), order = 1)
      fit.select(col("l_orderkey"), col("chan"),
        qround(col("fit_re"), 6).as("fit_re"),
        qround(col("fit_im"), 8).as("fit_im"))
    },
    """WITH t AS (SELECT l_orderkey, l_linenumber - 1 AS chan,
      |             avg(l_quantity) AS re_, avg(l_discount) AS im_
      |           FROM lineitem GROUP BY 1, 2),
      |f AS (SELECT l_orderkey,
      |        regr_slope(re_, chan) AS br, regr_intercept(re_, chan) AS ar,
      |        regr_slope(im_, chan) AS bi, regr_intercept(im_, chan) AS ai
      |      FROM t GROUP BY 1)
      |SELECT t.l_orderkey, t.chan,
      |  floor((f.ar + f.br * t.chan) * 1000000.0 + 0.5) / 1000000.0 AS fit_re,
      |  floor((f.ai + f.bi * t.chan) * 100000000.0 + 0.5) / 100000000.0 AS fit_im
      |FROM t JOIN f ON t.l_orderkey = f.l_orderkey""".stripMargin)

  // ----------------------------------------------------------------- image

  // shared fixture: 8x6 SIN-projected grid about (0.5, -0.3) rad
  private def skyGrid(s: SparkSession): DataFrame =
    ImageOps.makeEmptySkyImage(s, phaseCenter = (0.5, -0.3),
      imageSize = (8, 6), cellSize = (-0.001, 0.001),
      chans = Seq(1.0e9, 2.0e9), pols = Seq(1, 2))

  private val skyGridSql =
    """SELECT CAST(i // 6 AS INT) AS l_idx, CAST(i % 6 AS INT) AS m_idx,
      |  (CAST(i // 6 AS INT) - 4) * CAST(-0.001 AS DOUBLE) AS l,
      |  (CAST(i % 6 AS INT) - 3) * CAST(0.001 AS DOUBLE) AS m
      |FROM generate_series(0, 47) t(i)""".stripMargin

  private val makeEmptySkyImageQ = Q(
    (s, d) => skyGrid(s).select(
      col("l_idx"), col("m_idx"), col("l"), col("m"),
      qround(col("right_ascension"), 12).as("right_ascension"),
      qround(col("declination"), 12).as("declination"),
      col("chan"), col("chan_freq"), col("pol"), col("time")),
    s"""WITH px AS ($skyGridSql),
      |world AS (
      |  SELECT *,
      |    floor((0.5 + atan2(l, sqrt(1.0 - l*l - m*m) * cos(-0.3) - m * sin(-0.3))) * 1e12 + 0.5) / 1e12 AS right_ascension,
      |    floor(asin(m * cos(-0.3) + sqrt(1.0 - l*l - m*m) * sin(-0.3)) * 1e12 + 0.5) / 1e12 AS declination
      |  FROM px)
      |SELECT w.*, c.chan, c.chan_freq, p.pol, CAST(0.0 AS DOUBLE) AS time
      |FROM world w
      |CROSS JOIN (VALUES (0, CAST(1000000000.0 AS DOUBLE)), (1, CAST(2000000000.0 AS DOUBLE))) c(chan, chan_freq)
      |CROSS JOIN (VALUES (1), (2)) p(pol)""".stripMargin)

  private val maskRegionQ = Q(
    (s, d) => {
      val g = skyGrid(s)
      val masked = ImageOps.mask(g, "mask0",
        raRange = (0.4985, 0.5025), decRange = (-0.3025, -0.2985),
        lRange = (-0.0025, 0.0015), mRange = (-0.0015, 0.0025),
        pols = Seq(1), chans = Seq(0))
      val out = ImageOps.region(masked, "region0",
        raRange = (0.4985, 0.5025), decRange = (-0.3025, -0.2985),
        lRange = (-0.0025, 0.0015), mRange = (-0.0015, 0.0025),
        pols = Seq(1), chans = Seq(0))
      out.select("l_idx", "m_idx", "chan", "pol", "mask0", "region0")
    },
    s"""WITH px AS ($skyGridSql),
      |world AS (
      |  SELECT *,
      |    0.5 + atan2(l, sqrt(1.0 - l*l - m*m) * cos(-0.3) - m * sin(-0.3)) AS ra,
      |    asin(m * cos(-0.3) + sqrt(1.0 - l*l - m*m) * sin(-0.3)) AS dec
      |  FROM px),
      |g AS (SELECT w.*, c.chan, p.pol
      |      FROM world w
      |      CROSS JOIN (VALUES (0), (1)) c(chan) CROSS JOIN (VALUES (1), (2)) p(pol)),
      |b AS (SELECT *,
      |  (ra > 0.4985 AND ra < 0.5025 AND dec > -0.3025 AND dec < -0.2985) AS in_world,
      |  (l > -0.0025 AND l < 0.0015 AND m > -0.0015 AND m < 0.0025) AS in_pix
      |  FROM g)
      |SELECT l_idx, m_idx, chan, pol,
      |  (NOT in_world AND NOT in_pix AND pol <> 1 AND chan <> 0) AS mask0,
      |  ((in_world OR in_pix) AND pol = 1 AND chan = 0) AS region0
      |FROM b""".stripMargin)

  private val stokesToCorrQ = Q(
    (s, d) => {
      val stokes = li(s, d)
        .withColumn("pol", (col("chan") % 4 + 1).cast("int"))
        .groupBy(col("l_orderkey"), col("pol"))
        .agg(c(avg(col("l_quantity")), avg(col("l_discount"))).as("value"))
      val out = ImageOps.stokesToCorr(stokes, Seq("l_orderkey"), "pol", "value")
      out.select(col("l_orderkey"), col("pol"),
        qround(col("value.re"), 6).as("value_re"),
        qround(col("value.im"), 6).as("value_im"))
    },
    """WITH s AS (SELECT l_orderkey, ((l_linenumber - 1) % 4) + 1 AS pol,
      |             avg(l_quantity) AS re, avg(l_discount) AS im
      |           FROM lineitem GROUP BY 1, 2),
      |p AS (SELECT l_orderkey,
      |  max(CASE WHEN pol = 1 THEN re END) AS i_re, max(CASE WHEN pol = 1 THEN im END) AS i_im,
      |  max(CASE WHEN pol = 2 THEN re END) AS q_re, max(CASE WHEN pol = 2 THEN im END) AS q_im,
      |  max(CASE WHEN pol = 3 THEN re END) AS u_re, max(CASE WHEN pol = 3 THEN im END) AS u_im,
      |  max(CASE WHEN pol = 4 THEN re END) AS v_re, max(CASE WHEN pol = 4 THEN im END) AS v_im
      |  FROM s GROUP BY 1)
      |SELECT l_orderkey, 9 AS pol,
      |  floor((i_re + q_re) * 1000000.0 + 0.5) / 1000000.0 AS value_re,
      |  floor((i_im + q_im) * 1000000.0 + 0.5) / 1000000.0 AS value_im FROM p
      |UNION ALL SELECT l_orderkey, 10,
      |  floor((u_re - v_im) * 1000000.0 + 0.5) / 1000000.0,
      |  floor((u_im + v_re) * 1000000.0 + 0.5) / 1000000.0 FROM p
      |UNION ALL SELECT l_orderkey, 11,
      |  floor((u_re + v_im) * 1000000.0 + 0.5) / 1000000.0,
      |  floor((u_im - v_re) * 1000000.0 + 0.5) / 1000000.0 FROM p
      |UNION ALL SELECT l_orderkey, 12,
      |  floor((i_re - q_re) * 1000000.0 + 0.5) / 1000000.0,
      |  floor((i_im - q_im) * 1000000.0 + 0.5) / 1000000.0 FROM p""".stripMargin)

  /** corr→Stokes — the inverse of stokes_to_corr (same pivot + packed
    * projection shape, linear basis: I=(XX+YY)/2, Q=(XX-YY)/2,
    * U=(XY+YX)/2, V=(XY-YX)/2i), previously unit-tested but not
    * oracle-gated.
    */
  private val corrToStokesQ = Q(
    (s, d) => {
      val corr = li(s, d)
        .withColumn("pol", (col("chan") % 4 + 9).cast("int"))
        .groupBy(col("l_orderkey"), col("pol"))
        .agg(c(avg(col("l_quantity")), avg(col("l_discount"))).as("value"))
      val out = ImageOps.corrToStokes(corr, Seq("l_orderkey"), "pol", "value")
      out.select(col("l_orderkey"), col("pol"),
        qround(col("value.re"), 6).as("value_re"),
        qround(col("value.im"), 6).as("value_im"))
    },
    """WITH s AS (SELECT l_orderkey, ((l_linenumber - 1) % 4) + 9 AS pol,
      |             avg(l_quantity) AS re, avg(l_discount) AS im
      |           FROM lineitem GROUP BY 1, 2),
      |p AS (SELECT l_orderkey,
      |  max(CASE WHEN pol = 9 THEN re END) AS xx_re, max(CASE WHEN pol = 9 THEN im END) AS xx_im,
      |  max(CASE WHEN pol = 10 THEN re END) AS xy_re, max(CASE WHEN pol = 10 THEN im END) AS xy_im,
      |  max(CASE WHEN pol = 11 THEN re END) AS yx_re, max(CASE WHEN pol = 11 THEN im END) AS yx_im,
      |  max(CASE WHEN pol = 12 THEN re END) AS yy_re, max(CASE WHEN pol = 12 THEN im END) AS yy_im
      |  FROM s GROUP BY 1)
      |SELECT l_orderkey, 1 AS pol,
      |  floor((xx_re + yy_re) * 0.5 * 1000000.0 + 0.5) / 1000000.0 AS value_re,
      |  floor((xx_im + yy_im) * 0.5 * 1000000.0 + 0.5) / 1000000.0 AS value_im FROM p
      |UNION ALL SELECT l_orderkey, 2,
      |  floor((xx_re - yy_re) * 0.5 * 1000000.0 + 0.5) / 1000000.0,
      |  floor((xx_im - yy_im) * 0.5 * 1000000.0 + 0.5) / 1000000.0 FROM p
      |UNION ALL SELECT l_orderkey, 3,
      |  floor((xy_re + yx_re) * 0.5 * 1000000.0 + 0.5) / 1000000.0,
      |  floor((xy_im + yx_im) * 0.5 * 1000000.0 + 0.5) / 1000000.0 FROM p
      |UNION ALL SELECT l_orderkey, 4,
      |  floor((xy_im - yx_im) * 0.5 * 1000000.0 + 0.5) / 1000000.0,
      |  floor((yx_re - xy_re) * 0.5 * 1000000.0 + 0.5) / 1000000.0 FROM p""".stripMargin)

  private val decimateQ = Q(
    (s, d) => StatsOps.decimate(li(s, d), strides = Map("chan" -> 2),
      keys = Seq("l_returnflag"), values = Seq("l_quantity", "l_extendedprice")),
    """SELECT l_linenumber - 1 AS chan, l_returnflag,
      |  max(l_quantity) AS l_quantity, max(l_extendedprice) AS l_extendedprice
      |FROM lineitem WHERE (l_linenumber - 1) % 2 = 0
      |GROUP BY 1, 2""".stripMargin)

  /** visplot rasterization (cngi/vis/visplot.py:56-105): the full
    * point cloud reduced to a 64x64 density canvas — the distributed
    * part of the preview plot (PlotOps.visplotPng encodes this exact
    * table to PNG; PlotOpsSpec round-trips it losslessly). Pixel
    * binning and intensity are integer-exact; the only floats are the
    * identical (x-min)/(max-min) scalings in both engines.
    */
  private val visplotRenderQ = Q(
    (s, d) => operators.PlotOps.visplotPixels(
      li(s, d), "l_extendedprice", "l_quantity", width = 64, height = 64),
    """WITH b AS (
      |  SELECT min(l_extendedprice) AS xmin, max(l_extendedprice) AS xmax,
      |         min(l_quantity) AS ymin, max(l_quantity) AS ymax
      |  FROM lineitem)
      |SELECT
      |  CAST(CASE WHEN xmax > xmin
      |       THEN floor((l_extendedprice - xmin) / (xmax - xmin) * 63 + 0.5)
      |       ELSE 0.0 END AS INT) AS x_px,
      |  CAST(CASE WHEN ymax > ymin
      |       THEN floor((l_quantity - ymin) / (ymax - ymin) * 63 + 0.5)
      |       ELSE 0.0 END AS INT) AS y_px,
      |  count(*) AS n_points,
      |  CAST(255 - least(count(*), 255) AS INT) AS gray
      |FROM lineitem CROSS JOIN b
      |GROUP BY 1, 2""".stripMargin)

  /** implot rasterization (cngi/image/implot.py:20): collapse the
    * non-plotted dims with an order-free max (the reference's
    * collapse), normalize the plane to 8-bit gray. Raster here is the
    * events heatmap (hour-of-day x user bucket).
    */
  private val implotRenderQ = Q(
    (s, d) => operators.PlotOps.implotPixels(
      Tables.events(s, d)
        .select((expr("ts_ns div 1000000000") % 24)
            .cast("int").as("hour_px"),
          (col("user_id") % 16).cast("int").as("user_px"),
          col("value")),
      "hour_px", "user_px", "value"),
    """WITH plane AS (
      |  SELECT CAST((epoch_ns(ts) // 1000000000) % 24 AS INT) AS l_px,
      |         CAST(user_id % 16 AS INT) AS m_px,
      |         max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT min(v) AS vmin, max(v) AS vmax FROM plane)
      |SELECT l_px, m_px,
      |  CAST(CASE WHEN vmax > vmin
      |       THEN floor((v - vmin) / (vmax - vmin) * 255 + 0.5)
      |       ELSE 0.0 END AS INT) AS gray
      |FROM plane CROSS JOIN b""".stripMargin)

  // -------------------------------------------------------------- describe

  private val describeVisQ = Q(
    (s, d) => li(s, d).groupBy(col("l_returnflag").as("ddi"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("l_shipdate")).as("n_times"),
        countDistinct(col("l_orderkey")).as("n_baselines"),
        min(col("l_shipdate")).as("time_min"),
        max(col("l_shipdate")).as("time_max")),
    """SELECT l_returnflag AS ddi, count(*) AS n_rows,
      |  count(DISTINCT l_shipdate) AS n_times,
      |  count(DISTINCT l_orderkey) AS n_baselines,
      |  min(l_shipdate) AS time_min, max(l_shipdate) AS time_max
      |FROM lineitem GROUP BY 1""".stripMargin)

  // -------------------------------------------------------------------- io

  private val writeReadRoundtripQ = Q(
    (s, d) => {
      // write partitioned+zstd, read back with partition pruning, then
      // aggregate — matching the oracle run directly on the source table
      // proves the round trip is lossless.
      val path = s"/tmp/graft_roundtrip_${scratchTag(s, d)}"
      val cols = Seq("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_returnflag", "l_linestatus")
      sources.IoOps.writeVis(
        Tables.lineitem(s, d).select(cols.map(col): _*), path,
        partitionBy = Seq("l_returnflag"), repartitionTo = Some(4))
      val back = sources.IoOps.readVis(s, path,
        partitionFilter = Map("l_returnflag" -> Seq("R")))
      back.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          qround(sum(col("l_quantity")), 4).as("sum_qty"),
          qround(avg(col("l_extendedprice")), 4).as("avg_price"),
          min(col("l_orderkey")).as("min_okey"),
          max(col("l_orderkey")).as("max_okey"))
    },
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
      |  floor(avg(l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS avg_price,
      |  min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey
      |FROM lineitem WHERE l_returnflag = 'R'
      |GROUP BY 1, 2""".stripMargin)

  /** Lakehouse MERGE (IoOps.mergeUpsert): a change set carrying
    * updates (+100 qty for orderkey%10=0), deletes (%10=1) and inserts
    * (%10=2 re-keyed +3M) applied copy-on-write, then aggregated —
    * matching the oracle's replayed ANTI JOIN + union proves the merge
    * semantics row-for-row (quantities are integral, sums exact).
    */
  /** SCD Type-2 dimension versioning (IoOps.scd2Apply): the customer
    * dimension seeded as all-current at valid_from 0, then one change
    * batch — every 7th customer's balance moves by +100.00 (cents
    * kept as exact BIGINTs) and every 31st key arrives brand new —
    * closed/kept/new-version rows emitted per the SCD2 contract.
    */
  private val scd2ApplyQ = Q(
    (s, d) => {
      val cust = Tables.customer(s, d)
      val cur = cust.select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").as("bal"),
        lit(0L).as("valid_from"),
        lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current"))
      val ch = cust.where(col("c_custkey") % 7 === 0)
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
          (floor(col("c_acctbal") * 100 + lit(0.5)).cast("long")
            + 10000L).as("bal"), lit(86400L).as("ts"))
        .unionByName(cust.where(col("c_custkey") % 31 === 0)
          .select((col("c_custkey") + 1000000L).as("k"),
            lit("NEW").as("seg"), lit(0L).as("bal"),
            lit(86400L).as("ts")))
      sources.IoOps.scd2Apply(cur, ch, Seq("k"), Seq("seg", "bal"), "ts")
    },
    """WITH cur AS (
      |  SELECT c_custkey AS k, c_mktsegment AS seg,
      |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal,
      |    CAST(0 AS BIGINT) AS valid_from,
      |    CAST(NULL AS BIGINT) AS valid_to, true AS is_current
      |  FROM customer),
      |ch AS (
      |  SELECT c_custkey AS k, c_mktsegment AS seg,
      |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 10000 AS bal,
      |    CAST(86400 AS BIGINT) AS ts
      |  FROM customer WHERE c_custkey % 7 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 'NEW', CAST(0 AS BIGINT),
      |    CAST(86400 AS BIGINT)
      |  FROM customer WHERE c_custkey % 31 = 0),
      |j AS (
      |  SELECT cur.k AS k0, cur.seg, cur.bal, cur.valid_from,
      |    cur.valid_to, ch.k AS ck, ch.seg AS cseg, ch.bal AS cbal,
      |    ch.ts
      |  FROM cur FULL OUTER JOIN ch ON cur.k = ch.k),
      |closed AS (
      |  SELECT k0 AS k, seg, bal, valid_from,
      |    ts AS valid_to, false AS is_current
      |  FROM j WHERE k0 IS NOT NULL AND ck IS NOT NULL
      |    AND (seg IS DISTINCT FROM cseg OR bal IS DISTINCT FROM cbal)),
      |kept AS (
      |  SELECT k0 AS k, seg, bal, valid_from, valid_to,
      |    true AS is_current
      |  FROM j WHERE k0 IS NOT NULL AND (ck IS NULL
      |    OR (seg IS NOT DISTINCT FROM cseg
      |        AND bal IS NOT DISTINCT FROM cbal))),
      |fresh AS (
      |  SELECT ck AS k, cseg AS seg, cbal AS bal,
      |    ts AS valid_from, CAST(NULL AS BIGINT) AS valid_to,
      |    true AS is_current
      |  FROM j WHERE ck IS NOT NULL AND (k0 IS NULL
      |    OR (seg IS DISTINCT FROM cseg OR bal IS DISTINCT FROM cbal)))
      |SELECT * FROM closed UNION ALL SELECT * FROM kept
      |UNION ALL SELECT * FROM fresh""".stripMargin)

  /** Streaming twin of scd2_apply (StreamingOps.scd2ApplyStream): the
    * foreachBatch CDC loop applied to the SAME seeded dimension and
    * change batch as scd2_apply — one micro-batch through the
    * maintained-table state must be bit-equal to the batch operator
    * (identical code path by construction), so the oracle is shared.
    */
  private val streamScd2ApplyQ = Q(
    (s, d) => {
      val cust = Tables.customer(s, d)
      val cur = cust.select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").as("bal"),
        lit(0L).as("valid_from"),
        lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current"))
      val ch = cust.where(col("c_custkey") % 7 === 0)
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
          (floor(col("c_acctbal") * 100 + lit(0.5)).cast("long")
            + 10000L).as("bal"), lit(86400L).as("ts"))
        .unionByName(cust.where(col("c_custkey") % 31 === 0)
          .select((col("c_custkey") + 1000000L).as("k"),
            lit("NEW").as("seg"), lit(0L).as("bal"),
            lit(86400L).as("ts")))
      val st = streaming.StreamingOps.scd2ApplyStream(
        cur, Seq("k"), Seq("seg", "bal"), "ts")
      st(ch)
      st.snapshot
    },
    scd2ApplyQ.sql)

  /** Merge-on-read DELETE via deletion vectors (IoOps.buildDeleteVector
    * / applyDeleteVector): write a physical store, record a predicate
    * delete as (_metadata.file_path, _metadata.row_index) pairs — NO
    * data-file rewrite — then serve the read through the anti-join.
    * The oracle runs the plain complement predicate on the source
    * table, so a hash match proves the physical positions identify
    * exactly the predicate's rows through the write/scan round trip.
    */
  private val deleteVectorsQ = Q(
    (s, d) => {
      val path = s"/tmp/graft_mor_${scratchTag(s, d)}"
      val cols = Seq("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_returnflag", "l_linestatus")
      sources.IoOps.writeVis(
        Tables.lineitem(s, d).select(cols.map(col): _*), path,
        repartitionTo = Some(4))
      val lin = sources.IoOps.readWithLineage(s, path)
      val dv = sources.IoOps.buildDeleteVector(lin,
        col("l_quantity") < 5 || col("l_orderkey") % 97 === 0)
      sources.IoOps.applyDeleteVector(lin, dv)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          qround(sum(col("l_quantity")), 4).as("sum_qty"),
          qround(sum(col("l_extendedprice")), 4).as("sum_price"),
          min(col("l_orderkey")).as("min_okey"),
          max(col("l_orderkey")).as("max_okey"))
    },
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
      |  floor(sum(l_extendedprice) * 10000.0 + 0.5) / 10000.0
      |    AS sum_price,
      |  min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey
      |FROM lineitem
      |WHERE NOT (l_quantity < 5 OR l_orderkey % 97 = 0)
      |GROUP BY 1, 2""".stripMargin)

  /** Per-file Bloom data-skipping point lookup (IoOps.bloomIndex /
    * bloomSkipRead): a range-laid-out physical store, a per-file
    * Bloom occupancy index built in one scan, and a multi-key point
    * lookup that reads ONLY the qualifying files before the exact
    * re-filter. The oracle runs the plain IN-list on the source
    * table, so a hash match proves no false negative survived the
    * write → index → prune → scan chain (false positives are
    * re-filtered away by construction). 40001 is a key the generator
    * never mints — its legs must vanish from both sides.
    */
  private val bloomSkipQ = Q(
    (s, d) => {
      val path = s"/tmp/graft_bloom_${scratchTag(s, d)}"
      val keys = Seq(1L, 7L, 68L, 4000L, 40001L)
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .repartitionByRange(16, col("l_orderkey"))
        .write.mode("overwrite").option("compression", "zstd")
        .parquet(path)
      val idx = sources.IoOps.bloomIndex(s, path, "l_orderkey")
      sources.IoOps.bloomSkipRead(s, path, idx, "l_orderkey", keys)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"),
          qround(sum(col("l_quantity")), 4).as("sum_qty"),
          qround(sum(col("l_extendedprice")), 4).as("sum_price"))
    },
    """SELECT l_orderkey, count(*) AS n,
      |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
      |  floor(sum(l_extendedprice) * 10000.0 + 0.5) / 10000.0
      |    AS sum_price
      |FROM lineitem
      |WHERE l_orderkey IN (1, 7, 68, 4000, 40001)
      |GROUP BY 1""".stripMargin)

  /** Streaming twin of bloom_skip's index build
    * (StreamingOps.bloomIndexStream): the store's (key, file) rows
    * arrive as two micro-batches split by file hash; the maintained
    * per-file position-SET state merges by set-union — a commutative
    * idempotent monoid, so any batch order lands on the one-scan
    * index. The point lookup through the streamed index shares
    * bloom_skip's oracle.
    */
  private val streamBloomIndexQ = Q(
    (s, d) => {
      val path = s"/tmp/graft_bloomst_${scratchTag(s, d)}"
      val keys = Seq(1L, 7L, 68L, 4000L, 40001L)
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .repartitionByRange(16, col("l_orderkey"))
        .write.mode("overwrite").option("compression", "zstd")
        .parquet(path)
      val rows = s.read.parquet(path)
        .select(col("l_orderkey"), col("_metadata.file_path").as("_file"))
      val st = streaming.StreamingOps.bloomIndexStream(
        "l_orderkey", "_file")
      st(rows.where(pmod(hash(col("_file")), lit(2)) === 0))
      st(rows.where(pmod(hash(col("_file")), lit(2)) === 1))
      sources.IoOps.bloomSkipRead(s, path, st.snapshot, "l_orderkey",
          keys)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"),
          qround(sum(col("l_quantity")), 4).as("sum_qty"),
          qround(sum(col("l_extendedprice")), 4).as("sum_price"))
    },
    bloomSkipQ.sql)

  /** Unified snapshot manifest read (IoOps.commitManifest /
    * manifestRead): the zone-map, Bloom-membership, and deletion-
    * vector legs committed together as ONE `v=`-partitioned manifest,
    * and the read planned from one manifest scan — range pruning on
    * the range-laid-out l_orderkey zones, membership pruning through
    * the per-file Bloom, exact re-filter, and the DVs the manifest
    * points at applied. The oracle runs the equivalent predicates on
    * the source table, so a hash match proves the whole
    * commit -> plan -> pruned-scan -> MOR chain is lossless (40001 is
    * never minted; the DV hides every l_quantity < 5 row).
    */
  private val manifestReadQ = Q(
    (s, d) => {
      val tag = scratchTag(s, d)
      val path = s"/tmp/graft_man_$tag"
      val dvRoot = s"/tmp/graft_man_dv_$tag"
      val manRoot = s"/tmp/graft_man_m_$tag"
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .repartitionByRange(16, col("l_orderkey"))
        .write.mode("overwrite").option("compression", "zstd")
        .parquet(path)
      val lin = sources.IoOps.readWithLineage(s, path)
      sources.IoOps.commitDeleteVector(
        sources.IoOps.buildDeleteVector(lin, col("l_quantity") < 5),
        dvRoot, version = 1)
      sources.IoOps.commitManifest(s, path, manRoot, version = 1,
        keyCol = "l_orderkey",
        statsCols = Seq("l_orderkey", "l_quantity"), dvVersion = 1)
      sources.IoOps.manifestRead(s, path, manRoot, version = 1,
          dvRoot = Some(dvRoot), keyCol = "l_orderkey",
          keys = Seq(1L, 7L, 68L, 4000L, 40001L),
          ranges = Seq(("l_orderkey", 1.0, 5000.0)))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"),
          qround(sum(col("l_quantity")), 4).as("sum_qty"),
          qround(sum(col("l_extendedprice")), 4).as("sum_price"))
    },
    """SELECT l_orderkey, count(*) AS n,
      |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
      |  floor(sum(l_extendedprice) * 10000.0 + 0.5) / 10000.0
      |    AS sum_price
      |FROM lineitem
      |WHERE l_orderkey IN (1, 7, 68, 4000, 40001)
      |  AND l_orderkey BETWEEN 1 AND 5000
      |  AND NOT (l_quantity < 5)
      |GROUP BY 1""".stripMargin)

  /** Streaming twin of manifest_read's build
    * (StreamingOps.manifestStream): the store's rows arrive as two
    * micro-batches sliced BY ROW (odd/even line numbers — finer than
    * file-grouped slicing), and the maintained per-file manifest
    * merges n_rows by +, zones by min/max, bloom by set union — all
    * commutative, the zone/bloom legs idempotent — so any slicing
    * lands on the one-scan commitManifest result. The snapshot serves
    * the SAME planned read (manifestReadWith) as the batch gate, so
    * the oracle is shared with manifest_read.
    */
  private val streamManifestQ = Q(
    (s, d) => {
      val tag = scratchTag(s, d)
      val path = s"/tmp/graft_manst_$tag"
      val dvRoot = s"/tmp/graft_manst_dv_$tag"
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .repartitionByRange(16, col("l_orderkey"))
        .write.mode("overwrite").option("compression", "zstd")
        .parquet(path)
      val lin = sources.IoOps.readWithLineage(s, path)
      sources.IoOps.commitDeleteVector(
        sources.IoOps.buildDeleteVector(lin, col("l_quantity") < 5),
        dvRoot, version = 1)
      val rows = s.read.parquet(path)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("_metadata.file_path").as("_file"))
      val st = streaming.StreamingOps.manifestStream("l_orderkey",
        Seq("l_orderkey", "l_quantity"))
      st(rows.where(col("l_linenumber") % 2 === 0))
      st(rows.where(col("l_linenumber") % 2 === 1))
      sources.IoOps.manifestReadWith(s, path, st.snapshot, dvV = 1,
          dvRoot = Some(dvRoot), keyCol = "l_orderkey",
          keys = Seq(1L, 7L, 68L, 4000L, 40001L),
          ranges = Seq(("l_orderkey", 1.0, 5000.0)))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"),
          qround(sum(col("l_quantity")), 4).as("sum_qty"),
          qround(sum(col("l_extendedprice")), 4).as("sum_price"))
    },
    manifestReadQ.sql)

  /** Snapshot time travel over versioned deletion vectors
    * (IoOps.commitDeleteVector / readAsOf): two delete commits land as
    * v=1 and v=2 partitions of the DV store; reading AS OF versions
    * 0/1/2 subtracts the pruned cumulative union. The per-version
    * aggregates must match the oracle's cumulative complement
    * predicates — including the overlap between the two commits, which
    * the idempotent anti-join must not double-drop.
    */
  private val timeTravelQ = Q(
    (s, d) => {
      val tag = scratchTag(s, d)
      val path = s"/tmp/graft_tt_$tag"
      val dvRoot = s"/tmp/graft_tt_dv_$tag"
      val cols = Seq("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_returnflag")
      sources.IoOps.writeVis(
        Tables.lineitem(s, d).select(cols.map(col): _*), path,
        repartitionTo = Some(4))
      val lin = sources.IoOps.readWithLineage(s, path)
      sources.IoOps.commitDeleteVector(
        sources.IoOps.buildDeleteVector(lin, col("l_quantity") < 3),
        dvRoot, version = 1)
      sources.IoOps.commitDeleteVector(
        sources.IoOps.buildDeleteVector(lin,
          col("l_returnflag") === "A" || col("l_quantity") < 4),
        dvRoot, version = 2)
      Seq(0, 1, 2).map { v =>
        sources.IoOps.readAsOf(s, path, dvRoot, v)
          .agg(count(lit(1)).as("n"),
            qround(sum(col("l_quantity")), 4).as("sum_qty"),
            qround(sum(col("l_extendedprice")), 4).as("sum_price"))
          .select(lit(v).as("v"), col("n"), col("sum_qty"),
            col("sum_price"))
      }.reduce(_ unionByName _)
    },
    """SELECT 0 AS v, count(*) AS n,
      |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
      |  floor(sum(l_extendedprice) * 10000.0 + 0.5) / 10000.0
      |    AS sum_price
      |FROM lineitem
      |UNION ALL
      |SELECT 1, count(*),
      |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0,
      |  floor(sum(l_extendedprice) * 10000.0 + 0.5) / 10000.0
      |FROM lineitem WHERE NOT (l_quantity < 3)
      |UNION ALL
      |SELECT 2, count(*),
      |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0,
      |  floor(sum(l_extendedprice) * 10000.0 + 0.5) / 10000.0
      |FROM lineitem
      |WHERE NOT (l_quantity < 3 OR l_returnflag = 'A'
      |  OR l_quantity < 4)""".stripMargin)

  private val mergeUpsertQ = Q(
    (s, d) => {
      val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag",
        "l_quantity")
      val t = li(s, d).select(cols.map(col): _*)
      val changes = li(s, d).where(col("l_orderkey") % 10 <= 2)
        .select(
          when(col("l_orderkey") % 10 === 2,
            col("l_orderkey") + 3000000L).otherwise(col("l_orderkey"))
            .as("l_orderkey"),
          col("l_linenumber"), col("l_returnflag"),
          when(col("l_orderkey") % 10 === 0, col("l_quantity") + 100)
            .otherwise(col("l_quantity")).as("l_quantity"),
          (col("l_orderkey") % 10 === 1).as("_del"))
      sources.IoOps.mergeUpsert(t, changes,
          Seq("l_orderkey", "l_linenumber"), deleteCol = Some("_del"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          qround(sum(col("l_quantity")), 4).as("sum_qty"),
          min(col("l_orderkey")).as("min_okey"),
          max(col("l_orderkey")).as("max_okey"))
    },
    """WITH chg AS (
      |  SELECT CASE WHEN l_orderkey % 10 = 2 THEN l_orderkey + 3000000
      |              ELSE l_orderkey END AS l_orderkey,
      |    l_linenumber, l_returnflag,
      |    CASE WHEN l_orderkey % 10 = 0 THEN l_quantity + 100
      |         ELSE l_quantity END AS l_quantity,
      |    (l_orderkey % 10 = 1) AS _del
      |  FROM lineitem WHERE l_orderkey % 10 <= 2),
      |kept AS (
      |  SELECT t.l_orderkey, t.l_linenumber, t.l_returnflag, t.l_quantity
      |  FROM lineitem t ANTI JOIN chg c
      |    ON t.l_orderkey = c.l_orderkey
      |   AND t.l_linenumber = c.l_linenumber),
      |merged AS (
      |  SELECT * FROM kept
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
      |  FROM chg WHERE NOT _del)
      |SELECT l_returnflag, count(*) AS n,
      |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
      |  min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey
      |FROM merged GROUP BY 1""".stripMargin)

  /** Streaming twin of merge_upsert (StreamingOps.mergeUpsertStream):
    * the foreachBatch COW loop applied to the SAME target and change
    * set as merge_upsert, the changes split into two KEY-DISJOINT
    * micro-batches (hash of the change's final key) — sequential
    * applies of key-disjoint batches compose to the one-shot MERGE
    * (each batch's anti-join only ever removes its own keys), so the
    * oracle is shared with the batch operator.
    */
  private val streamMergeUpsertQ = Q(
    (s, d) => {
      val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag",
        "l_quantity")
      val t = li(s, d).select(cols.map(col): _*)
      val changes = li(s, d).where(col("l_orderkey") % 10 <= 2)
        .select(
          when(col("l_orderkey") % 10 === 2,
            col("l_orderkey") + 3000000L).otherwise(col("l_orderkey"))
            .as("l_orderkey"),
          col("l_linenumber"), col("l_returnflag"),
          when(col("l_orderkey") % 10 === 0, col("l_quantity") + 100)
            .otherwise(col("l_quantity")).as("l_quantity"),
          (col("l_orderkey") % 10 === 1).as("_del"))
      val st = streaming.StreamingOps.mergeUpsertStream(t,
        Seq("l_orderkey", "l_linenumber"), deleteCol = Some("_del"))
      st(changes.where(pmod(hash(col("l_orderkey")), lit(2)) === 0))
      st(changes.where(pmod(hash(col("l_orderkey")), lit(2)) === 1))
      st.snapshot
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          qround(sum(col("l_quantity")), 4).as("sum_qty"),
          min(col("l_orderkey")).as("min_okey"),
          max(col("l_orderkey")).as("max_okey"))
    },
    mergeUpsertQ.sql)

  /** Lakehouse composition end to end: the COW MERGE (same change set
    * as merge_upsert) materializes a physical store, a merge-on-read
    * DV delete lands on THAT store without rewriting it, and the
    * snapshot read serves the final table — copy-on-write and
    * merge-on-read composing on one table, which is how a real
    * lakehouse alternates big rewrites with cheap deletes. The oracle
    * replays the merge relationally and applies the delete as the
    * complement predicate.
    */
  private val lakehousePipelineQ = Q(
    (s, d) => {
      val tag = scratchTag(s, d)
      val path = s"/tmp/graft_lake_$tag"
      val dvRoot = s"/tmp/graft_lake_dv_$tag"
      val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag",
        "l_quantity")
      val t0 = Tables.lineitem(s, d).select(cols.map(col): _*)
      val changes = Tables.lineitem(s, d)
        .where(col("l_orderkey") % 10 <= 2)
        .select(
          when(col("l_orderkey") % 10 === 2,
            col("l_orderkey") + 3000000L)
            .otherwise(col("l_orderkey")).as("l_orderkey"),
          col("l_linenumber"), col("l_returnflag"),
          when(col("l_orderkey") % 10 === 0, col("l_quantity") + 100)
            .otherwise(col("l_quantity")).as("l_quantity"),
          (col("l_orderkey") % 10 === 1).as("_del"))
      val merged = sources.IoOps.mergeUpsert(t0, changes,
        Seq("l_orderkey", "l_linenumber"), deleteCol = Some("_del"))
      sources.IoOps.writeVis(merged, path, repartitionTo = Some(4))
      val lin = sources.IoOps.readWithLineage(s, path)
      sources.IoOps.commitDeleteVector(
        sources.IoOps.buildDeleteVector(lin,
          col("l_returnflag") === "R" && col("l_quantity") < 10),
        dvRoot, version = 1)
      sources.IoOps.readAsOf(s, path, dvRoot, 1)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          qround(sum(col("l_quantity")), 4).as("sum_qty"),
          min(col("l_orderkey")).as("min_okey"),
          max(col("l_orderkey")).as("max_okey"))
    },
    """WITH chg AS (
      |  SELECT CASE WHEN l_orderkey % 10 = 2 THEN l_orderkey + 3000000
      |              ELSE l_orderkey END AS l_orderkey,
      |    l_linenumber, l_returnflag,
      |    CASE WHEN l_orderkey % 10 = 0 THEN l_quantity + 100
      |         ELSE l_quantity END AS l_quantity,
      |    (l_orderkey % 10 = 1) AS _del
      |  FROM lineitem WHERE l_orderkey % 10 <= 2),
      |kept AS (
      |  SELECT t.l_orderkey, t.l_linenumber, t.l_returnflag, t.l_quantity
      |  FROM lineitem t ANTI JOIN chg c
      |    ON t.l_orderkey = c.l_orderkey
      |   AND t.l_linenumber = c.l_linenumber),
      |merged AS (
      |  SELECT * FROM kept
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
      |  FROM chg WHERE NOT _del),
      |alive AS (
      |  SELECT * FROM merged
      |  WHERE NOT (l_returnflag = 'R' AND l_quantity < 10))
      |SELECT l_returnflag, count(*) AS n,
      |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
      |  min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey
      |FROM alive GROUP BY 1""".stripMargin)

  /** Lakehouse OPTIMIZE composition: the maintenance rhythm that
    * bounds read amplification — a store accumulates a deletion
    * vector (MOR), then OPTIMIZE materializes the MOR view COMPACTED
    * (16 range files -> 4, clustering preserved via
    * repartitionByRange so zone maps stay useful), resets the DV
    * store, and commits a FRESH manifest (dv_v = 0) over the new
    * files; the planned read then serves the same rows with no
    * anti-join and no dead bytes. Every leg is an already-proven
    * operator (commitDeleteVector, readAsOf, commitManifest,
    * manifestRead) — this gate proves the composition, sharing
    * manifest_read's oracle.
    */
  private val optimizePipelineQ = Q(
    (s, d) => {
      val tag = scratchTag(s, d)
      val path = s"/tmp/graft_opt_$tag"
      val dvRoot = s"/tmp/graft_opt_dv_$tag"
      val path2 = s"/tmp/graft_opt_c_$tag"
      val manRoot2 = s"/tmp/graft_opt_m2_$tag"
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .repartitionByRange(16, col("l_orderkey"))
        .write.mode("overwrite").option("compression", "zstd")
        .parquet(path)
      val lin = sources.IoOps.readWithLineage(s, path)
      sources.IoOps.commitDeleteVector(
        sources.IoOps.buildDeleteVector(lin, col("l_quantity") < 5),
        dvRoot, version = 1)
      // OPTIMIZE: compact the MOR view, keep the range clustering
      sources.IoOps.writeVis(
        sources.IoOps.readAsOf(s, path, dvRoot, 1)
          .repartitionByRange(4, col("l_orderkey")), path2)
      sources.IoOps.commitManifest(s, path2, manRoot2, version = 2,
        keyCol = "l_orderkey",
        statsCols = Seq("l_orderkey", "l_quantity"), dvVersion = 0)
      sources.IoOps.manifestRead(s, path2, manRoot2, version = 2,
          dvRoot = None, keyCol = "l_orderkey",
          keys = Seq(1L, 7L, 68L, 4000L, 40001L),
          ranges = Seq(("l_orderkey", 1.0, 5000.0)))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"),
          qround(sum(col("l_quantity")), 4).as("sum_qty"),
          qround(sum(col("l_extendedprice")), 4).as("sum_price"))
    },
    manifestReadQ.sql)

  /** Salted skew join (JoinOps.saltedJoin): result must be
    * row-identical to the plain lineitem x part join — the salt only
    * moves rows between reducers, never changes the relation.
    */
  private val saltedJoinQ2 = Q(
    (s, d) => {
      val big = li(s, d).select(col("l_partkey").as("p_partkey"),
        col("l_quantity"))
      val dim = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
      operators.JoinOps.saltedJoin(big, dim, Seq("p_partkey"), salts = 8)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          qround(sum(col("l_quantity")), 4).as("sum_qty"))
    },
    """SELECT p_brand, count(*) AS n,
      |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0 AS sum_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1""".stripMargin)

  private val zorderLayoutQ = Q(
    (s, d) => {
      // Z-ordered rewrite on (l_extendedprice, l_quantity), read back
      // through a 2-d range predicate, then aggregate — matching the
      // oracle on the source table proves the layout op is lossless.
      // The predicate's real payoff (file/row-group skipping via the
      // clustered footer min/max stats) is asserted by ZorderSpec.
      val path = s"/tmp/graft_zorder_${scratchTag(s, d)}"
      sources.IoOps.writeZordered(Tables.lineitem(s, d), path,
        Seq("l_extendedprice", "l_quantity"), numFiles = 8)
      s.read.parquet(path)
        .where(col("l_extendedprice").between(20000, 40000) &&
          col("l_quantity").between(10, 20))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          qround(sum(col("l_quantity")), 4).as("sum_qty"),
          qround(sum(col("l_extendedprice")), 2).as("sum_price"),
          min(col("l_orderkey")).as("min_okey"),
          max(col("l_orderkey")).as("max_okey"))
    },
    """SELECT l_returnflag, count(*) AS n,
      |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
      |  floor(sum(l_extendedprice) * 100.0 + 0.5) / 100.0 AS sum_price,
      |  min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey
      |FROM lineitem
      |WHERE l_extendedprice BETWEEN 20000 AND 40000
      |  AND l_quantity BETWEEN 10 AND 20
      |GROUP BY 1""".stripMargin)

  private val hilbertLayoutQ = Q(
    (s, d) => {
      // Hilbert-clustered rewrite on (l_extendedprice, l_quantity),
      // read back through a 2-d range predicate, then aggregate —
      // the oracle on the source table proves the layout rewrite is
      // lossless (same contract as zorder_layout; the curve-quality
      // delta vs Morton is asserted by ZorderSpec's bounding-box
      // comparison, not here).
      val path = s"/tmp/graft_hilbert_${scratchTag(s, d)}"
      sources.IoOps.writeHilberted(Tables.lineitem(s, d), path,
        "l_extendedprice", "l_quantity", numFiles = 8)
      s.read.parquet(path)
        .where(col("l_extendedprice").between(50000, 70000) &&
          col("l_quantity").between(30, 40))
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"),
          qround(sum(col("l_quantity")), 4).as("sum_qty"),
          qround(sum(col("l_extendedprice")), 2).as("sum_price"),
          min(col("l_orderkey")).as("min_okey"),
          max(col("l_orderkey")).as("max_okey"))
    },
    """SELECT l_linestatus, count(*) AS n,
      |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
      |  floor(sum(l_extendedprice) * 100.0 + 0.5) / 100.0 AS sum_price,
      |  min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey
      |FROM lineitem
      |WHERE l_extendedprice BETWEEN 50000 AND 70000
      |  AND l_quantity BETWEEN 30 AND 40
      |GROUP BY 1""".stripMargin)

  /** The skew-safe two-stage salted aggregation must equal the plain
    * one-stage weighted average — the oracle computes the latter, so
    * hash-matching proves the salting rewrite is value-preserving.
    */
  private val saltedAvgQ = Q(
    (s, d) => AverageOps.saltedWeightedAverage(li(s, d), Seq("l_returnflag"),
        Seq(AverageOps.Weighted("l_extendedprice", "l_quantity")), salts = 16)
      .select(col("l_returnflag"),
        qround(col("l_extendedprice"), 6).as("wavg_price"),
        qround(col("l_quantity"), 4).as("sum_qty")),
    """SELECT l_returnflag,
      |  floor((sum(l_extendedprice * l_quantity) / sum(l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS wavg_price,
      |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0 AS sum_qty
      |FROM lineitem GROUP BY 1""".stripMargin)

  /** append_xds as sidecar + join view: write a base store and a
    * keyed sidecar of new columns, read the joined view back, and
    * match an oracle computed directly on the source — proving the
    * append round trip is lossless.
    */
  private val appendXdsQ = Q(
    (s, d) => {
      val bpath = s"/tmp/graft_append_base_${scratchTag(s, d)}"
      val spath = s"/tmp/graft_append_side_${scratchTag(s, d)}"
      val keys = Seq("l_orderkey", "l_linenumber")
      // one row per key — (l_orderkey, l_linenumber) is not unique in
      // the synthetic data and the sidecar join must be 1:1
      val base = Tables.lineitem(s, d)
        .groupBy(keys.map(col): _*)
        .agg(min(col("l_quantity")).as("qty"))
      sources.IoOps.writeVis(base, bpath, repartitionTo = Some(2))
      val side = base.select(col("l_orderkey"), col("l_linenumber"),
        (col("qty") * 2.0).as("qty2x"))
      sources.IoOps.appendColumns(base, spath, keys, side)
      sources.IoOps.readWithSidecar(s, bpath, spath, keys)
        .select("l_orderkey", "l_linenumber", "qty", "qty2x")
    },
    """SELECT l_orderkey, l_linenumber, min(l_quantity) AS qty,
      |  min(l_quantity) * 2.0 AS qty2x
      |FROM lineitem GROUP BY 1, 2""".stripMargin)

  /** Bucketed co-located join — the join_vis/join_dataset hot path at
    * 100 TB: both sides written bucketed+sorted on the join key (8
    * buckets) via writeVisBucketed, read back through the catalog, and
    * joined WITHOUT a shuffle or sort on either side (asserted on the
    * physical plan in IoOpsSpec; here the oracle proves the bucketed
    * round trip + join is value-preserving vs a plain join on the
    * source parquet).
    */
  private val bucketedJoinQ = Q(
    (s, d) => {
      val h = scratchTag(s, d)
      val li4 = Tables.lineitem(s, d)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
      val ord = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
      sources.IoOps.writeVisBucketed(li4, s"graft_bkt_li_$h",
        s"/tmp/graft_bkt_li_$h", Seq("l_orderkey"), numBuckets = 8)
      sources.IoOps.writeVisBucketed(ord, s"graft_bkt_ord_$h",
        s"/tmp/graft_bkt_ord_$h", Seq("o_orderkey"), numBuckets = 8)
      val a = s.table(s"graft_bkt_li_$h")
      val b = s.table(s"graft_bkt_ord_$h")
      a.join(b, a("l_orderkey") === b("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          qround(sum(col("l_quantity")), 4).as("sum_qty"),
          qround(sum(col("l_extendedprice")), 4).as("sum_price"),
          countDistinct(col("o_custkey")).as("n_cust"))
    },
    """SELECT o_orderstatus, count(*) AS n,
      |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
      |  floor(sum(l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS sum_price,
      |  count(DISTINCT o_custkey) AS n_cust
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin)

  /** The rewrite-merge compaction of a sidecar append: compact, read
    * the MERGED store (no join), and match the same oracle as
    * `append_xds` — proving compaction preserves the joined view.
    */
  private val appendCompactQ = Q(
    (s, d) => {
      val bpath = s"/tmp/graft_compact_base_${scratchTag(s, d)}"
      val spath = s"/tmp/graft_compact_side_${scratchTag(s, d)}"
      val opath = s"/tmp/graft_compact_out_${scratchTag(s, d)}"
      val keys = Seq("l_orderkey", "l_linenumber")
      val base = Tables.lineitem(s, d)
        .groupBy(keys.map(col): _*)
        .agg(min(col("l_quantity")).as("qty"))
      sources.IoOps.writeVis(base, bpath, repartitionTo = Some(2))
      val side = base.select(col("l_orderkey"), col("l_linenumber"),
        (col("qty") * 2.0).as("qty2x"))
      sources.IoOps.appendColumns(base, spath, keys, side)
      sources.IoOps.compactSidecar(s, bpath, spath, keys, opath,
        repartitionTo = Some(2))
      s.read.parquet(opath)
        .select("l_orderkey", "l_linenumber", "qty", "qty2x")
    },
    """SELECT l_orderkey, l_linenumber, min(l_quantity) AS qty,
      |  min(l_quantity) * 2.0 AS qty2x
      |FROM lineitem GROUP BY 1, 2""".stripMargin)

  /** convert_image artifact merge: sibling artifacts become one table
    * with a value column per artifact via full-outer joins on the
    * image dims (one artifact deliberately partial).
    */
  private val mergeArtifactsQ = Q(
    (s, d) => {
      val grid = ImageOps.makeEmptySkyImage(s, (0.0, 0.0), (16, 16),
        (0.0005, 0.0005))
      val residual = grid.select(col("l_idx"), col("m_idx"),
        (sin(col("l_idx") * lit(0.3)) + cos(col("m_idx") * lit(0.5))).as("image"))
      val model = grid.where(col("l_idx") < 8)
        .select(col("l_idx"), col("m_idx"),
          (col("l_idx") * lit(0.1) + col("m_idx") * lit(0.2)).as("image"))
      sources.IoOps.mergeImageArtifacts(
          Seq("residual" -> residual, "model" -> model),
          keys = Seq("l_idx", "m_idx"))
        .select("l_idx", "m_idx", "residual", "model")
    },
    """WITH px AS (
      |  SELECT CAST(i // 16 AS INT) AS l_idx, CAST(i % 16 AS INT) AS m_idx
      |  FROM generate_series(0, 255) t(i)),
      |a1 AS (SELECT l_idx, m_idx,
      |  sin(l_idx * CAST(0.3 AS DOUBLE)) + cos(m_idx * CAST(0.5 AS DOUBLE)) AS residual
      |  FROM px),
      |a2 AS (SELECT l_idx, m_idx,
      |  l_idx * CAST(0.1 AS DOUBLE) + m_idx * CAST(0.2 AS DOUBLE) AS model
      |  FROM px WHERE l_idx < 8)
      |SELECT a1.l_idx, a1.m_idx, a1.residual, a2.model
      |FROM a1 FULL OUTER JOIN a2 ON a1.l_idx = a2.l_idx AND a1.m_idx = a2.m_idx""".stripMargin)

  // ------------------------------------------------------- ingest/streaming

  private val baselineIdsQ = Q(
    (s, d) => {
      val vis = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_orderkey") % 50).cast("int").as("antenna1"),
        (col("l_suppkey") % 50).cast("int").as("antenna2"))
      sources.IngestOps.assignBaselineIds(vis, "antenna1", "antenna2")
        .select("l_orderkey", "l_linenumber", "antenna1", "antenna2", "baseline")
    },
    """WITH v AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(l_orderkey % 50 AS INT) AS antenna1,
      |    CAST(l_suppkey % 50 AS INT) AS antenna2
      |  FROM lineitem),
      |pairs AS (
      |  SELECT antenna1, antenna2,
      |    CAST(dense_rank() OVER (ORDER BY antenna1, antenna2) - 1 AS INT) AS baseline
      |  FROM (SELECT DISTINCT antenna1, antenna2 FROM v))
      |SELECT v.l_orderkey, v.l_linenumber, v.antenna1, v.antenna2, p.baseline
      |FROM v JOIN pairs p ON v.antenna1 = p.antenna1 AND v.antenna2 = p.antenna2""".stripMargin)

  private val deriveWeightQ = Q(
    (s, d) => sources.IngestOps.deriveDataWeight(
        Tables.lineitem(s, d).withColumn("sigma", col("l_tax")), "sigma")
      .select(col("l_orderkey"), col("l_linenumber"), col("data_weight")),
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN l_tax IS NOT NULL AND l_tax <> 0.0
      |       THEN 1.0 / (l_tax * l_tax) END AS data_weight
      |FROM lineitem""".stripMargin)

  private val splitAutocrossQ = Q(
    (s, d) => {
      // FEED-aware auto/cross split (convert_ms.py:105-106): a row is
      // auto only when antennas AND feeds both match; the query returns
      // the cross partition tagged, plus enough keys to hash-compare.
      val vis = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_orderkey") % 20).cast("int").as("antenna1"),
        (col("l_suppkey") % 20).cast("int").as("antenna2"),
        (col("l_linenumber") % 2).cast("int").as("feed1"),
        lit(0).cast("int").as("feed2"))
      val (auto, cross) = sources.IngestOps.splitAutoCross(
        vis, "antenna1", "antenna2", Some("feed1"), Some("feed2"))
      auto.withColumn("part", lit("auto"))
        .unionAll(cross.withColumn("part", lit("cross")))
        .select("l_orderkey", "l_linenumber", "antenna1", "antenna2",
          "feed1", "feed2", "part")
    },
    """SELECT l_orderkey, l_linenumber,
      |  CAST(l_orderkey % 20 AS INT) AS antenna1,
      |  CAST(l_suppkey % 20 AS INT) AS antenna2,
      |  CAST(l_linenumber % 2 AS INT) AS feed1,
      |  CAST(0 AS INT) AS feed2,
      |  CASE WHEN l_orderkey % 20 = l_suppkey % 20
      |        AND l_linenumber % 2 = 0
      |       THEN 'auto' ELSE 'cross' END AS part
      |FROM lineitem""".stripMargin)

  private val eventsWindowQ = Q(
    (s, d) => {
      // Tables.events already normalizes ts to a canonical timestamp
      // column regardless of the parquet flavor (int64 nanos vs µs).
      val ev = Tables.events(s, d).withColumn("w", lit(1.0))
      streaming.StreamingOps.windowedAverage(ev, "ts", "10 minutes",
          Seq("event_type"), "value", "w")
        .select(
          (unix_timestamp(col("time_bin.start")) / 600).cast("long").as("time_bin_id"),
          col("event_type"), qround(col("value"), 6).as("value"),
          col("w"), col("n_rows"))
    },
    """SELECT CAST(floor(epoch(ts) / 600.0) AS BIGINT) AS time_bin_id,
      |  event_type,
      |  floor((sum(value * 1.0) / sum(1.0)) * 1000000.0 + 0.5) / 1000000.0 AS value,
      |  sum(1.0) AS w, count(*) AS n_rows
      |FROM events GROUP BY 1, 2""".stripMargin)

  /** KMV distinct-count sketch per group (k = 64 smallest distinct
    * hashes of l_orderkey). Deterministic by construction — the oracle
    * replays the sketch exactly: rank the distinct hashes, take the
    * 64th as threshold, estimate (k-1)*M/h_(k). A HLL would not be
    * oracle-checkable; this is the point of the KMV design (see
    * SketchOps).
    */
  private val distinctSketchQ = Q(
    (s, d) => operators.SketchOps.distinctSketch(
        Tables.lineitem(s, d), Seq("l_returnflag"), "l_orderkey", k = 64)
      .select(col("l_returnflag"), col("kth_min"), col("n_sketch"),
        qround(col("estimate"), 6).as("estimate")),
    """WITH h AS (
      |  SELECT DISTINCT l_returnflag,
      |    ((l_orderkey % 1000000007) * 2654435761) % 1000000007 AS h
      |  FROM lineitem),
      |r AS (
      |  SELECT l_returnflag, h,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn,
      |    count(*) OVER (PARTITION BY l_returnflag) AS nd
      |  FROM h)
      |SELECT l_returnflag,
      |  max(CASE WHEN rn = least(nd, 64) THEN h END) AS kth_min,
      |  CAST(least(max(nd), 64) AS BIGINT) AS n_sketch,
      |  floor((CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
      |         ELSE 6.3e1 * 1.000000007e9
      |              / max(CASE WHEN rn = 64 THEN h END) END)
      |    * 1000000.0 + 0.5) / 1000000.0 AS estimate
      |FROM r GROUP BY 1""".stripMargin)

  /** Bottom-k quantile sketch per group (k = 256 rows with smallest
    * row-id hash; estimates = lower-rank order statistics of the
    * sample). Deterministic and merge-order-invariant by construction,
    * so the oracle replays the ENTIRE sketch exactly: rank rows by
    * (hash, value), keep 256, take the order statistics. A GK/KLL/
    * t-digest would not be oracle-checkable (state depends on merge
    * order); this is the point of the bottom-k design (see SketchOps).
    */
  private val quantileSketchQ = Q(
    (s, d) => operators.SketchOps.quantileSketch(
        Tables.lineitem(s, d), Seq("l_returnflag"),
        expr("l_orderkey * 8 + l_linenumber"), col("l_extendedprice"),
        k = 256,
        qs = Seq("q25" -> 0.25, "q50" -> 0.5, "q75" -> 0.75, "q90" -> 0.9)),
    """WITH h AS (
      |  SELECT l_returnflag, l_extendedprice AS v,
      |    (((l_orderkey * 8 + l_linenumber) % 1000000007) * 2654435761)
      |      % 1000000007 AS h
      |  FROM lineitem),
      |r AS (
      |  SELECT l_returnflag, v,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h, v) AS rk
      |  FROM h),
      |o AS (
      |  SELECT l_returnflag, v,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS vr,
      |    count(*) OVER (PARTITION BY l_returnflag) AS ns
      |  FROM r WHERE rk <= 256)
      |SELECT l_returnflag, CAST(max(ns) AS BIGINT) AS n_sample,
      |  max(CASE WHEN vr = CAST(floor(2.5e-1 * (ns - 1)) AS BIGINT) + 1
      |      THEN v END) AS q25,
      |  max(CASE WHEN vr = CAST(floor(5.0e-1 * (ns - 1)) AS BIGINT) + 1
      |      THEN v END) AS q50,
      |  max(CASE WHEN vr = CAST(floor(7.5e-1 * (ns - 1)) AS BIGINT) + 1
      |      THEN v END) AS q75,
      |  max(CASE WHEN vr = CAST(floor(9.0e-1 * (ns - 1)) AS BIGINT) + 1
      |      THEN v END) AS q90
      |FROM o GROUP BY 1""".stripMargin)

  /** AS-OF join: attach to every event the most recent 'click' of the
    * same user at-or-before it (clicks pre-aggregated to one row per
    * (user, time) so the inclusive-tie semantics are engine-neutral).
    * Times are integer microsecond-nanos (see sessionize). The oracle
    * is DuckDB's native ASOF LEFT JOIN — an independent implementation
    * of the same semantics, checking our union+window formulation.
    */
  private val asofJoinQ = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("tsn", expr("ts_ns div 1000 * 1000"))
      val left = ev.select("event_id", "user_id", "tsn")
      val clicks = ev.where(col("event_type") === "click")
        .groupBy("user_id", "tsn").agg(max(col("value")).as("click_value"))
      JoinOps.asofJoin(left, clicks, Seq("user_id"),
          leftTime = "tsn", rightTime = "tsn",
          payload = Seq("tsn" -> "click_tsn", "click_value" -> "click_value"),
          tieCol = "tsn")
        .select("event_id", "user_id", "tsn", "click_tsn", "click_value")
    },
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_ns(ts) AS tsn, event_type, value
      |  FROM events),
      |c AS (
      |  SELECT user_id, tsn, max(value) AS click_value
      |  FROM e WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, e.tsn,
      |  c.tsn AS click_tsn, c.click_value
      |FROM e ASOF LEFT JOIN c
      |  ON e.user_id = c.user_id AND e.tsn >= c.tsn""".stripMargin)

  /** Binned range join: lineitem prices against +-0.05 intervals
    * around part retail prices — the equi-join-on-bin plan (see
    * JoinOps.rangeJoin), never a nested loop. The oracle is the plain
    * non-equi join (DuckDB plans it as an IEJoin), independently
    * checking the binning rewrite is exactly match-preserving.
    */
  private val rangeJoinQ = Q(
    (s, d) => {
      val points = Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
      val intervals = Tables.part(s, d)
        .select(col("p_partkey"),
          (col("p_retailprice") - 0.05).as("lo"),
          (col("p_retailprice") + 0.05).as("hi"))
      JoinOps.rangeJoin(points, intervals,
          "l_extendedprice", "lo", "hi", binWidth = 1.0)
        .select("l_orderkey", "l_linenumber", "p_partkey",
          "l_extendedprice", "lo")
    },
    """SELECT l_orderkey, l_linenumber, p_partkey, l_extendedprice,
      |  p_retailprice - 5.0e-2 AS lo
      |FROM lineitem JOIN part
      |  ON l_extendedprice >= p_retailprice - 5.0e-2
      | AND l_extendedprice <  p_retailprice + 5.0e-2""".stripMargin)

  /** User sessionization over the events stream: 30-minute-gap
    * sessions computed on the raw integer nanosecond timestamps (see
    * StreamingOps.sessionize — bit-exact across engines; wall-clock
    * floats are not). DuckDB mirrors with the classic gaps-and-islands
    * lag/cumsum; the integer sums make every session boundary exact.
    */
  private val sessionizeQ = Q(
    (s, d) => {
      // contract resolution is MICROSECONDS (integer div, not float):
      // DuckDB reads parquet timestamps at us precision, so the oracle
      // can only see us — any sub-us digits are dropped on both sides
      // before any gap comparison.
      val ev = Tables.events(s, d)
        .withColumn("ts", expr("ts_ns div 1000 * 1000"))
      streaming.StreamingOps.sessionize(ev,
          "user_id", "ts", gapNs = 1800L * 1000 * 1000 * 1000, "value")
        .select(col("user_id"), col("session_seq"),
          col("session_start_ns"), col("session_end_ns"),
          col("n_events"), qround(col("value_sum"), 6).as("value_sum"))
    },
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) AS tsn, value FROM events),
      |l AS (
      |  SELECT user_id, tsn, value,
      |    CASE WHEN lag(tsn) OVER (PARTITION BY user_id ORDER BY tsn) IS NULL
      |           OR tsn - lag(tsn) OVER (PARTITION BY user_id ORDER BY tsn)
      |              > 1800000000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM e),
      |sids AS (
      |  SELECT user_id, tsn, value,
      |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tsn
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      |  FROM l)
      |SELECT user_id, session_seq,
      |  min(tsn) AS session_start_ns, max(tsn) AS session_end_ns,
      |  count(*) AS n_events,
      |  floor(sum(value) * 1000000.0 + 0.5) / 1000000.0 AS value_sum
      |FROM sids GROUP BY 1, 2""".stripMargin)

  /** Sessionization through the BUILT-IN `session_window` (the
    * streaming twin of `sessionize` — same operator runs under
    * Structured Streaming with a watermark; see
    * StreamingOps.sessionizeStream). Boundary semantics verified
    * inclusive: an event exactly gap after the previous one MERGES, so
    * the oracle's gaps-and-islands split is strictly-greater — the
    * same convention the integer-nanos sessionize uses. Session end =
    * last event + gap, mirrored as max + 30 min.
    */
  private val streamSessionizeQ = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
      streaming.StreamingOps.sessionizeStream(ev, "ts", "30 minutes",
          Seq("user_id"), "value")
        .select(col("user_id"),
          unix_micros(col("session.start")).as("session_start_us"),
          unix_micros(col("session.end")).as("session_end_us"),
          col("n_events"), qround(col("value_sum"), 6).as("value_sum"))
    },
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS tsu, value FROM events),
      |l AS (
      |  SELECT user_id, tsu, value,
      |    CASE WHEN lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu) IS NULL
      |           OR tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu)
      |              > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM e),
      |sids AS (
      |  SELECT user_id, tsu, value,
      |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tsu
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      |  FROM l)
      |SELECT user_id,
      |  min(tsu) AS session_start_us,
      |  max(tsu) + 1800000000 AS session_end_us,
      |  count(*) AS n_events,
      |  floor(sum(value) * 1000000.0 + 0.5) / 1000000.0 AS value_sum
      |FROM sids GROUP BY user_id, session_seq""".stripMargin)

  /** First-touch funnel view → click → purchase per user
    * (SequenceOps.funnelSteps): conditional-min cascade on integer
    * nanosecond timestamps — every chain timestamp and the depth are
    * exact integers in both engines.
    */
  private val funnelStepsQ = Q(
    (s, d) => operators.SequenceOps.funnelSteps(
        Tables.events(s, d).select(col("user_id"), col("event_type"),
          col("ts_ns")),
        "user_id", "event_type", "ts_ns",
        Seq("view", "click", "purchase"))
      .select(col("user_id"), col("t1"), col("t2"), col("t3"), col("depth")),
    """WITH v AS (
      |  SELECT user_id, min(epoch_ns(ts)) AS t1
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT v.user_id, v.t1,
      |    min(CASE WHEN epoch_ns(e.ts) > v.t1 THEN epoch_ns(e.ts) END) AS t2
      |  FROM v LEFT JOIN events e
      |    ON e.user_id = v.user_id AND e.event_type = 'click'
      |  GROUP BY 1, 2),
      |p AS (
      |  SELECT c.user_id, c.t1, c.t2,
      |    min(CASE WHEN epoch_ns(e.ts) > c.t2 THEN epoch_ns(e.ts) END) AS t3
      |  FROM c LEFT JOIN events e
      |    ON e.user_id = c.user_id AND e.event_type = 'purchase'
      |  GROUP BY 1, 2, 3)
      |SELECT user_id, t1, t2, t3,
      |  CAST(1 + (CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END)
      |         + (CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS INT)
      |    AS depth
      |FROM p""".stripMargin)

  /** Funnel completion-latency percentiles (SequenceOps.funnelLatency):
    * exact interpolated p50/p90 of (purchase − first view) over users
    * who completed the whole view→click→purchase chain, in seconds
    * (the ns→s division is the same IEEE op in both engines).
    */
  private val funnelLatencyQ = Q(
    (s, d) => operators.SequenceOps.funnelLatency(
        Tables.events(s, d).select(col("user_id"), col("event_type"),
          col("ts_ns")),
        "user_id", "event_type", "ts_ns",
        Seq("view", "click", "purchase"), ps = Seq(0.5, 0.9))
      .select(col("n_completed"),
        qround(col("q_0"), 6).as("p50_s"),
        qround(col("q_1"), 6).as("p90_s")),
    """WITH v AS (
      |  SELECT user_id, min(epoch_ns(ts)) AS t1
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT v.user_id, v.t1,
      |    min(CASE WHEN epoch_ns(e.ts) > v.t1 THEN epoch_ns(e.ts) END) AS t2
      |  FROM v LEFT JOIN events e
      |    ON e.user_id = v.user_id AND e.event_type = 'click'
      |  GROUP BY 1, 2),
      |p AS (
      |  SELECT c.user_id, c.t1, c.t2,
      |    min(CASE WHEN epoch_ns(e.ts) > c.t2 THEN epoch_ns(e.ts) END) AS t3
      |  FROM c LEFT JOIN events e
      |    ON e.user_id = c.user_id AND e.event_type = 'purchase'
      |  GROUP BY 1, 2, 3),
      |done AS (
      |  SELECT CAST(t3 - t1 AS DOUBLE) / 1e9 AS lat
      |  FROM p WHERE t3 IS NOT NULL)
      |SELECT count(*) AS n_completed,
      |  floor(quantile_cont(lat, 0.5) * 1000000.0 + 0.5) / 1000000.0
      |    AS p50_s,
      |  floor(quantile_cont(lat, 0.9) * 1000000.0 + 0.5) / 1000000.0
      |    AS p90_s
      |FROM done""".stripMargin)

  /** Top user-journey paths (SequenceOps.sessionPaths): 30-minute-gap
    * sessions, event types concatenated in exact (tsn, event_id)
    * order, 20 most common paths. Strings and integers only — exact;
    * the (count desc, path) tie-break pins the selected set.
    */
  private val sessionPathsQ = Q(
    (s, d) => operators.SequenceOps.sessionPaths(
      Tables.events(s, d).select(col("user_id"), col("ts_ns"),
        col("event_id"), col("event_type")),
      "user_id", "ts_ns", "event_id", "event_type",
      gapNs = 1800L * 1000 * 1000 * 1000, k = 20),
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) AS tsn, event_id, event_type
      |  FROM events),
      |l AS (
      |  SELECT *, CASE WHEN lag(tsn) OVER
      |      (PARTITION BY user_id ORDER BY tsn, event_id) IS NULL
      |    OR tsn - lag(tsn) OVER
      |      (PARTITION BY user_id ORDER BY tsn, event_id)
      |      > 1800000000000 THEN 1 ELSE 0 END AS new_s
      |  FROM e),
      |sx AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id
      |    ORDER BY tsn, event_id ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM l),
      |p AS (
      |  SELECT user_id, sess,
      |    string_agg(event_type, '>' ORDER BY tsn, event_id) AS path
      |  FROM sx GROUP BY 1, 2)
      |SELECT path, count(*) AS n_sessions
      |FROM p GROUP BY 1
      |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin)

  /** Streaming cohort retention driven on the batch frame: the
    * stateful first-seen stage collapses to exact (user, cohort,
    * period) pairs, and the plain triangle reduction must equal
    * SequenceOps.retentionCohorts — same oracle SQL.
    */
  private val streamRetentionQ = Q(
    (s, d) => {
      val pairs = streaming.StreamingOps.firstSeenPeriods(s,
        Tables.events(s, d).select(col("user_id"), col("ts_ns")),
        "user_id", "ts_ns", periodNs = 604800000000000L)
      pairs.groupBy(col("cohort"),
          (col("period") - col("cohort")).as("offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
    },
    """WITH w AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 604800000000000 AS period
      |  FROM events),
      |f AS (SELECT user_id, min(period) AS cohort FROM w GROUP BY 1)
      |SELECT f.cohort, w.period - f.cohort AS offset,
      |  count(DISTINCT w.user_id) AS n_active
      |FROM w JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin)

  /** The STREAMING funnel run on the batch frame — on a static frame
    * every group folds its full sorted history at once, so the output
    * must equal funnelSteps exactly (same oracle SQL; the chain column
    * unpacks through try_element_at, null past the depth under ANSI).
    * Cross-micro-batch progression is covered by the MemoryStream spec.
    */
  private val streamFunnelQ = Q(
    (s, d) => streaming.StreamingOps.funnelStream(s,
        Tables.events(s, d).select(col("user_id"), col("event_type"),
          col("ts_ns")),
        "user_id", "event_type", "ts_ns",
        Seq("view", "click", "purchase"))
      .select(col("user_id"),
        expr("try_element_at(chain, 1)").as("t1"),
        expr("try_element_at(chain, 2)").as("t2"),
        expr("try_element_at(chain, 3)").as("t3"),
        col("depth")),
    """WITH v AS (
      |  SELECT user_id, min(epoch_ns(ts)) AS t1
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT v.user_id, v.t1,
      |    min(CASE WHEN epoch_ns(e.ts) > v.t1 THEN epoch_ns(e.ts) END) AS t2
      |  FROM v LEFT JOIN events e
      |    ON e.user_id = v.user_id AND e.event_type = 'click'
      |  GROUP BY 1, 2),
      |p AS (
      |  SELECT c.user_id, c.t1, c.t2,
      |    min(CASE WHEN epoch_ns(e.ts) > c.t2 THEN epoch_ns(e.ts) END) AS t3
      |  FROM c LEFT JOIN events e
      |    ON e.user_id = c.user_id AND e.event_type = 'purchase'
      |  GROUP BY 1, 2, 3)
      |SELECT user_id, t1, t2, t3,
      |  CAST(1 + (CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END)
      |         + (CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS INT)
      |    AS depth
      |FROM p""".stripMargin)

  /** Weekly cohort retention over the events stream
    * (SequenceOps.retentionCohorts): pure integer arithmetic — cohort
    * and offset are epoch-week divisions, the count is an exact
    * distinct.
    */
  private val retentionCohortsQ = Q(
    (s, d) => operators.SequenceOps.retentionCohorts(
      Tables.events(s, d).select(col("user_id"), col("ts_ns")),
      "user_id", "ts_ns", periodNs = 604800000000000L),
    """WITH w AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 604800000000000 AS period
      |  FROM events),
      |f AS (SELECT user_id, min(period) AS cohort FROM w GROUP BY 1)
      |SELECT f.cohort, w.period - f.cohort AS offset,
      |  count(DISTINCT w.user_id) AS n_active
      |FROM w JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin)

  /** INTERVAL join on the events stream: every view paired with the
    * same user's clicks within the following 6 hours. Integer
    * nanosecond bounds — frame membership is exact in both engines, so
    * the whole join is hash-checkable (see StreamingOps.intervalJoin;
    * the streaming twin with watermark state eviction is covered by
    * the MemoryStream ScalaTest).
    */
  private val intervalJoinQ = Q(
    (s, d) => {
      val ev = Tables.events(s, d).withColumn("tsn", expr("ts_ns div 1000 * 1000"))
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("tsn").as("view_ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("tsn").as("click_ts"), col("value").as("click_value"))
      streaming.StreamingOps.intervalJoin(views, clicks, Seq("user_id"),
          "view_ts", "click_ts", lit(0L), lit(21600L * 1000 * 1000 * 1000))
        .select("view_id", "user_id", "view_ts", "click_id", "click_ts",
          "click_value")
    },
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_ns(ts) AS tsn, event_type, value
      |  FROM events),
      |v AS (
      |  SELECT event_id AS view_id, user_id, tsn AS view_ts
      |  FROM e WHERE event_type = 'view'),
      |c AS (
      |  SELECT event_id AS click_id, user_id, tsn AS click_ts,
      |    value AS click_value
      |  FROM e WHERE event_type = 'click')
      |SELECT v.view_id, v.user_id, v.view_ts, c.click_id, c.click_ts,
      |  c.click_value
      |FROM v JOIN c ON v.user_id = c.user_id
      | AND c.click_ts >= v.view_ts
      | AND c.click_ts <= v.view_ts + 21600000000000""".stripMargin)

  /** Trailing 1-hour rolling count/sum per user over event time (RANGE
    * frame on integer nanos — frame membership exact in both engines;
    * the in-frame float sum is order-dependent, hence qround).
    */
  private val rollingValueQ = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("tsn", expr("ts_ns div 1000 * 1000"))
        .select("event_id", "user_id", "tsn", "value")
      operators.StatsOps.rollingByTime(ev, Seq("user_id"), "tsn",
          "value", windowNs = 3600L * 1000 * 1000 * 1000)
        .select(col("event_id"), col("user_id"), col("tsn"),
          col("n_window"), qround(col("sum_window"), 6).as("sum_window"))
    },
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_ns(ts) AS tsn, value FROM events)
      |SELECT event_id, user_id, tsn,
      |  count(*) OVER w AS n_window,
      |  floor(sum(value) OVER w * 1000000.0 + 0.5) / 1000000.0 AS sum_window
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY tsn
      |  RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW)""".stripMargin)

  /** Stream-static enrichment: orders enriched with customer
    * attributes through the broadcast dimension join (stateless under
    * Structured Streaming; the MemoryStream twin is in
    * StreamingOpsSpec).
    */
  private val streamEnrichQ = Q(
    (s, d) => streaming.StreamingOps.enrich(
        Tables.orders(s, d).select(col("o_orderkey"),
          col("o_custkey").as("c_custkey"), col("o_totalprice")),
        Tables.customer(s, d), keys = Seq("c_custkey"),
        dimCols = Seq("c_nationkey", "c_mktsegment"))
      .select("o_orderkey", "c_custkey", "o_totalprice",
        "c_nationkey", "c_mktsegment"),
    """SELECT o_orderkey, o_custkey AS c_custkey, o_totalprice,
      |  c_nationkey, c_mktsegment
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin)

  /** Windowed flag-rate counting (StreamingOps.runningFlagCounts —
    * the same operator runs under Structured Streaming with a
    * watermark; MemoryStream twin in StreamingOpsSpec): per 10-minute
    * bin and event_type, how many events exceed the value threshold.
    * Exact integers throughout.
    */
  private val runningFlagCountsQ = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
      streaming.StreamingOps.runningFlagCounts(ev, "ts", "10 minutes",
          col("value") >= 50.0, Seq("event_type"))
        .select(
          (unix_timestamp(col("time_bin.start")) / 600).cast("long")
            .as("time_bin_id"),
          col("event_type"), col("flagged"), col("total"))
    },
    """SELECT CAST(floor(epoch(ts) / 600.0) AS BIGINT) AS time_bin_id,
      |  event_type,
      |  CAST(sum(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS flagged,
      |  count(*) AS total
      |FROM events GROUP BY 1, 2""".stripMargin)

  /** Schema-on-read JSON extraction over the events props column
    * (beyond-parity; the metadata-filtering shape of a training-data
    * pipeline): `from_json` with an explicit schema — a native codegen
    * expression, so the parse rides the scan with no UDF and no
    * shuffle — then one hash aggregate per event_type. All outputs are
    * exact integers, so the whole query is hash-checkable against
    * DuckDB's independent JSON parser.
    */
  private val propsParseQ = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("k",
          from_json(col("props"), lit("k BIGINT")).getField("k"))
      ev.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum("k").as("k_sum"),
          min("k").as("k_min"), max("k").as("k_max"),
          sum(when(col("k") % 2 === 0, 1L).otherwise(0L)).as("n_even"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null"))
    },
    """WITH p AS (
      |  SELECT event_type,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events)
      |SELECT event_type, count(*) AS n_events,
      |  CAST(sum(k) AS BIGINT) AS k_sum, min(k) AS k_min, max(k) AS k_max,
      |  CAST(sum(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
      |  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
      |FROM p GROUP BY 1""".stripMargin)

  /** Top-3 events per user by value (deterministic event_id
    * tie-break) — the rank-truncation window shape.
    */
  private val topPerGroupQ = Q(
    (s, d) => {
      val ev = Tables.events(s, d).select("event_id", "user_id", "value")
      operators.StatsOps.topKPerGroup(ev, Seq("user_id"), "value",
        Seq("event_id"), k = 3)
    },
    """SELECT event_id, user_id, value, rk FROM (
      |  SELECT event_id, user_id, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY value DESC, event_id) AS rk
      |  FROM events) WHERE rk <= 3""".stripMargin)

  /** Exact per-group lower median of l_quantity by return flag —
    * a discrete rank pick, engine-exact with no float averaging.
    */
  private val groupMedianQ = Q(
    (s, d) => operators.StatsOps.groupMedian(Tables.lineitem(s, d),
      Seq("l_returnflag"), "l_quantity", Seq("l_orderkey", "l_linenumber")),
    """SELECT l_returnflag, l_quantity AS median, n_group FROM (
      |  SELECT l_returnflag, l_quantity,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_quantity NULLS LAST, l_orderkey, l_linenumber) AS rk,
      |    count(l_quantity) OVER (PARTITION BY l_returnflag) AS n_group
      |  FROM lineitem) WHERE rk = CAST(ceil(n_group / 2.0) AS BIGINT)""".stripMargin)

  /** Exact per-group interpolated quartiles via the shared rank-select
    * machinery (StatsOps.groupedQuantiles): one window sort, bounded
    * 2·|ps|-double aggregate state per group — never a per-group value
    * buffer like `percentile`/collect_list.
    */
  private val groupedQuantilesQ = Q(
    (s, d) => {
      val out = operators.StatsOps.groupedQuantiles(Tables.lineitem(s, d),
        Seq("l_returnflag"), "l_extendedprice", Seq(0.25, 0.5, 0.75))
      out.select(col("l_returnflag"), col("n_group"),
        qround(col("q_0"), 4).as("q1"),
        qround(col("q_1"), 4).as("median"),
        qround(col("q_2"), 4).as("q3"))
    },
    """SELECT l_returnflag, count(l_extendedprice) AS n_group,
      |  floor(quantile_cont(l_extendedprice, 0.25) * 10000.0 + 0.5) / 10000.0 AS q1,
      |  floor(quantile_cont(l_extendedprice, 0.5) * 10000.0 + 0.5) / 10000.0 AS median,
      |  floor(quantile_cont(l_extendedprice, 0.75) * 10000.0 + 0.5) / 10000.0 AS q3
      |FROM lineitem GROUP BY 1""".stripMargin)

  /** Rolling z-score anomaly flags (SequenceOps.anomalyZscore): value
    * fixed-point-scaled to exact BIGINT (money-like 2-decimal data;
    * the ×1000 double product sits within 1e-10 of an integer, so
    * round() is tie-free and engine-identical), windowed sums exact
    * integers, z one closed-form double expression evaluated in the
    * same op order by both engines — the |z|>3 flag is bit-identical
    * without tolerance.
    */
  private val anomalyZscoreQ = Q(
    (s, d) => operators.SequenceOps.anomalyZscore(
        Tables.events(s, d).select(col("user_id"), col("ts_ns"),
          col("event_id"), col("value")),
        "user_id", "ts_ns", "event_id", "value")
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        col("value_scaled"), col("n_prev"), qround(col("z"), 6).as("z"),
        col("is_anomaly")),
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
      |    CAST(round(value * 1000) AS BIGINT) AS iv
      |  FROM events),
      |w AS (
      |  SELECT user_id, ts_ns, event_id, iv,
      |    count(iv) OVER pw AS n,
      |    sum(iv) OVER pw AS sm,
      |    sum(iv * iv) OVER pw AS sq
      |  FROM e
      |  WINDOW pw AS (PARTITION BY user_id ORDER BY ts_ns, event_id
      |    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
      |z AS (
      |  SELECT user_id, ts_ns, event_id, iv, n,
      |    CASE WHEN n >= 5 AND
      |      (CAST(sq AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)
      |         / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) > 0.0
      |    THEN (CAST(iv AS DOUBLE) - CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
      |      / sqrt((CAST(sq AS DOUBLE) - CAST(sm AS DOUBLE)
      |           * CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
      |         / (CAST(n AS DOUBLE) - 1.0))
      |    END AS zv
      |  FROM w)
      |SELECT user_id, ts_ns, event_id, iv AS value_scaled, n AS n_prev,
      |  floor(zv * 1000000.0 + 0.5) / 1000000.0 AS z,
      |  CAST(CASE WHEN abs(zv) > 3.0 THEN 1 ELSE 0 END AS INT) AS is_anomaly
      |FROM z""".stripMargin)

  /** The STREAMING anomaly scorer on the batch frame — each group folds
    * its full sorted history, so the ring-buffer fold must equal the
    * batch window operator bit-for-bit (same oracle SQL). Incremental
    * cross-batch behavior is pinned by StreamingOpsSpec.
    */
  private val streamAnomalyQ = Q(
    (s, d) => streaming.StreamingOps.anomalyStream(s,
        Tables.events(s, d).select(col("user_id"), col("ts_ns"),
          col("event_id"),
          round(col("value") * 1000).cast("long").as("value_scaled")),
        "user_id", "ts_ns", "event_id", "value_scaled")
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        col("value_scaled"), col("n_prev"), qround(col("z"), 6).as("z"),
        col("is_anomaly")),
    anomalyZscoreQ.sql)

  /** SCD type-2 dimension history (SequenceOps.scd2History): each
    * user's event_type treated as a changing state attribute, collapsed
    * to [valid_from, valid_to) rows. Integers and strings only.
    */
  private val scd2HistoryQ = Q(
    (s, d) => operators.SequenceOps.scd2History(
        Tables.events(s, d).select(col("user_id"), col("ts_ns"),
          col("event_id"), col("event_type")),
        "user_id", "ts_ns", "event_id", "event_type"),
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) AS tsn, event_id, event_type
      |  FROM events),
      |c AS (
      |  SELECT user_id, event_type, tsn, event_id,
      |    lag(event_type) OVER
      |      (PARTITION BY user_id ORDER BY tsn, event_id) AS prev
      |  FROM e),
      |f AS (SELECT * FROM c WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, event_type AS state,
      |  CAST(row_number() OVER w AS INT) AS version,
      |  tsn AS valid_from,
      |  lead(tsn) OVER w AS valid_to
      |FROM f WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)"""
      .stripMargin)

  /** The STREAMING SCD2 builder on the batch frame — each group folds
    * its full sorted history, so closed intervals + the final open
    * snapshot equal the batch window operator (same oracle SQL).
    * Cross-batch interval closing is pinned by StreamingOpsSpec.
    */
  private val streamScd2Q = Q(
    (s, d) => streaming.StreamingOps.scd2Stream(s,
        Tables.events(s, d).select(col("user_id"), col("ts_ns"),
          col("event_id"), col("event_type")),
        "user_id", "ts_ns", "event_id", "event_type")
      .select(col("user_id"), col("state"), col("version"),
        col("valid_from"), col("valid_to")),
    scd2HistoryQ.sql)

  /** First-order Markov transition matrix
    * (SequenceOps.eventTransitions): (prev → next) counts and exact
    * int/int conditional probabilities, '_start' fronting each user.
    */
  private val eventTransitionsQ = Q(
    (s, d) => operators.SequenceOps.eventTransitions(
        Tables.events(s, d).select(col("user_id"), col("ts_ns"),
          col("event_id"), col("event_type")),
        "user_id", "ts_ns", "event_id", "event_type"),
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) AS tsn, event_id, event_type
      |  FROM events),
      |p AS (
      |  SELECT coalesce(lag(event_type) OVER
      |      (PARTITION BY user_id ORDER BY tsn, event_id), '_start')
      |      AS prev_type,
      |    event_type AS next_type
      |  FROM e),
      |g AS (SELECT prev_type, next_type, count(*) AS n FROM p GROUP BY 1, 2),
      |t AS (SELECT prev_type, sum(n) AS tot FROM g GROUP BY 1)
      |SELECT g.prev_type, g.next_type, g.n,
      |  CAST(g.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS p
      |FROM g JOIN t USING (prev_type)""".stripMargin)

  /** CUBE rollup over (event_type, day-of-week): the multi-dimensional
    * summary surface next to flag_summary's GROUPING SETS. All-exact
    * integers (epoch-day arithmetic dow, fixed-point value sums);
    * the null super-aggregate cells match across engines.
    */
  private val eventsCubeQ = Q(
    (s, d) => Tables.events(s, d)
      .select(col("event_type"),
        expr("(ts_ns div 86400000000000L + 4) % 7").cast("int").as("dow"),
        round(col("value") * 1000).cast("long").as("iv"))
      .cube(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n"), sum(col("iv")).as("sv")),
    """WITH e AS (
      |  SELECT event_type,
      |    CAST((epoch_ns(ts) // 86400000000000 + 4) % 7 AS INT) AS dow,
      |    CAST(round(value * 1000) AS BIGINT) AS iv
      |  FROM events)
      |SELECT event_type, dow, count(*) AS n,
      |  CAST(sum(iv) AS BIGINT) AS sv
      |FROM e GROUP BY CUBE (event_type, dow)""".stripMargin)

  /** Quantile normalization: percent_rank of value within each
    * event_type under a fully-deterministic (value, event_id) order —
    * rank and count are exact integers, (rank-1)/(n-1) one exact
    * division, identical in both engines by definition.
    */
  private val percentRankNormQ = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      Tables.events(s, d).select(col("event_id"), col("event_type"),
        col("value"), percent_rank().over(w).as("pr"))
    },
    """SELECT event_id, event_type, value,
      |  percent_rank() OVER
      |    (PARTITION BY event_type ORDER BY value, event_id) AS pr
      |FROM events""".stripMargin)

  /** Decile bucketing: ntile(10) per event_type under the fully-
    * deterministic (value, event_id) order — NTILE's bucket arithmetic
    * is exact integers by definition in both engines.
    */
  private val ntileBucketQ = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      Tables.events(s, d).select(col("event_id"), col("event_type"),
        col("value"), ntile(10).over(w).as("decile"))
    },
    """SELECT event_id, event_type, value,
      |  CAST(ntile(10) OVER
      |    (PARTITION BY event_type ORDER BY value, event_id) AS INT)
      |    AS decile
      |FROM events""".stripMargin)

  /** Last-touch attribution (SequenceOps.lastTouchAttribution): each
    * purchase credited to the user's most recent preceding view, with
    * latency; null attribution rows kept. Integer nanos throughout.
    */
  private val lastTouchQ = Q(
    (s, d) => operators.SequenceOps.lastTouchAttribution(
      Tables.events(s, d).select(col("user_id"), col("ts_ns"),
        col("event_id"), col("event_type")),
      "user_id", "ts_ns", "event_id", "event_type",
      touchType = "view", convType = "purchase"),
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) AS tsn, event_id, event_type
      |  FROM events),
      |a AS (
      |  SELECT user_id, tsn, event_id, event_type,
      |    max(CASE WHEN event_type = 'view' THEN tsn END) OVER
      |      (PARTITION BY user_id ORDER BY tsn, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS touch_ts
      |  FROM e)
      |SELECT user_id, tsn AS conv_ts, event_id, touch_ts,
      |  tsn - touch_ts AS latency
      |FROM a WHERE event_type = 'purchase'""".stripMargin)

  /** The STREAMING attribution scorer on the batch frame — O(1) state
    * (latest touch ts per user); each group folds its full sorted
    * history, so the output equals lastTouchAttribution exactly
    * (same oracle SQL).
    */
  private val streamAttributionQ = Q(
    (s, d) => streaming.StreamingOps.attributionStream(s,
        Tables.events(s, d).select(col("user_id"), col("ts_ns"),
          col("event_id"), col("event_type")),
        "user_id", "ts_ns", "event_id", "event_type",
        touchType = "view", convType = "purchase")
      .select(col("user_id"), col("conv_ts"), col("event_id"),
        col("touch_ts"), col("latency")),
    lastTouchQ.sql)

  /** Distinct active users per 10-minute window
    * (StreamingOps.windowedDistinctUsers): the dedup→count chain whose
    * streaming form runs as chained stateful operators; batch form is
    * exact COUNT(DISTINCT) — all integers.
    */
  private val streamWindowUsersQ = Q(
    (s, d) => streaming.StreamingOps.windowedDistinctUsers(
        Tables.events(s, d), "ts", "10 minutes", "user_id")
      .select(
        (unix_timestamp(col("time_bin.start")) / 600).cast("long")
          .as("time_bin_id"),
        col("n_users")),
    """SELECT CAST(floor(epoch(ts) / 600.0) AS BIGINT) AS time_bin_id,
      |  count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1""".stripMargin)

  /** ORC round-trip (IoOps.writeTable/readTable): write the fact as
    * ORC, read it back, aggregate — matching the oracle run on the
    * source parquet proves the format conversion lossless (integral
    * quantities only, so sums are order-independent exact).
    */
  private val orcRoundtripQ = Q(
    (s, d) => {
      val path = s"/tmp/graft_orc_${scratchTag(s, d)}"
      val cols = Seq("l_orderkey", "l_linenumber", "l_quantity",
        "l_returnflag")
      sources.IoOps.writeTable(
        Tables.lineitem(s, d).select(cols.map(col): _*), path, "orc",
        repartitionTo = Some(4))
      sources.IoOps.readTable(s, path, "orc")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          qround(sum(col("l_quantity")), 4).as("sum_qty"),
          min(col("l_orderkey")).as("min_okey"),
          max(col("l_orderkey")).as("max_okey"))
    },
    """SELECT l_returnflag, count(*) AS n,
      |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
      |  min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey
      |FROM lineitem GROUP BY 1""".stripMargin)

  /** CSV round-trip (headered), completing the interchange trio with
    * ORC and JSONL: integer/string columns, writer-schema read.
    */
  private val csvRoundtripQ = Q(
    (s, d) => {
      val path = s"/tmp/graft_csv_${scratchTag(s, d)}"
      val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag")
      val src = Tables.lineitem(s, d).select(cols.map(col): _*)
      sources.IoOps.writeTable(src, path, "csv", repartitionTo = Some(4),
        options = Map("header" -> "true"))
      sources.IoOps.readTable(s, path, "csv", Some(src.schema),
          options = Map("header" -> "true"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_linenumber")).as("sum_line"),
          min(col("l_orderkey")).as("min_okey"),
          max(col("l_orderkey")).as("max_okey"))
    },
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(l_linenumber) AS BIGINT) AS sum_line,
      |  min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey
      |FROM lineitem GROUP BY 1""".stripMargin)

  /** JSONL round-trip: write integer/string columns as JSON lines,
    * read back under the WRITER'S schema (inference would widen the
    * integers), aggregate — proves the interchange path lossless.
    */
  private val jsonlRoundtripQ = Q(
    (s, d) => {
      val path = s"/tmp/graft_jsonl_${scratchTag(s, d)}"
      val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag")
      val src = Tables.lineitem(s, d).select(cols.map(col): _*)
      sources.IoOps.writeTable(src, path, "json", repartitionTo = Some(4))
      sources.IoOps.readTable(s, path, "json", Some(src.schema))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_linenumber")).as("sum_line"),
          min(col("l_orderkey")).as("min_okey"),
          max(col("l_orderkey")).as("max_okey"))
    },
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(l_linenumber) AS BIGINT) AS sum_line,
      |  min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey
      |FROM lineitem GROUP BY 1""".stripMargin)

  /** Snapshot diff (JoinOps.tableDiff): the base fact vs a mutated
    * revision (same change shape as merge_upsert), reconciled to
    * added/removed/changed rows by one full outer join — every
    * comparison on exact integers/strings.
    */
  private val tableDiffQ = Q(
    (s, d) => {
      val cols = Seq("l_orderkey", "l_linenumber", "l_quantity",
        "l_returnflag")
      val base = Tables.lineitem(s, d).select(cols.map(col): _*)
      val revised = base.where(col("l_orderkey") % 10 =!= 1)
        .withColumn("l_quantity",
          when(col("l_orderkey") % 10 === 0, col("l_quantity") + 100)
            .otherwise(col("l_quantity")))
        .unionByName(base.where(col("l_orderkey") % 10 === 2)
          .withColumn("l_orderkey", col("l_orderkey") + 3000000L))
      operators.JoinOps.tableDiff(base, revised,
        Seq("l_orderkey", "l_linenumber"))
    },
    """WITH b AS (
      |  SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      |  FROM lineitem),
      |r AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CASE WHEN l_orderkey % 10 = 0 THEN l_quantity + 100
      |         ELSE l_quantity END AS l_quantity,
      |    l_returnflag
      |  FROM lineitem WHERE l_orderkey % 10 <> 1
      |  UNION ALL
      |  SELECT l_orderkey + 3000000, l_linenumber, l_quantity,
      |    l_returnflag
      |  FROM lineitem WHERE l_orderkey % 10 = 2),
      |j AS (
      |  SELECT coalesce(b.l_orderkey, r.l_orderkey) AS l_orderkey,
      |    coalesce(b.l_linenumber, r.l_linenumber) AS l_linenumber,
      |    CASE WHEN b.l_orderkey IS NULL THEN 'added'
      |         WHEN r.l_orderkey IS NULL THEN 'removed'
      |         WHEN NOT (b.l_quantity IS NOT DISTINCT FROM r.l_quantity
      |               AND b.l_returnflag IS NOT DISTINCT FROM
      |                   r.l_returnflag)
      |         THEN 'changed' END AS status
      |  FROM b FULL OUTER JOIN r
      |    ON b.l_orderkey = r.l_orderkey
      |   AND b.l_linenumber = r.l_linenumber)
      |SELECT * FROM j WHERE status IS NOT NULL""".stripMargin)

  /** Winsorized values: clamp at the per-type exact p05/p95 cutoffs
    * QUANTIZED to the 1e-4 grid (the same grid grouped_quantiles is
    * gate-proven equal on), so the clamp decisions compare identical
    * doubles in both engines.
    */
  private val winsorizeQ = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
      val q = operators.StatsOps.groupedQuantiles(
          ev.select(col("event_type"), col("value")),
          Seq("event_type"), "value", Seq(0.05, 0.95))
        .select(col("event_type"), qround(col("q_0"), 4).as("_lo"),
          qround(col("q_1"), 4).as("_hi"))
      ev.join(broadcast(q), Seq("event_type"))
        .select(col("event_id"), col("event_type"), col("value"),
          when(col("value") < col("_lo"), col("_lo"))
            .when(col("value") > col("_hi"), col("_hi"))
            .otherwise(col("value")).as("clamped"))
    },
    """WITH q AS (
      |  SELECT event_type,
      |    floor(quantile_cont(value, 0.05) * 10000.0 + 0.5) / 10000.0
      |      AS lo,
      |    floor(quantile_cont(value, 0.95) * 10000.0 + 0.5) / 10000.0
      |      AS hi
      |  FROM events GROUP BY 1)
      |SELECT event_id, e.event_type, value,
      |  CASE WHEN value < lo THEN lo
      |       WHEN value > hi THEN hi ELSE value END AS clamped
      |FROM events e JOIN q USING (event_type)""".stripMargin)

  /** Behavioral entropy (SequenceOps.behavioralEntropy): per-user
    * Shannon entropy of the event-type mix via a fixed-order fold
    * over exact integer counts.
    */
  private val userEntropyQ = Q(
    (s, d) => operators.SequenceOps.behavioralEntropy(
        Tables.events(s, d).select(col("user_id"), col("event_type")),
        "user_id", "event_type")
      .select(col("user_id"), col("n_events"),
        qround(col("entropy"), 8).as("entropy")),
    """WITH c AS (
      |  SELECT user_id, event_type AS ty, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
      |    list(c ORDER BY ty) AS lc
      |  FROM c GROUP BY 1)
      |SELECT user_id, n_events,
      |  floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(generate_series(1, len(lc)), i_ ->
      |        -(CAST(lc[i_] AS DOUBLE) / CAST(n_events AS DOUBLE))
      |          * ln(CAST(lc[i_] AS DOUBLE) / CAST(n_events AS DOUBLE)))),
      |      (a_, b_) -> a_ + b_) * 100000000.0 + 0.5) / 100000000.0
      |    AS entropy
      |FROM g""".stripMargin)

  /** Pivot: per-user event-type count matrix through Spark's pivot
    * surface (explicit value list — no extra distinct pass), nulls
    * filled to the oracle's CASE-sum zeros. All integers.
    */
  private val pivotCountsQ = Q(
    (s, d) => {
      val types = Seq("view", "click", "purchase", "signup", "error")
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L, types)
    },
    """SELECT user_id,
      |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS view,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS click,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS purchase,
      |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS signup,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS error
      |FROM events GROUP BY 1""".stripMargin)

  /** Deterministic argmax: the (value, event_id)-lexicographic struct
    * max per user — unlike max_by, ties resolve identically in any
    * engine (the oracle mirrors with a two-key descending rank).
    */
  private val argmaxEventQ = Q(
    (s, d) => Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(max(struct(col("value"), col("event_id"))).as("_m"))
      .select(col("user_id"), col("_m.value").as("max_value"),
        col("_m.event_id").as("argmax_event")),
    """WITH r AS (
      |  SELECT user_id, value, event_id,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY value DESC, event_id DESC) AS rk
      |  FROM events)
      |SELECT user_id, value AS max_value, event_id AS argmax_event
      |FROM r WHERE rk = 1""".stripMargin)

  /** Funnel conversion-rate readout: users reaching at least step k
    * (depth exploded to its prefix), rate = n_reached(k)/n_reached(1)
    * — exact ints over the funnel_steps chain, single exact division.
    */
  private val funnelRatesQ = Q(
    (s, d) => {
      val f = operators.SequenceOps.funnelSteps(
        Tables.events(s, d).select(col("user_id"), col("event_type"),
          col("ts_ns")),
        "user_id", "event_type", "ts_ns",
        Seq("view", "click", "purchase"))
      val reached = f
        .select(explode(sequence(lit(1), col("depth"))).as("step"))
        .groupBy(col("step")).agg(count(lit(1)).as("n_reached"))
      val total = reached.where(col("step") === 1)
        .select(col("n_reached").as("_n0"))
      reached.crossJoin(broadcast(total))
        .select(col("step"), col("n_reached"),
          (col("n_reached").cast("double") / col("_n0").cast("double"))
            .as("rate"))
    },
    s"""WITH fs AS (${funnelStepsQ.sql}),
       |e AS (SELECT unnest(generate_series(1, depth)) AS step FROM fs),
       |g AS (SELECT CAST(step AS INT) AS step, count(*) AS n_reached
       |      FROM e GROUP BY 1),
       |t AS (SELECT n_reached AS n0 FROM g WHERE step = 1)
       |SELECT step, n_reached,
       |  CAST(n_reached AS DOUBLE) / CAST(n0 AS DOUBLE) AS rate
       |FROM g CROSS JOIN t""".stripMargin)

  /** Gap-filling resample (SequenceOps.resampleFfill): each user's
    * activity span on a 6-hour grid with forward-filled values —
    * integer grid arithmetic, passthrough doubles, null before first
    * observation. Both engines fill via the same running
    * last-non-null under the same total order.
    */
  private val resampleFfillQ = Q(
    (s, d) => operators.SequenceOps.resampleFfill(
      Tables.events(s, d).select(col("user_id"), col("ts_ns"),
        col("event_id"), col("value")),
      "user_id", "ts_ns", "event_id", "value",
      stepNs = 21600L * 1000000000L),
    """WITH b AS (
      |  SELECT user_id, min(epoch_ns(ts)) AS t0, max(epoch_ns(ts)) AS t1
      |  FROM events GROUP BY 1),
      |g AS (
      |  SELECT user_id,
      |    unnest(generate_series(t0 // 21600000000000,
      |      t1 // 21600000000000)) * 21600000000000 AS gts
      |  FROM b),
      |u AS (
      |  SELECT user_id, epoch_ns(ts) AS tsn, event_id, value,
      |    0 AS is_grid
      |  FROM events
      |  UNION ALL
      |  SELECT user_id, gts, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), 1
      |  FROM g),
      |f AS (
      |  SELECT user_id, tsn, is_grid,
      |    last_value(value IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY tsn, is_grid, event_id ROWS UNBOUNDED PRECEDING)
      |      AS v
      |  FROM u)
      |SELECT user_id, tsn AS grid_ts, v AS value_ffill
      |FROM f WHERE is_grid = 1""".stripMargin)

  /** Multiset EXCEPT through Spark's exceptAll — duplicates subtract
    * by count, genuinely exercised because (orderkey, linenumber) is
    * NOT unique in the synthetic fact. All integers.
    */
  private val exceptAllQ = Q(
    (s, d) => {
      val a = Tables.lineitem(s, d).where(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"))
      val b = Tables.lineitem(s, d).where(col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"))
      a.exceptAll(b).groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"))
    },
    """WITH a AS (SELECT l_orderkey, l_linenumber FROM lineitem
      |           WHERE l_returnflag = 'R'),
      |b AS (SELECT l_orderkey, l_linenumber FROM lineitem
      |      WHERE l_discount > 0.05),
      |e AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
      |SELECT l_orderkey, count(*) AS n FROM e GROUP BY 1""".stripMargin)

  /** Multiset INTERSECT (intersectAll) — the companion surface. */
  private val intersectAllQ = Q(
    (s, d) => {
      val a = Tables.lineitem(s, d).where(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"))
      val b = Tables.lineitem(s, d).where(col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"))
      a.intersectAll(b).groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"))
    },
    """WITH a AS (SELECT l_orderkey, l_linenumber FROM lineitem
      |           WHERE l_returnflag = 'R'),
      |b AS (SELECT l_orderkey, l_linenumber FROM lineitem
      |      WHERE l_discount > 0.05),
      |e AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
      |SELECT l_orderkey, count(*) AS n FROM e GROUP BY 1""".stripMargin)

  /** Fixed-bin histogram of value: 20 equal-width bins over the
    * observed [min, max], top edge clamped into the last bin — the
    * bin arithmetic is one identical double expression per row in
    * both engines, counts exact.
    */
  private val valueHistogramQ = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
      val m = ev.agg(min(col("value")).as("_lo"), max(col("value")).as("_hi"))
      // a degenerate range (all values equal) collapses to bin 0 in
      // both engines instead of an ANSI division-by-zero job kill
      ev.crossJoin(broadcast(m))
        .select(when(col("_hi") === col("_lo"), lit(0)).otherwise(least(
          floor((col("value") - col("_lo")) /
            ((col("_hi") - col("_lo")) / lit(20.0))).cast("int"),
          lit(19))).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    },
    """WITH m AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
      |b AS (
      |  SELECT CASE WHEN hi = lo THEN 0
      |    ELSE LEAST(CAST(floor((value - lo) / ((hi - lo) / 20.0))
      |      AS INT), 19) END AS bin
      |  FROM events CROSS JOIN m)
      |SELECT bin, count(*) AS n FROM b GROUP BY 1""".stripMargin)

  /** Grouped Pearson correlation + sample covariance from EXACT
    * integer sums (quantity is integral; price floors to exact whole
    * units), assembled by one closed-form double expression per group
    * — bit-identical across engines, unlike corr()'s streaming
    * accumulator whose merge order shuffles float error. The same
    * move as anomaly_zscore: never trust a float aggregate, aggregate
    * integers and do the float math once.
    */
  private val groupCorrelationQ = Q(
    (s, d) => operators.StatsOps.groupCorrelation(
        Tables.lineitem(s, d)
          .select(col("l_returnflag"),
            col("l_quantity").cast("long").as("_xq"),
            floor(col("l_extendedprice")).cast("long").as("_yq")),
        Seq("l_returnflag"), "_xq", "_yq")
      .select(col("l_returnflag"), col("n"),
        qround(col("corr"), 8).as("corr_qty_price"),
        qround(col("covar_samp"), 4).as("covar_samp")),
    """WITH g AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM (SELECT l_returnflag,
      |          CAST(l_quantity AS BIGINT) AS x,
      |          CAST(floor(l_extendedprice) AS BIGINT) AS y
      |        FROM lineitem)
      |  GROUP BY 1)
      |SELECT l_returnflag, n,
      |  floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
      |    * 100000000.0 + 0.5) / 100000000.0 AS corr_qty_price,
      |  floor(((CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
      |    / (CAST(n AS DOUBLE) - 1.0)) * 10000.0 + 0.5) / 10000.0
      |    AS covar_samp
      |FROM g""".stripMargin)

  /** cume_dist companion to percent_rank: rows ≤ current / n under the
    * same deterministic total order — exact integer ratio.
    */
  private val cumeDistNormQ = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      Tables.events(s, d).select(col("event_id"), col("event_type"),
        col("value"), cume_dist().over(w).as("cd"))
    },
    """SELECT event_id, event_type, value,
      |  cume_dist() OVER
      |    (PARTITION BY event_type ORDER BY value, event_id) AS cd
      |FROM events""".stripMargin)

  /** Per-user linear trend of value over time: slope/intercept by
    * closed-form least squares over EXACT integer sums — x is whole
    * seconds since the user's first event (span-bounded so x² sums
    * stay double-exact), y the fixed-point value. Same discipline as
    * group_correlation; only users with ≥ 2 distinct x fit.
    */
  private val groupLinfitQ = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
      val base = Tables.events(s, d)
        .select(col("user_id"), col("ts_ns"),
          round(col("value") * 1000).cast("long").as("_y"))
        .withColumn("_x",
          expr("(ts_ns - min(ts_ns) OVER (PARTITION BY user_id)) div 1000000000L"))
      val g = base.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("_x")).as("_sx"),
          sum(col("_y")).as("_sy"),
          sum(col("_x") * col("_y")).as("_sxy"),
          sum(col("_x") * col("_x")).as("_sxx"))
      val nD = col("n").cast("double")
      def D(c: String) = col(c).cast("double")
      val den = nD * D("_sxx") - D("_sx") * D("_sx")
      val slope = (nD * D("_sxy") - D("_sx") * D("_sy")) / den
      val icept = (D("_sy") - slope * D("_sx")) / nD
      g.where(den > 0.0)
        .select(col("user_id"), col("n"),
          qround(slope, 8).as("slope_per_sec"),
          qround(icept, 4).as("intercept"))
    },
    """WITH b AS (
      |  SELECT user_id,
      |    (epoch_ns(ts) - min(epoch_ns(ts)) OVER (PARTITION BY user_id))
      |      // 1000000000 AS x,
      |    CAST(round(value * 1000) AS BIGINT) AS y
      |  FROM events),
      |g AS (
      |  SELECT user_id, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM b GROUP BY 1),
      |f AS (
      |  SELECT user_id, n,
      |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
      |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
      |    sx, sy
      |  FROM g)
      |SELECT user_id, n,
      |  floor(slope * 100000000.0 + 0.5) / 100000000.0 AS slope_per_sec,
      |  floor(((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
      |      / CAST(n AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS intercept
      |FROM f WHERE den > 0.0""".stripMargin)

  /** The STREAMING linear-trend fit on the batch frame — exact integer
    * sums make the state order-free, so each group's one fold equals
    * the batch closed form bit-for-bit (shared oracle SQL).
    */
  private val streamLinfitQ = Q(
    (s, d) => streaming.StreamingOps.linfitStream(s,
        Tables.events(s, d).select(col("user_id"), col("ts_ns"),
          round(col("value") * 1000).cast("long").as("value_scaled")),
        "user_id", "ts_ns", "value_scaled")
      .select(col("user_id"), col("n"),
        qround(col("slope_per_sec"), 8).as("slope_per_sec"),
        qround(col("intercept"), 4).as("intercept")),
    groupLinfitQ.sql)

  /** Theil-Sen robust per-user trend (StatsOps.theilSen) on the same
    * (seconds-from-first-event, value×1000) frame as group_linfit —
    * the outlier-immune slope beside the OLS one. Pairwise slopes
    * snap to the 1e-6 grid as bigints; the discrete median picks a
    * grid point; the per-key cap bounds the quadratic pair space.
    */
  private val theilSenQ = Q(
    (s, d) => {
      val base = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_ns"),
          round(col("value") * 1000).cast("long").as("_y"))
        .withColumn("_x",
          expr("(ts_ns - min(ts_ns) OVER (PARTITION BY user_id)) div 1000000000L"))
      operators.StatsOps.theilSen(base, Seq("user_id"), "_x", "_y",
          "event_id", maxN = 128, quantDigits = 6)
        .select(col("user_id"), col("slope"), col("n_pairs"))
    },
    """WITH b AS (
      |  SELECT user_id, event_id,
      |    (epoch_ns(ts) - min(epoch_ns(ts)) OVER (PARTITION BY user_id))
      |      // 1000000000 AS x,
      |    CAST(round(value * 1000) AS BIGINT) AS y
      |  FROM events WHERE value IS NOT NULL),
      |r AS (
      |  SELECT user_id, x, y, row_number() OVER (PARTITION BY user_id
      |    ORDER BY x, event_id) AS rn
      |  FROM b),
      |c AS (SELECT * FROM r WHERE rn <= 128),
      |p AS (
      |  SELECT a.user_id,
      |    CAST(floor(CAST(b2.y - a.y AS DOUBLE)
      |      / CAST(b2.x - a.x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
      |      AS sq
      |  FROM c a JOIN c b2 ON a.user_id = b2.user_id
      |    AND a.rn < b2.rn AND a.x <> b2.x),
      |m AS (
      |  SELECT user_id, sq,
      |    row_number() OVER (PARTITION BY user_id ORDER BY sq) AS rk,
      |    count(sq) OVER (PARTITION BY user_id) AS n
      |  FROM p)
      |SELECT user_id, CAST(sq AS DOUBLE) / 1000000.0 AS slope,
      |  n AS n_pairs
      |FROM m WHERE rk = CAST(ceil(n / 2.0) AS BIGINT)""".stripMargin)

  /** ROLLUP companion to events_cube: the hierarchical
    * (event_type → dow) super-aggregates only. Same exact integers.
    */
  private val eventsRollupQ = Q(
    (s, d) => Tables.events(s, d)
      .select(col("event_type"),
        expr("(ts_ns div 86400000000000L + 4) % 7").cast("int").as("dow"),
        round(col("value") * 1000).cast("long").as("iv"))
      .rollup(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n"), sum(col("iv")).as("sv")),
    """WITH e AS (
      |  SELECT event_type,
      |    CAST((epoch_ns(ts) // 86400000000000 + 4) % 7 AS INT) AS dow,
      |    CAST(round(value * 1000) AS BIGINT) AS iv
      |  FROM events)
      |SELECT event_type, dow, count(*) AS n,
      |  CAST(sum(iv) AS BIGINT) AS sv
      |FROM e GROUP BY ROLLUP (event_type, dow)""".stripMargin)

  /** Per-user session statistics off the shared gap sessionization:
    * session count, event count, exact events-per-session ratio.
    */
  private val sessionStatsQ = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
      val gapNs = 1800L * 1000 * 1000 * 1000
      val sessioned = Tables.events(s, d)
        .select(col("user_id"), col("ts_ns"), col("event_id"))
        .withColumn("_new",
          when(lag(col("ts_ns"), 1).over(w).isNull ||
            col("ts_ns") - lag(col("ts_ns"), 1).over(w) > gapNs, 1L)
            .otherwise(0L))
        .withColumn("_sess", sum(col("_new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // max(_sess) == countDistinct(_sess) by construction (sessions are
      // numbered 1..n per user by the running sum) and skips the
      // distinct-aggregate Expand the countDistinct form pays.
      sessioned.groupBy(col("user_id"))
        .agg(max(col("_sess")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("n_sessions"), col("n_events"),
          (col("n_events").cast("double") /
            col("n_sessions").cast("double")).as("events_per_session"))
    },
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) AS tsn, event_id FROM events),
      |l AS (
      |  SELECT *, CASE WHEN lag(tsn) OVER
      |      (PARTITION BY user_id ORDER BY tsn, event_id) IS NULL
      |    OR tsn - lag(tsn) OVER
      |      (PARTITION BY user_id ORDER BY tsn, event_id)
      |      > 1800000000000 THEN 1 ELSE 0 END AS new_s
      |  FROM e),
      |sx AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id
      |    ORDER BY tsn, event_id ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM l)
      |SELECT user_id, count(DISTINCT sess) AS n_sessions,
      |  count(*) AS n_events,
      |  CAST(count(*) AS DOUBLE) / count(DISTINCT sess)
      |    AS events_per_session
      |FROM sx GROUP BY 1""".stripMargin)

  // ---------------------------------------------------------------- export

  val all: Map[String, Q] = Map(
    "apply_flags" -> applyFlagsQ,
    "auto_clip" -> autoClipQ,
    "manual_flag" -> manualFlagQ,
    "manual_unflag" -> manualUnflagQ,
    "quack_flag" -> quackFlagQ,
    "extend_flag" -> extendFlagQ,
    "shadow_flag" -> shadowFlagQ,
    "elevation_flag" -> elevationFlagQ,
    "auto_uvbin" -> autoUvbinQ,
    "auto_rflag" -> autoRflagQ,
    "auto_tfcrop" -> autoTfcropQ,
    "reframe" -> reframeQ,
    "flag_summary" -> flagSummaryQ,
    "flag_summary_antenna" -> flagSummaryAntennaQ,
    "manager_flags" -> managerFlagsQ,
    "chan_average" -> chanAverageQ,
    "salted_weighted_average" -> saltedAvgQ,
    "time_average" -> timeAverageQ,
    "time_average_bin" -> timeAverageBinQ,
    "rebin" -> rebinQ,
    "chan_smooth" -> chanSmoothQ,
    "chan_smooth_gaussian" -> chanSmoothGaussianQ,
    "statistics" -> statisticsQ,
    "moments" -> momentsQ,
    "join_vis" -> joinVisQ,
    "join_conflicts" -> joinConflictsQ,
    "split_dataset" -> splitDatasetQ,
    "split_mxds" -> splitMxdsQ,
    "join_dataset" -> joinDatasetQ,
    "remap_fact_key" -> remapFactKeyQ,
    "complex_math" -> complexMathQ,
    "describe_vis" -> describeVisQ,
    "uv_cont_fit" -> uvContFitQ,
    "uv_cont_fit_complex" -> uvContFitComplexQ,
    "cont_sub" -> contSubQ,
    "fit_metrics" -> fitMetricsQ,
    "make_empty_sky_image" -> makeEmptySkyImageQ,
    "mask_region" -> maskRegionQ,
    "stokes_to_corr" -> stokesToCorrQ,
    "corr_to_stokes" -> corrToStokesQ,
    "decimate" -> decimateQ,
    "visplot_render" -> visplotRenderQ,
    "implot_render" -> implotRenderQ,
    "write_read_roundtrip" -> writeReadRoundtripQ,
    "zorder_layout" -> zorderLayoutQ,
    "hilbert_layout" -> hilbertLayoutQ,
    "merge_upsert" -> mergeUpsertQ,
    "stream_merge_upsert" -> streamMergeUpsertQ,
    "scd2_apply" -> scd2ApplyQ,
    "delete_vectors" -> deleteVectorsQ,
    "time_travel" -> timeTravelQ,
    "bloom_skip" -> bloomSkipQ,
    "manifest_read" -> manifestReadQ,
    "stream_manifest" -> streamManifestQ,
    "stream_bloom_index" -> streamBloomIndexQ,
    "lakehouse_pipeline" -> lakehousePipelineQ,
    "optimize_pipeline" -> optimizePipelineQ,
    "stream_scd2_apply" -> streamScd2ApplyQ,
    "salted_join" -> saltedJoinQ2,
    "bucketed_join" -> bucketedJoinQ,
    "append_xds" -> appendXdsQ,
    "append_compact" -> appendCompactQ,
    "merge_image_artifacts" -> mergeArtifactsQ,
    "baseline_ids" -> baselineIdsQ,
    "derive_weight" -> deriveWeightQ,
    "split_autocross" -> splitAutocrossQ,
    "events_window" -> eventsWindowQ,
    "props_parse" -> propsParseQ,
    "running_flag_counts" -> runningFlagCountsQ,
    "sessionize" -> sessionizeQ,
    "stream_sessionize" -> streamSessionizeQ,
    "funnel_steps" -> funnelStepsQ,
    "funnel_latency" -> funnelLatencyQ,
    "retention_cohorts" -> retentionCohortsQ,
    "stream_funnel" -> streamFunnelQ,
    "stream_retention" -> streamRetentionQ,
    "session_paths" -> sessionPathsQ,
    "anomaly_zscore" -> anomalyZscoreQ,
    "stream_anomaly" -> streamAnomalyQ,
    "scd2_history" -> scd2HistoryQ,
    "stream_scd2" -> streamScd2Q,
    "event_transitions" -> eventTransitionsQ,
    "events_cube" -> eventsCubeQ,
    "percent_rank_norm" -> percentRankNormQ,
    "ntile_bucket" -> ntileBucketQ,
    "last_touch" -> lastTouchQ,
    "stream_attribution" -> streamAttributionQ,
    "stream_window_users" -> streamWindowUsersQ,
    "table_diff" -> tableDiffQ,
    "winsorize" -> winsorizeQ,
    "user_entropy" -> userEntropyQ,
    "pivot_counts" -> pivotCountsQ,
    "argmax_event" -> argmaxEventQ,
    "funnel_rates" -> funnelRatesQ,
    "resample_ffill" -> resampleFfillQ,
    "except_all" -> exceptAllQ,
    "intersect_all" -> intersectAllQ,
    "value_histogram" -> valueHistogramQ,
    "orc_roundtrip" -> orcRoundtripQ,
    "jsonl_roundtrip" -> jsonlRoundtripQ,
    "csv_roundtrip" -> csvRoundtripQ,
    "group_correlation" -> groupCorrelationQ,
    "cume_dist_norm" -> cumeDistNormQ,
    "group_linfit" -> groupLinfitQ,
    "theil_sen" -> theilSenQ,
    "stream_linfit" -> streamLinfitQ,
    "events_rollup" -> eventsRollupQ,
    "session_stats" -> sessionStatsQ,
    "interval_join" -> intervalJoinQ,
    "rolling_value" -> rollingValueQ,
    "top_per_group" -> topPerGroupQ,
    "stream_enrich" -> streamEnrichQ,
    "group_median" -> groupMedianQ,
    "grouped_quantiles" -> groupedQuantilesQ,
    "asof_join" -> asofJoinQ,
    "range_join" -> rangeJoinQ,
    "distinct_sketch" -> distinctSketchQ,
    "quantile_sketch" -> quantileSketchQ) ++
    QueriesLlm.all ++ QueriesImaging.all ++ QueriesKernels.all ++
    QueriesCuration.all ++ QueriesAnalytics.all ++
    QueriesDiagnostics.all
}
