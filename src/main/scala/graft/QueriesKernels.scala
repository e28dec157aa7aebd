package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.functions.complex._
import graft.Queries.{Q, qround}

/** Driver-contract queries for the remaining §2.8 kernels. Row-wise
  * operators (direction_rotate, gaussian_beam, make_pb) get exact
  * DuckDB oracles (the J1 polynomial and rotation matrices are
  * generated from the same Scala code); iterative kernels (self_cal,
  * CLEAN, smooth, fit_gaussian) are wired without oracle SQL — the
  * driver records the weaker rows-only check, and their numerics are
  * covered by the analytic ScalaTest fixtures.
  */
object QueriesKernels {

  private def fmt(d: Double): String = "%.17e".format(d)

  // ------------------------------------------------------ direction_rotate

  private val NewCenter = (0.501, -0.299)
  private val FieldCenter = (0.5, -0.3)

  private val directionRotateQ = Q(
    (s, d) => {
      val vis = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        lit(0).as("field_id"),
        (col("l_extendedprice") % 1000.0).as("u"),
        (col("l_quantity") * 20.0).as("v"),
        (col("l_discount") * 100.0).as("w"),
        c(col("l_tax"), col("l_discount")).as("vis"),
        lit(1.5e9).as("freq"))
      RotateOps.directionRotate(vis, Map(0 -> FieldCenter), NewCenter,
          "field_id", "u", "v", "w", "vis", "freq")
        .select(col("l_orderkey"), col("l_linenumber"),
          qround(col("u_rot"), 6).as("u_rot"),
          qround(col("v_rot"), 6).as("v_rot"),
          qround(col("w_rot"), 6).as("w_rot"),
          qround(col("vis_rot.re"), 8).as("vis_re"),
          qround(col("vis_rot.im"), 8).as("vis_im"))
    }, {
      val (m, p) = RotateOps.rotationForField(NewCenter, FieldCenter,
        commonTangent = true)
      s"""WITH v AS (
         |  SELECT l_orderkey, l_linenumber,
         |    l_extendedprice % 1000.0 AS u, l_quantity * 20.0 AS v,
         |    l_discount * 100.0 AS w, l_tax AS vr, l_discount AS vi
         |  FROM lineitem),
         |r AS (
         |  SELECT *,
         |    u * ${fmt(m(0)(0))} + v * ${fmt(m(1)(0))} + w * ${fmt(m(2)(0))} AS u_rot,
         |    u * ${fmt(m(0)(1))} + v * ${fmt(m(1)(1))} + w * ${fmt(m(2)(1))} AS v_rot,
         |    u * ${fmt(m(0)(2))} + v * ${fmt(m(1)(2))} + w * ${fmt(m(2)(2))} AS w_rot,
         |    2 * pi() * ((u * ${fmt(m(0)(0))} + v * ${fmt(m(1)(0))} + w * ${fmt(m(2)(0))}) * ${fmt(p(0))}
         |      + (u * ${fmt(m(0)(1))} + v * ${fmt(m(1)(1))} + w * ${fmt(m(2)(1))}) * ${fmt(p(1))}) * 1500000000.0 / 299792458.0 AS theta
         |  FROM v)
         |SELECT l_orderkey, l_linenumber,
         |  floor(u_rot * 1000000.0 + 0.5) / 1000000.0 AS u_rot,
         |  floor(v_rot * 1000000.0 + 0.5) / 1000000.0 AS v_rot,
         |  floor(w_rot * 1000000.0 + 0.5) / 1000000.0 AS w_rot,
         |  floor((vr * cos(theta) - vi * sin(theta)) * 100000000.0 + 0.5) / 100000000.0 AS vis_re,
         |  floor((vr * sin(theta) + vi * cos(theta)) * 100000000.0 + 0.5) / 100000000.0 AS vis_im
         |FROM r""".stripMargin
    })

  // --------------------------------------------------------- gaussian_beam

  private val gaussianBeamQ = Q(
    (s, d) => {
      val grid = ImageOps.makeEmptySkyImage(s, (0.0, 0.0), (16, 16),
        (0.0005, 0.0005))
      BeamOps.gaussianBeam(grid, 600.0, 400.0, 30.0, (0.0005, 0.0005), 16, 16)
        .select(col("l_idx"), col("m_idx"), qround(col("beam"), 10).as("beam"))
    }, {
      // mirror the synthesizedbeam quadratic-form constants from Scala
      val incr = 0.0005 * 180 / math.Pi * 3600
      val (dc1, dc2) = (600.0 / incr, 400.0 / incr)
      val t = 30.0 * math.Pi / 180
      val ln2x4 = 4 * math.log(2)
      val alpha = ln2x4 * (math.pow(math.cos(t), 2) / (dc1 * dc1) +
        math.pow(math.sin(t), 2) / (dc2 * dc2))
      val beta = 2 * ln2x4 * (1 / (dc1 * dc1) - 1 / (dc2 * dc2)) *
        math.sin(t) * math.cos(t)
      val gamma = ln2x4 * (math.pow(math.sin(t), 2) / (dc1 * dc1) +
        math.pow(math.cos(t), 2) / (dc2 * dc2))
      s"""SELECT CAST(i // 16 AS INT) AS l_idx, CAST(i % 16 AS INT) AS m_idx,
         |  floor(exp(-(${fmt(alpha)} * (CAST(i // 16 AS INT) - 8) * (CAST(i // 16 AS INT) - 8)
         |    + ${fmt(beta)} * (CAST(i // 16 AS INT) - 8) * (CAST(i % 16 AS INT) - 8)
         |    + ${fmt(gamma)} * (CAST(i % 16 AS INT) - 8) * (CAST(i % 16 AS INT) - 8))) * 1e10 + 0.5) / 1e10 AS beam
         |FROM generate_series(0, 255) s(i)""".stripMargin
    })

  // --------------------------------------------------------------- make_pb

  /** SQL mirror of BeamOps.besselJ1 (A&S rational approximation). */
  private def j1Sql(x: String): String = {
    val small = {
      val c = Seq(0.5, -0.56249985, 0.21093573, -0.03954289, 0.00443319,
        -0.00031761, 0.00001109)
      val y = s"(($x) / 3.0) * (($x) / 3.0)"
      val horner = c.reverse.map(fmt).reduce((acc, cc) => s"($cc + $y * ($acc))")
      // NOTE reversed fold builds c0 + y*(c1 + y*(...)) exactly as Scala
      s"($x) * $horner"
    }
    val big = {
      val f1c = Seq(0.79788456, 0.00000156, 0.01659667, 0.00017105,
        -0.00249511, 0.00113653, -0.00020033)
      val thc = Seq(0.12499612, 0.0000565, -0.00637879, 0.00074348,
        0.00079824, -0.00029166)
      val y = s"(3.0 / abs($x))"
      val f1 = f1c.reverse.map(fmt).reduce((acc, cc) => s"($cc + $y * ($acc))")
      val th = s"(abs($x) - 2.35619449 + $y * ${
        thc.reverse.map(fmt).reduce((acc, cc) => s"($cc + $y * ($acc))")})"
      s"sqrt(2.0 / (pi() * abs($x))) * ($f1) * cos($th) * (CASE WHEN ($x) < 0 THEN -1.0 ELSE 1.0 END)"
    }
    s"(CASE WHEN abs($x) < 3.0 THEN ($small) ELSE ($big) END)"
  }

  private val makePbQ = Q(
    (s, d) => {
      val grid = ImageOps.makeEmptySkyImage(s, (0.0, 0.0), (16, 16),
        (0.0005, 0.0005), chans = Seq(1.0e9))
      BeamOps.makePb(grid, dishDiameter = 25.0)
        .select(col("l_idx"), col("m_idx"), col("chan"),
          qround(col("pb"), 10).as("pb"))
    },
    s"""WITH px AS (
       |  SELECT CAST(i // 16 AS INT) AS l_idx, CAST(i % 16 AS INT) AS m_idx,
       |    (CAST(i // 16 AS INT) - 8) * CAST(0.0005 AS DOUBLE) AS l,
       |    (CAST(i % 16 AS INT) - 8) * CAST(0.0005 AS DOUBLE) AS m
       |  FROM generate_series(0, 255) s(i)),
       |r AS (
       |  SELECT l_idx, m_idx, 0 AS chan,
       |    sqrt(l * l + m * m) * (2 * pi() * 1000000000.0 / 299792458.0) * 12.5 AS r0
       |  FROM px),
       |rr AS (SELECT *, CASE WHEN r0 = 0.0 THEN 1.0 ELSE r0 END AS rv FROM r)
       |SELECT l_idx, m_idx, chan,
       |  CASE WHEN r0 = 0.0 THEN 1.0
       |       ELSE floor(power(2.0 * ${j1Sql("rv")} / rv, 2) * 1e10 + 0.5) / 1e10
       |  END AS pb
       |FROM rr""".stripMargin)

  // --------------------------------- iterative kernels (rows-only checks)

  private val selfCalQ = Q(
    (s, d) => {
      // synthetic per-"antenna" gains over the lineitem-derived baselines:
      // solint = month of shipdate, antennas from order/supplier keys
      val vis = Tables.lineitem(s, d).select(
        (month(col("l_shipdate"))).cast("long").as("solint"),
        (col("l_orderkey") % 8).cast("int").as("ant1"),
        (col("l_suppkey") % 8).cast("int").as("ant2"),
        c(col("l_tax") + 1.0, col("l_discount")).as("vis"),
        c_lit(1.0, 0.0).as("model"),
        lit(1.0).as("w"), lit(false).as("flag"))
        .where(col("ant1") =!= col("ant2"))
      CalOps.selfCal(s, vis, "solint", "ant1", "ant2", "vis", "model",
        "w", "flag", refAnt = 0)
        .select(col("solint"), col("antenna"),
          qround(col("gain_re"), 4).as("gain_re"),
          qround(col("gain_im"), 4).as("gain_im"))
    },
    // The CONVERGED solve, hash-exact via a recursive CTE: each level
    // replays one damped StEFCal sweep against the previous level's
    // gains; per-solint rows stop recursing once that interval's
    // max-delta falls under tol (mirroring the kernel's per-interval
    // while loop — intervals converge at different depths), and the
    // final state is each (solint, antenna)'s deepest row. The damped
    // fixed point contracts, so both engines sit within tol of the
    // same limit and qround(4) makes the cross-engine iteration-count
    // boundary immaterial. Base-case literals MUST be cast to DOUBLE:
    // a bare 1.0 types the recursive union DECIMAL(2,1) and silently
    // rounds every sweep back to the unit gain.
    """WITH RECURSIVE red AS MATERIALIZED (
      |  SELECT CAST(month(l_shipdate) AS BIGINT) AS solint,
      |    CAST(l_orderkey % 8 AS INT) AS ant1,
      |    CAST(l_suppkey % 8 AS INT) AS ant2,
      |    sum((l_tax + 1.0) * 1.0) / sum(1.0) AS xre,
      |    sum(l_discount * 1.0) / sum(1.0) AS xim,
      |    sum(1.0) AS wt
      |  FROM lineitem WHERE l_orderkey % 8 <> l_suppkey % 8
      |  GROUP BY 1, 2, 3),
      |g AS (
      |  SELECT 0 AS it, solint, antenna, CAST(1.0 AS DOUBLE) AS gre,
      |    CAST(0.0 AS DOUBLE) AS gim, CAST(1.0 AS DOUBLE) AS delta
      |  FROM (SELECT DISTINCT solint, ant1 AS antenna FROM red
      |        UNION SELECT DISTINCT solint, ant2 FROM red)
      |  UNION ALL
      |  SELECT nn.it, nn.solint, nn.antenna, nn.gre, nn.gim,
      |    max(abs(nn.gre - nn.ogre) + abs(nn.gim - nn.ogim))
      |      OVER (PARTITION BY nn.solint) AS delta
      |  FROM (
      |    SELECT o.it + 1 AS it, l.solint, l.antenna,
      |      0.5 * (o.gre + sum(l.nre) / sum(l.den)) AS gre,
      |      0.5 * (o.gim + sum(l.nim) / sum(l.den)) AS gim,
      |      o.gre AS ogre, o.gim AS ogim
      |    FROM (
      |      SELECT r.solint, r.ant1 AS antenna,
      |        r.wt * (r.xre * gj.gre - r.xim * gj.gim) AS nre,
      |        r.wt * (r.xim * gj.gre + r.xre * gj.gim) AS nim,
      |        r.wt * (gj.gre * gj.gre + gj.gim * gj.gim) AS den
      |      FROM red r JOIN g gj
      |        ON r.solint = gj.solint AND r.ant2 = gj.antenna
      |      UNION ALL
      |      SELECT r.solint, r.ant2 AS antenna,
      |        r.wt * (r.xre * gi.gre + r.xim * gi.gim) AS nre,
      |        r.wt * (-r.xim * gi.gre + r.xre * gi.gim) AS nim,
      |        r.wt * (gi.gre * gi.gre + gi.gim * gi.gim) AS den
      |      FROM red r JOIN g gi
      |        ON r.solint = gi.solint AND r.ant1 = gi.antenna
      |    ) l
      |    JOIN g o ON l.solint = o.solint AND l.antenna = o.antenna
      |    WHERE o.it < 100 AND o.delta > 1e-12
      |    GROUP BY o.it, l.solint, l.antenna, o.gre, o.gim
      |  ) nn),
      |fin AS (
      |  SELECT solint, antenna, gre, gim,
      |    row_number() OVER (PARTITION BY solint, antenna
      |                       ORDER BY it DESC) AS rn
      |  FROM g),
      |last AS (SELECT solint, antenna, gre, gim FROM fin WHERE rn = 1),
      |rot AS (
      |  SELECT solint,
      |    gre / sqrt(gre * gre + gim * gim) AS cr,
      |    -gim / sqrt(gre * gre + gim * gim) AS ci
      |  FROM last WHERE antenna = 0)
      |SELECT l.solint, l.antenna,
      |  floor((gre * cr - gim * ci) * 10000.0 + 0.5) / 10000.0 AS gain_re,
      |  floor((gre * ci + gim * cr) * 10000.0 + 0.5) / 10000.0 AS gain_im
      |FROM last l JOIN rot ON l.solint = rot.solint""".stripMargin)

  // -------------------------------------------------- uv_cont_fit order 3

  /** Replays RegressionOps.solveNormalMat's Gaussian elimination with
    * partial pivoting on the KNOWN moment matrix, emitting the same op
    * sequence applied to the rhs columns as SQL with literal
    * multipliers. The fixture fixes every group's chan set, so the
    * moment matrix is the same exact-integer-valued matrix in both
    * engines and the recorded multipliers are bit-identical to the
    * ones the operator computes at runtime.
    */
  private def eliminationSql(mom: Array[Double], rhs: Array[String]): Array[String] = {
    val n = rhs.length
    val a = Array.tabulate(n, n)((i, j) => mom(i + j))
    val b: Array[String] = rhs.clone()
    for (c0 <- 0 until n) {
      var p = c0
      for (r <- c0 + 1 until n) if (math.abs(a(r)(c0)) > math.abs(a(p)(c0))) p = r
      val tmp = a(c0); a(c0) = a(p); a(p) = tmp
      val tb = b(c0); b(c0) = b(p); b(p) = tb
      for (r <- c0 + 1 until n) {
        val f = a(r)(c0) / a(c0)(c0)
        for (cc <- c0 until n) a(r)(cc) -= f * a(c0)(cc)
        b(r) = s"(${b(r)} - ${fmt(f)} * ${b(c0)})"
      }
    }
    val out = new Array[String](n)
    for (i <- n - 1 to 0 by -1) {
      var s = b(i)
      for (j <- i + 1 until n) s = s"($s - ${fmt(a(i)(j))} * ${out(j)})"
      out(i) = s"(($s) / ${fmt(a(i)(i))})"
    }
    out
  }

  /** Order-3 polynomial continuum fit with a nonempty excludechans
    * (uv_cont_fit.py:66) — the higher-order path of the regression
    * aggregator, oracle'd by replaying the exact solve (above) over
    * SQL-computed normal-equation sums.
    */
  private val uvContFitOrder3Q = Q(
    (s, d) => {
      // every group gets the full chan set 0..6 so the moment matrix is
      // a shared exact-integer constant (see eliminationSql)
      val base = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(avg(col("l_quantity")).as("q"), avg(col("l_discount")).as("dsc"))
      val chans = s.range(0, 7).select(col("id").cast("int").as("chan"))
      val series = base.crossJoin(chans)
        .select(col("l_orderkey"), col("chan"),
          (col("q") + col("q") * col("chan") +
            col("dsc") * pow(col("chan"), 4)).as("y"))
      val fit = RegressionOps.uvContFit(series, Seq("l_orderkey"), "chan",
        source = "y", target = "contfit", fitorder = 3, excludeChans = Seq(5))
      fit.select(col("l_orderkey"), col("chan"),
        qround(col("contfit"), 6).as("contfit"))
    }, {
      val included = Seq(0, 1, 2, 3, 4, 6).map(_.toDouble)
      val mom = Array.tabulate(7)(k =>
        included.map(x => math.pow(x, k)).sum)
      val coefs = eliminationSql(mom, Array("r0", "r1", "r2", "r3"))
      s"""WITH t AS (
         |  SELECT l_orderkey, avg(l_quantity) AS q, avg(l_discount) AS dsc
         |  FROM lineitem GROUP BY 1),
         |series AS (
         |  SELECT l_orderkey, CAST(g.chan AS INT) AS chan,
         |    q + q * CAST(g.chan AS INT) + dsc * pow(CAST(g.chan AS INT), 4) AS y
         |  FROM t CROSS JOIN generate_series(0, 6) g(chan)),
         |r AS (
         |  SELECT l_orderkey,
         |    sum(CASE WHEN chan <> 5 THEN y * 1.0 ELSE 0.0 END) AS r0,
         |    sum(CASE WHEN chan <> 5 THEN y * chan ELSE 0.0 END) AS r1,
         |    sum(CASE WHEN chan <> 5 THEN y * pow(chan, 2) ELSE 0.0 END) AS r2,
         |    sum(CASE WHEN chan <> 5 THEN y * pow(chan, 3) ELSE 0.0 END) AS r3
         |  FROM series GROUP BY 1),
         |cfs AS (
         |  SELECT l_orderkey, ${coefs(0)} AS c0, ${coefs(1)} AS c1,
         |    ${coefs(2)} AS c2, ${coefs(3)} AS c3
         |  FROM r)
         |SELECT series.l_orderkey, series.chan,
         |  floor((c0 * 1.0 + c1 * series.chan + c2 * pow(series.chan, 2)
         |    + c3 * pow(series.chan, 3)) * 1000000.0 + 0.5) / 1000000.0 AS contfit
         |FROM series JOIN cfs ON series.l_orderkey = cfs.l_orderkey""".stripMargin
    })

  /** ONE damped StEFCal update from the unit initial guess IS
    * closed-form (CalOps.solveGains with g=1: per antenna
    * N_k = sum over incident baselines of w*X (conj(X) on the ant2
    * leg), D_k = sum w, then g_k = (1 + N_k/D_k)/2 followed by the
    * reference-antenna phase rotation) — so the solver's update rule
    * gets an exact oracle; the converged solve stays rows-only.
    */
  private val selfcalOneIterQ = Q(
    (s, d) => {
      val vis = Tables.lineitem(s, d).select(
        month(col("l_shipdate")).cast("long").as("solint"),
        (col("l_orderkey") % 8).cast("int").as("ant1"),
        (col("l_suppkey") % 8).cast("int").as("ant2"),
        c(col("l_tax") + 1.0, col("l_discount")).as("vis"),
        c(lit(2.0), lit(0.0)).as("model"),
        (col("l_quantity") / 10.0).as("w"),
        (col("l_linenumber") === 7).as("flag"))
      CalOps.selfCal(s, vis, "solint", "ant1", "ant2", "vis", "model",
          "w", "flag", refAnt = 0, maxIter = 1)
        .select(col("solint"), col("antenna"),
          qround(col("gain_re"), 6).as("gain_re"),
          qround(col("gain_im"), 6).as("gain_im"),
          col("n_iter"))
    },
    """WITH v AS (
      |  SELECT CAST(month(l_shipdate) AS BIGINT) AS solint,
      |    CAST(l_orderkey % 8 AS INT) AS ant1,
      |    CAST(l_suppkey % 8 AS INT) AS ant2,
      |    (l_tax + 1.0) AS vr, l_discount AS vi,
      |    l_quantity / 10.0 AS w
      |  FROM lineitem
      |  WHERE NOT (l_linenumber = 7) AND l_orderkey % 8 <> l_suppkey % 8
      |    AND l_quantity / 10.0 > 0),
      |x AS (
      |  SELECT solint, ant1, ant2,
      |    (vr * 2.0 + vi * 0.0) / (2.0 * 2.0 + 0.0 * 0.0) AS xre,
      |    (vi * 2.0 - vr * 0.0) / (2.0 * 2.0 + 0.0 * 0.0) AS xim,
      |    w * (2.0 * 2.0 + 0.0 * 0.0) AS xwt
      |  FROM v),
      |red AS (
      |  SELECT solint, ant1, ant2,
      |    sum(xre * xwt) / sum(xwt) AS xre,
      |    sum(xim * xwt) / sum(xwt) AS xim,
      |    sum(xwt) AS wt
      |  FROM x GROUP BY 1, 2, 3),
      |legs AS (
      |  SELECT solint, ant1 AS antenna, wt, xre, xim FROM red
      |  UNION ALL
      |  SELECT solint, ant2 AS antenna, wt, xre, -xim FROM red),
      |num AS (
      |  SELECT solint, antenna, sum(wt * xre) AS nre,
      |    sum(wt * xim) AS nim, sum(wt) AS den
      |  FROM legs GROUP BY 1, 2),
      |g0 AS (
      |  SELECT solint, antenna,
      |    0.5 * (1.0 + nre / den) AS gre, 0.5 * (nim / den) AS gim
      |  FROM num),
      |rot AS (
      |  SELECT solint,
      |    gre / sqrt(gre * gre + gim * gim) AS cr,
      |    -gim / sqrt(gre * gre + gim * gim) AS ci
      |  FROM g0 WHERE antenna = 0)
      |SELECT g0.solint, g0.antenna,
      |  floor((gre * cr - gim * ci) * 1000000.0 + 0.5) / 1000000.0 AS gain_re,
      |  floor((gre * ci + gim * cr) * 1000000.0 + 0.5) / 1000000.0 AS gain_im,
      |  CAST(1 AS INT) AS n_iter
      |FROM g0 JOIN rot ON g0.solint = rot.solint""".stripMargin)

  /** TWO damped StEFCal sweeps, hash-exact: sweep 1 from the unit
    * guess is selfcal_one_iter's closed form (kept UNROTATED — the
    * kernel applies the reference-antenna phase rotation only after
    * the loop); sweep 2 re-evaluates the per-antenna numerator /
    * denominator against the sweep-1 gains through the same two-leg
    * union, then rotates. Covers the solver's full per-iteration
    * recurrence including gain-dependent denominators.
    */
  private val selfcalTwoIterQ = Q(
    (s, d) => {
      val vis = Tables.lineitem(s, d).select(
        month(col("l_shipdate")).cast("long").as("solint"),
        (col("l_orderkey") % 8).cast("int").as("ant1"),
        (col("l_suppkey") % 8).cast("int").as("ant2"),
        c(col("l_tax") + 1.0, col("l_discount")).as("vis"),
        c(lit(2.0), lit(0.0)).as("model"),
        (col("l_quantity") / 10.0).as("w"),
        (col("l_linenumber") === 7).as("flag"))
      CalOps.selfCal(s, vis, "solint", "ant1", "ant2", "vis", "model",
          "w", "flag", refAnt = 0, maxIter = 2)
        .select(col("solint"), col("antenna"),
          qround(col("gain_re"), 6).as("gain_re"),
          qround(col("gain_im"), 6).as("gain_im"),
          col("n_iter"))
    },
    """WITH v AS (
      |  SELECT CAST(month(l_shipdate) AS BIGINT) AS solint,
      |    CAST(l_orderkey % 8 AS INT) AS ant1,
      |    CAST(l_suppkey % 8 AS INT) AS ant2,
      |    (l_tax + 1.0) AS vr, l_discount AS vi,
      |    l_quantity / 10.0 AS w
      |  FROM lineitem
      |  WHERE NOT (l_linenumber = 7) AND l_orderkey % 8 <> l_suppkey % 8
      |    AND l_quantity / 10.0 > 0),
      |x AS (
      |  SELECT solint, ant1, ant2,
      |    (vr * 2.0 + vi * 0.0) / (2.0 * 2.0 + 0.0 * 0.0) AS xre,
      |    (vi * 2.0 - vr * 0.0) / (2.0 * 2.0 + 0.0 * 0.0) AS xim,
      |    w * (2.0 * 2.0 + 0.0 * 0.0) AS xwt
      |  FROM v),
      |red AS (
      |  SELECT solint, ant1, ant2,
      |    sum(xre * xwt) / sum(xwt) AS xre,
      |    sum(xim * xwt) / sum(xwt) AS xim,
      |    sum(xwt) AS wt
      |  FROM x GROUP BY 1, 2, 3),
      |legs1 AS (
      |  SELECT solint, ant1 AS antenna, wt, xre, xim FROM red
      |  UNION ALL
      |  SELECT solint, ant2 AS antenna, wt, xre, -xim FROM red),
      |g1 AS (
      |  SELECT solint, antenna,
      |    0.5 * (1.0 + sum(wt * xre) / sum(wt)) AS gre,
      |    0.5 * (sum(wt * xim) / sum(wt)) AS gim
      |  FROM legs1 GROUP BY 1, 2),
      |legs2 AS (
      |  -- ant1 leg: numerator X_ij * g_j, denominator |g_j|^2
      |  SELECT r.solint, r.ant1 AS antenna,
      |    r.wt * (r.xre * gj.gre - r.xim * gj.gim) AS nre,
      |    r.wt * (r.xim * gj.gre + r.xre * gj.gim) AS nim,
      |    r.wt * (gj.gre * gj.gre + gj.gim * gj.gim) AS den
      |  FROM red r JOIN g1 gj
      |    ON r.solint = gj.solint AND r.ant2 = gj.antenna
      |  UNION ALL
      |  -- ant2 leg: numerator conj(X_ij) * g_i, denominator |g_i|^2
      |  SELECT r.solint, r.ant2 AS antenna,
      |    r.wt * (r.xre * gi.gre + r.xim * gi.gim) AS nre,
      |    r.wt * (-r.xim * gi.gre + r.xre * gi.gim) AS nim,
      |    r.wt * (gi.gre * gi.gre + gi.gim * gi.gim) AS den
      |  FROM red r JOIN g1 gi
      |    ON r.solint = gi.solint AND r.ant1 = gi.antenna),
      |g2 AS (
      |  SELECT l.solint, l.antenna,
      |    0.5 * (g1.gre + sum(l.nre) / sum(l.den)) AS gre,
      |    0.5 * (g1.gim + sum(l.nim) / sum(l.den)) AS gim
      |  FROM legs2 l JOIN g1
      |    ON l.solint = g1.solint AND l.antenna = g1.antenna
      |  GROUP BY l.solint, l.antenna, g1.gre, g1.gim),
      |rot AS (
      |  SELECT solint,
      |    gre / sqrt(gre * gre + gim * gim) AS cr,
      |    -gim / sqrt(gre * gre + gim * gim) AS ci
      |  FROM g2 WHERE antenna = 0)
      |SELECT g2.solint, g2.antenna,
      |  floor((gre * cr - gim * ci) * 1000000.0 + 0.5) / 1000000.0 AS gain_re,
      |  floor((gre * ci + gim * cr) * 1000000.0 + 0.5) / 1000000.0 AS gain_im,
      |  CAST(2 AS INT) AS n_iter
      |FROM g2 JOIN rot ON g2.solint = rot.solint""".stripMargin)

  /** applyGains (self_cal.py docstring: Vcorrect = Vobs / (g_i
    * conj(g_j))): two broadcast joins + row-wise complex division —
    * exact oracle with a literal 8-antenna gain table.
    */
  private val applyGainsQ = Q(
    (s, d) => {
      import s.implicits._
      val vis = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        lit(1L).as("solint"),
        (col("l_orderkey") % 8).cast("int").as("ant1"),
        (col("l_suppkey") % 8).cast("int").as("ant2"),
        c(col("l_tax") + 1.0, col("l_discount")).as("vis"))
      // deterministic synthetic gains: g_a = (1 + a/10, a/20)
      val gains = (0 until 8).map(a =>
        (1L, a, 1.0 + a / 10.0, a / 20.0))
        .toDF("solint", "antenna", "gain_re", "gain_im")
      CalOps.applyGains(vis, gains, "solint", "ant1", "ant2", "vis")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("ant1"), col("ant2"),
          qround(col("vis_corrected.re"), 8).as("corr_re"),
          qround(col("vis_corrected.im"), 8).as("corr_im"))
    }, {
      val gainRows = (0 until 8).map(a =>
        s"($a, ${fmt(1.0 + a / 10.0)}, ${fmt(a / 20.0)})").mkString(", ")
      // c_div(v, g1*conj(g2)): d = g1*conj(g2); out = v*conj(d)/|d|^2
      s"""WITH v AS (
         |  SELECT l_orderkey, l_linenumber,
         |    CAST(l_orderkey % 8 AS INT) AS ant1,
         |    CAST(l_suppkey % 8 AS INT) AS ant2,
         |    (l_tax + 1.0) AS vr, l_discount AS vi
         |  FROM lineitem),
         |g(antenna, gre, gim) AS (VALUES $gainRows),
         |j AS (
         |  SELECT v.*, g1.gre AS g1re, g1.gim AS g1im,
         |    g2.gre AS g2re, g2.gim AS g2im
         |  FROM v JOIN g g1 ON v.ant1 = g1.antenna
         |         JOIN g g2 ON v.ant2 = g2.antenna),
         |dd AS (
         |  SELECT *, g1re * g2re + g1im * g2im AS dre,
         |    g1im * g2re - g1re * g2im AS dim
         |  FROM j)
         |SELECT l_orderkey, l_linenumber, ant1, ant2,
         |  floor(((vr * dre + vi * dim) / (dre * dre + dim * dim)) * 100000000.0 + 0.5) / 100000000.0 AS corr_re,
         |  floor(((vi * dre - vr * dim) / (dre * dre + dim * dim)) * 100000000.0 + 0.5) / 100000000.0 AS corr_im
         |FROM dd""".stripMargin
    })

  /** The relational reduction stage of self_cal, oracle-checked on its
    * own (the iterative solve above it is covered by analytic tests).
    */
  private val selfcalReduceQ = Q(
    (s, d) => {
      val vis = Tables.lineitem(s, d).select(
        month(col("l_shipdate")).cast("long").as("solint"),
        (col("l_orderkey") % 8).cast("int").as("ant1"),
        (col("l_suppkey") % 8).cast("int").as("ant2"),
        c(col("l_tax") + 1.0, col("l_discount")).as("vis"),
        c(lit(2.0), lit(0.0)).as("model"),
        (col("l_quantity") / 10.0).as("w"),
        (col("l_linenumber") === 7).as("flag"))
      CalOps.reduceVisModel(vis, "solint", "ant1", "ant2", "vis", "model",
          "w", "flag")
        .select(col("solint"), col("ant1"), col("ant2"),
          qround(col("xre"), 8).as("xre"), qround(col("xim"), 8).as("xim"),
          qround(col("wt"), 4).as("wt"))
    },
    """WITH v AS (
      |  SELECT CAST(month(l_shipdate) AS BIGINT) AS solint,
      |    CAST(l_orderkey % 8 AS INT) AS ant1,
      |    CAST(l_suppkey % 8 AS INT) AS ant2,
      |    (l_tax + 1.0) AS vr, l_discount AS vi,
      |    l_quantity / 10.0 AS w
      |  FROM lineitem
      |  WHERE NOT (l_linenumber = 7) AND l_orderkey % 8 <> l_suppkey % 8
      |    AND l_quantity / 10.0 > 0),
      |x AS (
      |  -- X = V/M with M = 2+0i: (vr/2, vi/2); Xwt = w * |M|^2 = w*4
      |  SELECT solint, ant1, ant2,
      |    (vr * 2.0 + vi * 0.0) / (2.0 * 2.0 + 0.0 * 0.0) AS xre,
      |    (vi * 2.0 - vr * 0.0) / (2.0 * 2.0 + 0.0 * 0.0) AS xim,
      |    w * (2.0 * 2.0 + 0.0 * 0.0) AS xwt
      |  FROM v)
      |SELECT solint, ant1, ant2,
      |  floor((sum(xre * xwt) / sum(xwt)) * 100000000.0 + 0.5) / 100000000.0 AS xre,
      |  floor((sum(xim * xwt) / sum(xwt)) * 100000000.0 + 0.5) / 100000000.0 AS xim,
      |  floor(sum(xwt) * 10000.0 + 0.5) / 10000.0 AS wt
      |FROM x GROUP BY 1, 2, 3""".stripMargin)

  private val cleanQ = Q(
    (s, d) => {
      // CLEAN the gridded lineitem image with its own PSF (both planes
      // from the imaging-chain fixture at 16x16)
      val p = GridOps.GridParams((32, 32), (0.002, 0.002),
        imageSize = Some((16, 16)))
      val fx = Tables.lineitem(s, d).select(
        lit(0).as("img_chan"), lit(0).as("pol"),
        (col("l_extendedprice") % 60.0 - 30.0).as("u"),
        ((col("l_quantity") * 3.0 + col("l_linenumber")) % 60.0 - 30.0).as("v"),
        col("l_tax").as("re"), col("l_discount").as("im"),
        (col("l_discount") + 0.5).as("weight"), lit(1.5e9).as("freq"))
      val (img, psf) = GridOps.makeImageAndPsf(s, fx, p)
      // niter 40 (was 200): each oracle iteration is one recursive-CTE
      // level, and 200 levels cost ~12 s of the driver's DuckDB budget;
      // 40 still replays a deep greedy loop and clean_converged covers
      // the threshold-stop path separately.
      CleanOps.cleanPlanes(s, img, psf, 16, 16, 16, 16,
          gain = 0.2, threshold = 0.05, niter = 40)
        .select(col("img_chan"), col("pol"), col("l_idx"), col("m_idx"),
          qround(col("model"), 6).as("model"),
          qround(col("residual"), 6).as("residual"))
    },
    // The FULL pipeline oracle, hash-exact end to end — see
    // hogbomChainSql.
    s"""WITH RECURSIVE fx AS (
       |  SELECT l_extendedprice % 60.0 - 30.0 AS u,
       |    (l_quantity * 3.0 + l_linenumber) % 60.0 - 30.0 AS v,
       |    l_tax AS re, l_discount AS im, l_discount + 0.5 AS weight,
       |    1500000000.0 AS freq
       |  FROM lineitem),
       |${hogbomChainSql(gain = 0.2, threshold = 0.05, niter = 40)}""".stripMargin)

  /** Everything downstream of a `fx(u, v, re, im, weight, freq)` CTE
    * for a full single-plane imaging + Hogbom chain, hash-exact end to
    * end: grid both the data and psf planes through the 49-tap
    * scatter, invert each by direct DFT (FFT vs DFT differ only in
    * addition order; qround(6) absorbs it), divide by sum_weight and
    * the PSWF correction, then replay EVERY Hogbom iteration as a
    * recursive CTE — peak argmax with the kernel's first-strict-max
    * row-major tie-break, exact subtraction,
    * threshold-relative-to-initial-peak stop. The ulp-scale FFT/DFT
    * differences never flip an argmax on these fixtures because
    * competing peaks are separated by far more than 1e-12. The caller
    * must open `WITH RECURSIVE` and define fx.
    */
  private def hogbomChainSql(gain: Double, threshold: Double,
                             niter: Int): String =
    s"""$imagingPrefixSql,
       |thr AS MATERIALIZED (SELECT ${fmt(threshold)} * abs(v) AS t FROM img
       |        ORDER BY abs(v) DESC, l_idx ASC, m_idx ASC LIMIT 1),
       |r AS (
       |  SELECT 0 AS it, l_idx, m_idx, v, CAST(0 AS DOUBLE) AS model
       |  FROM img
       |  UNION ALL
       |  SELECT r.it + 1, r.l_idx, r.m_idx,
       |    r.v - CASE WHEN (8 + r.l_idx - p.pl) BETWEEN 0 AND 15
       |                AND (8 + r.m_idx - p.pm) BETWEEN 0 AND 15
       |          THEN ${fmt(gain)} * p.pv * ps.k ELSE 0.0 END,
       |    r.model + CASE WHEN r.l_idx = p.pl AND r.m_idx = p.pm
       |          THEN ${fmt(gain)} * p.pv ELSE 0.0 END
       |  FROM r
       |  CROSS JOIN (SELECT l_idx AS pl, m_idx AS pm, v AS pv FROM r
       |              ORDER BY abs(v) DESC, l_idx ASC, m_idx ASC LIMIT 1) p
       |  CROSS JOIN thr
       |  LEFT JOIN psf ps ON ps.l_idx = 8 + r.l_idx - p.pl
       |                  AND ps.m_idx = 8 + r.m_idx - p.pm
       |  WHERE r.it < $niter AND abs(p.pv) > thr.t)
       |SELECT 0 AS img_chan, 0 AS pol, l_idx, m_idx,
       |  floor(model * 1000000.0 + 0.5) / 1000000.0 AS model,
       |  floor(v * 1000000.0 + 0.5) / 1000000.0 AS residual
       |FROM r WHERE it = (SELECT max(it) FROM r)""".stripMargin

  /** The shared gridding + DFT-inversion CTE block: everything from
    * the 49-tap scatter through the `img` (data) and `psf` plane CTEs,
    * both unrounded. Consumes a `fx(u, v, re, im, weight, freq)` CTE.
    */
  private def imagingPrefixSql: String = {
    def lst(a: Array[Double]) = a.map(fmt).mkString("[", ", ", "]")
    val tapsFor = (frac: String) =>
      s"""SELECT uc + du AS u_idx, vc + dv AS v_idx,
         |    cgk.t[abs(100 * du + ufrac) + 1] * cgk.t[abs(100 * dv + vfrac) + 1] AS conv,
         |    gre, gim
         |  FROM $frac
         |  CROSS JOIN generate_series(-3, 3) tu(du)
         |  CROSS JOIN generate_series(-3, 3) tv(dv)
         |  CROSS JOIN cgk
         |  WHERE cgk.t[abs(100 * du + ufrac) + 1] * cgk.t[abs(100 * dv + vfrac) + 1] <> 0.0""".stripMargin
    val sumwFor = (frac: String) =>
      s"""SELECT sum(
         |    list_sum(list_transform(generate_series(-3, 3), du_ ->
         |      cgk.t[abs(100 * du_ + ufrac) + 1])) *
         |    list_sum(list_transform(generate_series(-3, 3), dv_ ->
         |      cgk.t[abs(100 * dv_ + vfrac) + 1])) * weight) AS sw
         |  FROM $frac CROSS JOIN cgk""".stripMargin
    s"""cgk AS (SELECT ${lst(GridOps.cgk1D(100, 7))}::DOUBLE[] AS t),
         |corr AS (SELECT ${lst(GridOps.correcting1D(32))}::DOUBLE[] AS t),
         |geom AS (
         |  SELECT *,
         |    u * ((-((freq * 0.002) * 32)) / 299792458.0) + 16 AS u_pos,
         |    v * ((-((freq * 0.002) * 32)) / 299792458.0) + 16 AS v_pos
         |  FROM fx),
         |idx AS (
         |  SELECT *,
         |    CAST(floor(u_pos + 0.5) AS INT) AS uc,
         |    CAST(floor(v_pos + 0.5) AS INT) AS vc,
         |    re * weight AS wre, im * weight AS wim
         |  FROM geom
         |  WHERE CAST(floor(u_pos + 0.5) AS INT) + 3 < 32
         |    AND CAST(floor(v_pos + 0.5) AS INT) + 3 < 32
         |    AND CAST(floor(u_pos + 0.5) AS INT) - 3 >= 0
         |    AND CAST(floor(v_pos + 0.5) AS INT) - 3 >= 0),
         |frac_i AS (
         |  SELECT *,
         |    CAST(floor((uc - u_pos) * 100 + 0.5) AS INT) AS ufrac,
         |    CAST(floor((vc - v_pos) * 100 + 0.5) AS INT) AS vfrac,
         |    wre AS gre, wim AS gim
         |  FROM idx WHERE (wre <> 0.0 OR wim <> 0.0)),
         |frac_p AS (
         |  SELECT *,
         |    CAST(floor((uc - u_pos) * 100 + 0.5) AS INT) AS ufrac,
         |    CAST(floor((vc - v_pos) * 100 + 0.5) AS INT) AS vfrac,
         |    weight AS gre, 0.0 AS gim
         |  FROM idx WHERE weight <> 0.0),
         |taps_i AS (${tapsFor("frac_i")}),
         |taps_p AS (${tapsFor("frac_p")}),
         |grid_i AS (
         |  SELECT u_idx, v_idx, sum(conv * gre) AS gre, sum(conv * gim) AS gim
         |  FROM taps_i GROUP BY 1, 2),
         |grid_p AS (
         |  SELECT u_idx, v_idx, sum(conv * gre) AS gre
         |  FROM taps_p GROUP BY 1, 2),
         |sumw_i AS (${sumwFor("frac_i")}),
         |sumw_p AS (${sumwFor("frac_p")}),
         |px AS (
         |  SELECT l_out, m_out, l_out + 8 AS lp, m_out + 8 AS mp
         |  FROM generate_series(0, 15) tl(l_out)
         |  CROSS JOIN generate_series(0, 15) tm(m_out)),
         |img AS MATERIALIZED (
         |  SELECT px.l_out AS l_idx, px.m_out AS m_idx,
         |    sum(g.gre * cos(2 * pi() * ((g.u_idx - 16) * (px.lp - 16) + (g.v_idx - 16) * (px.mp - 16)) / 32.0)
         |      - g.gim * sin(2 * pi() * ((g.u_idx - 16) * (px.lp - 16) + (g.v_idx - 16) * (px.mp - 16)) / 32.0))
         |      / (SELECT CASE WHEN sw = 0 THEN 1.0 ELSE sw END FROM sumw_i)
         |      / (corr.t[px.lp + 1] * corr.t[px.mp + 1]) AS v
         |  FROM grid_i g CROSS JOIN px CROSS JOIN corr
         |  GROUP BY px.l_out, px.m_out, px.lp, px.mp, corr.t),
         |-- MATERIALIZED: DuckDB inlines single-reference CTEs, and a
         |-- CTE referenced from inside a recursive term is re-evaluated
         |-- at EVERY recursion level — without the hint each Hogbom
         |-- level recomputed this whole gridding + DFT chain (measured
         |-- 10.4 s -> 0.3 s on deconvolve_point_clean)
         |psf AS MATERIALIZED (
         |  SELECT px.l_out AS l_idx, px.m_out AS m_idx,
         |    sum(g.gre * cos(2 * pi() * ((g.u_idx - 16) * (px.lp - 16) + (g.v_idx - 16) * (px.mp - 16)) / 32.0))
         |      / (SELECT CASE WHEN sw = 0 THEN 1.0 ELSE sw END FROM sumw_p)
         |      / (corr.t[px.lp + 1] * corr.t[px.mp + 1]) AS k
         |  FROM grid_p g CROSS JOIN px CROSS JOIN corr
         |  GROUP BY px.l_out, px.m_out, px.lp, px.mp, corr.t)""".stripMargin
  }

  /** One Hogbom iteration IS closed-form (peak -> model += gain*peak,
    * residual -= gain*peak*shifted-psf), so the CLEAN kernel's update
    * rule gets an exact oracle; the multi-iteration query below stays
    * rows-only.
    */
  private val cleanOneIterQ = Q(
    (s, d) => {
      val grid = ImageOps.makeEmptySkyImage(s, (0.0, 0.0), (16, 16),
        (0.0005, 0.0005))
        .withColumn("img_chan", lit(0)).withColumn("pol", lit(0))
      val img = grid.withColumn("image",
        sin(col("l_idx") * 1.3) + cos(col("m_idx") * 0.7) +
          when(col("l_idx") === 5 && col("m_idx") === 9, 4.0).otherwise(0.0))
      val psf = BeamOps.gaussianBeam(grid, 400.0, 300.0, 0.0,
        (0.0005, 0.0005), 16, 16).withColumnRenamed("beam", "image")
      CleanOps.cleanPlanes(s, img, psf, 16, 16, 16, 16,
          gain = 0.3, threshold = 0.0, niter = 1)
        .select(col("l_idx"), col("m_idx"),
          qround(col("model"), 6).as("model"),
          qround(col("residual"), 6).as("residual"))
    }, {
      val incr = 0.0005 * 180 / math.Pi * 3600
      val (dc1, dc2) = (400.0 / incr, 300.0 / incr)
      val ln2x4 = 4 * math.log(2)
      val al = ln2x4 / (dc1 * dc1)
      val ga = ln2x4 / (dc2 * dc2)
      s"""WITH px AS (
         |  SELECT CAST(i // 16 AS INT) AS l_idx, CAST(i % 16 AS INT) AS m_idx
         |  FROM generate_series(0, 255) t(i)),
         |img AS (SELECT l_idx, m_idx,
         |  sin(l_idx * CAST(1.3 AS DOUBLE)) + cos(m_idx * CAST(0.7 AS DOUBLE)) +
         |    CASE WHEN l_idx = 5 AND m_idx = 9 THEN 4.0 ELSE 0.0 END AS v
         |  FROM px),
         |psf AS (SELECT l_idx, m_idx,
         |  exp(-(${fmt(al)} * (l_idx - 8) * (l_idx - 8)
         |      + ${fmt(ga)} * (m_idx - 8) * (m_idx - 8))) AS k
         |  FROM px),
         |peak AS (SELECT l_idx AS pl, m_idx AS pm, v AS pv FROM img
         |         ORDER BY abs(v) DESC, l_idx ASC, m_idx ASC LIMIT 1)
         |SELECT i.l_idx, i.m_idx,
         |  floor((CASE WHEN i.l_idx = p.pl AND i.m_idx = p.pm
         |         THEN 0.3 * p.pv ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS model,
         |  floor((i.v - CASE WHEN (8 + i.l_idx - p.pl) BETWEEN 0 AND 15
         |                     AND (8 + i.m_idx - p.pm) BETWEEN 0 AND 15
         |               THEN 0.3 * p.pv * ps.k ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS residual
         |FROM img i CROSS JOIN peak p
         |LEFT JOIN psf ps ON ps.l_idx = 8 + i.l_idx - p.pl
         |                AND ps.m_idx = 8 + i.m_idx - p.pm""".stripMargin
    })

  // -------------------------------------------------------- fit_gaussian_rl

  /** n x n determinant as a SQL expression via first-row cofactor
    * expansion (the oracle side of Cramer's rule; the operator solves
    * by Gaussian elimination — output quantization absorbs the
    * ~1e-12 fp-path gap, same pattern as fit_gaussian).
    */
  private def detSql(m: Vector[Vector[String]]): String =
    if (m.length == 1) m(0)(0)
    else m(0).indices.map { j =>
      val minor = m.tail.map(row => row.take(j) ++ row.drop(j + 1))
      val term = s"(${m(0)(j)}) * (${detSql(minor)})"
      if (j % 2 == 0) s"+ $term" else s"- $term"
    }.mkString("(", " ", ")")

  /** Catmull-Rom cubic as SQL — op order mirrors BeamOps.catmullRom. */
  private def crSql(p0: String, p1: String, p2: String, p3: String,
                    t: String): String =
    s"(0.5 * ((2.0 * $p1 + ($p2 - $p0) * $t) + " +
      s"(((2.0 * $p0 - 5.0 * $p1 + 4.0 * $p2 - $p3) * ($t * $t)) + " +
      s"((-$p0 + 3.0 * $p1 - 3.0 * $p2 + $p3) * (($t * $t) * $t)))))"

  /** fit_gaussian_rl on a synthesized 33x33 beam: the oracle replays
    * the whole chain — window, Catmull-Rom oversampling, contour-band
    * selection (bit-identical values, so the discrete point set
    * matches), conic normal equations, Cramer's-rule solve, and the
    * reference's ellipse conversion formulas.
    */
  private val fitGaussianRlQ = Q(
    (s, d) => {
      val grid = ImageOps.makeEmptySkyImage(s, (0.0, 0.0), (33, 33),
        (0.0005, 0.0005))
        .withColumn("img_chan", lit(0)).withColumn("pol", lit(0))
      val incr = 0.0005 * 180 / math.Pi * 3600
      val beam = BeamOps.gaussianBeam(grid, 1200.0, 800.0, 30.0,
        (0.0005, 0.0005), 33, 33).withColumnRenamed("beam", "image")
      BeamOps.fitGaussianRl(s, beam, 33, 33, (17, 17), (81, 81),
          cutoff = 0.5, sensitivity = 0.01, delta = (incr, incr))
        .select(col("img_chan"), col("pol"),
          qround(col("major"), 5).as("major"),
          qround(col("minor"), 5).as("minor"),
          qround(col("phi_deg"), 5).as("phi_deg"), col("n_points"))
    }, {
      val incr = 0.0005 * 180 / math.Pi * 3600
      val (dc1, dc2) = (1200.0 / incr, 800.0 / incr)
      val t0 = 30.0 * math.Pi / 180
      val ln2x4 = 4 * math.log(2)
      val al = ln2x4 * (math.pow(math.cos(t0), 2) / (dc1 * dc1) +
        math.pow(math.sin(t0), 2) / (dc2 * dc2))
      val be = 2 * ln2x4 * (1 / (dc1 * dc1) - 1 / (dc2 * dc2)) *
        math.sin(t0) * math.cos(t0)
      val ga = ln2x4 * (math.pow(math.sin(t0), 2) / (dc1 * dc1) +
        math.pow(math.cos(t0), 2) / (dc2 * dc2))
      val step = 16.0 / 80.0 // (npix-1)/(sampling-1), same both axes
      // 16 bicubic taps: beam value at window (clamp(i0+di), clamp(j0+dj))
      val tapJoins = (for (di <- -1 to 2; dj <- -1 to 2) yield {
        val nm = s"b${di + 1}${dj + 1}"
        s"JOIN beam $nm ON $nm.l_idx = 8 + least(greatest(i0 + $di, 0), 16) " +
          s"AND $nm.m_idx = 8 + least(greatest(j0 + $dj, 0), 16)"
      }).mkString("\n")
      val rows = (-1 to 2).map(di =>
        crSql(s"b${di + 1}0.v", s"b${di + 1}1.v", s"b${di + 1}2.v",
          s"b${di + 1}3.v", "fy"))
      val vExpr = crSql(rows(0), rows(1), rows(2), rows(3), "fx")
      // 5x5 normal-equation entries as moment column names
      val basis = Vector("(x * x)", "(x * y)", "(y * y)", "x", "y")
      val momDefs = (for (i <- 0 until 5; j <- i until 5) yield
        s"sum(${basis(i)} * ${basis(j)}) AS m$i$j").mkString(",\n    ")
      val rhsDefs = (0 until 5).map(i => s"sum(${basis(i)}) AS r$i")
        .mkString(", ")
      def mm(i: Int, j: Int): String = if (i <= j) s"m$i$j" else s"m$j$i"
      val mMat = Vector.tabulate(5, 5)((i, j) => mm(i, j))
      val det = detSql(mMat)
      val cols = (0 until 5).map { k =>
        val rep = Vector.tabulate(5, 5)((i, j) =>
          if (j == k) s"r$i" else mm(i, j))
        s"(${detSql(rep)}) / ($det) AS c$k"
      }.mkString(",\n    ")
      s"""WITH px AS (
         |  SELECT CAST(i // 33 AS INT) AS l_idx, CAST(i % 33 AS INT) AS m_idx
         |  FROM generate_series(0, 1088) t(i)),
         |beam AS (SELECT l_idx, m_idx,
         |  exp(-(${fmt(al)} * (l_idx - 16) * (l_idx - 16)
         |      + ${fmt(be)} * (l_idx - 16) * (m_idx - 16)
         |      + ${fmt(ga)} * (m_idx - 16) * (m_idx - 16))) AS v
         |  FROM px),
         |samp AS (
         |  SELECT s0.si, s1.sj,
         |    CAST(least(floor(s0.si * ${fmt(step)}), 15) AS INT) AS i0,
         |    s0.si * ${fmt(step)} - CAST(least(floor(s0.si * ${fmt(step)}), 15) AS INT) AS fx,
         |    CAST(least(floor(s1.sj * ${fmt(step)}), 15) AS INT) AS j0,
         |    s1.sj * ${fmt(step)} - CAST(least(floor(s1.sj * ${fmt(step)}), 15) AS INT) AS fy
         |  FROM generate_series(0, 80) s0(si) CROSS JOIN generate_series(0, 80) s1(sj)),
         |vals AS (
         |  SELECT si, sj, $vExpr AS v
         |  FROM samp
         |  $tapJoins),
         |contour AS (
         |  SELECT CAST(si AS DOUBLE) AS cx, CAST(sj AS DOUBLE) AS cy
         |  FROM vals WHERE abs(v - 0.5) < 0.01),
         |ctr AS (
         |  SELECT sum(cx) / count(*) AS xm, sum(cy) / count(*) AS ym,
         |    count(*) AS n
         |  FROM contour),
         |pts AS (
         |  SELECT (cx - xm) / 32.0 AS x, (cy - ym) / 32.0 AS y
         |  FROM contour CROSS JOIN ctr),
         |mom AS (
         |  SELECT $momDefs,
         |    $rhsDefs
         |  FROM pts),
         |cfs AS (
         |  SELECT $cols
         |  FROM mom),
         |conic AS (
         |  SELECT c0 AS a0, c1 / 2 AS b0, c2 AS cc0, c3 / 2 AS d0,
         |    c4 / 2 AS f0, -1.0 AS g0
         |  FROM cfs),
         |ell AS (
         |  SELECT
         |    CASE WHEN b0 = 0.0 THEN (CASE WHEN a0 > cc0 THEN 0.0 ELSE pi() / 2 END)
         |         WHEN a0 < cc0 THEN atan(2 * b0 / (a0 - cc0)) / 2
         |         ELSE pi() / 2 + atan(2 * b0 / (a0 - cc0)) / 2 END AS phi0,
         |    2 * (a0 * f0 * f0 + cc0 * d0 * d0 + g0 * b0 * b0
         |      - 2 * b0 * d0 * f0 - a0 * cc0 * g0) AS up,
         |    (b0 * b0 - a0 * cc0) *
         |      (sqrt((a0 - cc0) * (a0 - cc0) + 4 * b0 * b0) - (a0 + cc0)) AS down1,
         |    (b0 * b0 - a0 * cc0) *
         |      (-sqrt((a0 - cc0) * (a0 - cc0) + 4 * b0 * b0) - (a0 + cc0)) AS down2
         |  FROM conic),
         |res AS (
         |  SELECT sqrt(up / down1) * 32.0 AS res1, sqrt(up / down2) * 32.0 AS res2,
         |    CASE WHEN phi0 * 180.0 / pi() - 90.0 < -90.0
         |         THEN phi0 * 180.0 / pi() - 90.0 + 180.0
         |         ELSE phi0 * 180.0 / pi() - 90.0 END AS phi_deg
         |  FROM ell)
         |SELECT 0 AS img_chan, 0 AS pol,
         |  floor((res1 / 80 * 16 * ${fmt(incr)} * 2) * 100000.0 + 0.5) / 100000.0 AS major,
         |  floor((res2 / 80 * 16 * ${fmt(incr)} * 2) * 100000.0 + 0.5) / 100000.0 AS minor,
         |  floor(phi_deg * 100000.0 + 0.5) / 100000.0 AS phi_deg,
         |  CAST(ctr.n AS INT) AS n_points
         |FROM res CROSS JOIN ctr""".stripMargin
    })

  /** TWO Hogbom iterations in closed form: iteration 1's residual is a
    * row-wise expression, so iteration 2's peak search and update are
    * plain SQL over it — the oracle now checks the iteration
    * RECURRENCE (peak of the updated residual), not just one step.
    */
  private val cleanTwoIterQ = Q(
    (s, d) => {
      val grid = ImageOps.makeEmptySkyImage(s, (0.0, 0.0), (16, 16),
        (0.0005, 0.0005))
        .withColumn("img_chan", lit(0)).withColumn("pol", lit(0))
      val img = grid.withColumn("image",
        sin(col("l_idx") * 1.3) + cos(col("m_idx") * 0.7) +
          when(col("l_idx") === 5 && col("m_idx") === 9, 4.0).otherwise(0.0))
      val psf = BeamOps.gaussianBeam(grid, 400.0, 300.0, 0.0,
        (0.0005, 0.0005), 16, 16).withColumnRenamed("beam", "image")
      CleanOps.cleanPlanes(s, img, psf, 16, 16, 16, 16,
          gain = 0.3, threshold = 0.0, niter = 2)
        .select(col("l_idx"), col("m_idx"),
          qround(col("model"), 6).as("model"),
          qround(col("residual"), 6).as("residual"))
    }, {
      val incr = 0.0005 * 180 / math.Pi * 3600
      val (dc1, dc2) = (400.0 / incr, 300.0 / incr)
      val ln2x4 = 4 * math.log(2)
      val al = ln2x4 / (dc1 * dc1)
      val ga = ln2x4 / (dc2 * dc2)
      s"""WITH px AS (
         |  SELECT CAST(i // 16 AS INT) AS l_idx, CAST(i % 16 AS INT) AS m_idx
         |  FROM generate_series(0, 255) t(i)),
         |img AS (SELECT l_idx, m_idx,
         |  sin(l_idx * CAST(1.3 AS DOUBLE)) + cos(m_idx * CAST(0.7 AS DOUBLE)) +
         |    CASE WHEN l_idx = 5 AND m_idx = 9 THEN 4.0 ELSE 0.0 END AS v
         |  FROM px),
         |psf AS (SELECT l_idx, m_idx,
         |  exp(-(${fmt(al)} * (l_idx - 8) * (l_idx - 8)
         |      + ${fmt(ga)} * (m_idx - 8) * (m_idx - 8))) AS k
         |  FROM px),
         |p1 AS (SELECT l_idx AS pl, m_idx AS pm, v AS pv FROM img
         |       ORDER BY abs(v) DESC, l_idx ASC, m_idx ASC LIMIT 1),
         |r1 AS (
         |  SELECT i.l_idx, i.m_idx, p1.pl, p1.pm, p1.pv,
         |    i.v - CASE WHEN (8 + i.l_idx - p1.pl) BETWEEN 0 AND 15
         |                AND (8 + i.m_idx - p1.pm) BETWEEN 0 AND 15
         |          THEN 0.3 * p1.pv * ps.k ELSE 0.0 END AS v1
         |  FROM img i CROSS JOIN p1
         |  LEFT JOIN psf ps ON ps.l_idx = 8 + i.l_idx - p1.pl
         |                  AND ps.m_idx = 8 + i.m_idx - p1.pm),
         |p2 AS (SELECT l_idx AS pl2, m_idx AS pm2, v1 AS pv2 FROM r1
         |       ORDER BY abs(v1) DESC, l_idx ASC, m_idx ASC LIMIT 1)
         |SELECT r1.l_idx, r1.m_idx,
         |  floor((CASE WHEN r1.l_idx = r1.pl AND r1.m_idx = r1.pm
         |         THEN 0.3 * r1.pv ELSE 0.0 END
         |       + CASE WHEN r1.l_idx = p2.pl2 AND r1.m_idx = p2.pm2
         |         THEN 0.3 * p2.pv2 ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS model,
         |  floor((r1.v1 - CASE WHEN (8 + r1.l_idx - p2.pl2) BETWEEN 0 AND 15
         |                      AND (8 + r1.m_idx - p2.pm2) BETWEEN 0 AND 15
         |                 THEN 0.3 * p2.pv2 * ps2.k ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS residual
         |FROM r1 CROSS JOIN p2
         |LEFT JOIN psf ps2 ON ps2.l_idx = 8 + r1.l_idx - p2.pl2
         |                 AND ps2.m_idx = 8 + r1.m_idx - p2.pm2""".stripMargin
    })

  /** MULTI-iteration Hogbom replayed as a DuckDB recursive CTE: the
    * working table carries (residual, model) per pixel; each recursive
    * step re-derives the plane peak (argmax with the kernel's
    * first-strict-max row-major tie-break) from the previous
    * iteration's rows and applies the exact update rule of
    * clean_one_iter — so the whole loop, not just one unrolled step,
    * is oracle-checked. The stop predicate mirrors _clean_jit's
    * threshold-relative-to-initial-peak semantics: iterate while
    * |peak| > threshold * |initial peak| AND it < niter.
    */
  private def cleanRecursiveSql(gain: Double, threshold: Double,
                                niter: Int): String = {
    val incr = 0.0005 * 180 / math.Pi * 3600
    val (dc1, dc2) = (400.0 / incr, 300.0 / incr)
    val ln2x4 = 4 * math.log(2)
    val al = ln2x4 / (dc1 * dc1)
    val ga = ln2x4 / (dc2 * dc2)
    s"""WITH RECURSIVE px AS (
       |  SELECT CAST(i // 16 AS INT) AS l_idx, CAST(i % 16 AS INT) AS m_idx
       |  FROM generate_series(0, 255) t(i)),
       |img AS (SELECT l_idx, m_idx,
       |  sin(l_idx * CAST(1.3 AS DOUBLE)) + cos(m_idx * CAST(0.7 AS DOUBLE)) +
       |    CASE WHEN l_idx = 5 AND m_idx = 9 THEN 4.0 ELSE 0.0 END AS v
       |  FROM px),
       |psf AS MATERIALIZED (SELECT l_idx, m_idx,
       |  exp(-(${fmt(al)} * (l_idx - 8) * (l_idx - 8)
       |      + ${fmt(ga)} * (m_idx - 8) * (m_idx - 8))) AS k
       |  FROM px),
       |thr AS MATERIALIZED (SELECT ${fmt(threshold)} * abs(v) AS t FROM img
       |        ORDER BY abs(v) DESC, l_idx ASC, m_idx ASC LIMIT 1),
       |r AS (
       |  SELECT 0 AS it, l_idx, m_idx, v, CAST(0 AS DOUBLE) AS model
       |  FROM img
       |  UNION ALL
       |  SELECT r.it + 1, r.l_idx, r.m_idx,
       |    r.v - CASE WHEN (8 + r.l_idx - p.pl) BETWEEN 0 AND 15
       |                AND (8 + r.m_idx - p.pm) BETWEEN 0 AND 15
       |          THEN ${fmt(gain)} * p.pv * ps.k ELSE 0.0 END,
       |    r.model + CASE WHEN r.l_idx = p.pl AND r.m_idx = p.pm
       |          THEN ${fmt(gain)} * p.pv ELSE 0.0 END
       |  FROM r
       |  CROSS JOIN (SELECT l_idx AS pl, m_idx AS pm, v AS pv FROM r
       |              ORDER BY abs(v) DESC, l_idx ASC, m_idx ASC LIMIT 1) p
       |  CROSS JOIN thr
       |  LEFT JOIN psf ps ON ps.l_idx = 8 + r.l_idx - p.pl
       |                  AND ps.m_idx = 8 + r.m_idx - p.pm
       |  WHERE r.it < $niter AND abs(p.pv) > thr.t)
       |SELECT l_idx, m_idx,
       |  floor(model * 1000000.0 + 0.5) / 1000000.0 AS model,
       |  floor(v * 1000000.0 + 0.5) / 1000000.0 AS residual
       |FROM r WHERE it = (SELECT max(it) FROM r)""".stripMargin
  }

  private def cleanFixtureRun(s: SparkSession, gain: Double,
                              threshold: Double, niter: Int) = {
    val grid = ImageOps.makeEmptySkyImage(s, (0.0, 0.0), (16, 16),
      (0.0005, 0.0005))
      .withColumn("img_chan", lit(0)).withColumn("pol", lit(0))
    val img = grid.withColumn("image",
      sin(col("l_idx") * 1.3) + cos(col("m_idx") * 0.7) +
        when(col("l_idx") === 5 && col("m_idx") === 9, 4.0).otherwise(0.0))
    val psf = BeamOps.gaussianBeam(grid, 400.0, 300.0, 0.0,
      (0.0005, 0.0005), 16, 16).withColumnRenamed("beam", "image")
    CleanOps.cleanPlanes(s, img, psf, 16, 16, 16, 16,
        gain = gain, threshold = threshold, niter = niter)
      .select(col("l_idx"), col("m_idx"),
        qround(col("model"), 6).as("model"),
        qround(col("residual"), 6).as("residual"))
  }

  /** Five full Hogbom iterations, hash-exact via the recursive CTE. */
  private val cleanFiveIterQ = Q(
    (s, d) => cleanFixtureRun(s, gain = 0.3, threshold = 0.0, niter = 5),
    cleanRecursiveSql(gain = 0.3, threshold = 0.0, niter = 5))

  /** CLEAN run to its own convergence criterion (|peak| falls under
    * threshold x |initial peak| before niter) — the complete
    * deconvolve_point_clean loop semantics, hash-exact.
    */
  private val cleanConvergedQ = Q(
    (s, d) => cleanFixtureRun(s, gain = 0.3, threshold = 0.3, niter = 50),
    cleanRecursiveSql(gain = 0.3, threshold = 0.3, niter = 50))

  /** deconvolve_multiterm_clean, MS-Clean option (nterms=1): the full
    * iterative multi-scale kernel on the gridded fixture — rows-only
    * (iterative), with the one-iteration recurrence oracled exactly
    * below (same pattern as clean_one_iter).
    */
  private val msCleanQ = Q(
    (s, d) => {
      val p = GridOps.GridParams((32, 32), (0.002, 0.002),
        imageSize = Some((16, 16)))
      val fx = Tables.lineitem(s, d).select(
        lit(0).as("img_chan"), lit(0).as("pol"),
        (col("l_extendedprice") % 60.0 - 30.0).as("u"),
        ((col("l_quantity") * 3.0 + col("l_linenumber")) % 60.0 - 30.0).as("v"),
        col("l_tax").as("re"), col("l_discount").as("im"),
        (col("l_discount") + 0.5).as("weight"), lit(1.5e9).as("freq"))
      val (img, psf) = GridOps.makeImageAndPsf(s, fx, p)
      // niter 20 (was 50): each level is a heavy recursive-CTE step in
      // the oracle (dual smoothed residuals + scored argmax); 50 cost
      // ~20 s of the driver's DuckDB budget
      CleanOps.msCleanPlanes(s, img, psf, 16, 16, 16, 16,
          scales = Seq(0, 2), gain = 0.2, threshold = 0.05, niter = 20)
        .select(col("img_chan"), col("pol"), col("l_idx"), col("m_idx"),
          qround(col("model"), 6).as("model"),
          qround(col("residual"), 6).as("residual"))
    },
    {
      // The FULL multi-scale CLEAN replayed recursively, hash-exact:
      // the working table carries BOTH smoothed residuals (scale 0 =
      // identity, scale 2 = the tapered-paraboloid kernel) plus the
      // model per pixel; each level takes the bias-weighted argmax
      // across (scale, pixel) with the kernel's scan-order tie-break,
      // adds coeff * k_best to the model, and subtracts
      // coeff * cross(best, s) from every smoothed residual. The
      // cross-convolution tables psf(x)k2 and psf(x)k2(x)k2 are
      // precomputed CTEs; biases and the scale kernel are emitted as
      // exact double literals from the Scala arrays.
      def lst(a: Array[Double]) = a.map(fmt).mkString("[", ", ", "]")
      val k2 = lst(CleanOps.scaleKernel(2)._1)
      val bias1 = fmt(1.0 - 0.6 * 2.0 / 2.0)
      val conv5 = (src: String, vcol: String, out: String) =>
        s"""SELECT p.l_idx, p.m_idx,
           |    coalesce(sum(i.$vcol * k2.t[(d1.di + 2) * 5 + (d2.dj + 2) + 1]), 0.0) AS $out
           |  FROM (SELECT l_idx, m_idx FROM $src) p
           |  CROSS JOIN generate_series(-2, 2) d1(di)
           |  CROSS JOIN generate_series(-2, 2) d2(dj)
           |  CROSS JOIN k2
           |  LEFT JOIN $src i ON i.l_idx = p.l_idx - d1.di
           |                  AND i.m_idx = p.m_idx - d2.dj
           |  GROUP BY 1, 2""".stripMargin
      s"""WITH RECURSIVE fx AS (
         |  SELECT l_extendedprice % 60.0 - 30.0 AS u,
         |    (l_quantity * 3.0 + l_linenumber) % 60.0 - 30.0 AS v,
         |    l_tax AS re, l_discount AS im, l_discount + 0.5 AS weight,
         |    1500000000.0 AS freq
         |  FROM lineitem),
         |$imagingPrefixSql,
         |k2 AS MATERIALIZED (SELECT $k2::DOUBLE[] AS t),
         |r1init AS (${conv5("img", "v", "v")}),
         |crossA AS MATERIALIZED (${conv5("psf", "k", "x")}),
         |crossB AS MATERIALIZED (${conv5("crossA", "x", "x")}),
         |nrm AS MATERIALIZED (
         |  SELECT (SELECT k FROM psf WHERE l_idx = 8 AND m_idx = 8) AS n0,
         |         (SELECT x FROM crossB WHERE l_idx = 8 AND m_idx = 8) AS n1),
         |state0 AS MATERIALIZED (
         |  SELECT i.l_idx, i.m_idx, i.v AS r0, r1.v AS r1,
         |    CAST(0 AS DOUBLE) AS model
         |  FROM img i JOIN r1init r1 USING (l_idx, m_idx)),
         |stp AS MATERIALIZED (
         |  SELECT ${fmt(0.05)} * max(biased) AS stop FROM (
         |    SELECT abs(r0) * 1.0e0 AS biased FROM state0
         |    UNION ALL
         |    SELECT abs(r1) * $bias1 FROM state0)),
         |r AS (
         |  SELECT 0 AS it, l_idx, m_idx, r0, r1, model FROM state0
         |  UNION ALL
         |  SELECT r.it + 1, r.l_idx, r.m_idx,
         |    r.r0 - CASE WHEN (8 + r.l_idx - pk.pl) BETWEEN 0 AND 15
         |                 AND (8 + r.m_idx - pk.pm) BETWEEN 0 AND 15
         |           THEN pk.coeff * (CASE WHEN pk.s0 = 0 THEN ps.k ELSE ca.x END)
         |           ELSE 0.0 END,
         |    r.r1 - CASE WHEN (8 + r.l_idx - pk.pl) BETWEEN 0 AND 15
         |                 AND (8 + r.m_idx - pk.pm) BETWEEN 0 AND 15
         |           THEN pk.coeff * (CASE WHEN pk.s0 = 0 THEN ca.x ELSE cb.x END)
         |           ELSE 0.0 END,
         |    r.model + CASE
         |      WHEN pk.s0 = 0 AND r.l_idx = pk.pl AND r.m_idx = pk.pm
         |        THEN pk.coeff * 1.0e0
         |      WHEN pk.s0 = 1 AND abs(r.l_idx - pk.pl) <= 2
         |        AND abs(r.m_idx - pk.pm) <= 2
         |        THEN pk.coeff * k2.t[(r.l_idx - pk.pl + 2) * 5 + (r.m_idx - pk.pm + 2) + 1]
         |      ELSE 0.0 END
         |  FROM r
         |  CROSS JOIN (
         |    SELECT pl, pm, s AS s0, biased,
         |      (${fmt(0.2)} * pv) / (CASE WHEN s = 0 THEN nrm.n0 ELSE nrm.n1 END) AS coeff
         |    FROM (
         |      SELECT l_idx AS pl, m_idx AS pm, s, pv, biased,
         |        row_number() OVER (ORDER BY biased DESC, s ASC,
         |                           l_idx ASC, m_idx ASC) AS rn
         |      FROM (
         |        SELECT it, l_idx, m_idx, 0 AS s, r0 AS pv,
         |          abs(r0) * 1.0e0 AS biased FROM r
         |        UNION ALL
         |        SELECT it, l_idx, m_idx, 1, r1, abs(r1) * $bias1 FROM r)
         |    ) q CROSS JOIN nrm
         |    WHERE rn = 1) pk(pl, pm, s0, biased, coeff)
         |  CROSS JOIN stp
         |  CROSS JOIN k2
         |  LEFT JOIN psf ps ON ps.l_idx = 8 + r.l_idx - pk.pl
         |                  AND ps.m_idx = 8 + r.m_idx - pk.pm
         |  LEFT JOIN crossA ca ON ca.l_idx = 8 + r.l_idx - pk.pl
         |                     AND ca.m_idx = 8 + r.m_idx - pk.pm
         |  LEFT JOIN crossB cb ON cb.l_idx = 8 + r.l_idx - pk.pl
         |                     AND cb.m_idx = 8 + r.m_idx - pk.pm
         |  WHERE r.it < 20 AND pk.biased > stp.stop)
         |SELECT 0 AS img_chan, 0 AS pol, l_idx, m_idx,
         |  floor(model * 1000000.0 + 0.5) / 1000000.0 AS model,
         |  floor(r0 * 1000000.0 + 0.5) / 1000000.0 AS residual
         |FROM r WHERE it = (SELECT max(it) FROM r)""".stripMargin
    })

  /** One MS-CLEAN iteration in closed form: smoothed residuals per
    * scale, bias-weighted argmax over (scale, pixel), coeff =
    * gain * r_s(p) / (psf (x) k_s (x) k_s)(center), model += coeff *
    * k_s footprint, residual -= coeff * (psf (x) k_s) shifted. The
    * scale-tagged kernel table makes every step a generic join — no
    * branch on which scale wins.
    */
  private val msCleanOneIterQ = Q(
    (s, d) => {
      val grid = ImageOps.makeEmptySkyImage(s, (0.0, 0.0), (16, 16),
        (0.0005, 0.0005))
        .withColumn("img_chan", lit(0)).withColumn("pol", lit(0))
      val img = grid.withColumn("image",
        lit(3.0) * exp(-((col("l_idx") - 5) * (col("l_idx") - 5)
          + (col("m_idx") - 9) * (col("m_idx") - 9)) / 8.0) +
          when(col("l_idx") === 12 && col("m_idx") === 4, 1.5).otherwise(0.0))
      val psf = BeamOps.gaussianBeam(grid, 400.0, 300.0, 0.0,
        (0.0005, 0.0005), 16, 16).withColumnRenamed("beam", "image")
      CleanOps.msCleanPlanes(s, img, psf, 16, 16, 16, 16,
          scales = Seq(0, 2), gain = 0.2, threshold = 0.0, niter = 1,
          smallScaleBias = 0.6)
        .select(col("l_idx"), col("m_idx"),
          qround(col("model"), 6).as("model"),
          qround(col("residual"), 6).as("residual"))
    }, {
      val incr = 0.0005 * 180 / math.Pi * 3600
      val (dc1, dc2) = (400.0 / incr, 300.0 / incr)
      val ln2x4 = 4 * math.log(2)
      val al = ln2x4 / (dc1 * dc1)
      val ga = ln2x4 / (dc2 * dc2)
      s"""WITH px AS (
         |  SELECT CAST(i // 16 AS INT) AS l_idx, CAST(i % 16 AS INT) AS m_idx
         |  FROM generate_series(0, 255) t(i)),
         |img AS (SELECT l_idx, m_idx,
         |  3.0e0 * exp(-((l_idx - 5) * (l_idx - 5)
         |              + (m_idx - 9) * (m_idx - 9)) / 8.0e0)
         |  + CASE WHEN l_idx = 12 AND m_idx = 4 THEN 1.5e0 ELSE 0.0e0 END AS v
         |  FROM px),
         |psf AS (SELECT l_idx, m_idx,
         |  exp(-(${fmt(al)} * (l_idx - 8) * (l_idx - 8)
         |      + ${fmt(ga)} * (m_idx - 8) * (m_idx - 8))) AS k
         |  FROM px),
         |kk AS (
         |  SELECT 0 AS scale, 0 AS i, 0 AS j, 1.0e0 AS k
         |  UNION ALL
         |  SELECT 2, CAST(i AS INT), CAST(j AS INT),
         |    (1.0e0 - (i*i + j*j) / 4.0e0) / 6.0e0
         |  FROM generate_series(-2, 2) a(i) CROSS JOIN generate_series(-2, 2) b(j)
         |  WHERE i*i + j*j <= 4),
         |bias AS (SELECT 0 AS scale, 1.0e0 AS b
         |         UNION ALL SELECT 2, 1.0e0 - 0.6e0 * 2.0e0 / 2.0e0),
         |rs AS (
         |  SELECT kk.scale, p.l_idx, p.m_idx, sum(i.v * kk.k) AS v
         |  FROM px p
         |  JOIN img i ON true
         |  JOIN kk ON kk.i = p.l_idx - i.l_idx AND kk.j = p.m_idx - i.m_idx
         |  GROUP BY 1, 2, 3),
         |psfs AS (
         |  SELECT kk.scale, p.l_idx, p.m_idx, sum(f.k * kk.k) AS v
         |  FROM px p
         |  JOIN psf f ON true
         |  JOIN kk ON kk.i = p.l_idx - f.l_idx AND kk.j = p.m_idx - f.m_idx
         |  GROUP BY 1, 2, 3),
         |norm AS (
         |  SELECT ps.scale, sum(ps.v * kk.k) AS nv
         |  FROM psfs ps
         |  JOIN kk ON kk.scale = ps.scale
         |         AND ps.l_idx = 8 - kk.i AND ps.m_idx = 8 - kk.j
         |  GROUP BY 1),
         |cand AS (
         |  SELECT rs.scale, rs.l_idx AS pl, rs.m_idx AS pm, rs.v AS pv
         |  FROM rs JOIN bias USING (scale)
         |  ORDER BY abs(rs.v) * bias.b DESC, rs.scale ASC,
         |    rs.l_idx ASC, rs.m_idx ASC
         |  LIMIT 1),
         |cf AS (
         |  SELECT c.scale, c.pl, c.pm, 0.2e0 * c.pv / n.nv AS coeff
         |  FROM cand c JOIN norm n USING (scale))
         |SELECT p.l_idx, p.m_idx,
         |  floor(coalesce(cf.coeff * mk.k, 0.0e0) * 1000000.0 + 0.5)
         |    / 1000000.0 AS model,
         |  floor((i.v - coalesce(cf.coeff * ps.v, 0.0e0)) * 1000000.0 + 0.5)
         |    / 1000000.0 AS residual
         |FROM px p
         |JOIN img i USING (l_idx, m_idx)
         |CROSS JOIN cf
         |LEFT JOIN kk mk ON mk.scale = cf.scale
         |  AND mk.i = p.l_idx - cf.pl AND mk.j = p.m_idx - cf.pm
         |LEFT JOIN psfs ps ON ps.scale = cf.scale
         |  AND ps.l_idx = 8 + p.l_idx - cf.pl
         |  AND ps.m_idx = 8 + p.m_idx - cf.pm""".stripMargin
    })

  /** deconvolve_fast_resolve: Wiener/MAP deconvolution, oracled by a
    * direct DFT per transform (the radix-2 FFT and the DFT sums differ
    * only in addition order; qround(6) absorbs it — same device as the
    * make_image oracle).
    */
  private val fastResolveQ = Q(
    (s, d) => {
      val grid = ImageOps.makeEmptySkyImage(s, (0.0, 0.0), (16, 16),
        (0.0005, 0.0005))
        .withColumn("img_chan", lit(0)).withColumn("pol", lit(0))
      val img = grid.withColumn("image",
        lit(1.0) + lit(0.5) * sin(col("l_idx") * 0.4) +
          lit(0.3) * cos(col("m_idx") * 0.7))
      val psf = BeamOps.gaussianBeam(grid, 400.0, 300.0, 0.0,
        (0.0005, 0.0005), 16, 16).withColumnRenamed("beam", "image")
      CleanOps.fastResolve(s, img, psf, 16, 16, lambda = 0.01)
        .select(col("l_idx"), col("m_idx"),
          qround(col("model"), 6).as("model"),
          qround(col("error"), 6).as("error"))
    }, {
      val incr = 0.0005 * 180 / math.Pi * 3600
      val (dc1, dc2) = (400.0 / incr, 300.0 / incr)
      val ln2x4 = 4 * math.log(2)
      val al = ln2x4 / (dc1 * dc1)
      val ga = ln2x4 / (dc2 * dc2)
      s"""WITH px AS (
         |  SELECT CAST(i // 16 AS INT) AS l_idx, CAST(i % 16 AS INT) AS m_idx
         |  FROM generate_series(0, 255) t(i)),
         |img AS (SELECT l_idx, m_idx,
         |  1.0e0 + 0.5e0 * sin(l_idx * CAST(0.4 AS DOUBLE))
         |        + 0.3e0 * cos(m_idx * CAST(0.7 AS DOUBLE)) AS v
         |  FROM px),
         |psf AS (SELECT l_idx, m_idx,
         |  exp(-(${fmt(al)} * (l_idx - 8) * (l_idx - 8)
         |      + ${fmt(ga)} * (m_idx - 8) * (m_idx - 8))) AS k
         |  FROM px),
         |fimg AS (
         |  SELECT f.l_idx AS p, f.m_idx AS q,
         |    sum(i.v * cos(2 * pi() * (f.l_idx * i.l_idx + f.m_idx * i.m_idx) / 16.0)) AS re,
         |    -sum(i.v * sin(2 * pi() * (f.l_idx * i.l_idx + f.m_idx * i.m_idx) / 16.0)) AS im
         |  FROM px f JOIN img i ON true GROUP BY 1, 2),
         |fpsf AS (
         |  SELECT f.l_idx AS p, f.m_idx AS q,
         |    sum(k.k * cos(2 * pi() * (f.l_idx * k.l_idx + f.m_idx * k.m_idx) / 16.0)) AS re,
         |    -sum(k.k * sin(2 * pi() * (f.l_idx * k.l_idx + f.m_idx * k.m_idx) / 16.0)) AS im
         |  FROM px f JOIN psf k ON true GROUP BY 1, 2),
         |wien AS (
         |  SELECT i.p, i.q,
         |    (s.re * i.re + s.im * i.im) / (s.re * s.re + s.im * s.im + 0.01e0) AS mr,
         |    (s.re * i.im - s.im * i.re) / (s.re * s.re + s.im * s.im + 0.01e0) AS mi
         |  FROM fimg i JOIN fpsf s USING (p, q)),
         |err AS (
         |  SELECT sum(0.01e0 / (re * re + im * im + 0.01e0)) / 256.0 AS e
         |  FROM fpsf),
         |inv AS (
         |  SELECT o.l_idx, o.m_idx,
         |    sum(w.mr * cos(2 * pi() * (w.p * ((o.l_idx + 8) % 16) + w.q * ((o.m_idx + 8) % 16)) / 16.0)
         |      - w.mi * sin(2 * pi() * (w.p * ((o.l_idx + 8) % 16) + w.q * ((o.m_idx + 8) % 16)) / 16.0)) AS yre,
         |    sum(w.mr * sin(2 * pi() * (w.p * ((o.l_idx + 8) % 16) + w.q * ((o.m_idx + 8) % 16)) / 16.0)
         |      + w.mi * cos(2 * pi() * (w.p * ((o.l_idx + 8) % 16) + w.q * ((o.m_idx + 8) % 16)) / 16.0)) AS yim
         |  FROM px o JOIN wien w ON true GROUP BY 1, 2)
         |SELECT inv.l_idx, inv.m_idx,
         |  floor(yre / 256.0 * 1000000.0 + 0.5)
         |    / 1000000.0 AS model,
         |  floor(err.e * 1000000.0 + 0.5) / 1000000.0 AS error
         |FROM inv CROSS JOIN err""".stripMargin
    })

  /** deconvolve_adaptive_scale_pixel_clean, one iteration in closed
    * form: correlation-scored scale selection over a literal sigma
    * grid, best-fit amplitude, gaussian-component and psf-convolved
    * subtraction — all generic joins over a (sigma, r)-tagged tap
    * table. refineIters=0 here (grid-only) so the SQL stays closed
    * form; the continuous ternary-search refinement is exercised by
    * the rows-only query and ScalaTest.
    */
  private val aspCleanOneIterQ = Q(
    (s, d) => {
      val grid = ImageOps.makeEmptySkyImage(s, (0.0, 0.0), (16, 16),
        (0.0005, 0.0005))
        .withColumn("img_chan", lit(0)).withColumn("pol", lit(0))
      val img = grid.withColumn("image",
        lit(3.0) * exp(-((col("l_idx") - 6) * (col("l_idx") - 6)
          + (col("m_idx") - 10) * (col("m_idx") - 10)) / lit(2.0 * 1.8 * 1.8)) +
          lit(0.1) * sin(col("l_idx") * 0.9) * cos(col("m_idx") * 0.8))
      val psf = BeamOps.gaussianBeam(grid, 400.0, 300.0, 0.0,
        (0.0005, 0.0005), 16, 16).withColumnRenamed("beam", "image")
      CleanOps.aspCleanPlanes(s, img, psf, 16, 16, 16, 16,
          sigmas = Seq(1.0, 2.0, 3.0), gain = 0.3, threshold = 0.0,
          niter = 1, refineIters = 0)
        .select(col("l_idx"), col("m_idx"),
          qround(col("model"), 6).as("model"),
          qround(col("residual"), 6).as("residual"))
    }, {
      val incr = 0.0005 * 180 / math.Pi * 3600
      val (dc1, dc2) = (400.0 / incr, 300.0 / incr)
      val ln2x4 = 4 * math.log(2)
      val al = ln2x4 / (dc1 * dc1)
      val ga = ln2x4 / (dc2 * dc2)
      s"""WITH px AS (
         |  SELECT CAST(i // 16 AS INT) AS l_idx, CAST(i % 16 AS INT) AS m_idx
         |  FROM generate_series(0, 255) t(i)),
         |img AS (SELECT l_idx, m_idx,
         |  3.0e0 * exp(-((l_idx - 6) * (l_idx - 6)
         |              + (m_idx - 10) * (m_idx - 10)) / ${fmt(2.0 * 1.8 * 1.8)})
         |  + 0.1e0 * sin(l_idx * CAST(0.9 AS DOUBLE))
         |          * cos(m_idx * CAST(0.8 AS DOUBLE)) AS v
         |  FROM px),
         |psf AS (SELECT l_idx, m_idx,
         |  exp(-(${fmt(al)} * (l_idx - 8) * (l_idx - 8)
         |      + ${fmt(ga)} * (m_idx - 8) * (m_idx - 8))) AS k
         |  FROM px),
         |sg AS (SELECT * FROM (VALUES (1.0e0, 3), (2.0e0, 6), (3.0e0, 9))
         |       s(sigma, r)),
         |pk AS (SELECT l_idx AS pl, m_idx AS pm, v AS pv FROM img
         |       ORDER BY abs(v) DESC, l_idx ASC, m_idx ASC LIMIT 1),
         |taps AS (
         |  SELECT sg.sigma, CAST(a.i AS INT) AS i, CAST(b.j AS INT) AS j,
         |    exp(-(a.i * a.i + b.j * b.j)
         |        / (2.0e0 * sg.sigma * sg.sigma)) AS g
         |  FROM sg
         |  CROSS JOIN generate_series(-9, 9) a(i)
         |  CROSS JOIN generate_series(-9, 9) b(j)
         |  WHERE abs(a.i) <= sg.r AND abs(b.j) <= sg.r),
         |corr AS (
         |  -- fixed-order folds in the kernel's (i, j) loop order: a
         |  -- parallel float sum() could reorder additions run-to-run
         |  SELECT t.sigma,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list(i.v * t.g ORDER BY t.i, t.j)),
         |      (x_, y_) -> x_ + y_) AS s1,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list(t.g * t.g ORDER BY t.i, t.j)),
         |      (x_, y_) -> x_ + y_) AS s2
         |  FROM taps t
         |  CROSS JOIN pk
         |  JOIN img i ON i.l_idx = pk.pl + t.i AND i.m_idx = pk.pm + t.j
         |  GROUP BY 1),
         |best AS (
         |  SELECT sigma, s1 / s2 AS amp FROM corr
         |  ORDER BY s1 * s1 / s2 DESC, sigma ASC LIMIT 1),
         |sub AS (
         |  SELECT p.l_idx, p.m_idx,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      list(t.g * f.k ORDER BY t.i, t.j)),
         |      (x_, y_) -> x_ + y_) AS c
         |  FROM px p
         |  CROSS JOIN best b
         |  CROSS JOIN pk
         |  JOIN taps t ON t.sigma = b.sigma
         |  JOIN psf f ON f.l_idx = 8 + p.l_idx - pk.pl - t.i
         |            AND f.m_idx = 8 + p.m_idx - pk.pm - t.j
         |  GROUP BY 1, 2)
         |SELECT p.l_idx, p.m_idx,
         |  floor(coalesce(0.3e0 * b.amp * mt.g, 0.0e0) * 1000000.0 + 0.5)
         |    / 1000000.0 AS model,
         |  floor((i.v - 0.3e0 * b.amp * coalesce(sub.c, 0.0e0))
         |    * 1000000.0 + 0.5) / 1000000.0 AS residual
         |FROM px p
         |JOIN img i USING (l_idx, m_idx)
         |CROSS JOIN best b
         |CROSS JOIN pk
         |LEFT JOIN taps mt ON mt.sigma = b.sigma
         |  AND mt.i = p.l_idx - pk.pl AND mt.j = p.m_idx - pk.pm
         |LEFT JOIN sub USING (l_idx, m_idx)""".stripMargin
    })

  /** The full adaptive loop with continuous scale refinement —
    * rows-only; the grid-restricted recurrence is oracled above.
    */
  private val aspCleanQ = Q(
    (s, d) => {
      val grid = ImageOps.makeEmptySkyImage(s, (0.0, 0.0), (16, 16),
        (0.0005, 0.0005))
        .withColumn("img_chan", lit(0)).withColumn("pol", lit(0))
      val img = grid.withColumn("image",
        lit(3.0) * exp(-((col("l_idx") - 6) * (col("l_idx") - 6)
          + (col("m_idx") - 10) * (col("m_idx") - 10)) / lit(2.0 * 1.8 * 1.8)) +
          lit(0.1) * sin(col("l_idx") * 0.9) * cos(col("m_idx") * 0.8))
      val psf = BeamOps.gaussianBeam(grid, 400.0, 300.0, 0.0,
        (0.0005, 0.0005), 16, 16).withColumnRenamed("beam", "image")
      // gain 0.1: with this broad psf the ASP subtraction overshoots at
      // gain 0.3 and the loop diverges to ~1e8 amplitudes, where the
      // absolute 1e-6 quantization grid sits only ~100 ulp above the
      // noise floor; at gain 0.1 the loop CONVERGES (threshold stop at
      // iteration 18 of 20), values stay O(1), and the full adaptive
      // recursion is hash-checkable
      CleanOps.aspCleanPlanes(s, img, psf, 16, 16, 16, 16,
          sigmas = Seq(1.0, 2.0, 3.0), gain = 0.1, threshold = 0.05,
          niter = 20, refineIters = 3)
        .select(col("l_idx"), col("m_idx"),
          qround(col("model"), 6).as("model"),
          qround(col("residual"), 6).as("residual"))
    }, {
      // The FULL adaptive-scale-pixel loop replayed recursively,
      // hash-exact — including the CONTINUOUS ternary-search scale
      // refinement the one-iteration oracle cannot reach: each level's
      // peak derived table nests the grid scoring (three correlated
      // fit aggregates over the working residual), the winner bracket,
      // three unrolled ternary steps (each comparing two more fit
      // aggregates at data-dependent sigmas), the final fit at
      // (lo3+hi3)/2, and the gaussian + psf-convolved subtraction at
      // the refined width. Tap bounds use a fixed +-18 series clipped
      // by ceil(3 sigma), mirroring the kernel's loop bounds exactly.
      val sig1 = "1.0e0"; val sig2 = "2.0e0"; val sig3 = "3.0e0"
      // FIXED-ORDER folds, not sum(): DuckDB parallelizes float
      // aggregation, so a plain sum's addition order varies with
      // thread scheduling — observed once as a full-gate flicker when
      // a borderline value crossed the 1e-6 grid. list(... ORDER BY
      // di, dj) + list_reduce replays the KERNEL'S exact accumulation
      // order (CleanOps fit(): di outer, dj inner, ascending), making
      // the doubles bit-identical, not just grid-equal.
      def foldSum(terms: String) =
        s"list_reduce(list_prepend(CAST(0 AS DOUBLE), $terms), " +
          "(x_, y_) -> x_ + y_)"
      def s1(sig: String) =
        s"(SELECT ${foldSum(
            s"list(rr.v * exp(-(a.di * a.di + b.dj * b.dj) * (1.0 / (2.0 * ($sig) * ($sig)))) ORDER BY a.di, b.dj)")} " +
          s"FROM generate_series(-9, 9) a(di) CROSS JOIN generate_series(-9, 9) b(dj) " +
          s"CROSS JOIN r rr " +
          s"WHERE abs(a.di) <= CAST(ceil(3.0 * ($sig)) AS INT) " +
          s"AND abs(b.dj) <= CAST(ceil(3.0 * ($sig)) AS INT) " +
          s"AND rr.l_idx = pl + a.di AND rr.m_idx = pm + b.dj)"
      def s2(sig: String) =
        s"(SELECT ${foldSum(
            s"list(exp(-(a.di * a.di + b.dj * b.dj) * (1.0 / (2.0 * ($sig) * ($sig)))) " +
            s"* exp(-(a.di * a.di + b.dj * b.dj) * (1.0 / (2.0 * ($sig) * ($sig)))) ORDER BY a.di, b.dj)")} " +
          s"FROM generate_series(-9, 9) a(di) CROSS JOIN generate_series(-9, 9) b(dj) " +
          s"WHERE abs(a.di) <= CAST(ceil(3.0 * ($sig)) AS INT) " +
          s"AND abs(b.dj) <= CAST(ceil(3.0 * ($sig)) AS INT) " +
          s"AND pl + a.di BETWEEN 0 AND 15 AND pm + b.dj BETWEEN 0 AND 15)"
      val pk0 = "(SELECT l_idx AS pl, m_idx AS pm, abs(v) AS pabs FROM r " +
        "ORDER BY abs(v) DESC, l_idx ASC, m_idx ASC LIMIT 1)"
      val l1 = s"SELECT *, ${s1(sig1)} AS s1_1, ${s2(sig1)} AS s2_1, " +
        s"${s1(sig2)} AS s1_2, ${s2(sig2)} AS s2_2, " +
        s"${s1(sig3)} AS s1_3, ${s2(sig3)} AS s2_3 FROM $pk0 p0"
      val l2 = "SELECT *, " +
        "CASE WHEN s1_2 * s1_2 / s2_2 > s1_1 * s1_1 / s2_1 THEN 2 ELSE 1 END AS b12, " +
        "CASE WHEN s1_2 * s1_2 / s2_2 > s1_1 * s1_1 / s2_1 THEN s1_2 * s1_2 / s2_2 " +
        s"ELSE s1_1 * s1_1 / s2_1 END AS sc12 FROM ($l1) t1"
      val l3 = "SELECT *, CASE WHEN s1_3 * s1_3 / s2_3 > sc12 THEN 3 ELSE b12 END AS bidx " +
        s"FROM ($l2) t2"
      // hi for the edge-winning largest sigma is the sigma itself (3),
      // not 2x: the kernel clamps refinement to the grid span, which
      // bounds every tap radius at ceil(3 * 3) = 9 and lets the whole
      // oracle use a +-9 series instead of +-18 (4x fewer tap cells)
      val l4 = "SELECT *, CASE bidx WHEN 1 THEN 5.0e-1 WHEN 2 THEN 1.0e0 ELSE 2.0e0 END AS lo0, " +
        "CASE bidx WHEN 1 THEN 2.0e0 WHEN 2 THEN 3.0e0 ELSE 3.0e0 END AS hi0 " +
        s"FROM ($l3) t3"
      var lvl = l4
      for (k <- 0 until 3) {
        val m1 = s"(lo$k + (hi$k - lo$k) / 3.0e0)"
        val m2 = s"(hi$k - (hi$k - lo$k) / 3.0e0)"
        val cmp = s"SELECT *, (${s1(m1)}) AS s1m1_$k, (${s2(m1)}) AS s2m1_$k, " +
          s"(${s1(m2)}) AS s1m2_$k, (${s2(m2)}) AS s2m2_$k FROM ($lvl) ta$k"
        lvl = s"SELECT *, CASE WHEN s1m1_$k * s1m1_$k / s2m1_$k < s1m2_$k * s1m2_$k / s2m2_$k " +
          s"THEN $m1 ELSE lo$k END AS lo${k + 1}, " +
          s"CASE WHEN s1m1_$k * s1m1_$k / s2m1_$k < s1m2_$k * s1m2_$k / s2m2_$k " +
          s"THEN hi$k ELSE $m2 END AS hi${k + 1} FROM ($cmp) tb$k"
      }
      val lf = s"SELECT *, (lo3 + hi3) / 2.0e0 AS sigf FROM ($lvl) tc"
      val lg = s"SELECT *, (${s1("sigf")}) / (${s2("sigf")}) AS ampf, " +
        "CAST(ceil(3.0e0 * sigf) AS INT) AS rrad, " +
        s"1.0e0 / (2.0e0 * sigf * sigf) AS inv FROM ($lf) td"
      val incr = 0.0005 * 180 / math.Pi * 3600
      val (dc1, dc2) = (400.0 / incr, 300.0 / incr)
      val ln2x4 = 4 * math.log(2)
      val al = ln2x4 / (dc1 * dc1)
      val ga = ln2x4 / (dc2 * dc2)
      s"""WITH RECURSIVE px AS (
         |  SELECT CAST(i // 16 AS INT) AS l_idx, CAST(i % 16 AS INT) AS m_idx
         |  FROM generate_series(0, 255) t(i)),
         |img AS (SELECT l_idx, m_idx,
         |  3.0e0 * exp(-((l_idx - 6) * (l_idx - 6)
         |              + (m_idx - 10) * (m_idx - 10)) / ${fmt(2.0 * 1.8 * 1.8)})
         |  + 0.1e0 * sin(l_idx * CAST(0.9 AS DOUBLE))
         |          * cos(m_idx * CAST(0.8 AS DOUBLE)) AS v
         |  FROM px),
         |psf AS MATERIALIZED (SELECT l_idx, m_idx,
         |  exp(-(${fmt(al)} * (l_idx - 8) * (l_idx - 8)
         |      + ${fmt(ga)} * (m_idx - 8) * (m_idx - 8))) AS k
         |  FROM px),
         |stp AS MATERIALIZED (SELECT ${fmt(0.05)} * max(abs(v)) AS stop FROM img),
         |r AS (
         |  SELECT 0 AS it, l_idx, m_idx, v, CAST(0 AS DOUBLE) AS model FROM img
         |  UNION ALL
         |  SELECT r.it + 1, r.l_idx, r.m_idx,
         |    r.v - ${fmt(0.1)} * pk.ampf * coalesce(
         |      (SELECT ${foldSum(
                  "list(exp(-(a.gi * a.gi + b.gj * b.gj) * pk.inv) * f.k " +
                  "ORDER BY a.gi, b.gj)")}
         |       FROM generate_series(-9, 9) a(gi)
         |       CROSS JOIN generate_series(-9, 9) b(gj)
         |       JOIN psf f ON f.l_idx = 8 + r.l_idx - pk.pl - a.gi
         |                 AND f.m_idx = 8 + r.m_idx - pk.pm - b.gj
         |       WHERE abs(a.gi) <= pk.rrad AND abs(b.gj) <= pk.rrad), 0.0),
         |    r.model + CASE WHEN abs(r.l_idx - pk.pl) <= pk.rrad
         |                    AND abs(r.m_idx - pk.pm) <= pk.rrad
         |      THEN ${fmt(0.1)} * pk.ampf
         |        * exp(-((r.l_idx - pk.pl) * (r.l_idx - pk.pl)
         |              + (r.m_idx - pk.pm) * (r.m_idx - pk.pm)) * pk.inv)
         |      ELSE 0.0 END
         |  FROM r
         |  CROSS JOIN ($lg) pk
         |  CROSS JOIN stp
         |  WHERE r.it < 20 AND pk.pabs > stp.stop)
         |SELECT l_idx, m_idx,
         |  floor(model * 1000000.0 + 0.5) / 1000000.0 AS model,
         |  floor(v * 1000000.0 + 0.5) / 1000000.0 AS residual
         |FROM r WHERE it = (SELECT max(it) FROM r)""".stripMargin
    })

  /** deconvolve_rotation_measure_clean, one CLEAN iteration in closed
    * form: Faraday spectrum + RMSF as DFT sums over lambda^2, window
    * argmax per pixel, peak * shifted-RMSF subtraction.
    */
  private val rmCleanOneIterQ = Q(
    (s, d) => {
      val vis = s.range(0, 4)
        .selectExpr("CAST(id DIV 2 AS INT) AS l_idx", "CAST(id % 2 AS INT) AS m_idx")
        .crossJoin(s.range(0, 8).selectExpr("CAST(id AS INT) AS chan"))
        .select(col("l_idx"), col("m_idx"),
          (lit(1.4e9) + col("chan") * 5.0e7).as("freq"),
          sin(col("chan") * 0.7 + col("l_idx")).as("q"),
          cos(col("chan") * 0.3 + col("m_idx")).as("u"))
      CleanOps.rmClean(s, vis, nPhi = 16, dPhi = 4.0, gain = 0.2,
          threshold = 0.0, niter = 1)
        .select(col("l_idx"), col("m_idx"), col("phi_idx"),
          qround(col("model_re"), 6).as("model_re"),
          qround(col("model_im"), 6).as("model_im"),
          qround(col("resid_re"), 6).as("resid_re"),
          qround(col("resid_im"), 6).as("resid_im"))
    },
    """WITH px AS (
      |  SELECT CAST(i // 2 AS INT) AS l_idx, CAST(i % 2 AS INT) AS m_idx
      |  FROM generate_series(0, 3) t(i)),
      |ch AS (SELECT CAST(c AS INT) AS chan, 1.4e9 + c * 5.0e7 AS freq
      |       FROM generate_series(0, 7) g(c)),
      |v AS (
      |  SELECT p.l_idx, p.m_idx, ch.chan,
      |    (299792458.0e0 / ch.freq) * (299792458.0e0 / ch.freq) AS lam2,
      |    sin(ch.chan * CAST(0.7 AS DOUBLE) + p.l_idx) AS q,
      |    cos(ch.chan * CAST(0.3 AS DOUBLE) + p.m_idx) AS u
      |  FROM px p CROSS JOIN ch),
      |l0 AS (SELECT l_idx, m_idx, (min(lam2) + max(lam2)) / 2.0e0 AS l0
      |       FROM v GROUP BY 1, 2),
      |f AS (
      |  SELECT v.l_idx, v.m_idx, CAST(k.k AS INT) AS phi_idx,
      |    sum((v.q * cos(-2.0e0 * ((k.k - 8) * 4.0e0) * (v.lam2 - l0.l0))
      |       - v.u * sin(-2.0e0 * ((k.k - 8) * 4.0e0) * (v.lam2 - l0.l0))) / 8.0e0) AS fre,
      |    sum((v.q * sin(-2.0e0 * ((k.k - 8) * 4.0e0) * (v.lam2 - l0.l0))
      |       + v.u * cos(-2.0e0 * ((k.k - 8) * 4.0e0) * (v.lam2 - l0.l0))) / 8.0e0) AS fim
      |  FROM v JOIN l0 USING (l_idx, m_idx)
      |  CROSS JOIN generate_series(0, 15) k(k)
      |  GROUP BY 1, 2, 3),
      |rmsf AS (
      |  SELECT v.l_idx, v.m_idx, CAST(o.o AS INT) AS o,
      |    sum(cos(-2.0e0 * (o.o * 4.0e0) * (v.lam2 - l0.l0)) / 8.0e0) AS rre,
      |    sum(sin(-2.0e0 * (o.o * 4.0e0) * (v.lam2 - l0.l0)) / 8.0e0) AS rim
      |  FROM v JOIN l0 USING (l_idx, m_idx)
      |  CROSS JOIN generate_series(-15, 15) o(o)
      |  GROUP BY 1, 2, 3),
      |pk AS (
      |  SELECT l_idx, m_idx, phi_idx AS pp, fre AS pre, fim AS pim
      |  FROM (SELECT *, row_number() OVER (
      |          PARTITION BY l_idx, m_idx
      |          ORDER BY fre * fre + fim * fim DESC, phi_idx ASC) AS rn
      |        FROM f)
      |  WHERE rn = 1)
      |SELECT f.l_idx, f.m_idx, f.phi_idx,
      |  floor((CASE WHEN f.phi_idx = pk.pp THEN 0.2e0 * pk.pre
      |         ELSE 0.0e0 END) * 1000000.0 + 0.5) / 1000000.0 AS model_re,
      |  floor((CASE WHEN f.phi_idx = pk.pp THEN 0.2e0 * pk.pim
      |         ELSE 0.0e0 END) * 1000000.0 + 0.5) / 1000000.0 AS model_im,
      |  floor((f.fre - (0.2e0 * pk.pre * r.rre - 0.2e0 * pk.pim * r.rim))
      |    * 1000000.0 + 0.5) / 1000000.0 AS resid_re,
      |  floor((f.fim - (0.2e0 * pk.pre * r.rim + 0.2e0 * pk.pim * r.rre))
      |    * 1000000.0 + 0.5) / 1000000.0 AS resid_im
      |FROM f
      |JOIN pk USING (l_idx, m_idx)
      |JOIN rmsf r ON r.l_idx = f.l_idx AND r.m_idx = f.m_idx
      |           AND r.o = f.phi_idx - pk.pp""".stripMargin)

  /** The full iterative RM-CLEAN on the same fixture, hash-exact: the
    * recursive CTE replays every iteration — per-pixel complex peak
    * (power argmax, first-strict-max phi tie-break), RMSF subtraction
    * in the kernel's exact arithmetic order, and the per-pixel
    * threshold^2 * initial-peak-power stop (pixels converge at
    * different depths and drop out of the recursion independently;
    * each pixel's final state is its deepest row).
    */
  private val rmCleanQ = Q(
    (s, d) => {
      val vis = s.range(0, 4)
        .selectExpr("CAST(id DIV 2 AS INT) AS l_idx", "CAST(id % 2 AS INT) AS m_idx")
        .crossJoin(s.range(0, 8).selectExpr("CAST(id AS INT) AS chan"))
        .select(col("l_idx"), col("m_idx"),
          (lit(1.4e9) + col("chan") * 5.0e7).as("freq"),
          sin(col("chan") * 0.7 + col("l_idx")).as("q"),
          cos(col("chan") * 0.3 + col("m_idx")).as("u"))
      CleanOps.rmClean(s, vis, nPhi = 16, dPhi = 4.0, gain = 0.2,
          threshold = 0.05, niter = 100)
        .select(col("l_idx"), col("m_idx"), col("phi_idx"),
          qround(col("model_re"), 6).as("model_re"),
          qround(col("model_im"), 6).as("model_im"),
          qround(col("resid_re"), 6).as("resid_re"),
          qround(col("resid_im"), 6).as("resid_im"))
    },
    """WITH RECURSIVE px AS (
      |  SELECT CAST(i // 2 AS INT) AS l_idx, CAST(i % 2 AS INT) AS m_idx
      |  FROM generate_series(0, 3) t(i)),
      |ch AS (SELECT CAST(c AS INT) AS chan, 1.4e9 + c * 5.0e7 AS freq
      |       FROM generate_series(0, 7) g(c)),
      |v AS (
      |  SELECT p.l_idx, p.m_idx, ch.chan,
      |    (299792458.0e0 / ch.freq) * (299792458.0e0 / ch.freq) AS lam2,
      |    sin(ch.chan * CAST(0.7 AS DOUBLE) + p.l_idx) AS q,
      |    cos(ch.chan * CAST(0.3 AS DOUBLE) + p.m_idx) AS u
      |  FROM px p CROSS JOIN ch),
      |l0 AS (SELECT l_idx, m_idx, (min(lam2) + max(lam2)) / 2.0e0 AS l0
      |       FROM v GROUP BY 1, 2),
      |f AS (
      |  SELECT v.l_idx, v.m_idx, CAST(k.k AS INT) AS phi_idx,
      |    sum((v.q * cos(-2.0e0 * ((k.k - 8) * 4.0e0) * (v.lam2 - l0.l0))
      |       - v.u * sin(-2.0e0 * ((k.k - 8) * 4.0e0) * (v.lam2 - l0.l0))) / 8.0e0) AS fre,
      |    sum((v.q * sin(-2.0e0 * ((k.k - 8) * 4.0e0) * (v.lam2 - l0.l0))
      |       + v.u * cos(-2.0e0 * ((k.k - 8) * 4.0e0) * (v.lam2 - l0.l0))) / 8.0e0) AS fim
      |  FROM v JOIN l0 USING (l_idx, m_idx)
      |  CROSS JOIN generate_series(0, 15) k(k)
      |  GROUP BY 1, 2, 3),
      |rmsf AS MATERIALIZED (
      |  SELECT v.l_idx, v.m_idx, CAST(o.o AS INT) AS o,
      |    sum(cos(-2.0e0 * (o.o * 4.0e0) * (v.lam2 - l0.l0)) / 8.0e0) AS rre,
      |    sum(sin(-2.0e0 * (o.o * 4.0e0) * (v.lam2 - l0.l0)) / 8.0e0) AS rim
      |  FROM v JOIN l0 USING (l_idx, m_idx)
      |  CROSS JOIN generate_series(-15, 15) o(o)
      |  GROUP BY 1, 2, 3),
      |stp AS MATERIALIZED (
      |  SELECT l_idx, m_idx,
      |    CAST(0.05 AS DOUBLE) * CAST(0.05 AS DOUBLE)
      |      * max(fre * fre + fim * fim) AS stop
      |  FROM f GROUP BY 1, 2),
      |r AS (
      |  SELECT 0 AS it, l_idx, m_idx, phi_idx, fre, fim,
      |    CAST(0 AS DOUBLE) AS mre, CAST(0 AS DOUBLE) AS mim
      |  FROM f
      |  UNION ALL
      |  SELECT r.it + 1, r.l_idx, r.m_idx, r.phi_idx,
      |    r.fre - ((0.2e0 * pk.pre) * rf.rre - (0.2e0 * pk.pim) * rf.rim),
      |    r.fim - ((0.2e0 * pk.pre) * rf.rim + (0.2e0 * pk.pim) * rf.rre),
      |    r.mre + CASE WHEN r.phi_idx = pk.pp THEN 0.2e0 * pk.pre ELSE 0.0e0 END,
      |    r.mim + CASE WHEN r.phi_idx = pk.pp THEN 0.2e0 * pk.pim ELSE 0.0e0 END
      |  FROM r
      |  JOIN (
      |    SELECT l_idx, m_idx, phi_idx AS pp, fre AS pre, fim AS pim,
      |      fre * fre + fim * fim AS pwr
      |    FROM (SELECT *, row_number() OVER (
      |            PARTITION BY l_idx, m_idx
      |            ORDER BY fre * fre + fim * fim DESC, phi_idx ASC) AS rn
      |          FROM r)
      |    WHERE rn = 1) pk USING (l_idx, m_idx)
      |  JOIN rmsf rf ON rf.l_idx = r.l_idx AND rf.m_idx = r.m_idx
      |              AND rf.o = r.phi_idx - pk.pp
      |  JOIN stp s USING (l_idx, m_idx)
      |  WHERE r.it < 100 AND pk.pwr > s.stop),
      |fin AS (
      |  SELECT *, row_number() OVER (PARTITION BY l_idx, m_idx, phi_idx
      |                               ORDER BY it DESC) AS rn
      |  FROM r)
      |SELECT l_idx, m_idx, phi_idx,
      |  floor(mre * 1000000.0 + 0.5) / 1000000.0 AS model_re,
      |  floor(mim * 1000000.0 + 0.5) / 1000000.0 AS model_im,
      |  floor(fre * 1000000.0 + 0.5) / 1000000.0 AS resid_re,
      |  floor(fim * 1000000.0 + 0.5) / 1000000.0 AS resid_im
      |FROM fin WHERE rn = 1""".stripMargin)

  /** restore_model: model (x) clean-beam + residual (native
    * resolution). Oracle mirrors the smooth oracle's circular
    * convolution on the sparse model plane and adds the residual.
    */
  private val restoreModelQ = Q(
    (s, d) => {
      val grid = ImageOps.makeEmptySkyImage(s, (0.0, 0.0), (16, 16),
        (0.0005, 0.0005))
        .withColumn("img_chan", lit(0)).withColumn("pol", lit(0))
      val model = grid.withColumn("model",
        when(col("l_idx") === 5 && col("m_idx") === 9, 2.0)
          .when(col("l_idx") === 11 && col("m_idx") === 3, 1.0)
          .otherwise(0.0))
      val residual = grid.withColumn("residual",
        (sin(col("l_idx") * 0.3) + cos(col("m_idx") * 0.5)) * 0.1)
      val beam = BeamOps.gaussianBeam(grid, 300.0, 300.0, 0.0,
        (0.0005, 0.0005), 16, 16)
      CleanOps.restoreModel(s, model, residual, beam, 16, 16)
        .select(col("l_idx"), col("m_idx"),
          qround(col("restored"), 6).as("restored"))
    }, {
      val incr = 0.0005 * 180 / math.Pi * 3600
      val dc = 300.0 / incr
      val a = 4 * math.log(2) * (1.0 / (dc * dc))
      s"""WITH px AS (
         |  SELECT CAST(i // 16 AS INT) AS l_idx, CAST(i % 16 AS INT) AS m_idx
         |  FROM generate_series(0, 255) t(i)),
         |mdl AS (SELECT l_idx, m_idx,
         |          CASE WHEN l_idx = 5 AND m_idx = 9 THEN 2.0
         |               WHEN l_idx = 11 AND m_idx = 3 THEN 1.0
         |               ELSE 0.0 END AS v FROM px),
         |ker AS (SELECT l_idx, m_idx,
         |          exp(-(${fmt(a)} * (l_idx - 8) * (l_idx - 8)
         |              + ${fmt(a)} * (m_idx - 8) * (m_idx - 8))) AS k
         |        FROM px),
         |conv AS (
         |  SELECT p.l_idx, p.m_idx, sum(i.v * k.k) AS s
         |  FROM px p
         |  JOIN mdl i ON true
         |  JOIN ker k
         |    ON k.l_idx = ((p.l_idx + 8 - i.l_idx) % 16 + 16) % 16
         |   AND k.m_idx = ((p.m_idx + 8 - i.m_idx) % 16 + 16) % 16
         |  GROUP BY 1, 2)
         |SELECT l_idx, m_idx,
         |  floor((abs(s) + (sin(l_idx * CAST(0.3 AS DOUBLE))
         |                 + cos(m_idx * CAST(0.5 AS DOUBLE))) * 0.1e0)
         |    * 1000000.0 + 0.5) / 1000000.0 AS restored
         |FROM conv""".stripMargin
    })

  /** make_mask: |image| above nSigma * robust-sigma, inside the
    * primary-beam limit. Medians are order-insensitive, so the mask
    * booleans agree across engines with no quantization.
    */
  private val makeMaskQ = Q(
    (s, d) => {
      val grid = ImageOps.makeEmptySkyImage(s, (0.0, 0.0), (16, 16),
        (0.0005, 0.0005))
        .withColumn("img_chan", lit(0)).withColumn("pol", lit(0))
      val img = grid.withColumn("image",
        (sin(col("l_idx") * 0.7) + cos(col("m_idx") * 1.1)) * 0.2 +
          when(col("l_idx") === 4 && col("m_idx") === 12, 3.0)
            .when(col("l_idx") === 9 && col("m_idx") === 2, -2.5)
            .otherwise(0.0))
      val withPb = BeamOps.gaussianBeam(img, 2000.0, 2000.0, 0.0,
        (0.0005, 0.0005), 16, 16, outCol = "pb")
      CleanOps.makeMask(withPb, nSigma = 3.0, pbCol = Some("pb"),
          pbLimit = 0.3)
        .select(col("l_idx"), col("m_idx"), col("mask"))
    }, {
      val incr = 0.0005 * 180 / math.Pi * 3600
      val dc = 2000.0 / incr
      val a = 4 * math.log(2) * (1.0 / (dc * dc))
      s"""WITH px AS (
         |  SELECT CAST(i // 16 AS INT) AS l_idx, CAST(i % 16 AS INT) AS m_idx
         |  FROM generate_series(0, 255) t(i)),
         |img AS (SELECT l_idx, m_idx,
         |  (sin(l_idx * CAST(0.7 AS DOUBLE)) + cos(m_idx * CAST(1.1 AS DOUBLE))) * 0.2e0
         |  + CASE WHEN l_idx = 4 AND m_idx = 12 THEN 3.0
         |         WHEN l_idx = 9 AND m_idx = 2 THEN -2.5
         |         ELSE 0.0 END AS v
         |  FROM px),
         |med AS (SELECT median(v) AS med FROM img),
         |sig AS (SELECT median(abs(img.v - med.med)) * 1.4826e0 AS sigma
         |        FROM img, med)
         |SELECT img.l_idx, img.m_idx,
         |  (abs(img.v) > 3.0e0 * sig.sigma
         |   AND exp(-(${fmt(a)} * (img.l_idx - 8) * (img.l_idx - 8)
         |           + ${fmt(a)} * (img.m_idx - 8) * (img.m_idx - 8))) > 0.3e0)
         |    AS mask
         |FROM img, sig""".stripMargin
    })

  /** is_converged: the iteration controller's stopping criteria as one
    * aggregate row per plane — peak |residual| vs threshold, iteration
    * budget, and their disjunction.
    */
  private val isConvergedQ = Q(
    (s, d) => {
      val s2 = s
      import s2.implicits._
      val grid = ImageOps.makeEmptySkyImage(s, (0.0, 0.0), (16, 16),
        (0.0005, 0.0005))
        .withColumn("img_chan", lit(0))
        .withColumn("pol", explode(array(lit(0), lit(1))))
      val res = grid.withColumn("residual",
        (sin(col("l_idx") * 0.3 + col("pol")) + cos(col("m_idx") * 0.5)) *
          (lit(0.05) + col("pol") * 0.04))
      val iters = Seq((0, 0, 50), (0, 1, 200))
        .toDF("img_chan", "pol", "iters_done")
      CleanOps.isConverged(res, iters, threshold = 0.15, niter = 100)
        .select(col("img_chan"), col("pol"),
          qround(col("peak_residual"), 6).as("peak_residual"),
          col("iters_done"), col("hit_threshold"), col("hit_niter"),
          col("converged"))
    },
    """WITH px AS (
      |  SELECT CAST(i // 16 AS INT) AS l_idx, CAST(i % 16 AS INT) AS m_idx,
      |    CAST(p AS INT) AS pol
      |  FROM generate_series(0, 255) t(i) CROSS JOIN generate_series(0, 1) q(p)),
      |res AS (SELECT pol,
      |  (sin(l_idx * CAST(0.3 AS DOUBLE) + pol) + cos(m_idx * CAST(0.5 AS DOUBLE)))
      |    * (0.05e0 + pol * 0.04e0) AS v
      |  FROM px),
      |iters AS (SELECT 0 AS pol, 50 AS iters_done
      |          UNION ALL SELECT 1, 200),
      |pk AS (SELECT pol, max(abs(v)) AS peak FROM res GROUP BY 1)
      |SELECT 0 AS img_chan, pk.pol,
      |  floor(pk.peak * 1000000.0 + 0.5) / 1000000.0 AS peak_residual,
      |  iters.iters_done,
      |  pk.peak <= 0.15e0 AS hit_threshold,
      |  iters.iters_done >= 100 AS hit_niter,
      |  (pk.peak <= 0.15e0 OR iters.iters_done >= 100) AS converged
      |FROM pk JOIN iters USING (pol)""".stripMargin)

  private val smoothQ = Q(
    (s, d) => {
      val grid = ImageOps.makeEmptySkyImage(s, (0.0, 0.0), (16, 16),
        (0.0005, 0.0005))
        .withColumn("img_chan", lit(0)).withColumn("pol", lit(0))
      val img = grid.withColumn("image",
        sin(col("l_idx") * 0.3) + cos(col("m_idx") * 0.5))
      val beam = BeamOps.gaussianBeam(grid, 300.0, 300.0, 0.0,
        (0.0005, 0.0005), 16, 16)
      BeamOps.smooth(s, img, beam, 16, 16)
        .select(col("l_idx"), col("m_idx"), qround(col("smoothed"), 6).as("smoothed"))
    }, {
      // oracle: ifft2(fft2(A)*fft2(K)) == circular convolution; the
      // final fftshift is an index shift of +n/2 mod n. Beam constants
      // mirror BeamOps.gaussianBeam(d1=300, d2=300, theta=0).
      val incr = 0.0005 * 180 / math.Pi * 3600
      val dc = 300.0 / incr
      val a = 4 * math.log(2) * (1.0 / (dc * dc)) // alpha == gamma, beta == 0
      s"""WITH px AS (
         |  SELECT CAST(i // 16 AS INT) AS l_idx, CAST(i % 16 AS INT) AS m_idx
         |  FROM generate_series(0, 255) t(i)),
         |img AS (SELECT l_idx, m_idx,
         |          sin(l_idx * CAST(0.3 AS DOUBLE)) + cos(m_idx * CAST(0.5 AS DOUBLE)) AS v
         |        FROM px),
         |ker AS (SELECT l_idx, m_idx,
         |          exp(-(${fmt(a)} * (l_idx - 8) * (l_idx - 8)
         |              + ${fmt(a)} * (m_idx - 8) * (m_idx - 8))) AS k
         |        FROM px),
         |conv AS (
         |  SELECT p.l_idx, p.m_idx,
         |    sum(i.v * k.k) AS s
         |  FROM px p
         |  JOIN img i ON true
         |  JOIN ker k
         |    ON k.l_idx = ((p.l_idx + 8 - i.l_idx) % 16 + 16) % 16
         |   AND k.m_idx = ((p.m_idx + 8 - i.m_idx) % 16 + 16) % 16
         |  GROUP BY 1, 2)
         |SELECT l_idx, m_idx,
         |  floor(abs(s) * 1000000.0 + 0.5) / 1000000.0 AS smoothed
         |FROM conv""".stripMargin
    })

  /** feather (the reference stubs it): SD + interferometer image
    * combination. The oracle uses the image-space identity
    * comb = int + B (x) (s*sd - int) with a circular-convolution join
    * (same pattern as the smooth oracle) and divides by the beam sum
    * after the convolution — linearity makes that equal to the
    * operator's pre-normalized beam up to the qround.
    */
  private val featherQ = Q(
    (s, d) => {
      val grid = ImageOps.makeEmptySkyImage(s, (0.0, 0.0), (16, 16),
        (0.0005, 0.0005))
        .withColumn("img_chan", lit(0)).withColumn("pol", lit(0))
      val imgInt = grid.withColumn("image",
        sin(col("l_idx") * 0.3) + cos(col("m_idx") * 0.5))
      val imgSd = grid.withColumn("image",
        cos(col("l_idx") * 0.2) + sin(col("m_idx") * 0.1))
      val beam = BeamOps.gaussianBeam(grid, 600.0, 600.0, 0.0,
        (0.0005, 0.0005), 16, 16)
      BeamOps.feather(s, imgInt, imgSd, beam, 16, 16, fluxScale = 0.5)
        .select(col("l_idx"), col("m_idx"),
          qround(col("feathered"), 6).as("feathered"))
    }, {
      val incr = 0.0005 * 180 / math.Pi * 3600
      val dc = 600.0 / incr
      val a = 4 * math.log(2) * (1.0 / (dc * dc))
      s"""WITH px AS (
         |  SELECT CAST(i // 16 AS INT) AS l_idx, CAST(i % 16 AS INT) AS m_idx
         |  FROM generate_series(0, 255) t(i)),
         |iimg AS (SELECT l_idx, m_idx,
         |           sin(l_idx * CAST(0.3 AS DOUBLE))
         |           + cos(m_idx * CAST(0.5 AS DOUBLE)) AS v FROM px),
         |simg AS (SELECT l_idx, m_idx,
         |           cos(l_idx * CAST(0.2 AS DOUBLE))
         |           + sin(m_idx * CAST(0.1 AS DOUBLE)) AS v FROM px),
         |ker AS (SELECT l_idx, m_idx,
         |          exp(-(${fmt(a)} * (l_idx - 8) * (l_idx - 8)
         |              + ${fmt(a)} * (m_idx - 8) * (m_idx - 8))) AS k
         |        FROM px),
         |df AS (SELECT i.l_idx, i.m_idx, 5.0e-1 * s.v - i.v AS v
         |       FROM iimg i JOIN simg s USING (l_idx, m_idx)),
         |conv AS (
         |  SELECT p.l_idx, p.m_idx, sum(df.v * k.k) AS s
         |  FROM px p
         |  JOIN df ON true
         |  JOIN ker k
         |    ON k.l_idx = ((p.l_idx + 8 - df.l_idx) % 16 + 16) % 16
         |   AND k.m_idx = ((p.m_idx + 8 - df.m_idx) % 16 + 16) % 16
         |  GROUP BY 1, 2)
         |SELECT c.l_idx, c.m_idx,
         |  floor((i.v + c.s / (SELECT sum(k) FROM ker)) * 1000000.0 + 0.5)
         |    / 1000000.0 AS feathered
         |FROM conv c JOIN iimg i USING (l_idx, m_idx)""".stripMargin
    })

  /** 4x4 determinant as a SQL expression (Leibniz expansion) — lets
    * the oracle solve the fit's normal equations by Cramer's rule.
    */
  private def det4(m: Array[Array[String]]): String = {
    val perms = Seq(0, 1, 2, 3).permutations.toSeq
    def sign(p: Seq[Int]): Int = {
      var s = 1
      for (i <- p.indices; j <- i + 1 until p.length) if (p(i) > p(j)) s = -s
      s
    }
    perms.map { p =>
      val term = (0 until 4).map(i => m(i)(p(i))).mkString(" * ")
      s"${if (sign(p) > 0) "+" else "-"} ($term)"
    }.mkString(" ")
  }

  private val fitGaussianQ = Q(
    (s, d) => {
      val grid = ImageOps.makeEmptySkyImage(s, (0.0, 0.0), (32, 32),
        (0.0005, 0.0005))
        .withColumn("img_chan", lit(0)).withColumn("pol", lit(0))
      val beam = BeamOps.gaussianBeam(grid, 600.0, 400.0, 20.0,
        (0.0005, 0.0005), 32, 32).withColumnRenamed("beam", "image")
      BeamOps.fitGaussianBeam(s, beam, 32, 32)
        .select(col("img_chan"), col("pol"),
          qround(col("d1_pix"), 6).as("d1_pix"),
          qround(col("d2_pix"), 6).as("d2_pix"),
          qround(col("theta_rad"), 6).as("theta_rad"), col("n_points"))
    }, {
      // mirror of BeamOps.fitGaussianBeam on the same synthesized beam:
      // LSQ of ln v on (1, x^2, xy, y^2) over the central 9x9 window,
      // solved by Cramer's rule (different fp path than the Scala
      // Gaussian elimination — quantization absorbs the ~1e-12 gap)
      val incr = 0.0005 * 180 / math.Pi * 3600
      val (dc1, dc2) = (600.0 / incr, 400.0 / incr)
      val t0 = 20.0 * math.Pi / 180
      val ln2x4 = 4 * math.log(2)
      val al0 = ln2x4 * (math.pow(math.cos(t0), 2) / (dc1 * dc1) +
        math.pow(math.sin(t0), 2) / (dc2 * dc2))
      val be0 = 2 * ln2x4 * (1 / (dc1 * dc1) - 1 / (dc2 * dc2)) *
        math.sin(t0) * math.cos(t0)
      val ga0 = ln2x4 * (math.pow(math.sin(t0), 2) / (dc1 * dc1) +
        math.pow(math.cos(t0), 2) / (dc2 * dc2))
      // normal matrix entries: s(fi*fj) over f = (1, xx, xy, yy)
      val f = Array("1.0", "xx", "xy", "yy")
      val a = Array.tabulate(4, 4)((i, j) => s"sum(${f(i)} * ${f(j)})")
      val b = Array.tabulate(4)(i => s"sum(${f(i)} * lv)")
      def repl(colIdx: Int): Array[Array[String]] =
        Array.tabulate(4, 4)((i, j) => if (j == colIdx) b(i) else a(i)(j))
      s"""WITH px AS (
         |  SELECT CAST(i // 32 AS INT) AS l_idx, CAST(i % 32 AS INT) AS m_idx
         |  FROM generate_series(0, 1023) t(i)),
         |beam AS (SELECT l_idx, m_idx,
         |  exp(-(${fmt(al0)} * (l_idx - 16) * (l_idx - 16)
         |      + ${fmt(be0)} * (l_idx - 16) * (m_idx - 16)
         |      + ${fmt(ga0)} * (m_idx - 16) * (m_idx - 16))) AS v
         |  FROM px),
         |w AS (
         |  SELECT CAST(l_idx - 16 AS DOUBLE) AS x, CAST(m_idx - 16 AS DOUBLE) AS y, v
         |  FROM beam
         |  WHERE abs(l_idx - 16) <= 4 AND abs(m_idx - 16) <= 4 AND v > 1e-12),
         |feats AS (SELECT x * x AS xx, x * y AS xy, y * y AS yy, ln(v) AS lv FROM w),
         |solved AS (
         |  SELECT count(*) AS n_points,
         |    (${det4(repl(1))}) / (${det4(a)}) AS s1,
         |    (${det4(repl(2))}) / (${det4(a)}) AS s2,
         |    (${det4(repl(3))}) / (${det4(a)}) AS s3
         |  FROM feats),
         |p AS (SELECT n_points, -s1 AS al, -s2 AS be, -s3 AS ga FROM solved),
         |q AS (SELECT *, al + ga AS tr,
         |        sqrt((al - ga) * (al - ga) + be * be) AS dd FROM p)
         |SELECT 0 AS img_chan, 0 AS pol,
         |  floor(sqrt(2 * ${fmt(ln2x4)} / (tr - dd)) * 1000000.0 + 0.5) / 1000000.0 AS d1_pix,
         |  floor(sqrt(2 * ${fmt(ln2x4)} / (tr + dd)) * 1000000.0 + 0.5) / 1000000.0 AS d2_pix,
         |  floor((0.5 * atan2(be, al - ga)) * 1000000.0 + 0.5) / 1000000.0 AS theta_rad,
         |  n_points
         |FROM q""".stripMargin
    })

  // mosaic fixture shared by the image and psf queries. The 1/16
  // deterministic subset (l_orderkey % 16 = 0, mirrored in every
  // mosaic oracle's fx CTE) keeps the DuckDB mirror affordable: the
  // oracle replays the complex-kernel scatter as a 225-tap explode
  // per row, which at full sf0.01 cost ~90 s PER mosaic query and
  // blew the driver's correctness budget in round 4. Exactness is
  // untouched — both engines see the identical subset.
  private def mosaicFixture(s: SparkSession, d: String) =
    Tables.lineitem(s, d).where(col("l_orderkey") % 16 === 0).select(
      lit(0).as("img_chan"), lit(0).as("pol"),
      (col("l_extendedprice") % 60.0 - 30.0).as("u"),
      ((col("l_quantity") * 3.0 + col("l_linenumber")) % 60.0 - 30.0).as("v"),
      col("l_tax").as("re"), col("l_discount").as("im"),
      (col("l_discount") + 0.5).as("weight"), lit(1.5e9).as("freq"),
      (col("l_suppkey") % 2).cast("int").as("cf_type"),
      (col("l_orderkey") % 2).cast("int").as("field_id"))

  private val MosaicP = GridOps.GridParams((32, 32), (0.002, 0.002),
    imageSize = Some((16, 16)))
  private val MosaicOffsets =
    Map(0 -> ((0.0, 0.0)), 1 -> ((0.002, -0.002)))

  /** Full SQL mirror of the aperture gridder: per-type kernels
    * (support 7 and 15), per-field phase gradient applied to the
    * KERNEL taps (complex conv = k x e^{i(cfU pix0 + cfV pix1)}),
    * complex grid + per-row complex norm, sum_weight with Re(norm^2)
    * (image) / Re(norm) (psf), DFT, and sinc-oversampling + PSWF
    * normalization.
    */
  private def mosaicSql(doPsf: Boolean): String = {
    val cgk0 = GridOps.cgk1D(100, 7)
    val cgk1 = GridOps.cgk1D(100, 15)
    def lst(a: Array[Double]) = a.map(fmt).mkString("[", ", ", "]")
    // per-field kernel-coordinate phase slopes, via the same helper the
    // operator uses — bit-identical constants
    val pix0f1 = MosaicOps.phaseGradientPix(0.002, 0.002, 32, 100)
    val pix1f1 = MosaicOps.phaseGradientPix(-0.002, 0.002, 32, 100)
    val pix0f0 = MosaicOps.phaseGradientPix(0.0, 0.002, 32, 100)
    val pix1f0 = MosaicOps.phaseGradientPix(0.0, 0.002, 32, 100)
    val (greDef, gimDef, gate, swExpr) =
      if (doPsf) ("weight", "0.0", "weight <> 0.0", "weight * nre")
      else ("re * weight", "im * weight", "(gre <> 0.0 OR gim <> 0.0)",
        "weight * (nre * nre - nim * nim)")
    val kExpr =
      "(CASE cf_type WHEN 0 THEN k.t0[abs(100 * du + ufrac) + 1] " +
        "ELSE k.t1[abs(100 * du + ufrac) + 1] END) * " +
        "(CASE cf_type WHEN 0 THEN k.t0[abs(100 * dv + vfrac) + 1] " +
        "ELSE k.t1[abs(100 * dv + vfrac) + 1] END)"
    val thExpr = "((100 * du + ufrac) * pix0 + (100 * dv + vfrac) * pix1)"
    s"""WITH fx AS (
       |  SELECT row_number() OVER () AS rid,
       |    l_extendedprice % 60.0 - 30.0 AS u,
       |    (l_quantity * 3.0 + l_linenumber) % 60.0 - 30.0 AS v,
       |    l_tax AS re, l_discount AS im, l_discount + 0.5 AS weight,
       |    1500000000.0 AS freq,
       |    CAST(l_suppkey % 2 AS INT) AS cf_type,
       |    CAST(l_orderkey % 2 AS INT) AS field_id
       |  FROM lineitem WHERE l_orderkey % 16 = 0),
       |k AS (SELECT ${lst(cgk0)}::DOUBLE[] AS t0, ${lst(cgk1)}::DOUBLE[] AS t1),
       |geom AS (
       |  SELECT *,
       |    CASE cf_type WHEN 0 THEN 3 ELSE 7 END AS sc,
       |    CASE field_id WHEN 1 THEN ${fmt(pix0f1)} ELSE ${fmt(pix0f0)} END AS pix0,
       |    CASE field_id WHEN 1 THEN ${fmt(pix1f1)} ELSE ${fmt(pix1f0)} END AS pix1,
       |    u * ((-((freq * 0.002) * 32)) / 299792458.0) + 16 AS u_pos,
       |    v * ((-((freq * 0.002) * 32)) / 299792458.0) + 16 AS v_pos
       |  FROM fx),
       |idx AS (
       |  SELECT *, CAST(floor(u_pos + 0.5) AS INT) AS uc,
       |            CAST(floor(v_pos + 0.5) AS INT) AS vc,
       |            $greDef AS gre, $gimDef AS gim
       |  FROM geom
       |  WHERE CAST(floor(u_pos + 0.5) AS INT) + (CASE cf_type WHEN 0 THEN 3 ELSE 7 END) < 32
       |    AND CAST(floor(v_pos + 0.5) AS INT) + (CASE cf_type WHEN 0 THEN 3 ELSE 7 END) < 32
       |    AND CAST(floor(u_pos + 0.5) AS INT) - (CASE cf_type WHEN 0 THEN 3 ELSE 7 END) >= 0
       |    AND CAST(floor(v_pos + 0.5) AS INT) - (CASE cf_type WHEN 0 THEN 3 ELSE 7 END) >= 0),
       |frac AS (
       |  SELECT *, CAST(floor((uc - u_pos) * 100 + 0.5) AS INT) AS ufrac,
       |            CAST(floor((vc - v_pos) * 100 + 0.5) AS INT) AS vfrac
       |  FROM idx WHERE $gate),
       |taps AS (
       |  SELECT rid, weight, uc + du AS u_idx, vc + dv AS v_idx, gre, gim,
       |    $kExpr AS kk,
       |    $kExpr * cos($thExpr) AS conv_re,
       |    $kExpr * sin($thExpr) AS conv_im
       |  FROM frac
       |  CROSS JOIN generate_series(-7, 7) tu(du)
       |  CROSS JOIN generate_series(-7, 7) tv(dv)
       |  CROSS JOIN k
       |  WHERE abs(du) <= sc AND abs(dv) <= sc),
       |grid AS (
       |  SELECT u_idx, v_idx,
       |    sum(conv_re * gre - conv_im * gim) AS gre,
       |    sum(conv_re * gim + conv_im * gre) AS gim
       |  FROM taps WHERE kk <> 0.0 GROUP BY 1, 2),
       |norms AS (
       |  SELECT rid, any_value(weight) AS weight,
       |    sum(conv_re) AS nre, sum(conv_im) AS nim
       |  FROM taps GROUP BY 1),
       |sumw AS (SELECT sum($swExpr) AS sw FROM norms),
       |corr AS (SELECT ${lst(GridOps.correcting1D(32))}::DOUBLE[] AS t,
       |  ${lst(MosaicOps.sincCorr1D(32, 100))}::DOUBLE[] AS sn),
       |pxx AS (
       |  SELECT l_out, m_out, l_out + 8 AS lp, m_out + 8 AS mp
       |  FROM generate_series(0, 15) tl(l_out) CROSS JOIN generate_series(0, 15) tm(m_out)),
       |dft AS (
       |  SELECT pxx.l_out, pxx.m_out, pxx.lp, pxx.mp,
       |    sum(g.gre * cos(2 * pi() * ((g.u_idx - 16) * (pxx.lp - 16) + (g.v_idx - 16) * (pxx.mp - 16)) / 32.0)
       |      - g.gim * sin(2 * pi() * ((g.u_idx - 16) * (pxx.lp - 16) + (g.v_idx - 16) * (pxx.mp - 16)) / 32.0)) AS val
       |  FROM grid g CROSS JOIN pxx GROUP BY 1, 2, 3, 4)
       |SELECT 0 AS img_chan, 0 AS pol, l_out AS l_idx, m_out AS m_idx,
       |  val / (CASE WHEN sumw.sw = 0 THEN 1.0 ELSE sumw.sw END)
       |    / ((corr.sn[lp + 1] * corr.sn[mp + 1]) * (corr.t[lp + 1] * corr.t[mp + 1])) AS image
       |FROM dft CROSS JOIN sumw CROSS JOIN corr""".stripMargin
  }

  private def mosaicSqlRounded(doPsf: Boolean): String =
    s"""SELECT img_chan, pol, l_idx, m_idx,
       |  floor(image * 10000.0 + 0.5) / 10000.0 AS image
       |FROM (
       |${mosaicSql(doPsf)}
       |) b""".stripMargin

  private val mosaicImageQ = Q(
    (s, d) => {
      val (gcf, _) = MosaicOps.makeGcf(Map(0 -> 25.0, 1 -> 12.0), baseDish = 25.0)
      MosaicOps.makeImageMosaic(s, mosaicFixture(s, d), MosaicP, gcf,
          MosaicOffsets)
        .select(col("img_chan"), col("pol"), col("l_idx"), col("m_idx"),
          qround(col("image"), 4).as("image"))
    },
    mosaicSqlRounded(doPsf = false))

  private val mosaicPsfQ = Q(
    (s, d) => {
      val (gcf, _) = MosaicOps.makeGcf(Map(0 -> 25.0, 1 -> 12.0), baseDish = 25.0)
      MosaicOps.makePsfMosaic(s, mosaicFixture(s, d), MosaicP, gcf,
          MosaicOffsets)
        .select(col("img_chan"), col("pol"), col("l_idx"), col("m_idx"),
          qround(col("image"), 4).as("image"))
    },
    mosaicSqlRounded(doPsf = true))

  /** flat_noise: the mosaic image divided by the airy PB model with a
    * pb_limit cutoff — _normalize.py's normalizing_image = PS_CORR x PB
    * composed as ImageOps.pbNormalize on top of the mosaic image.
    */
  private val mosaicPbNormQ = Q(
    (s, d) => {
      val (gcf, _) = MosaicOps.makeGcf(Map(0 -> 25.0, 1 -> 12.0), baseDish = 25.0)
      val img = MosaicOps.makeImageMosaic(s, mosaicFixture(s, d), MosaicP,
        gcf, MosaicOffsets)
      val grid = ImageOps.makeEmptySkyImage(s, (0.0, 0.0), (16, 16),
        (0.002, 0.002), chans = Seq(1.5e9))
      val pb = BeamOps.makePb(grid, dishDiameter = 25.0)
        .select("l_idx", "m_idx", "pb")
      ImageOps.pbNormalize(img, pb, Seq("l_idx", "m_idx"), pbLimit = 0.01)
        .select(col("img_chan"), col("pol"), col("l_idx"), col("m_idx"),
          qround(col("image"), 4).as("image"))
    },
    s"""WITH base AS (
       |${mosaicSql(doPsf = false)}
       |),
       |pbr AS (
       |  SELECT l_idx, m_idx,
       |    sqrt(l * l + m * m) * (2 * pi() * 1500000000.0 / 299792458.0) * 12.5 AS r0
       |  FROM (
       |    SELECT CAST(i // 16 AS INT) AS l_idx, CAST(i % 16 AS INT) AS m_idx,
       |      (CAST(i // 16 AS INT) - 8) * CAST(0.002 AS DOUBLE) AS l,
       |      (CAST(i % 16 AS INT) - 8) * CAST(0.002 AS DOUBLE) AS m
       |    FROM generate_series(0, 255) s(i)) px),
       |pbv AS (
       |  SELECT l_idx, m_idx,
       |    CASE WHEN r0 = 0.0 THEN 1.0
       |         ELSE power(2.0 * ${j1Sql("rv")} / rv, 2) END AS pb
       |  FROM (SELECT *, CASE WHEN r0 = 0.0 THEN 1.0 ELSE r0 END AS rv FROM pbr) q)
       |SELECT base.img_chan, base.pol, base.l_idx, base.m_idx,
       |  floor((CASE WHEN pbv.pb < 0.01 THEN 0.0
       |         ELSE base.image / pbv.pb END) * 10000.0 + 0.5) / 10000.0 AS image
       |FROM base JOIN pbv ON base.l_idx = pbv.l_idx AND base.m_idx = pbv.m_idx""".stripMargin)

  /** make_mosaic_pb: weights gridded through the complex gcf kernels
    * stamped at the GRID CENTER (no vis position, no frac offset), FFT,
    * /sum_weight; PB = sqrt(|weight image|). Full SQL mirror.
    */
  private val mosaicPbQ = Q(
    (s, d) => {
      val (gcf, _) = MosaicOps.makeGcf(Map(0 -> 25.0, 1 -> 12.0), baseDish = 25.0)
      MosaicOps.makeMosaicPb(s, mosaicFixture(s, d), MosaicP, gcf,
          MosaicOffsets)
        .select(col("img_chan"), col("pol"), col("l_idx"), col("m_idx"),
          qround(col("weight_pb"), 6).as("weight_pb"),
          qround(col("pb"), 6).as("pb"),
          qround(col("sum_weight"), 4).as("sum_weight"))
    }, {
      val cgk0 = GridOps.cgk1D(100, 7)
      val cgk1 = GridOps.cgk1D(100, 15)
      def lst(a: Array[Double]) = a.map(fmt).mkString("[", ", ", "]")
      val pix0f1 = MosaicOps.phaseGradientPix(0.002, 0.002, 32, 100)
      val pix1f1 = MosaicOps.phaseGradientPix(-0.002, 0.002, 32, 100)
      val pix0f0 = MosaicOps.phaseGradientPix(0.0, 0.002, 32, 100)
      val kExpr =
        "(CASE cf_type WHEN 0 THEN k.t0[abs(100 * du) + 1] " +
          "ELSE k.t1[abs(100 * du) + 1] END) * " +
          "(CASE cf_type WHEN 0 THEN k.t0[abs(100 * dv) + 1] " +
          "ELSE k.t1[abs(100 * dv) + 1] END)"
      val thExpr = "((100 * du) * pix0 + (100 * dv) * pix1)"
      s"""WITH fx AS (
         |  SELECT row_number() OVER () AS rid, l_discount + 0.5 AS weight,
         |    CAST(l_suppkey % 2 AS INT) AS cf_type,
         |    CAST(l_orderkey % 2 AS INT) AS field_id
         |  FROM lineitem WHERE l_orderkey % 16 = 0),
         |k AS (SELECT ${lst(cgk0)}::DOUBLE[] AS t0, ${lst(cgk1)}::DOUBLE[] AS t1),
         |geom AS (
         |  SELECT *,
         |    CASE cf_type WHEN 0 THEN 3 ELSE 7 END AS sc,
         |    CASE field_id WHEN 1 THEN ${fmt(pix0f1)} ELSE ${fmt(pix0f0)} END AS pix0,
         |    CASE field_id WHEN 1 THEN ${fmt(pix1f1)} ELSE ${fmt(pix0f0)} END AS pix1
         |  FROM fx WHERE weight <> 0.0),
         |taps AS (
         |  SELECT rid, weight, 16 + du AS u_idx, 16 + dv AS v_idx,
         |    $kExpr AS kk,
         |    $kExpr * cos($thExpr) AS conv_re,
         |    $kExpr * sin($thExpr) AS conv_im
         |  FROM geom
         |  CROSS JOIN generate_series(-7, 7) tu(du)
         |  CROSS JOIN generate_series(-7, 7) tv(dv)
         |  CROSS JOIN k
         |  WHERE abs(du) <= sc AND abs(dv) <= sc),
         |grid AS (
         |  SELECT u_idx, v_idx,
         |    sum(conv_re * weight) AS gre, sum(conv_im * weight) AS gim
         |  FROM taps WHERE kk <> 0.0 GROUP BY 1, 2),
         |norms AS (
         |  SELECT rid, any_value(weight) AS weight, sum(conv_re) AS nre
         |  FROM taps GROUP BY 1),
         |sumw AS (SELECT sum(weight * nre) AS sw FROM norms),
         |pxx AS (
         |  SELECT l_out, m_out, l_out + 8 AS lp, m_out + 8 AS mp
         |  FROM generate_series(0, 15) tl(l_out) CROSS JOIN generate_series(0, 15) tm(m_out)),
         |dft AS (
         |  SELECT pxx.l_out, pxx.m_out,
         |    sum(g.gre * cos(2 * pi() * ((g.u_idx - 16) * (pxx.lp - 16) + (g.v_idx - 16) * (pxx.mp - 16)) / 32.0)
         |      - g.gim * sin(2 * pi() * ((g.u_idx - 16) * (pxx.lp - 16) + (g.v_idx - 16) * (pxx.mp - 16)) / 32.0)) AS val
         |  FROM grid g CROSS JOIN pxx GROUP BY 1, 2)
         |SELECT 0 AS img_chan, 0 AS pol, l_out AS l_idx, m_out AS m_idx,
         |  floor((val / sw) * 1000000.0 + 0.5) / 1000000.0 AS weight_pb,
         |  floor(sqrt(abs(val / sw)) * 1000000.0 + 0.5) / 1000000.0 AS pb,
         |  floor(sw * 10000.0 + 0.5) / 10000.0 AS sum_weight
         |FROM dft CROSS JOIN sumw""".stripMargin
    })

  /** MS-MFS Taylor maps over a synthesized 5-channel polynomial cube:
    * the per-pixel c0/c1/c2 solve (oracle: Cramer's rule on the 3x3
    * normal equations — quantization absorbs the fp-path gap vs the
    * operator's Gaussian elimination) plus the alpha = c1/c0 map.
    * All x powers are multiplication chains, never libm pow.
    */
  private val mfsTaylorQ = Q(
    (s, d) => {
      val px = s.range(16L * 16)
        .select((col("id") / 16).cast("int").as("l_idx"),
          (col("id") % 16).cast("int").as("m_idx"))
      val cube = px
        .withColumn("chan", explode(array((0 until 5).map(i => lit(i)): _*)))
        .withColumn("freq",
          (lit(1.0) + col("chan").cast("double") / lit(10.0)) * lit(1.0e9))
        .withColumn("xf", (col("freq") - lit(1.0e9)) / lit(1.0e9))
        .withColumn("image",
          lit(1.0) + col("l_idx") * lit(0.5) +
            (col("m_idx") * lit(0.25) - lit(2.0)) * col("xf") +
            (col("l_idx") * lit(0.125) - col("m_idx") * lit(0.0625)) *
              col("xf") * col("xf"))
      CleanOps.mfsTaylor(cube, Seq("l_idx", "m_idx"), "freq", "image",
          refFreq = 1.0e9, nterms = 3)
        .select(col("l_idx"), col("m_idx"),
          qround(col("c0"), 6).as("c0"), qround(col("c1"), 6).as("c1"),
          qround(col("c2"), 6).as("c2"),
          qround(col("alpha"), 6).as("alpha"), col("n_chan"))
    }, {
      val a = Array(
        Array("m0", "m1", "m2"),
        Array("m1", "m2", "m3"),
        Array("m2", "m3", "m4"))
      val b = Array("r0", "r1", "r2")
      def repl(k: Int): Array[Array[String]] =
        a.zipWithIndex.map { case (row, i) =>
          row.zipWithIndex.map { case (v, j) => if (j == k) b(i) else v } }
      def qr6(e: String): String = s"floor(($e) * 1.0e6 + 0.5) / 1.0e6"
      s"""WITH px AS (
         |  SELECT CAST(i // 16 AS INT) AS l_idx, CAST(i % 16 AS INT) AS m_idx
         |  FROM generate_series(0, 255) t(i)),
         |ch AS (SELECT CAST(unnest(generate_series(0, 4)) AS INT) AS chan),
         |cx AS (
         |  SELECT l_idx, m_idx,
         |    ((1.0e0 + chan / 10.0e0) * 1.0e9 - 1.0e9) / 1.0e9 AS x
         |  FROM px CROSS JOIN ch),
         |cube AS (
         |  SELECT l_idx, m_idx, x,
         |    1.0e0 + l_idx * 5.0e-1 + (m_idx * 2.5e-1 - 2.0e0) * x
         |      + (l_idx * 1.25e-1 - m_idx * 6.25e-2) * x * x AS v
         |  FROM cx),
         |mom AS (
         |  SELECT l_idx, m_idx,
         |    sum(1.0e0) AS m0, sum(x) AS m1, sum(x * x) AS m2,
         |    sum(x * x * x) AS m3, sum(x * x * x * x) AS m4,
         |    sum(v * 1.0e0) AS r0, sum(v * x) AS r1,
         |    sum(v * (x * x)) AS r2,
         |    count(*) AS n_chan
         |  FROM cube GROUP BY 1, 2),
         |sol AS (
         |  SELECT l_idx, m_idx, n_chan,
         |    (${det3(repl(0))}) / (${det3(a)}) AS c0,
         |    (${det3(repl(1))}) / (${det3(a)}) AS c1,
         |    (${det3(repl(2))}) / (${det3(a)}) AS c2
         |  FROM mom)
         |SELECT l_idx, m_idx, ${qr6("c0")} AS c0, ${qr6("c1")} AS c1,
         |  ${qr6("c2")} AS c2,
         |  CASE WHEN c0 <> 0.0e0 THEN ${qr6("c1 / c0")} ELSE NULL END AS alpha,
         |  n_chan
         |FROM sol""".stripMargin
    })

  private def det3(m: Array[Array[String]]): String =
    s"((${m(0)(0)}) * ((${m(1)(1)}) * (${m(2)(2)}) - (${m(1)(2)}) * (${m(2)(1)}))" +
      s" - (${m(0)(1)}) * ((${m(1)(0)}) * (${m(2)(2)}) - (${m(1)(2)}) * (${m(2)(0)}))" +
      s" + (${m(0)(2)}) * ((${m(1)(0)}) * (${m(2)(1)}) - (${m(1)(1)}) * (${m(2)(0)})))"

  /** ONE Gauss-Newton step of spec_fit from the data-driven initial
    * guess (amp = max y, center = argmax, sigma = range/6) IS closed
    * form: the J'J / J'r sums and the damped 3x3 solve are plain SQL
    * (Cramer's rule; quantization absorbs the fp-path gap vs the
    * operator's Gaussian elimination). The converged fit stays
    * rows-only with the analytic recovery test.
    */
  private val specFitOneStepQ = Q(
    (s, d) => {
      import s.implicits._
      val spec = Tables.lineitem(s, d)
        .groupBy((col("l_linenumber") - 1).cast("int").as("chan"))
        .agg(avg(col("l_quantity")).as("v"))
        .orderBy("chan") // deterministic accumulation order
        .collect().map(r => (r.getInt(0).toDouble, r.getDouble(1)))
      val (amp, cen, sig) = BeamOps.specFit(spec, maxIter = 1)
      Seq((qr4(amp), qr4(cen), qr4(sig))).toDF("amp", "center", "sigma")
    }, {
      val a = Array(
        Array("a00", "a01", "a02"),
        Array("a01", "a11", "a12"),
        Array("a02", "a12", "a22"))
      val b = Array("b0", "b1", "b2")
      def repl(k: Int): Array[Array[String]] =
        Array.tabulate(3, 3)((i, j) => if (j == k) b(i) else a(i)(j))
      s"""WITH t AS (
         |  SELECT CAST(l_linenumber - 1 AS INT) AS chan, avg(l_quantity) AS y
         |  FROM lineitem GROUP BY 1),
         |init AS (
         |  SELECT max(y) AS amp,
         |    CAST((array_agg(chan ORDER BY y DESC, chan))[1] AS DOUBLE) AS cen,
         |    (max(chan) - min(chan)) / 6.0 AS sig
         |  FROM t),
         |comp AS (
         |  SELECT chan, y, amp, cen, sig,
         |    exp(-0.5 * pow((chan - cen) / sig, 2)) AS e
         |  FROM t CROSS JOIN init),
         |jc AS (
         |  SELECT *, amp * e AS f FROM comp),
         |jr AS (
         |  SELECT *, e AS j0,
         |    f * (chan - cen) / (sig * sig) AS j1,
         |    f * (chan - cen) * (chan - cen) / (sig * sig * sig) AS j2,
         |    y - f AS r
         |  FROM jc),
         |m AS (
         |  SELECT
         |    sum(j0 * j0) * (1.0 + 1e-9) AS a00, sum(j0 * j1) AS a01,
         |    sum(j0 * j2) AS a02, sum(j1 * j1) * (1.0 + 1e-9) AS a11,
         |    sum(j1 * j2) AS a12, sum(j2 * j2) * (1.0 + 1e-9) AS a22,
         |    sum(j0 * r) AS b0, sum(j1 * r) AS b1, sum(j2 * r) AS b2,
         |    any_value(amp) AS amp, any_value(cen) AS cen,
         |    any_value(sig) AS sig
         |  FROM jr)
         |SELECT
         |  floor((amp + (${det3(repl(0))}) / (${det3(a)})) * 10000.0 + 0.5) / 10000.0 AS amp,
         |  floor((cen + (${det3(repl(1))}) / (${det3(a)})) * 10000.0 + 0.5) / 10000.0 AS center,
         |  floor(abs(sig + (${det3(repl(2))}) / (${det3(a)})) * 10000.0 + 0.5) / 10000.0 AS sigma
         |FROM m""".stripMargin
    })

  private val specFitQ = Q(
    (s, d) => {
      import s.implicits._
      // per-chan mean quantity = the "spectrum" of one synthetic pixel;
      // dimension-sized collect + driver-side fit, as in the reference
      val spec = Tables.lineitem(s, d)
        .groupBy((col("l_linenumber") - 1).cast("int").as("chan"))
        .agg(avg(col("l_quantity")).as("v"))
        .collect().map(r => (r.getInt(0).toDouble, r.getDouble(1)))
      val (amp, cen, sig) = BeamOps.specFit(spec)
      Seq((qr4(amp), qr4(cen), qr4(sig))).toDF("amp", "center", "sigma")
    }, {
      // The CONVERGED Gauss-Newton fit, hash-exact via a recursive CTE:
      // each level recomputes the 3x3 normal equations against the
      // current (amp, cen, sig) and applies the Cramer-solved step;
      // recursion stops at the kernel's |d0|+|d1|+|d2| < 1e-12 test.
      // Cramer here vs Gaussian elimination in the kernel differ at fp
      // level, but Gauss-Newton contracts near the optimum so both
      // engines land within tol of the same fixed point (same device
      // as the self_cal oracle); qround(4) absorbs the rest. NOTE the
      // `mm.it IS NOT NULL` guard: an aggregate over the empty
      // filtered recursive table still emits one all-NULL row, which
      // would otherwise recurse forever.
      val a = Array(
        Array("a00", "a01", "a02"),
        Array("a01", "a11", "a12"),
        Array("a02", "a12", "a22"))
      val b = Array("b0", "b1", "b2")
      def repl(k: Int): Array[Array[String]] =
        Array.tabulate(3, 3)((i, j) => if (j == k) b(i) else a(i)(j))
      s"""WITH RECURSIVE t AS (
         |  SELECT CAST(l_linenumber - 1 AS INT) AS chan, avg(l_quantity) AS y
         |  FROM lineitem GROUP BY 1),
         |init AS (
         |  SELECT max(y) AS amp,
         |    CAST((array_agg(chan ORDER BY y DESC, chan))[1] AS DOUBLE) AS cen,
         |    (max(chan) - min(chan)) / 6.0 AS sig
         |  FROM t),
         |r AS (
         |  SELECT 0 AS it, amp, cen, sig, CAST(1.0 AS DOUBLE) AS delta
         |  FROM init
         |  UNION ALL
         |  SELECT s.it, s.amp + s.d0, s.cen + s.d1, s.sig + s.d2,
         |    abs(s.d0) + abs(s.d1) + abs(s.d2)
         |  FROM (
         |    SELECT mm.it, mm.amp, mm.cen, mm.sig,
         |      (${det3(repl(0))}) / (${det3(a)}) AS d0,
         |      (${det3(repl(1))}) / (${det3(a)}) AS d1,
         |      (${det3(repl(2))}) / (${det3(a)}) AS d2
         |    FROM (
         |      SELECT any_value(q.it) + 1 AS it, any_value(q.amp) AS amp,
         |        any_value(q.cen) AS cen, any_value(q.sig) AS sig,
         |        sum(j0 * j0) * (1.0 + 1e-9) AS a00, sum(j0 * j1) AS a01,
         |        sum(j0 * j2) AS a02, sum(j1 * j1) * (1.0 + 1e-9) AS a11,
         |        sum(j1 * j2) AS a12, sum(j2 * j2) * (1.0 + 1e-9) AS a22,
         |        sum(j0 * r_) AS b0, sum(j1 * r_) AS b1, sum(j2 * r_) AS b2
         |      FROM (
         |        SELECT rr.it, rr.amp, rr.cen, rr.sig,
         |          e AS j0,
         |          f * (chan - cen) / (sig * sig) AS j1,
         |          f * (chan - cen) * (chan - cen) / (sig * sig * sig) AS j2,
         |          y - f AS r_
         |        FROM (
         |          SELECT r.*, t.chan, t.y,
         |            exp(-0.5 * pow((t.chan - r.cen) / r.sig, 2)) AS e,
         |            r.amp * exp(-0.5 * pow((t.chan - r.cen) / r.sig, 2)) AS f
         |          FROM r CROSS JOIN t
         |          WHERE r.it < 200 AND r.delta >= 1e-12
         |        ) rr
         |      ) q
         |    ) mm
         |    WHERE mm.it IS NOT NULL
         |  ) s)
         |SELECT floor(amp * 10000.0 + 0.5) / 10000.0 AS amp,
         |  floor(cen * 10000.0 + 0.5) / 10000.0 AS center,
         |  floor(abs(sig) * 10000.0 + 0.5) / 10000.0 AS sigma
         |FROM r WHERE it = (SELECT max(it) FROM r)""".stripMargin
    })

  private def qr4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  /** The full synthesis-imaging composition (SURVEY §7.1 P4):
    * briggs imaging weights -> grid -> image + psf -> CLEAN. Each stage
    * is individually oracle-checked elsewhere; this query proves the
    * stages compose end to end (rows-only).
    */
  private val synthesisQ = Q(
    (s, d) => {
      val p = GridOps.GridParams((32, 32), (0.002, 0.002),
        imageSize = Some((16, 16)))
      val vis = Tables.lineitem(s, d).select(
        lit(0).as("img_chan"), lit(0).as("pol"),
        (col("l_extendedprice") % 60.0 - 30.0).as("u"),
        ((col("l_quantity") * 3.0 + col("l_linenumber")) % 60.0 - 30.0).as("v"),
        col("l_tax").as("re"), col("l_discount").as("im"),
        (col("l_discount") + 0.5).as("weight"), lit(1.5e9).as("freq"))
      val weighted = GridOps.makeImagingWeight(vis, p, "briggs", robust = 0.5)
        .withColumn("weight", col("imaging_weight"))
        .select("img_chan", "pol", "u", "v", "re", "im", "weight", "freq")
      // one scan + one shuffle grids both accumulators
      val (img, psf) = GridOps.makeImageAndPsf(s, weighted, p)
      // niter 30 (was 100): the composed-pipeline oracle replays every
      // Hogbom level recursively; 100 levels cost ~15 s of the
      // driver's DuckDB budget
      CleanOps.cleanPlanes(s, img, psf, 16, 16, 16, 16,
          gain = 0.2, threshold = 0.05, niter = 30)
        .select(col("img_chan"), col("pol"), col("l_idx"), col("m_idx"),
          qround(col("model"), 6).as("model"),
          qround(col("residual"), 6).as("residual"))
    },
    // Composed-pipeline oracle, hash-exact end to end: the briggs
    // imaging-weight mirror (hermitian cell sums + robust factor,
    // identical to the imaging_weight_briggs oracle) rewrites each
    // row's weight, and everything downstream — dual gridding, DFT
    // inversion, every Hogbom iteration — is hogbomChainSql.
    s"""WITH RECURSIVE fx0 AS (
       |  SELECT l_extendedprice % 60.0 - 30.0 AS u,
       |    (l_quantity * 3.0 + l_linenumber) % 60.0 - 30.0 AS v,
       |    l_tax AS re, l_discount AS im, l_discount + 0.5 AS weight,
       |    1500000000.0 AS freq
       |  FROM lineitem),
       |cells0 AS (
       |  SELECT *,
       |    CAST(floor(u * (freq * ((-0.002 * 32) / 299792458.0)) + 16 + 0.5) AS INT) AS u_cell,
       |    CAST(floor(v * (freq * ((-0.002 * 32) / 299792458.0)) + 16 + 0.5) AS INT) AS v_cell,
       |    CAST(floor((-u) * (freq * ((-0.002 * 32) / 299792458.0)) + 16 + 0.5) AS INT) AS u_conj,
       |    CAST(floor((-v) * (freq * ((-0.002 * 32) / 299792458.0)) + 16 + 0.5) AS INT) AS v_conj
       |  FROM fx0),
       |prim AS (
       |  SELECT * FROM cells0
       |  WHERE u_cell >= 0 AND u_cell < 32 AND v_cell >= 0 AND v_cell < 32),
       |contrib AS (
       |  SELECT u_cell, v_cell, weight FROM prim
       |  UNION ALL
       |  SELECT u_conj AS u_cell, v_conj AS v_cell, weight FROM prim
       |  WHERE u_conj >= 0 AND u_conj < 32 AND v_conj >= 0 AND v_conj < 32),
       |cells AS (
       |  SELECT u_cell, v_cell, sum(weight) AS cell_w FROM contrib
       |  GROUP BY 1, 2),
       |sumwb AS (SELECT sum(weight) * 2.0 AS sum_w FROM prim),
       |fac AS (
       |  SELECT power(5.0 * power(10.0, -0.5), 2) / (q.sq_sum / s.sum_w) AS f2
       |  FROM (SELECT sum(cell_w * cell_w) AS sq_sum FROM cells) q
       |  CROSS JOIN sumwb s),
       |fx AS (
       |  SELECT c0.u, c0.v, c0.re, c0.im,
       |    CASE WHEN c0.u_cell >= 0 AND c0.u_cell < 32
       |          AND c0.v_cell >= 0 AND c0.v_cell < 32
       |          AND c0.weight <> 0.0 AND c.cell_w IS NOT NULL
       |          AND c.cell_w <> 0.0
       |     THEN c0.weight / (fac.f2 * c.cell_w + 1.0)
       |     ELSE c0.weight END AS weight,
       |    c0.freq
       |  FROM cells0 c0
       |  LEFT JOIN cells c ON c0.u_cell = c.u_cell AND c0.v_cell = c.v_cell
       |  CROSS JOIN fac),
       |${hogbomChainSql(gain = 0.2, threshold = 0.05, niter = 30)}""".stripMargin)

  /** The flagship pipeline's artifacts THROUGH the zarr store layer:
    * run synthesis_imaging, export the model and residual planes as
    * chunked zarr 2-D arrays (sources.ZarrSource.writeVar2D — the
    * reference persists exactly these artifacts to zarr), read them
    * back through the distributed chunk decoder, and reassemble the
    * original output shape. Shares synthesis_imaging's composed oracle
    * VERBATIM, so the store round-trip is proven bit-preserving on the
    * real workflow's numbers (doubles ride <f8 untouched). The 256-px
    * collect is canvas-bounded — the same budget as the plot queries.
    */
  private val synthesisZarrQ = Q(
    (s, d) => {
      val rows = synthesisQ.fn(s, d).collect()
      val (nL, nM) = (16, 16)
      def plane(cIdx: Int) = {
        val a = Array.fill(nL, nM)(0.0)
        rows.foreach { r =>
          a(r.getInt(2))(r.getInt(3)) = r.getDouble(cIdx)
        }
        a
      }
      // deterministic per-(session, sf) scratch path — reps overwrite
      // in place (same shape -> same chunk files) instead of leaking a
      // fresh UUID-named store per bench rep
      val base = s"/tmp/graft_zarrimg_${Queries.scratchTag(s, d)}"
      sources.ZarrSource.writeVar2D(plane(4), s"$base/model", 8, 8,
        ("l_idx", "m_idx"))
      sources.ZarrSource.writeVar2D(plane(5), s"$base/residual", 8, 8,
        ("l_idx", "m_idx"))
      sources.ZarrSource.readVars(s, base, Seq("model", "residual"))
        .select(lit(0).as("img_chan"), lit(0).as("pol"),
          col("i0").cast("int").as("l_idx"),
          col("i1").cast("int").as("m_idx"),
          col("model"), col("residual"))
    },
    synthesisQ.sql)

  /** synthesis_imaging_cube (ngcasa/imaging/synthesis_imaging_cube.py:
    * 30-310): the per-channel flagship composition — imaging weights ->
    * single-pass image+psf cube gridding -> per-plane restore-beam fit
    * (the reference's casa_fit over the psf). Rows-only: every stage is
    * oracle-checked on its own (imaging_weight_briggs, make_grid_cube,
    * make_image, fit_gaussian).
    */
  private val synthesisCubeQ = Q(
    (s, d) => {
      val p = GridOps.GridParams((32, 32), (0.002, 0.002),
        imageSize = Some((16, 16)))
      val vis = Tables.lineitem(s, d).select(
        (col("l_orderkey") % 2).cast("int").as("img_chan"), // cube: 2 planes
        lit(0).as("pol"),
        (col("l_extendedprice") % 60.0 - 30.0).as("u"),
        ((col("l_quantity") * 3.0 + col("l_linenumber")) % 60.0 - 30.0).as("v"),
        col("l_tax").as("re"), col("l_discount").as("im"),
        (col("l_discount") + 0.5).as("weight"), lit(1.5e9).as("freq"))
      val weighted = GridOps.makeImagingWeight(vis, p, "briggs", robust = 0.5)
        .withColumn("weight", col("imaging_weight"))
        .select("img_chan", "pol", "u", "v", "re", "im", "weight", "freq")
      val (img, psf) = GridOps.makeImageAndPsf(s, weighted, p)
      val beam = BeamOps.fitGaussianBeam(s, psf, 16, 16)
      img.join(psf.select(col("img_chan"), col("pol"), col("l_idx"),
          col("m_idx"), col("image").as("psf")),
          Seq("img_chan", "pol", "l_idx", "m_idx"))
        .join(broadcast(beam), Seq("img_chan", "pol"))
        .select(col("img_chan"), col("pol"), col("l_idx"), col("m_idx"),
          qround(col("image"), 6).as("image"),
          qround(col("psf"), 6).as("psf"),
          qround(col("d1_pix"), 4).as("beam_d1_pix"),
          qround(col("d2_pix"), 4).as("beam_d2_pix"))
    },
    {
      // Composed cube oracle, hash-exact end to end: every CTE block
      // from the single-plane chain re-keyed by the channel column —
      // per-channel briggs factors, grids, sum-weights, DFT inversion —
      // plus the restore-beam fit: a per-plane 4x4 least-squares of
      // ln(psf) over the 9x9 center window, solved by Cramer (detSql)
      // against the kernel's Gaussian elimination; qround(4) absorbs
      // the fp-path gap (same device as fit_gaussian). The x^2*y^2
      // moment appears twice with DIFFERENT factorizations — (x*x)*
      // (y*y) for a13 but (x*y)*(x*y) for a22 — mirroring the
      // kernel's f(i)*f(j) products bit for bit.
      def lst(a: Array[Double]) = a.map(fmt).mkString("[", ", ", "]")
      def mm(i: Int, j: Int) = s"m${math.min(i, j)}${math.max(i, j)}"
      val a4 = Vector.tabulate(4, 4)((i, j) => mm(i, j))
      val b4 = Vector("r0", "r1", "r2", "r3")
      def repl4(k: Int) = Vector.tabulate(4, 4)((i, j) =>
        if (j == k) b4(i) else a4(i)(j))
      s"""WITH fx0 AS (
         |  SELECT CAST(l_orderkey % 2 AS INT) AS ch,
         |    l_extendedprice % 60.0 - 30.0 AS u,
         |    (l_quantity * 3.0 + l_linenumber) % 60.0 - 30.0 AS v,
         |    l_tax AS re, l_discount AS im, l_discount + 0.5 AS weight,
         |    1500000000.0 AS freq
         |  FROM lineitem),
         |cells0 AS (
         |  SELECT *,
         |    CAST(floor(u * (freq * ((-0.002 * 32) / 299792458.0)) + 16 + 0.5) AS INT) AS u_cell,
         |    CAST(floor(v * (freq * ((-0.002 * 32) / 299792458.0)) + 16 + 0.5) AS INT) AS v_cell,
         |    CAST(floor((-u) * (freq * ((-0.002 * 32) / 299792458.0)) + 16 + 0.5) AS INT) AS u_conj,
         |    CAST(floor((-v) * (freq * ((-0.002 * 32) / 299792458.0)) + 16 + 0.5) AS INT) AS v_conj
         |  FROM fx0),
         |prim AS (
         |  SELECT * FROM cells0
         |  WHERE u_cell >= 0 AND u_cell < 32 AND v_cell >= 0 AND v_cell < 32),
         |contrib AS (
         |  SELECT ch, u_cell, v_cell, weight FROM prim
         |  UNION ALL
         |  SELECT ch, u_conj AS u_cell, v_conj AS v_cell, weight FROM prim
         |  WHERE u_conj >= 0 AND u_conj < 32 AND v_conj >= 0 AND v_conj < 32),
         |cells AS (
         |  SELECT ch, u_cell, v_cell, sum(weight) AS cell_w FROM contrib
         |  GROUP BY 1, 2, 3),
         |sumwb AS (SELECT ch, sum(weight) * 2.0 AS sum_w FROM prim GROUP BY 1),
         |fac AS (
         |  SELECT q.ch, power(5.0 * power(10.0, -0.5), 2) / (q.sq_sum / s.sum_w) AS f2
         |  FROM (SELECT ch, sum(cell_w * cell_w) AS sq_sum FROM cells GROUP BY 1) q
         |  JOIN sumwb s ON q.ch = s.ch),
         |fx AS (
         |  SELECT c0.ch, c0.u, c0.v, c0.re, c0.im,
         |    CASE WHEN c0.u_cell >= 0 AND c0.u_cell < 32
         |          AND c0.v_cell >= 0 AND c0.v_cell < 32
         |          AND c0.weight <> 0.0 AND c.cell_w IS NOT NULL
         |          AND c.cell_w <> 0.0
         |     THEN c0.weight / (fac.f2 * c.cell_w + 1.0)
         |     ELSE c0.weight END AS weight,
         |    c0.freq
         |  FROM cells0 c0
         |  LEFT JOIN cells c ON c0.ch = c.ch AND c0.u_cell = c.u_cell
         |                   AND c0.v_cell = c.v_cell
         |  LEFT JOIN fac ON c0.ch = fac.ch),
         |cgk AS (SELECT ${lst(GridOps.cgk1D(100, 7))}::DOUBLE[] AS t),
         |corr AS (SELECT ${lst(GridOps.correcting1D(32))}::DOUBLE[] AS t),
         |geom AS (
         |  SELECT *,
         |    u * ((-((freq * 0.002) * 32)) / 299792458.0) + 16 AS u_pos,
         |    v * ((-((freq * 0.002) * 32)) / 299792458.0) + 16 AS v_pos
         |  FROM fx),
         |idx AS (
         |  SELECT *,
         |    CAST(floor(u_pos + 0.5) AS INT) AS uc,
         |    CAST(floor(v_pos + 0.5) AS INT) AS vc,
         |    re * weight AS wre, im * weight AS wim
         |  FROM geom
         |  WHERE CAST(floor(u_pos + 0.5) AS INT) + 3 < 32
         |    AND CAST(floor(v_pos + 0.5) AS INT) + 3 < 32
         |    AND CAST(floor(u_pos + 0.5) AS INT) - 3 >= 0
         |    AND CAST(floor(v_pos + 0.5) AS INT) - 3 >= 0),
         |frac_i AS (
         |  SELECT *,
         |    CAST(floor((uc - u_pos) * 100 + 0.5) AS INT) AS ufrac,
         |    CAST(floor((vc - v_pos) * 100 + 0.5) AS INT) AS vfrac,
         |    wre AS gre, wim AS gim
         |  FROM idx WHERE (wre <> 0.0 OR wim <> 0.0)),
         |frac_p AS (
         |  SELECT *,
         |    CAST(floor((uc - u_pos) * 100 + 0.5) AS INT) AS ufrac,
         |    CAST(floor((vc - v_pos) * 100 + 0.5) AS INT) AS vfrac,
         |    weight AS gre, 0.0 AS gim
         |  FROM idx WHERE weight <> 0.0),
         |taps_i AS (
         |  SELECT ch, uc + du AS u_idx, vc + dv AS v_idx,
         |    cgk.t[abs(100 * du + ufrac) + 1] * cgk.t[abs(100 * dv + vfrac) + 1] AS conv,
         |    gre, gim
         |  FROM frac_i
         |  CROSS JOIN generate_series(-3, 3) tu(du)
         |  CROSS JOIN generate_series(-3, 3) tv(dv)
         |  CROSS JOIN cgk
         |  WHERE cgk.t[abs(100 * du + ufrac) + 1] * cgk.t[abs(100 * dv + vfrac) + 1] <> 0.0),
         |taps_p AS (
         |  SELECT ch, uc + du AS u_idx, vc + dv AS v_idx,
         |    cgk.t[abs(100 * du + ufrac) + 1] * cgk.t[abs(100 * dv + vfrac) + 1] AS conv,
         |    gre
         |  FROM frac_p
         |  CROSS JOIN generate_series(-3, 3) tu(du)
         |  CROSS JOIN generate_series(-3, 3) tv(dv)
         |  CROSS JOIN cgk
         |  WHERE cgk.t[abs(100 * du + ufrac) + 1] * cgk.t[abs(100 * dv + vfrac) + 1] <> 0.0),
         |grid_i AS (
         |  SELECT ch, u_idx, v_idx, sum(conv * gre) AS gre, sum(conv * gim) AS gim
         |  FROM taps_i GROUP BY 1, 2, 3),
         |grid_p AS (
         |  SELECT ch, u_idx, v_idx, sum(conv * gre) AS gre
         |  FROM taps_p GROUP BY 1, 2, 3),
         |sumw_i AS (
         |  SELECT ch, sum(
         |    list_sum(list_transform(generate_series(-3, 3), du_ ->
         |      cgk.t[abs(100 * du_ + ufrac) + 1])) *
         |    list_sum(list_transform(generate_series(-3, 3), dv_ ->
         |      cgk.t[abs(100 * dv_ + vfrac) + 1])) * weight) AS sw
         |  FROM frac_i CROSS JOIN cgk GROUP BY 1),
         |sumw_p AS (
         |  SELECT ch, sum(
         |    list_sum(list_transform(generate_series(-3, 3), du_ ->
         |      cgk.t[abs(100 * du_ + ufrac) + 1])) *
         |    list_sum(list_transform(generate_series(-3, 3), dv_ ->
         |      cgk.t[abs(100 * dv_ + vfrac) + 1])) * weight) AS sw
         |  FROM frac_p CROSS JOIN cgk GROUP BY 1),
         |px AS (
         |  SELECT l_out, m_out, l_out + 8 AS lp, m_out + 8 AS mp
         |  FROM generate_series(0, 15) tl(l_out)
         |  CROSS JOIN generate_series(0, 15) tm(m_out)),
         |img AS (
         |  SELECT g.ch, px.l_out AS l_idx, px.m_out AS m_idx,
         |    sum(g.gre * cos(2 * pi() * ((g.u_idx - 16) * (px.lp - 16) + (g.v_idx - 16) * (px.mp - 16)) / 32.0)
         |      - g.gim * sin(2 * pi() * ((g.u_idx - 16) * (px.lp - 16) + (g.v_idx - 16) * (px.mp - 16)) / 32.0))
         |      / any_value(CASE WHEN sumw_i.sw = 0 THEN 1.0 ELSE sumw_i.sw END)
         |      / (corr.t[px.lp + 1] * corr.t[px.mp + 1]) AS v
         |  FROM grid_i g
         |  JOIN sumw_i ON g.ch = sumw_i.ch
         |  CROSS JOIN px CROSS JOIN corr
         |  GROUP BY g.ch, px.l_out, px.m_out, px.lp, px.mp, corr.t),
         |psf AS (
         |  SELECT g.ch, px.l_out AS l_idx, px.m_out AS m_idx,
         |    sum(g.gre * cos(2 * pi() * ((g.u_idx - 16) * (px.lp - 16) + (g.v_idx - 16) * (px.mp - 16)) / 32.0))
         |      / any_value(CASE WHEN sumw_p.sw = 0 THEN 1.0 ELSE sumw_p.sw END)
         |      / (corr.t[px.lp + 1] * corr.t[px.mp + 1]) AS k
         |  FROM grid_p g
         |  JOIN sumw_p ON g.ch = sumw_p.ch
         |  CROSS JOIN px CROSS JOIN corr
         |  GROUP BY g.ch, px.l_out, px.m_out, px.lp, px.mp, corr.t),
         |fitpts AS (
         |  SELECT ch, CAST(l_idx - 8 AS DOUBLE) AS x,
         |    CAST(m_idx - 8 AS DOUBLE) AS y, ln(k) AS lv
         |  FROM psf
         |  WHERE abs(l_idx - 8) <= 4 AND abs(m_idx - 8) <= 4 AND k > 1e-12),
         |mom AS (
         |  SELECT ch,
         |    sum(1.0 * 1.0) AS m00, sum(1.0 * (x * x)) AS m01,
         |    sum(1.0 * (x * y)) AS m02, sum(1.0 * (y * y)) AS m03,
         |    sum((x * x) * (x * x)) AS m11, sum((x * x) * (x * y)) AS m12,
         |    sum((x * x) * (y * y)) AS m13, sum((x * y) * (x * y)) AS m22,
         |    sum((x * y) * (y * y)) AS m23, sum((y * y) * (y * y)) AS m33,
         |    sum(1.0 * lv) AS r0, sum((x * x) * lv) AS r1,
         |    sum((x * y) * lv) AS r2, sum((y * y) * lv) AS r3
         |  FROM fitpts GROUP BY 1),
         |beam AS (
         |  SELECT ch,
         |    -((${detSql(repl4(1))}) / (${detSql(a4)})) AS al,
         |    -((${detSql(repl4(2))}) / (${detSql(a4)})) AS be,
         |    -((${detSql(repl4(3))}) / (${detSql(a4)})) AS ga
         |  FROM mom),
         |bm AS (
         |  SELECT ch,
         |    sqrt(2 * (4 * ln(2.0)) / ((al + ga) - sqrt((al - ga) * (al - ga) + be * be))) AS d1,
         |    sqrt(2 * (4 * ln(2.0)) / ((al + ga) + sqrt((al - ga) * (al - ga) + be * be))) AS d2
         |  FROM beam)
         |SELECT i.ch AS img_chan, 0 AS pol, i.l_idx, i.m_idx,
         |  floor(i.v * 1000000.0 + 0.5) / 1000000.0 AS image,
         |  floor(p.k * 1000000.0 + 0.5) / 1000000.0 AS psf,
         |  floor(bm.d1 * 10000.0 + 0.5) / 10000.0 AS beam_d1_pix,
         |  floor(bm.d2 * 10000.0 + 0.5) / 10000.0 AS beam_d2_pix
         |FROM img i
         |JOIN psf p ON i.ch = p.ch AND i.l_idx = p.l_idx AND i.m_idx = p.m_idx
         |JOIN bm ON i.ch = bm.ch""".stripMargin
    })

  val all: Map[String, Q] = Map(
    "make_image_mosaic" -> mosaicImageQ,
    "synthesis_imaging_cube" -> synthesisCubeQ,
    "make_psf_mosaic" -> mosaicPsfQ,
    "make_image_mosaic_pbnorm" -> mosaicPbNormQ,
    "make_mosaic_pb" -> mosaicPbQ,
    "spec_fit" -> specFitQ,
    "spec_fit_one_step" -> specFitOneStepQ,
    "synthesis_imaging" -> synthesisQ,
    "synthesis_to_zarr" -> synthesisZarrQ,
    "direction_rotate" -> directionRotateQ,
    "gaussian_beam" -> gaussianBeamQ,
    "make_pb" -> makePbQ,
    "self_cal" -> selfCalQ,
    "apply_gains" -> applyGainsQ,
    "selfcal_reduce" -> selfcalReduceQ,
    "selfcal_one_iter" -> selfcalOneIterQ,
    "selfcal_two_iter" -> selfcalTwoIterQ,
    "uv_cont_fit_order3" -> uvContFitOrder3Q,
    "deconvolve_point_clean" -> cleanQ,
    "clean_one_iter" -> cleanOneIterQ,
    "clean_two_iter" -> cleanTwoIterQ,
    "clean_five_iter" -> cleanFiveIterQ,
    "clean_converged" -> cleanConvergedQ,
    "restore_model" -> restoreModelQ,
    "make_mask" -> makeMaskQ,
    "is_converged" -> isConvergedQ,
    "deconvolve_multiscale_clean" -> msCleanQ,
    "mfs_taylor" -> mfsTaylorQ,
    "msclean_one_iter" -> msCleanOneIterQ,
    "deconvolve_fast_resolve" -> fastResolveQ,
    "deconvolve_rm_clean" -> rmCleanQ,
    "rmclean_one_iter" -> rmCleanOneIterQ,
    "deconvolve_asp_clean" -> aspCleanQ,
    "aspclean_one_iter" -> aspCleanOneIterQ,
    "smooth" -> smoothQ,
    "feather" -> featherQ,
    "fit_gaussian" -> fitGaussianQ,
    "fit_gaussian_rl" -> fitGaussianRlQ)
}
