package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.GridOps
import graft.operators.GridOps.GridParams
import graft.Queries.{Q, qround}

/** Driver-contract queries for the imaging chain. The DuckDB oracles
  * recompute the gridder as an explode + group-by (49 kernel taps per
  * visibility) and the FFT as a direct DFT over the touched grid
  * cells; the PSWF kernel / correction tables are embedded as literal
  * lists GENERATED from the very same Scala functions the operator
  * uses, so both engines look up identical doubles.
  */
object QueriesImaging {

  private val P = GridParams((32, 32), (0.002, 0.002),
    imageSize = Some((16, 16)))
  private val Freq = 1.5e9

  /** deterministic uv fixture from lineitem, identical in both engines */
  private def visFixture(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      lit(0).as("img_chan"),
      (col("l_linenumber") % 2).cast("int").as("pol"),
      (col("l_extendedprice") % 60.0 - 30.0).as("u"),
      ((col("l_quantity") * 3.0 + col("l_linenumber")) % 60.0 - 30.0).as("v"),
      col("l_tax").as("re"), col("l_discount").as("im"),
      (col("l_discount") + 0.5).as("weight"),
      lit(Freq).as("freq"))

  private val visFixtureSql =
    s"""SELECT l_orderkey, l_linenumber, 0 AS img_chan,
       |  CAST(l_linenumber % 2 AS INT) AS pol,
       |  l_extendedprice % 60.0 - 30.0 AS u,
       |  (l_quantity * 3.0 + l_linenumber) % 60.0 - 30.0 AS v,
       |  l_tax AS re, l_discount AS im, l_discount + 0.5 AS weight,
       |  1500000000.0 AS freq
       |FROM lineitem""".stripMargin

  private def fmt(d: Double): String = {
    val s = "%.17e".format(d)
    s
  }

  private def litList(a: Array[Double]): String =
    a.map(fmt).mkString("[", ", ", "]")

  // kernel geometry shared by Scala and SQL: scale, center, rounding
  private val geomSql =
    s"""SELECT *,
       |  u * ((-((freq * 0.002) * 32)) / 299792458.0) + 16 AS u_pos,
       |  v * ((-((freq * 0.002) * 32)) / 299792458.0) + 16 AS v_pos
       |FROM fx""".stripMargin

  private val idxSql =
    """SELECT *,
      |  CAST(floor(u_pos + 0.5) AS INT) AS uc,
      |  CAST(floor(v_pos + 0.5) AS INT) AS vc,
      |  re * weight AS wre, im * weight AS wim
      |FROM geom
      |WHERE CAST(floor(u_pos + 0.5) AS INT) + 3 < 32
      |  AND CAST(floor(v_pos + 0.5) AS INT) + 3 < 32
      |  AND CAST(floor(u_pos + 0.5) AS INT) - 3 >= 0
      |  AND CAST(floor(v_pos + 0.5) AS INT) - 3 >= 0""".stripMargin

  private def fracSql(doPsf: Boolean) = {
    val (wre, wim, gate) =
      if (doPsf) ("weight", "0.0", "weight <> 0.0")
      else ("wre", "wim", "(wre <> 0.0 OR wim <> 0.0)")
    s"""SELECT *,
       |  CAST(floor((uc - u_pos) * 100 + 0.5) AS INT) AS ufrac,
       |  CAST(floor((vc - v_pos) * 100 + 0.5) AS INT) AS vfrac,
       |  $wre AS gre, $wim AS gim
       |FROM idx WHERE $gate""".stripMargin
  }

  /** the 49-tap scatter, exploded: one row per (vis, du, dv), conv<>0 */
  private def tapsSql: String =
    s"""SELECT pol, uc + du AS u_idx, vc + dv AS v_idx,
       |  cgk.t[abs(100 * du + ufrac) + 1] * cgk.t[abs(100 * dv + vfrac) + 1] AS conv,
       |  gre, gim
       |FROM frac
       |CROSS JOIN generate_series(-3, 3) tu(du)
       |CROSS JOIN generate_series(-3, 3) tv(dv)
       |CROSS JOIN cgk
       |WHERE cgk.t[abs(100 * du + ufrac) + 1] * cgk.t[abs(100 * dv + vfrac) + 1] <> 0.0""".stripMargin

  private def gridCtes(doPsf: Boolean): String =
    s"""fx AS ($visFixtureSql),
       |cgk AS (SELECT ${litList(GridOps.cgk1D(100, 7))}::DOUBLE[] AS t),
       |geom AS ($geomSql),
       |idx AS ($idxSql),
       |frac AS (${fracSql(doPsf)}),
       |taps AS ($tapsSql)""".stripMargin

  private val makeGridQ = Q(
    (s, d) => {
      val (grid, _) = GridOps.makeGrid(s, visFixture(s, d), P)
      grid.select(col("img_chan"), col("pol"), col("u_idx"), col("v_idx"),
        qround(col("grid_re"), 6).as("grid_re"),
        qround(col("grid_im"), 6).as("grid_im"))
    },
    s"""WITH ${gridCtes(doPsf = false)}
       |SELECT 0 AS img_chan, pol, u_idx, v_idx,
       |  floor(sum(conv * gre) * 1000000.0 + 0.5) / 1000000.0 AS grid_re,
       |  floor(sum(conv * gim) * 1000000.0 + 0.5) / 1000000.0 AS grid_im
       |FROM taps GROUP BY 2, 3, 4""".stripMargin)

  private val gridSumWeightQ = Q(
    (s, d) => {
      val (_, sumW) = GridOps.makeGrid(s, visFixture(s, d), P)
      sumW.select(col("img_chan"), col("pol"),
        qround(col("sum_weight"), 4).as("sum_weight"))
    },
    s"""WITH fx AS ($visFixtureSql),
       |cgk AS (SELECT ${litList(GridOps.cgk1D(100, 7))}::DOUBLE[] AS t),
       |geom AS ($geomSql),
       |idx AS ($idxSql),
       |frac AS (${fracSql(doPsf = false)}),
       |norms AS (
       |  SELECT pol, weight,
       |    list_sum(list_transform(generate_series(-3, 3), du_ ->
       |      cgk.t[abs(100 * du_ + ufrac) + 1])) *
       |    list_sum(list_transform(generate_series(-3, 3), dv_ ->
       |      cgk.t[abs(100 * dv_ + vfrac) + 1])) AS norm
       |  FROM frac CROSS JOIN cgk)
       |SELECT 0 AS img_chan, pol,
       |  floor(sum(weight * norm) * 10000.0 + 0.5) / 10000.0 AS sum_weight
       |FROM norms GROUP BY 2""".stripMargin)

  /** cube-mode gridding: img_chan = a real channel axis (2 planes per
    * pol) instead of the continuum collapse — the chan_map choice of
    * make_image.py:132-139 expressed as a column.
    */
  private val makeGridCubeQ = Q(
    (s, d) => {
      val vis = visFixture(s, d)
        .withColumn("img_chan", (col("l_orderkey") % 2).cast("int"))
      val (grid, _) = GridOps.makeGrid(s, vis, P)
      grid.select(col("img_chan"), col("pol"), col("u_idx"), col("v_idx"),
        qround(col("grid_re"), 6).as("grid_re"),
        qround(col("grid_im"), 6).as("grid_im"))
    },
    s"""WITH fx0 AS ($visFixtureSql),
       |fx AS (SELECT * REPLACE (CAST(l_orderkey % 2 AS INT) AS img_chan) FROM fx0),
       |cgk AS (SELECT ${litList(GridOps.cgk1D(100, 7))}::DOUBLE[] AS t),
       |geom AS ($geomSql),
       |idx AS ($idxSql),
       |frac AS (${fracSql(doPsf = false)}),
       |taps AS (SELECT img_chan, pol, uc + du AS u_idx, vc + dv AS v_idx,
       |  cgk.t[abs(100 * du + ufrac) + 1] * cgk.t[abs(100 * dv + vfrac) + 1] AS conv,
       |  gre, gim
       |FROM frac
       |CROSS JOIN generate_series(-3, 3) tu(du)
       |CROSS JOIN generate_series(-3, 3) tv(dv)
       |CROSS JOIN cgk
       |WHERE cgk.t[abs(100 * du + ufrac) + 1] * cgk.t[abs(100 * dv + vfrac) + 1] <> 0.0)
       |SELECT img_chan, pol, u_idx, v_idx,
       |  floor(sum(conv * gre) * 1000000.0 + 0.5) / 1000000.0 AS grid_re,
       |  floor(sum(conv * gim) * 1000000.0 + 0.5) / 1000000.0 AS grid_im
       |FROM taps GROUP BY 1, 2, 3, 4""".stripMargin)

  /** Kernel degrid (beyond-parity — the reference's predict_modelvis
    * is a stub): grid the fixture, then sample the grid back at every
    * fixture (u, v) through the same PSWF taps. The oracle rebuilds
    * the UNROUNDED grid and replays the tap sampling; the qround
    * absorbs the cross-engine cell-sum order.
    */
  private def degridSelect(df: org.apache.spark.sql.DataFrame) =
    df.select(col("img_chan"), col("pol"),
      col("l_orderkey"), col("l_linenumber"), col("u"), col("v"),
      qround(col("model_re"), 6).as("model_re"),
      qround(col("model_im"), 6).as("model_im"))

  private val degridOracleSql =
    s"""WITH ${gridCtes(doPsf = false)},
       |grid AS (SELECT pol, u_idx, v_idx,
       |    sum(conv * gre) AS gr, sum(conv * gim) AS gi
       |  FROM taps GROUP BY 1, 2, 3),
       |dfrac AS (SELECT *,
       |    CAST(floor((uc - u_pos) * 100 + 0.5) AS INT) AS ufrac,
       |    CAST(floor((vc - v_pos) * 100 + 0.5) AS INT) AS vfrac
       |  FROM idx),
       |dtaps AS (SELECT l_orderkey, l_linenumber, u, v, pol,
       |    uc + du AS u_idx, vc + dv AS v_idx,
       |    cgk.t[abs(100 * du + ufrac) + 1] * cgk.t[abs(100 * dv + vfrac) + 1] AS conv
       |  FROM dfrac
       |  CROSS JOIN generate_series(-3, 3) tu(du)
       |  CROSS JOIN generate_series(-3, 3) tv(dv)
       |  CROSS JOIN cgk),
       |j AS (SELECT d.l_orderkey, d.l_linenumber, d.u, d.v, d.pol, d.conv,
       |    coalesce(g.gr, 0.0) AS gr, coalesce(g.gi, 0.0) AS gi
       |  FROM dtaps d LEFT JOIN grid g USING (pol, u_idx, v_idx))
       |SELECT 0 AS img_chan, pol, l_orderkey, l_linenumber, u, v,
       |  floor(sum(conv * gr) / sum(conv) * 1000000.0 + 0.5) / 1000000.0
       |    AS model_re,
       |  floor(sum(conv * gi) / sum(conv) * 1000000.0 + 0.5) / 1000000.0
       |    AS model_im
       |FROM j GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin

  private val degridVisQ = Q(
    (s, d) => {
      val fx = visFixture(s, d)
      val (grid, _) = GridOps.makeGrid(s, fx, P)
      degridSelect(GridOps.degridVis(fx, grid, P,
        Seq("l_orderkey", "l_linenumber", "u", "v")))
    },
    degridOracleSql)

  /** Same semantics through the RELATIONAL physical path (the
    * cube-scale fallback of GridOps.degridVis — taps equi-join the
    * grid DataFrame instead of sampling a broadcast). Shares the
    * oracle with degrid_vis: the paths are proven bitwise equal in
    * GridOpsSpec, so one SQL mirror serves both.
    */
  private val degridVisJoinQ = Q(
    (s, d) => {
      val fx = visFixture(s, d)
      val (grid, _) = GridOps.makeGrid(s, fx, P)
      degridSelect(GridOps.degridVisJoin(fx, grid, P,
        Seq("l_orderkey", "l_linenumber", "u", "v")))
    },
    degridOracleSql)

  /** linear_mosaic (the reference stubs it): two analytic fields
    * combined with pb/pb^2 weighting. The per-pixel sums have two
    * commutative-exact terms, but exp/sin differ by an ulp across
    * engines, so the result is quantized like any float reduction.
    */
  private val linearMosaicQ = Q(
    (s, d) => {
      val px = Tables.lineitem(s, d)
        .select((col("l_orderkey") % 32).cast("int").as("l_idx"),
          ((col("l_orderkey") / 32) % 32).cast("int").as("m_idx"))
        .distinct()
      val fields = Seq((0, 10.0, 12.0), (1, 20.0, 18.0))
      val stacked = fields.map { case (f, cl, cm) =>
        px.withColumn("field", lit(f))
          .withColumn("pb",
            exp((-(col("l_idx") - cl) * (col("l_idx") - cl)
              - (col("m_idx") - cm) * (col("m_idx") - cm)) / lit(80.0)))
          .withColumn("image",
            sin(col("l_idx") * 0.3) + cos(col("m_idx") * 0.5) + lit(f))
      }.reduce(_ unionByName _)
      operators.ImageOps.linearMosaic(stacked, "image", "pb",
          Seq("l_idx", "m_idx"))
        .select(col("l_idx"), col("m_idx"),
          qround(col("mosaic_image"), 8).as("mosaic_image"),
          col("n_fields"))
    },
    """WITH px AS (
      |  SELECT DISTINCT CAST(l_orderkey % 32 AS INT) AS l_idx,
      |    CAST((l_orderkey // 32) % 32 AS INT) AS m_idx
      |  FROM lineitem),
      |f AS (
      |  SELECT l_idx, m_idx, field,
      |    exp((-(l_idx - cl) * (l_idx - cl)
      |         - (m_idx - cm) * (m_idx - cm)) / 8.0e1) AS pb,
      |    sin(l_idx * CAST(0.3 AS DOUBLE))
      |      + cos(m_idx * CAST(0.5 AS DOUBLE)) + field AS image
      |  FROM px CROSS JOIN (VALUES (0, 1.0e1, 1.2e1), (1, 2.0e1, 1.8e1))
      |    c(field, cl, cm))
      |SELECT l_idx, m_idx,
      |  CASE WHEN sum(pb * pb) <> 0.0
      |    THEN floor(sum(pb * image) / sum(pb * pb) * 100000000.0 + 0.5)
      |         / 100000000.0 ELSE 0.0 END AS mosaic_image,
      |  count(*) AS n_fields
      |FROM f GROUP BY 1, 2""".stripMargin)

  /** predict_modelvis_component (the reference stubs it): analytic
    * point-component phasor sum per (u, v) row; the oracle mirrors
    * the left-associated component sum term for term.
    */
  private val predictComponentQ = Q(
    (s, d) => {
      val comps = Seq((2.0, 0.001, -0.002), (1.0, -0.003, 0.0005),
        (0.5, 0.0, 0.0))
      val vis = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") % 1000.0).as("u"),
        (col("l_quantity") * 20.0).as("v"))
      GridOps.predictComponentVis(vis, comps)
        .select(col("l_orderkey"), col("l_linenumber"),
          qround(col("model_re"), 8).as("model_re"),
          qround(col("model_im"), 8).as("model_im"))
    }, {
      val comps = Seq((2.0, 0.001, -0.002), (1.0, -0.003, 0.0005),
        (0.5, 0.0, 0.0))
      def term(f: String, c: (Double, Double, Double)) =
        s"${fmt(c._1)} * $f(${fmt(-2 * math.Pi)} * (u * ${fmt(c._2)} + v * ${fmt(c._3)}))"
      val re = comps.map(term("cos", _)).mkString(" + ")
      val im = comps.map(term("sin", _)).mkString(" + ")
      s"""WITH vis AS (
         |  SELECT l_orderkey, l_linenumber,
         |    l_extendedprice % 1000.0 AS u, l_quantity * 20.0 AS v
         |  FROM lineitem)
         |SELECT l_orderkey, l_linenumber,
         |  floor(($re) * 100000000.0 + 0.5) / 100000000.0 AS model_re,
         |  floor(($im) * 100000000.0 + 0.5) / 100000000.0 AS model_im
         |FROM vis""".stripMargin
    })

  /** make_sd_image (+ the weight plane; the reference stubs all three
    * SD operators): gaussian kernel binning of total-power samples.
    */
  private val makeSdImageQ = Q(
    (s, d) => {
      val samples = Tables.lineitem(s, d).select(
        lit(0).as("img_chan"),
        (col("l_linenumber") % 2).cast("int").as("pol"),
        (col("l_extendedprice") % 28.0 + 2.0).as("px"),
        ((col("l_quantity") * 1.7) % 28.0 + 2.0).as("py"),
        col("l_tax").as("value"),
        (col("l_discount") + 0.5).as("weight"))
      GridOps.makeSdImage(samples, nL = 32, nM = 32, support = 2,
          sigmaPx = 1.5)
        .select(col("img_chan"), col("pol"), col("l_idx"), col("m_idx"),
          qround(col("sd_weight"), 6).as("sd_weight"),
          qround(col("sd_image"), 6).as("sd_image"))
    }, {
      val inv2s2 = 1.0 / (2.0 * 1.5 * 1.5)
      s"""WITH sm AS (
         |  SELECT 0 AS img_chan, CAST(l_linenumber % 2 AS INT) AS pol,
         |    l_extendedprice % 28.0 + 2.0 AS px,
         |    (l_quantity * 1.7) % 28.0 + 2.0 AS py,
         |    l_tax AS value, l_discount + 0.5 AS weight
         |  FROM lineitem),
         |g AS (
         |  SELECT *, CAST(floor(px + 0.5) AS INT) AS pc,
         |    CAST(floor(py + 0.5) AS INT) AS qc
         |  FROM sm
         |  WHERE CAST(floor(px + 0.5) AS INT) - 2 >= 0
         |    AND CAST(floor(px + 0.5) AS INT) + 2 < 32
         |    AND CAST(floor(py + 0.5) AS INT) - 2 >= 0
         |    AND CAST(floor(py + 0.5) AS INT) + 2 < 32),
         |taps AS (
         |  SELECT img_chan, pol, pc + di AS l_idx, qc + dj AS m_idx,
         |    exp(-((pc + di - px) * (pc + di - px)
         |        + (qc + dj - py) * (qc + dj - py)) * ${fmt(inv2s2)}) AS k,
         |    value, weight
         |  FROM g
         |  CROSS JOIN generate_series(-2, 2) tu(di)
         |  CROSS JOIN generate_series(-2, 2) tv(dj)),
         |agg AS (
         |  SELECT img_chan, pol, l_idx, m_idx,
         |    sum(k * weight * value) AS num, sum(k * weight) AS den
         |  FROM taps GROUP BY 1, 2, 3, 4)
         |SELECT img_chan, pol, l_idx, m_idx,
         |  floor(den * 1000000.0 + 0.5) / 1000000.0 AS sd_weight,
         |  CASE WHEN den <> 0.0
         |    THEN floor(num / den * 1000000.0 + 0.5) / 1000000.0
         |    ELSE 0.0 END AS sd_image
         |FROM agg""".stripMargin
    })

  private val makePsfGridQ = Q(
    (s, d) => {
      val (grid, _) = GridOps.makeGrid(s, visFixture(s, d), P, doPsf = true)
      grid.select(col("img_chan"), col("pol"), col("u_idx"), col("v_idx"),
        qround(col("grid_re"), 6).as("grid_re"),
        qround(col("grid_im"), 6).as("grid_im"))
    },
    s"""WITH ${gridCtes(doPsf = true)}
       |SELECT 0 AS img_chan, pol, u_idx, v_idx,
       |  floor(sum(conv * gre) * 1000000.0 + 0.5) / 1000000.0 AS grid_re,
       |  floor(sum(conv * gim) * 1000000.0 + 0.5) / 1000000.0 AS grid_im
       |FROM taps GROUP BY 2, 3, 4""".stripMargin)

  /** make_image: Spark does FFT+crop+normalize; the oracle recomputes
    * each cropped pixel as a direct DFT over the gridded cells:
    *   img[lp,mp] = Re sum G[ju,jv] e^{2 pi i ((ju-16)(lp-16)+(jv-16)(mp-16))/32}
    * then divides by sum_weight and the PSWF correction.
    */
  private val makeImageQ = Q(
    (s, d) => GridOps.makeImage(s, visFixture(s, d), P)
      .select(col("img_chan"), col("pol"), col("l_idx"), col("m_idx"),
        qround(col("image"), 4).as("image")),
    s"""WITH ${gridCtes(doPsf = false)},
       |grid AS (
       |  SELECT pol, u_idx, v_idx,
       |    sum(conv * gre) AS gre, sum(conv * gim) AS gim
       |  FROM taps GROUP BY 1, 2, 3),
       |sw AS (
       |  SELECT pol,
       |    list_sum(list_transform(generate_series(-3, 3), du_ ->
       |      cgk.t[abs(100 * du_ + ufrac) + 1])) *
       |    list_sum(list_transform(generate_series(-3, 3), dv_ ->
       |      cgk.t[abs(100 * dv_ + vfrac) + 1])) * weight AS wn
       |  FROM frac CROSS JOIN cgk),
       |sumw AS (SELECT pol, sum(wn) AS sum_weight FROM sw GROUP BY 1),
       |corr AS (SELECT ${litList(GridOps.correcting1D(32))}::DOUBLE[] AS t),
       |px AS (
       |  SELECT l_out, m_out, l_out + 8 AS lp, m_out + 8 AS mp
       |  FROM generate_series(0, 15) tl(l_out) CROSS JOIN generate_series(0, 15) tm(m_out)),
       |dft AS (
       |  SELECT g.pol, px.l_out, px.m_out, px.lp, px.mp,
       |    sum(g.gre * cos(2 * pi() * ((g.u_idx - 16) * (px.lp - 16) + (g.v_idx - 16) * (px.mp - 16)) / 32.0)
       |      - g.gim * sin(2 * pi() * ((g.u_idx - 16) * (px.lp - 16) + (g.v_idx - 16) * (px.mp - 16)) / 32.0)) AS val
       |  FROM grid g CROSS JOIN px
       |  GROUP BY 1, 2, 3, 4, 5)
       |SELECT 0 AS img_chan, dft.pol, l_out AS l_idx, m_out AS m_idx,
       |  floor((val / (CASE WHEN sumw.sum_weight = 0 THEN 1.0 ELSE sumw.sum_weight END)
       |         / (corr.t[lp + 1] * corr.t[mp + 1])) * 10000.0 + 0.5) / 10000.0 AS image
       |FROM dft JOIN sumw ON dft.pol = sumw.pol CROSS JOIN corr""".stripMargin)

  private val imagingWeightQ = Q(
    (s, d) => GridOps.makeImagingWeight(visFixture(s, d), P, "briggs", robust = 0.5)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("u_cell"), col("v_cell"),
        qround(col("imaging_weight"), 8).as("imaging_weight")),
    // Hermitian mirror per _standard_grid_jit do_imaging_weight:
    // each weight lands on its cell AND the conjugate cell, sum_w is
    // doubled; f2 = (5*10^-r)^2 / (sum W^2 / sum_w).
    s"""WITH fx AS ($visFixtureSql),
       |cells0 AS (
       |  SELECT *,
       |    CAST(floor(u * (freq * ((-0.002 * 32) / 299792458.0)) + 16 + 0.5) AS INT) AS u_cell,
       |    CAST(floor(v * (freq * ((-0.002 * 32) / 299792458.0)) + 16 + 0.5) AS INT) AS v_cell,
       |    CAST(floor((-u) * (freq * ((-0.002 * 32) / 299792458.0)) + 16 + 0.5) AS INT) AS u_conj,
       |    CAST(floor((-v) * (freq * ((-0.002 * 32) / 299792458.0)) + 16 + 0.5) AS INT) AS v_conj
       |  FROM fx),
       |prim AS (
       |  SELECT * FROM cells0
       |  WHERE u_cell >= 0 AND u_cell < 32 AND v_cell >= 0 AND v_cell < 32),
       |contrib AS (
       |  SELECT pol, u_cell, v_cell, weight FROM prim
       |  UNION ALL
       |  SELECT pol, u_conj AS u_cell, v_conj AS v_cell, weight FROM prim
       |  WHERE u_conj >= 0 AND u_conj < 32 AND v_conj >= 0 AND v_conj < 32),
       |cells AS (
       |  SELECT pol, u_cell, v_cell, sum(weight) AS cell_w FROM contrib
       |  GROUP BY 1, 2, 3),
       |sumw AS (SELECT pol, sum(weight) * 2.0 AS sum_w FROM prim GROUP BY 1),
       |fac AS (
       |  SELECT q.pol,
       |    power(5.0 * power(10.0, -0.5), 2) / (q.sq_sum / s.sum_w) AS f2
       |  FROM (SELECT pol, sum(cell_w * cell_w) AS sq_sum FROM cells GROUP BY 1) q
       |  JOIN sumw s ON q.pol = s.pol)
       |SELECT c0.l_orderkey, c0.l_linenumber, c0.u_cell, c0.v_cell,
       |  floor((CASE WHEN c0.u_cell >= 0 AND c0.u_cell < 32
       |                AND c0.v_cell >= 0 AND c0.v_cell < 32
       |                AND c0.weight <> 0.0 AND c.cell_w IS NOT NULL
       |                AND c.cell_w <> 0.0
       |         THEN c0.weight / (fac.f2 * c.cell_w + 1.0)
       |         ELSE c0.weight END) * 100000000.0 + 0.5) / 100000000.0 AS imaging_weight
       |FROM cells0 c0
       |LEFT JOIN cells c ON c0.pol = c.pol AND c0.u_cell = c.u_cell AND c0.v_cell = c.v_cell
       |LEFT JOIN fac ON c0.pol = fac.pol""".stripMargin)

  /** 2-pol fixture: both pols share a (time,baseline,chan) row identity
    * so polAverage (reference n_pol==2, _standard_grid_jit:330-335)
    * grids (w0+w1)/2 for both pol planes.
    */
  private val imagingWeightPolAvgQ = Q(
    (s, d) => {
      // one row per (orderkey, linenumber) — l_linenumber is NOT unique
      // per order in the synthetic data, and the pol-average window
      // needs the row identity to hold exactly the 2 pol legs
      val vis = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(min(col("l_extendedprice")).as("ep"),
          min(col("l_quantity")).as("qt"),
          min(col("l_discount")).as("dc"), min(col("l_tax")).as("tx"))
        .select(col("l_orderkey"), col("l_linenumber"),
          lit(0).as("img_chan"),
          (col("ep") % 60.0 - 30.0).as("u"),
          ((col("qt") * 3.0 + col("l_linenumber")) % 60.0 - 30.0).as("v"),
          (col("dc") + 0.5).as("w0"),
          (col("tx") + 0.2).as("w1"),
          lit(Freq).as("freq"))
        .selectExpr("l_orderkey", "l_linenumber", "img_chan", "u", "v", "freq",
          "stack(2, 0, w0, 1, w1) AS (pol, weight)")
      GridOps.makeImagingWeight(vis, P, "briggs", robust = 0.5,
          polAverage = true, rowKeyCols = Seq("l_orderkey", "l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"), col("pol"),
          col("u_cell"), col("v_cell"),
          qround(col("imaging_weight"), 8).as("imaging_weight"))
    },
    s"""WITH fx0 AS (
       |  SELECT l_orderkey, l_linenumber,
       |    min(l_extendedprice) % 60.0 - 30.0 AS u,
       |    (min(l_quantity) * 3.0 + l_linenumber) % 60.0 - 30.0 AS v,
       |    min(l_discount) + 0.5 AS w0, min(l_tax) + 0.2 AS w1,
       |    1500000000.0 AS freq
       |  FROM lineitem GROUP BY l_orderkey, l_linenumber),
       |fx AS (
       |  SELECT fx0.*, p.pol,
       |    CASE WHEN p.pol = 0 THEN w0 ELSE w1 END AS weight,
       |    (w0 + w1) / 2 AS nat_w
       |  FROM fx0 CROSS JOIN (VALUES (0), (1)) p(pol)),
       |cells0 AS (
       |  SELECT *,
       |    CAST(floor(u * (freq * ((-0.002 * 32) / 299792458.0)) + 16 + 0.5) AS INT) AS u_cell,
       |    CAST(floor(v * (freq * ((-0.002 * 32) / 299792458.0)) + 16 + 0.5) AS INT) AS v_cell,
       |    CAST(floor((-u) * (freq * ((-0.002 * 32) / 299792458.0)) + 16 + 0.5) AS INT) AS u_conj,
       |    CAST(floor((-v) * (freq * ((-0.002 * 32) / 299792458.0)) + 16 + 0.5) AS INT) AS v_conj
       |  FROM fx),
       |prim AS (
       |  SELECT * FROM cells0
       |  WHERE u_cell >= 0 AND u_cell < 32 AND v_cell >= 0 AND v_cell < 32),
       |contrib AS (
       |  SELECT pol, u_cell, v_cell, nat_w FROM prim
       |  UNION ALL
       |  SELECT pol, u_conj AS u_cell, v_conj AS v_cell, nat_w FROM prim
       |  WHERE u_conj >= 0 AND u_conj < 32 AND v_conj >= 0 AND v_conj < 32),
       |cells AS (
       |  SELECT pol, u_cell, v_cell, sum(nat_w) AS cell_w FROM contrib
       |  GROUP BY 1, 2, 3),
       |sumw AS (SELECT pol, sum(nat_w) * 2.0 AS sum_w FROM prim GROUP BY 1),
       |fac AS (
       |  SELECT q.pol,
       |    power(5.0 * power(10.0, -0.5), 2) / (q.sq_sum / s.sum_w) AS f2
       |  FROM (SELECT pol, sum(cell_w * cell_w) AS sq_sum FROM cells GROUP BY 1) q
       |  JOIN sumw s ON q.pol = s.pol)
       |SELECT c0.l_orderkey, c0.l_linenumber, c0.pol, c0.u_cell, c0.v_cell,
       |  floor((CASE WHEN c0.u_cell >= 0 AND c0.u_cell < 32
       |                AND c0.v_cell >= 0 AND c0.v_cell < 32
       |                AND c0.nat_w <> 0.0 AND c.cell_w IS NOT NULL
       |                AND c.cell_w <> 0.0
       |         THEN c0.nat_w / (fac.f2 * c.cell_w + 1.0)
       |         ELSE c0.nat_w END) * 100000000.0 + 0.5) / 100000000.0 AS imaging_weight
       |FROM cells0 c0
       |LEFT JOIN cells c ON c0.pol = c.pol AND c0.u_cell = c.u_cell AND c0.v_cell = c.v_cell
       |LEFT JOIN fac ON c0.pol = fac.pol""".stripMargin)

  private val calcCellSizeQ = Q(
    (s, d) => {
      val vis = Tables.lineitem(s, d).select(
        (col("l_extendedprice") % 60.0).as("u"),
        (col("l_quantity") * 2.0).as("v"),
        (lit(1.4e9) + (col("l_suppkey") % 100) * 1e6).as("freq"))
      GridOps.calcImageCellSize(vis, "u", "v", "freq",
          minDishDiameter = 25.0, pixelsPerBeam = 7.0)
        .select(qround(col("cell_l"), 8).as("cell_l"),
          qround(col("cell_m"), 8).as("cell_m"),
          col("imsize_l"), col("imsize_m"))
    }, {
      val radToArc = 3600.0 * 180.0 / math.Pi
      s"""WITH v AS (
         |  SELECT l_extendedprice % 60.0 AS u, l_quantity * 2.0 AS v,
         |    1400000000.0 + (l_suppkey % 100) * 1000000.0 AS freq
         |  FROM lineitem),
         |a AS (
         |  SELECT max(u) AS max_u, max(v) AS max_v,
         |    min(freq) AS f_min, max(freq) AS f_max
         |  FROM v),
         |c0 AS (
         |  SELECT *,
         |    ${fmt(radToArc)} * (299792458.0 / (max_u * f_max)) / 7.0 AS cell_u,
         |    ${fmt(radToArc)} * (299792458.0 / (max_v * f_max)) / 7.0 AS cell_v,
         |    ${fmt(radToArc)} * (${fmt(1.02 * 299792458.0)} / (25.0 * f_min)) AS fwhm
         |  FROM a),
         |c1 AS (
         |  SELECT *,
         |    CASE WHEN cell_u / cell_v < CAST(1.2 AS DOUBLE)
         |           AND cell_v / cell_u < CAST(1.2 AS DOUBLE)
         |         THEN least(cell_u, cell_v) ELSE cell_u END AS cell_l,
         |    CASE WHEN cell_u / cell_v < CAST(1.2 AS DOUBLE)
         |           AND cell_v / cell_u < CAST(1.2 AS DOUBLE)
         |         THEN least(cell_u, cell_v) ELSE cell_v END AS cell_m
         |  FROM c0)
         |SELECT
         |  floor(cell_l * 100000000.0 + 0.5) / 100000000.0 AS cell_l,
         |  floor(cell_m * 100000000.0 + 0.5) / 100000000.0 AS cell_m,
         |  CAST(ceil(pow(2.0, ceil(log2(greatest(fwhm / cell_l, 1.0) / 10.0))) * 10.0 / 1.2) AS BIGINT) AS imsize_l,
         |  CAST(ceil(pow(2.0, ceil(log2(greatest(fwhm / cell_m, 1.0) / 10.0))) * 10.0 / 1.2) AS BIGINT) AS imsize_m
         |FROM c1""".stripMargin
    })

  val all: Map[String, Q] = Map(
    "calc_image_cell_size" -> calcCellSizeQ,
    "make_grid" -> makeGridQ,
    "degrid_vis" -> degridVisQ,
    "degrid_vis_join" -> degridVisJoinQ,
    "linear_mosaic" -> linearMosaicQ,
    "make_sd_image" -> makeSdImageQ,
    "predict_component" -> predictComponentQ,
    "make_grid_cube" -> makeGridCubeQ,
    "grid_sum_weight" -> gridSumWeightQ,
    "make_psf_grid" -> makePsfGridQ,
    "make_image" -> makeImageQ,
    "imaging_weight_briggs" -> imagingWeightQ,
    "imaging_weight_polavg" -> imagingWeightPolAvgQ)
}
