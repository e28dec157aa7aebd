package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Flagging operators (SURVEY.md §2.2, §2.4).
  *
  * The reference mutates a boolean FLAG data variable; every operator
  * here is a pure projection `DataFrame => DataFrame` — Catalyst folds
  * consecutive flag edits into one whole-stage-codegen'd projection, so
  * chains of flag commands cost a single scan.
  */
object FlagOps {

  /** apply_flags (cngi/vis/apply_flags.py:21,49-53): null out every data
    * column wherever the flag column is set. Nulls then vanish from all
    * downstream aggregates — Spark null semantics replace the
    * reference's NaN convention (SURVEY.md §2.9).
    */
  def applyFlags(df: DataFrame, flag: Column, dataCols: Seq[String]): DataFrame =
    dataCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(!coalesce(flag, lit(false)), col(c)))
    }

  /** auto_clip (ngcasa/flagging/auto_clip.py:22,45-48):
    * FLAG |= magnitude < clipMin || magnitude > clipMax.
    */
  def autoClip(df: DataFrame, flagCol: String, magnitude: Column,
               clipMin: Double, clipMax: Double): DataFrame =
    df.withColumn(flagCol,
      coalesce(col(flagCol), lit(false)) ||
        magnitude < clipMin || magnitude > clipMax)

  /** Selection command DSL — the moral equivalent of the reference's
    * flag-command dicts (ngcasa/flagging/_flagging_utils/
    * _parse_sel_cmd.py:20-58): a conjunction of closed ranges and
    * membership lists over named columns; antenna selections expand to
    * both baseline legs (`_antenna_to_baseline.py`).
    */
  final case class SelCmd(
      ranges: Map[String, (Any, Any)] = Map.empty,
      isin: Map[String, Seq[Any]] = Map.empty,
      antenna: Option[(String, String, Seq[Any])] = None // (ant1Col, ant2Col, ids)
  ) {
    def toPredicate: Column = {
      val rs = ranges.toSeq.map { case (c, (lo, hi)) => col(c).between(lo, hi) }
      val ms = isin.toSeq.map { case (c, vs) => col(c).isin(vs: _*) }
      val as = antenna.toSeq.map { case (a1, a2, ids) =>
        col(a1).isin(ids: _*) || col(a2).isin(ids: _*)
      }
      (rs ++ ms ++ as).reduceOption(_ && _).getOrElse(lit(true))
    }
  }

  /** manual_flag (ngcasa/flagging/manual_flag.py:26,71-88):
    * FLAG |= OR of the command predicates.
    */
  def manualFlag(df: DataFrame, flagCol: String, cmds: Seq[SelCmd]): DataFrame = {
    val sel = cmds.map(_.toPredicate).reduceOption(_ || _).getOrElse(lit(false))
    df.withColumn(flagCol, coalesce(col(flagCol), lit(false)) || sel)
  }

  /** manual_unflag (ngcasa/flagging/manual_unflag.py:24-70): clear FLAG on
    * the selection; an empty command list clears everything (:54-55).
    */
  def manualUnflag(df: DataFrame, flagCol: String, cmds: Seq[SelCmd]): DataFrame = {
    val sel = cmds.map(_.toPredicate).reduceOption(_ || _).getOrElse(lit(true))
    df.withColumn(flagCol, coalesce(col(flagCol), lit(false)) && !sel)
  }

  /** manager_add / manager_remove (ngcasa/flagging/manager_add.py:24-60):
    * named flag-version columns initialized from a source column.
    */
  def managerAdd(df: DataFrame, name: String, source: String): DataFrame =
    df.withColumn(name, col(source))

  def managerRemove(df: DataFrame, name: String): DataFrame = df.drop(name)

  def managerList(df: DataFrame, prefix: String = "flag"): Seq[String] =
    df.columns.filter(_.toLowerCase.startsWith(prefix)).toSeq

  /** summary (ngcasa/flagging/summary.py:22-150 +
    * _flagging_utils/_summary_utils.py): flagged/total counts broken down
    * by several independent keys. The reference runs one groupby per key
    * (6 scans); we do it in a single pass with GROUPING SETS — each key
    * becomes one grouping set, plus the grand-total set (SURVEY.md §2.4).
    */
  def summary(df: DataFrame, flag: Column, keys: Seq[String]): DataFrame = {
    val sets = Seq(Seq.empty[Column]) ++ keys.map(k => Seq(col(k)))
    df.groupingSets(sets, keys.map(col): _*)
      .agg(
        sum(when(coalesce(flag, lit(false)), 1L).otherwise(0L)).as("flagged"),
        count(lit(1)).as("total"))
  }

  /** quack (beyond-parity — ngcasa/flagging/quack.py is a
    * NotImplementedError stub whose docstring specifies "flag the
    * beginning and/or end of scans for slewing delays"): FLAG |= row
    * within `widthNs` of its scan's first (mode "beg"), last ("end"),
    * or either ("both") timestamp. One window min/max over the scan
    * key — a single shuffle, no self-join.
    */
  def quack(df: DataFrame, flagCol: String, scanCols: Seq[String],
            tsNanosCol: String, widthNs: Long,
            mode: String = "beg"): DataFrame = {
    require(Seq("beg", "end", "both").contains(mode), s"bad mode $mode")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(scanCols.map(col): _*)
    val beg = col(tsNanosCol) < min(col(tsNanosCol)).over(w) + widthNs
    val end = col(tsNanosCol) > max(col(tsNanosCol)).over(w) - widthNs
    val hit = mode match {
      case "beg" => beg; case "end" => end; case _ => beg || end
    }
    df.withColumn(flagCol, coalesce(col(flagCol), lit(false)) || hit)
  }

  /** extend (beyond-parity — ngcasa/flagging/extend.py is a stub):
    * grow flags along the channel axis — FLAG |= more than
    * `threshold` of the 2k+1 channels centered on this one (same
    * group) are already flagged. The classic "bridge narrow RFI
    * gaps" pass as one ROWS-frame window over chan order, no
    * self-join.
    */
  def extendFlags(df: DataFrame, flagCol: String, keyCols: Seq[String],
                  chanCol: String, k: Int, threshold: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(chanCol)).rowsBetween(-k, k)
    val frac = sum(when(coalesce(col(flagCol), lit(false)), 1.0)
      .otherwise(0.0)).over(w) / count(lit(1)).over(w)
    df.withColumn(flagCol,
      coalesce(col(flagCol), lit(false)) || frac > threshold)
  }

  /** shadow (beyond-parity — ngcasa/flagging/shadow.py:53 is a stub):
    * FLAG |= the projected baseline separation sqrt(u^2 + v^2) is
    * shorter than the dish diameter — one antenna of the pair sits in
    * the other's aperture shadow as seen from the source (the standard
    * CASA flagdata mode='shadow' criterion). Pure row-wise predicate,
    * whole-stage codegen, no shuffle.
    */
  def shadow(df: DataFrame, flagCol: String, u: Column, v: Column,
             dishDiameter: Double): DataFrame =
    df.withColumn(flagCol,
      coalesce(col(flagCol), lit(false)) ||
        u * u + v * v < dishDiameter * dishDiameter)

  /** elevation (beyond-parity — ngcasa/flagging/elevation.py:40 is a
    * stub): FLAG |= source elevation below `limitRad` at the row's
    * hour angle. sin(el) = sin(lat)sin(dec) + cos(lat)cos(dec)cos(HA);
    * the comparison runs on sin(el) against the precomputed
    * sin(limit), avoiding an asin per row. Row-wise trig, no shuffle.
    */
  def elevationFlag(df: DataFrame, flagCol: String, haRad: Column,
                    latRad: Double, decRad: Double,
                    limitRad: Double): DataFrame = {
    val sinEl = lit(math.sin(latRad) * math.sin(decRad)) +
      lit(math.cos(latRad) * math.cos(decRad)) * cos(haRad)
    df.withColumn(flagCol,
      coalesce(col(flagCol), lit(false)) || sinEl < math.sin(limitRad))
  }

  /** auto_uvbin (beyond-parity — ngcasa/flagging/auto_uvbin.py is a
    * stub: "detects outliers on the gridded spatial frequency plane"):
    * bin rows by radial uv distance, compute each bin's amplitude mean
    * and population stddev, and flag rows whose amplitude exceeds the
    * bin's mean + nSigma*std threshold. The threshold is quantized
    * (1e-6) so the outlier decision compares identical doubles in any
    * engine. One aggregate over the bin key + one broadcast join back
    * — the bin table is radial and tiny.
    */
  def autoUvBin(df: DataFrame, flagCol: String, u: Column, v: Column,
                amp: Column, binWidth: Double,
                nSigma: Double = 3.0): DataFrame = {
    val withBin = df.withColumn("uvbin",
        floor(sqrt(u * u + v * v) / binWidth).cast("long"))
      .withColumn("_amp", amp)
    val stats = withBin.groupBy("uvbin")
      .agg(avg(col("_amp")).as("_mean"),
        // population stddev via the moment form, matching SQL exactly
        sqrt(greatest(lit(0.0), avg(col("_amp") * col("_amp")) -
          avg(col("_amp")) * avg(col("_amp")))).as("_std"))
      .withColumn("_thr",
        floor((col("_mean") + lit(nSigma) * col("_std")) * 1e6 + 0.5) / 1e6)
    withBin.join(broadcast(stats.select("uvbin", "_thr")), Seq("uvbin"))
      .withColumn(flagCol,
        coalesce(col(flagCol), lit(false)) || col("_amp") > col("_thr"))
      .drop("_amp", "_thr")
  }

  /** auto_rflag (ngcasa/flagging/auto_rflag.py — a NotImplementedError
    * stub in the reference; its docstring specifies "outliers via
    * hierarchical MAD statistics applied to the visibility data"):
    * the CASA rflag criterion in two levels —
    *
    *   level 1 (local): per (baseline-key, chan) robust center and
    *     spread: med = median(amp), sigma = 1.4826 * median(|amp-med|);
    *   level 2 (hierarchical): per chan, the median of the level-1
    *     sigmas across baselines — a noisy baseline cannot inflate its
    *     own threshold past the population's.
    *
    *   FLAG |= |amp - med| > nSigma * max(sigma, medSigma_chan).
    *
    * Shape: ONE hash aggregate over the (key, chan) group computes
    * BOTH robust statistics — med and sigma come out of the same
    * sorted group buffer, so the facts shuffle once and join back
    * once (AQE broadcasts the dimension-sized stats table). Spark's
    * own `percentile` buffers every group value too, so per-group
    * memory is identical to the two-aggregate form this replaces —
    * at half the fact scans (2 vs 3) and half the shuffles. Groups
    * are time-series sized, never the whole frame. The median kernel
    * interpolates exactly like `percentile`/`median` (value ranks at
    * p*(n-1)), and the threshold is quantized (1e-6) so the flag
    * decision compares identical doubles in any engine.
    */
  def autoRflag(df: DataFrame, flagCol: String, keyCols: Seq[String],
                chanCol: String, amp: Column,
                nSigma: Double = 5.0): DataFrame = {
    val gk = keyCols :+ chanCol
    val withAmp = df.withColumn("_amp", amp)
    val medSig = udf((vs: Seq[Double]) => {
      // same interpolation as percentile: lower + (upper-lower)*frac
      def q50(a: Array[Double]): Double = {
        val r = 0.5 * (a.length - 1)
        val lo = math.floor(r).toInt; val hi = math.ceil(r).toInt
        a(lo) + (a(hi) - a(lo)) * (r - lo)
      }
      // collect_list drops nulls, so an all-null group arrives as an
      // EMPTY list: return null (None) exactly like the percentile
      // aggregate this kernel replaced, so downstream null-propagation
      // degrades the flag gracefully instead of q50 indexing a(-1).
      if (vs.isEmpty) None
      else {
        val a = vs.toArray.sorted
        val m = q50(a)
        Some((m, q50(a.map(x => math.abs(x - m)).sorted) * 1.4826))
      }
    })
    // level-2 chan median rides a WINDOW over the (dimension-sized)
    // stats table rather than a second aggregate — a separate agg
    // would make the table feed two consumers and re-execute its
    // whole subtree (one extra fact scan + one redundant median agg).
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(chanCol))
    val stats = withAmp.groupBy(gk.map(col): _*)
      .agg(collect_list(col("_amp")).as("_vs"))
      .withColumn("_ms", medSig(col("_vs")))
      .select((gk.map(col) :+ col("_ms._1").as("_med") :+
        col("_ms._2").as("_sigma")): _*)
      .withColumn("_chan_sigma", expr("percentile(_sigma, 0.5)").over(w))
    withAmp.join(stats, gk)
      .withColumn("_thr", floor(lit(nSigma) *
        greatest(col("_sigma"), col("_chan_sigma")) * 1e6 + 0.5) / 1e6)
      .withColumn(flagCol,
        coalesce(col(flagCol), lit(false)) ||
          abs(col("_amp") - col("_med")) > col("_thr"))
      .drop("_amp", "_med", "_sigma", "_chan_sigma", "_thr")
  }

  /** auto_tfcrop (ngcasa/flagging/auto_tfcrop.py — stub; docstring:
    * "outliers based on the assumption that the time-frequency plane
    * ... for a sky signal is smooth in comparison to RFI"): fit a
    * quadratic over the channel axis per (time-key) group — the smooth
    * bandpass — and flag samples deviating from the fit by more than
    * nSigma times the group's residual spread.
    *
    * The fit is the same normal-equations shape as uv_cont_fit
    * (RegressionOps): ONE hash aggregate collects the power sums
    * (Σx^k, Σx^k y), Cramer's rule solves the 3x3 system in closed-form
    * column expressions, and a join back scores each sample — two
    * passes over the facts, no iteration, no driver-side data.
    */
  def autoTfcrop(df: DataFrame, flagCol: String, keyCols: Seq[String],
                 chanCol: String, amp: Column,
                 nSigma: Double = 4.0): DataFrame = {
    val x = col(chanCol).cast("double")
    val y0 = amp
    val base = df.withColumn("_x", x).withColumn("_y", y0)
    val sums = base.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("double").as("s0"),
        sum(col("_x")).as("s1"),
        sum(col("_x") * col("_x")).as("s2"),
        sum(col("_x") * col("_x") * col("_x")).as("s3"),
        sum(col("_x") * col("_x") * col("_x") * col("_x")).as("s4"),
        sum(col("_y")).as("sy"),
        sum(col("_x") * col("_y")).as("sxy"),
        sum(col("_x") * col("_x") * col("_y")).as("sx2y"))
    // Cramer's rule for [s0 s1 s2; s1 s2 s3; s2 s3 s4] [a b c]' = [sy sxy sx2y]'
    def det3(a: Column, b: Column, c: Column, d: Column, e: Column, f: Column,
             g: Column, h: Column, i: Column): Column =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val dd = det3(col("s0"), col("s1"), col("s2"),
      col("s1"), col("s2"), col("s3"), col("s2"), col("s3"), col("s4"))
    val da = det3(col("sy"), col("s1"), col("s2"),
      col("sxy"), col("s2"), col("s3"), col("sx2y"), col("s3"), col("s4"))
    val db = det3(col("s0"), col("sy"), col("s2"),
      col("s1"), col("sxy"), col("s3"), col("s2"), col("sx2y"), col("s4"))
    val dc = det3(col("s0"), col("s1"), col("sy"),
      col("s1"), col("s2"), col("sxy"), col("s2"), col("s3"), col("sx2y"))
    val coefs = sums
      // a degenerate group (single sample / collinear channel axis)
      // has dd = 0 — under ANSI a plain `/` kills the job; null coefs
      // make the fit (and the flag decision) null -> not flagged
      .withColumn("_ca", try_divide(da, dd))
      .withColumn("_cb", try_divide(db, dd))
      .withColumn("_cc", try_divide(dc, dd))
      .select((keyCols.map(col) :+ col("_ca") :+ col("_cb") :+ col("_cc")): _*)
    val scored = base.join(coefs, keyCols)
      .withColumn("_fit",
        col("_ca") + col("_cb") * col("_x") + col("_cc") * col("_x") * col("_x"))
      .withColumn("_resid", col("_y") - col("_fit"))
    val spread = scored.groupBy(keyCols.map(col): _*)
      .agg(sqrt(greatest(lit(0.0),
        avg(col("_resid") * col("_resid")) -
          avg(col("_resid")) * avg(col("_resid")))).as("_rsig"))
    // Both sides of the outlier comparison are quantized (1e-4): the
    // power sums are engine-order-sensitive in their last ulps, and a
    // boolean output leaves no downstream rounding to absorb that.
    scored.join(spread, keyCols)
      .withColumn("_thr", floor(lit(nSigma) * col("_rsig") * 1e4 + 0.5) / 1e4)
      .withColumn("_rq", floor(abs(col("_resid")) * 1e4 + 0.5) / 1e4)
      .withColumn(flagCol,
        coalesce(col(flagCol), lit(false)) || col("_rq") > col("_thr"))
      .drop("_x", "_y", "_ca", "_cb", "_cc", "_fit", "_resid", "_rsig",
        "_thr", "_rq")
  }

  /** Per-antenna flag counts, reference-faithful: every baseline row is
    * counted under BOTH its antennas (ngcasa/flagging/summary.py:
    * antenna breakdown counts ant1 and ant2 legs) — an explode over
    * the two legs followed by one hash aggregate.
    */
  def summaryPerAntenna(df: DataFrame, flag: Column,
                        ant1: String, ant2: String): DataFrame =
    df.select(explode(array(col(ant1), col(ant2))).as("antenna"),
        coalesce(flag, lit(false)).as("_f"))
      .groupBy("antenna")
      .agg(sum(when(col("_f"), 1L).otherwise(0L)).as("flagged"),
        count(lit(1)).as("total"))
}
