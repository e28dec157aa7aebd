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
