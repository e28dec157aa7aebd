package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over event streams — the funnel /
  * path-progression family every event-analytics engine ships next to
  * sessionization (the batch twin of StreamingOps.sessionizeStream's
  * domain).
  */
object SequenceOps {

  /** First-touch funnel: per key, the earliest strictly-ordered chain
    * through `steps` — t1 = first step-0 event, t(i) = first step-i
    * event strictly after t(i-1). `depth` counts completed steps; a
    * missing step nulls every later one (the conditional min of a null
    * comparison stays null), so depth is always a prefix length.
    *
    * Plan shape: one filtered aggregate for step 0, then per further
    * step one key-equi join + conditional-min re-aggregate — every
    * stage hash-partitioned by the key, partial-agg combined, with the
    * `event_type` filters pushed to the scan. Per-key state never
    * exceeds the chain timestamps; shuffle volume is the type-filtered
    * event counts, not the full stream. At 100 TB: identical shape,
    * AQE handles the hot-key tail (a celebrity user's events all hash
    * to one partition but only their own rows).
    */
  def funnelSteps(events: DataFrame, keyCol: String, typeCol: String,
                  timeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelSteps needs at least one step")
    var acc = events.where(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(timeCol)).as("t1"))
    var i = 2
    for (step <- steps.tail) {
      val prev = s"t${i - 1}"
      val e = events.where(col(typeCol) === step)
        .select(col(keyCol), col(timeCol).as("_t"))
      acc = acc.join(e, Seq(keyCol), "left")
        .withColumn("_tv", when(col("_t") > col(prev), col("_t")))
        .groupBy((col(keyCol) +: (1 until i).map(j => col(s"t$j"))): _*)
        .agg(min(col("_tv")).as(s"t$i"))
      i += 1
    }
    val depth = (2 to steps.size).foldLeft(lit(1)) { (d, j) =>
      d + when(col(s"t$j").isNotNull, 1).otherwise(0)
    }
    acc.withColumn("depth", depth)
  }

  /** Top session paths — the "user journey" readout next to funnels:
    * sessionize by inactivity gap (gaps-and-islands on integer
    * timestamps), concatenate each session's event types in exact
    * (time, tiebreak) order, rank the resulting path strings by
    * frequency. The ordered concat rides array_sort over collected
    * (time, tie, type) structs — deterministic total order, no
    * window-ordered collect_list — and the per-session collect is
    * bounded by session length (human-scale), never the key's full
    * history. Top-k is one TakeOrdered.
    */
  def sessionPaths(events: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, typeCol: String, gapNs: Long,
                   k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val sessioned = events
      .withColumn("_new",
        when(lag(col(tsCol), 1).over(w).isNull ||
          col(tsCol) - lag(col(tsCol), 1).over(w) > gapNs, 1L)
          .otherwise(0L))
      .withColumn("_sess", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessioned.groupBy(col(keyCol), col("_sess"))
      .agg(array_join(expr(
          s"transform(array_sort(collect_list(struct($tsCol, $tieCol, " +
            s"$typeCol))), x -> x.$typeCol)"), ">").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** Cohort retention: bucket every key by its first-activity period
    * (integer division of the long timestamp by `periodNs`), then count
    * distinct keys active at each offset from their cohort — the
    * retention-triangle table behind every cohort chart.
    *
    * Plan shape: distinct (key, period) — shuffle bounded by distinct
    * activity pairs, not events — one min-aggregate for the cohort, a
    * key-equi join back, and the final count-distinct (which Spark
    * expands to a two-phase exact aggregate). All integer arithmetic:
    * hash-exact against any engine.
    */
  def retentionCohorts(events: DataFrame, keyCol: String, timeCol: String,
                       periodNs: Long): DataFrame = {
    val periods = events
      .select(col(keyCol), expr(s"$timeCol div ${periodNs}L").as("period"))
      .distinct()
    val cohorts = periods.groupBy(col(keyCol))
      .agg(min(col("period")).as("cohort"))
    periods.join(cohorts, Seq(keyCol))
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("offset"))
      .agg(countDistinct(col(keyCol)).as("n_active"))
  }
}
