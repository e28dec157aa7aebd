package graft

import org.apache.spark.sql.functions.col
import graft.operators.SequenceOps

class SequenceOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("user_id", "event_type", "ts_ns")

  test("funnelSteps: earliest strictly-ordered chain, prefix depth") {
    val events = ev(
      // user 1: full chain, with an earlier purchase that must NOT count
      (1L, "purchase", 5L), (1L, "view", 10L), (1L, "click", 20L),
      (1L, "purchase", 30L), (1L, "click", 15L),
      // user 2: view then purchase but no click -> depth 1, t3 null
      (2L, "view", 10L), (2L, "purchase", 40L),
      // user 3: click before any view -> not in the funnel at all
      (3L, "click", 10L),
      // user 4: click exactly AT the view time is not strictly after
      (4L, "view", 10L), (4L, "click", 10L))
    val out = SequenceOps.funnelSteps(events, "user_id", "event_type",
        "ts_ns", Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getAs[Int]("depth")))).toMap
    assert(out(1L) === ((Some(10L), Some(15L), Some(30L), 3)))
    // purchase at 40 does NOT count for user 2: the click step is
    // missing, so the chain stops at depth 1
    assert(out(2L) === ((Some(10L), None, None, 1)))
    assert(out(4L) === ((Some(10L), None, None, 1)))
    assert(!out.contains(3L))
  }

  test("sessionPaths: gap splits sessions, order is (time, tie), counts rank") {
    val events = ev(
      // user 1, session A: view(10) -> click(12); session B after gap:
      // view(100) -> click(101)
      (1L, "view", 10L), (1L, "click", 12L),
      (1L, "view", 100L), (1L, "click", 101L),
      // user 2, one session with the same path shape
      (2L, "view", 5L), (2L, "click", 6L),
      // user 3: single event
      (3L, "error", 7L))
    val out = operators.SequenceOps.sessionPaths(
        events.withColumn("event_id", col("ts_ns")), // unique tie
        "user_id", "ts_ns", "event_id", "event_type",
        gapNs = 50L, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("view>click" -> 3L, "error" -> 1L))
  }

  test("retentionCohorts: cohort by first period, distinct actives per offset") {
    val events = Seq(
      (1L, 0L), (1L, 5L),          // user 1: cohort 0, active p0 (twice)
      (1L, 25L),                   // ... and p2
      (2L, 12L), (2L, 22L),        // user 2: cohort 1, active p1 + p2
      (3L, 21L)).toDF("user_id", "ts_ns") // user 3: cohort 2 only
    val out = operators.SequenceOps.retentionCohorts(events, "user_id",
        "ts_ns", periodNs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map((0L, 0L) -> 1L, (0L, 2L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L, (2L, 0L) -> 1L))
  }
}
