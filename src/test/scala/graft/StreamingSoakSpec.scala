package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Composed streaming soak (round-10 verdict stretch directive): the
  * per-operator MemoryStream specs prove batch-equality one stateful
  * operator at a time; this suite runs FIVE concurrent streaming
  * queries — exact dedup, a windowed weighted average, watermarked
  * windowed distinct users, a CUSUM drift monitor, and the algebraic
  * agg-state carrier — all fed from ONE MemoryStream source, across
  * four micro-batches whose event times advance far past the
  * watermark each step. What the per-op specs can't see and this one
  * does: state stores of different shapes coexisting in one session,
  * several queries draining the same source at their own offsets,
  * append-mode watermark emission interleaved with complete-mode
  * snapshots, and each operator still matching its batch twin on the
  * full input afterwards.
  */
class StreamingSoakSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("five concurrent stateful queries over one stream survive four watermark advances and match batch") {
    implicit val sqlCtx = spark.sqlContext
    // (ts, user_id, event_id, doc_id, text, value)
    val input = MemoryStream[(java.sql.Timestamp, Long, Long, Long, String, Long)]
    val df = input.toDF()
      .toDF("ts", "user_id", "event_id", "doc_id", "text", "value")

    val dedup = StreamingOps.streamingExactDedup(spark,
      df.select("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("soak_dedup")
      .outputMode("append").start()
    val winAvg = StreamingOps.windowedAverage(
      df.select(col("ts"), col("user_id"),
        col("value").cast("double").as("v"), lit(1.0).as("w")),
      "ts", "30 seconds", Seq("user_id"), "v", "w")
      .writeStream.format("memory").queryName("soak_winavg")
      .outputMode("complete").start()
    val users = StreamingOps.windowedDistinctUsers(df, "ts", "30 seconds",
      "user_id", watermark = Some("10 seconds"))
      .writeStream.format("memory").queryName("soak_users")
      .outputMode("append").start()
    val cusum = StreamingOps.cusumStream(spark,
      df.select(col("user_id"), col("event_id").as("ts_ns"),
        col("event_id").as("tie"), col("value")),
      "user_id", "ts_ns", "tie", "value",
      refUp = 12L, refDown = 8L, threshold = 20L)
      .writeStream.format("memory").queryName("soak_cusum")
      .outputMode("append").start()
    val aggState = StreamingOps.aggStateStream(spark,
      df.select("user_id", "value"), "user_id", "value")
      .writeStream.format("memory").queryName("soak_agg")
      .outputMode("append").start()
    val all = Seq(dedup, winAvg, users, cusum, aggState)

    // four micro-batches, event time advancing ~1 minute per batch so
    // the 10 s watermark passes every earlier 30 s window each step
    val batches = Seq(
      Seq((t("2024-01-01 00:00:01"), 1L, 1L, 10L, "alpha beta", 10L),
        (t("2024-01-01 00:00:05"), 2L, 2L, 11L, "gamma delta", 30L),
        (t("2024-01-01 00:00:21"), 1L, 3L, 12L, "alpha beta", 12L)),
      Seq((t("2024-01-01 00:01:02"), 1L, 4L, 13L, "epsilon", 9L),
        (t("2024-01-01 00:01:07"), 2L, 5L, 14L, "gamma delta", 50L),
        (t("2024-01-01 00:01:09"), 3L, 6L, 15L, "zeta", 7L)),
      Seq((t("2024-01-01 00:02:03"), 2L, 7L, 16L, "alpha beta", 2L),
        (t("2024-01-01 00:02:08"), 1L, 8L, 17L, "eta theta", 40L)),
      Seq((t("2024-01-01 00:03:30"), 3L, 9L, 18L, "zeta", 6L),
        (t("2024-01-01 00:03:31"), 2L, 10L, 19L, "iota", 5L)))
    for (b <- batches) {
      input.addData(b: _*)
      all.foreach(_.processAllAvailable())
    }
    all.foreach(_.stop())

    val full = batches.flatten
      .toDF("ts", "user_id", "event_id", "doc_id", "text", "value")

    // 1. dedup: first-arrival min id per distinct text
    val gotDedup = spark.table("soak_dedup").collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(gotDedup === Seq(10L, 11L, 13L, 15L, 17L, 19L))

    // 2. windowed average (complete mode): equals the batch operator
    val gotAvg = spark.table("soak_winavg").collect()
      .map(r => (r.getAs[org.apache.spark.sql.Row]("time_bin")
        .getAs[java.sql.Timestamp]("start"), r.getAs[Long]("user_id")) ->
        r.getAs[Double]("v")).toMap
    val batchAvg = StreamingOps.windowedAverage(
        full.select(col("ts"), col("user_id"),
          col("value").cast("double").as("v"), lit(1.0).as("w")),
        "ts", "30 seconds", Seq("user_id"), "v", "w")
      .collect()
      .map(r => (r.getAs[org.apache.spark.sql.Row]("time_bin")
        .getAs[java.sql.Timestamp]("start"), r.getAs[Long]("user_id")) ->
        r.getAs[Double]("v")).toMap
    assert(gotAvg === batchAvg)

    // 3. watermarked distinct users: every window whose end precedes
    // the final watermark has been EMITTED (append mode) and matches
    // the batch count; the last batch's windows may still be open
    val gotUsers = spark.table("soak_users").collect()
      .map(r => r.getAs[org.apache.spark.sql.Row]("time_bin")
        .getAs[java.sql.Timestamp]("start") -> r.getAs[Long]("n_users"))
      .toMap
    val batchUsers = StreamingOps.windowedDistinctUsers(full, "ts",
        "30 seconds", "user_id")
      .collect()
      .map(r => r.getAs[org.apache.spark.sql.Row]("time_bin")
        .getAs[java.sql.Timestamp]("start") -> r.getAs[Long]("n_users"))
      .toMap
    val lastOpen = t("2024-01-01 00:03:30")
    assert(gotUsers === batchUsers.filter(_._1.before(lastOpen)),
      "all watermark-closed windows emitted exactly once, open ones held")

    // 4. CUSUM: the LAST snapshot per key equals the batch fold
    val gotCusum = spark.table("soak_cusum").collect()
      .map(r => (r.getAs[Long]("user_id"),
        (r.getAs[Long]("n"), r.getAs[Long]("max_pos"),
          r.getAs[Long]("max_neg"))))
      .groupBy(_._1).map { case (k, snaps) =>
        k -> snaps.map(_._2).maxBy(_._1) } // snapshot with largest n
    val batchCusum = StreamingOps.cusumStream(spark,
        full.select(col("user_id"), col("event_id").as("ts_ns"),
          col("event_id").as("tie"), col("value")),
        "user_id", "ts_ns", "tie", "value", 12L, 8L, 20L)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("max_pos"),
          r.getAs[Long]("max_neg")))).toMap
    assert(gotCusum === batchCusum)

    // 5. agg state: last snapshot per key equals the batch monoid
    val gotAgg = spark.table("soak_agg").collect()
      .map(r => (r.getString(0),
        (r.getAs[Long]("n"), r.getAs[Long]("sum_v"),
          r.getAs[Long]("min_v"), r.getAs[Long]("max_v"))))
      .groupBy(_._1).map { case (k, snaps) =>
        k -> snaps.map(_._2).maxBy(_._1) }
    val batchAgg = StreamingOps.aggStateStream(spark,
        full.select("user_id", "value"), "user_id", "value")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("sum_v"),
          r.getAs[Long]("min_v"), r.getAs[Long]("max_v")))).toMap
    assert(gotAgg === batchAgg)
  }
}
