package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("windowedAverage over a MemoryStream matches the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Int, Double, Double)]
    val df = input.toDF().toDF("ts", "key", "v", "w")

    val agg = StreamingOps.windowedAverage(df, "ts", "10 seconds",
      Seq("key"), "v", "w", watermark = Some("1 minute"))
    val q = agg.writeStream.format("memory").queryName("win_avg")
      .outputMode("complete").start()

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(
      (t("2024-01-01 00:00:01"), 0, 1.0, 1.0),
      (t("2024-01-01 00:00:05"), 0, 3.0, 1.0),
      (t("2024-01-01 00:00:12"), 0, 5.0, 2.0))
    q.processAllAvailable()
    val rows = spark.table("win_avg").orderBy($"time_bin.start").collect()
    q.stop()
    assert(rows.length === 2)
    assert(approx(rows(0).getAs[Double]("v"), 2.0)) // (1+3)/2
    assert(approx(rows(1).getAs[Double]("v"), 5.0))
    assert(rows(1).getAs[Double]("w") === 2.0)

    // batch equivalence: same operator on a static frame
    val batch = Seq(
      (t("2024-01-01 00:00:01"), 0, 1.0, 1.0),
      (t("2024-01-01 00:00:05"), 0, 3.0, 1.0),
      (t("2024-01-01 00:00:12"), 0, 5.0, 2.0)).toDF("ts", "key", "v", "w")
    val b = StreamingOps.windowedAverage(batch, "ts", "10 seconds",
      Seq("key"), "v", "w").orderBy($"time_bin.start").collect()
    assert(b.map(_.getAs[Double]("v")).toSeq ===
      rows.map(_.getAs[Double]("v")).toSeq)
  }

  test("streamingExactDedup suppresses duplicates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    val out = StreamingOps.streamingExactDedup(spark, df, "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("stream_dedup_t")
      .outputMode("append").start()
    input.addData((0L, "alpha beta"), (1L, "gamma"), (2L, "alpha beta"))
    q.processAllAvailable()
    // batch 2: one repeat of an already-seen text + one new text
    input.addData((3L, "alpha beta"), (4L, "delta"))
    q.processAllAvailable()
    val rows = spark.table("stream_dedup_t").collect()
      .map(r => r.getAs[Long]("doc_id")).sorted.toSeq
    q.stop()
    // "alpha beta" emitted once with min id of its FIRST batch (0);
    // id 3 from batch 2 is suppressed by state
    assert(rows === Seq(0L, 1L, 4L))

    // batch mode: same operator = one row per distinct text, min id
    val batch = Seq((0L, "x y"), (5L, "x y"), (9L, "z")).toDF("doc_id", "text")
    val b = StreamingOps.streamingExactDedup(spark, batch, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(b === Seq(0L, 9L))
  }

  test("scd2ApplyStream: key-disjoint micro-batches equal one-shot" +
      " batch apply; overlapping keys version each step") {
    implicit val sqlCtx = spark.sqlContext
    def dim(rows: Seq[(Long, String, Long, Long, Any, Boolean)]) =
      rows.map { case (k, s, b, f, t, c) =>
        (k, s, b, f, t.asInstanceOf[java.lang.Long] match {
          case null => Option.empty[Long]
          case v => Some(v.longValue())
        }, c)
      }.toDF("k", "seg", "bal", "valid_from", "valid_to", "is_current")
    val cur = dim(Seq((1L, "A", 10L, 0L, null, true),
      (2L, "B", 20L, 0L, null, true), (3L, "C", 30L, 0L, null, true)))
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getBoolean(5))).sorted.toSeq

    // --- key-disjoint batches: row-identical to one concatenated apply
    val st = StreamingOps.scd2ApplyStream(
      cur, Seq("k"), Seq("seg", "bal"), "ts")
    val input = MemoryStream[(Long, String, Long, Long)]
    val q = input.toDF().toDF("k", "seg", "bal", "ts")
      .writeStream.foreachBatch(st.sink).start()
    input.addData((1L, "A", 11L, 100L), (4L, "D", 40L, 100L))
    q.processAllAvailable()
    // batch 2: an EQUAL-VALUED change for k=2 (kept, no close) and a
    // real change for k=3
    input.addData((2L, "B", 20L, 200L), (3L, "Z", 30L, 200L))
    q.processAllAvailable()
    q.stop()
    val oneShot = graft.sources.IoOps.scd2Apply(cur,
      Seq((1L, "A", 11L, 100L), (4L, "D", 40L, 100L),
        (2L, "B", 20L, 200L), (3L, "Z", 30L, 200L))
        .toDF("k", "seg", "bal", "ts"),
      Seq("k"), Seq("seg", "bal"), "ts")
    assert(rowsOf(st.snapshot) === rowsOf(oneShot))

    // --- overlapping key across batches: the CDC trail keeps the
    // intermediate version (one per batch), and the CURRENT view
    // still equals the collapsed one-shot apply
    val st2 = StreamingOps.scd2ApplyStream(
      cur, Seq("k"), Seq("seg", "bal"), "ts")
    st2(Seq((1L, "A", 11L, 100L)).toDF("k", "seg", "bal", "ts"))
    st2(Seq((1L, "A", 12L, 300L)).toDF("k", "seg", "bal", "ts"))
    val trail = rowsOf(st2.snapshot)
    assert(trail.count(_._1 == 1L) === 3) // v0 closed, v1 closed, v2 open
    assert(trail.contains((1L, "A", 11L, 100L, 300L, false)))
    val oneShot2 = graft.sources.IoOps.scd2Apply(cur,
      Seq((1L, "A", 11L, 100L), (1L, "A", 12L, 300L))
        .toDF("k", "seg", "bal", "ts"),
      Seq("k"), Seq("seg", "bal"), "ts")
    assert(rowsOf(st2.snapshot.where(col("is_current"))) ===
      rowsOf(oneShot2.where(col("is_current"))))
  }

  test("mergeUpsertStream: key-disjoint micro-batches equal one-shot" +
      " MERGE; same-key changes across batches apply sequentially") {
    implicit val sqlCtx = spark.sqlContext
    val target = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "tag", "v")
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq

    // --- key-disjoint batches through a real MemoryStream
    val st = StreamingOps.mergeUpsertStream(target, Seq("k"),
      deleteCol = Some("_del"))
    val input = MemoryStream[(Long, String, Long, Boolean)]
    val q = input.toDF().toDF("k", "tag", "v", "_del")
      .writeStream.foreachBatch(st.sink).start()
    input.addData((1L, "a2", 11L, false), (4L, "d", 40L, false))
    q.processAllAvailable()
    input.addData((2L, "b", 20L, true)) // delete k=2
    q.processAllAvailable()
    q.stop()
    val oneShot = graft.sources.IoOps.mergeUpsert(target,
      Seq((1L, "a2", 11L, false), (4L, "d", 40L, false),
        (2L, "b", 20L, true)).toDF("k", "tag", "v", "_del"),
      Seq("k"), deleteCol = Some("_del"))
    assert(rowsOf(st.snapshot) === rowsOf(oneShot))
    assert(rowsOf(st.snapshot) ===
      Seq((1L, "a2", 11L), (3L, "c", 30L), (4L, "d", 40L)))

    // --- same key across batches: later batch replaces the earlier
    // (CDC ordering); a delete then an insert resurrects the key
    val st2 = StreamingOps.mergeUpsertStream(target, Seq("k"),
      deleteCol = Some("_del"))
    st2(Seq((1L, "x", 100L, false)).toDF("k", "tag", "v", "_del"))
    st2(Seq((1L, "y", 200L, false)).toDF("k", "tag", "v", "_del"))
    assert(rowsOf(st2.snapshot).filter(_._1 == 1L) ===
      Seq((1L, "y", 200L)))
    val st3 = StreamingOps.mergeUpsertStream(target, Seq("k"),
      deleteCol = Some("_del"))
    st3(Seq((3L, "c", 30L, true)).toDF("k", "tag", "v", "_del"))
    assert(rowsOf(st3.snapshot).count(_._1 == 3L) === 0)
    st3(Seq((3L, "c3", 33L, false)).toDF("k", "tag", "v", "_del"))
    assert(rowsOf(st3.snapshot).filter(_._1 == 3L) ===
      Seq((3L, "c3", 33L)))
  }

  test("bloomIndexStream: union of micro-batches equals the one-scan" +
      " index for any order; re-ingest is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_bst")
      .toString + "/store"
    val src = (1L to 300L).map(i => (i, i % 9)).toDF("id", "m")
    src.repartitionByRange(6, col("id")).write.parquet(dir)
    val rows = spark.read.parquet(dir)
      .select(col("id"), col("_metadata.file_path").as("_file"))
    val want = graft.sources.IoOps
      .bloomIndex(spark, dir, "id", bits = 4096, hashes = 3)

    // two batches via MemoryStream, split by file hash
    val st = StreamingOps.bloomIndexStream("id", "_file", 4096, 3)
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "_file")
      .writeStream.foreachBatch(st.sink).start()
    val all = rows.collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = all.partition(_._2.hashCode % 2 == 0)
    input.addData(b1.toSeq: _*)
    q.processAllAvailable()
    input.addData(b2.toSeq: _*)
    q.processAllAvailable()
    q.stop()
    assert(st.snapshot.exceptAll(want).count() === 0)
    assert(want.exceptAll(st.snapshot).count() === 0)

    // reversed order AND a duplicate re-ingest of batch 1: same index
    val st2 = StreamingOps.bloomIndexStream("id", "_file", 4096, 3)
    st2(b2.toSeq.toDF("id", "_file"))
    st2(b1.toSeq.toDF("id", "_file"))
    st2(b1.toSeq.toDF("id", "_file"))
    assert(st2.snapshot.exceptAll(want).count() === 0)
    assert(want.exceptAll(st2.snapshot).count() === 0)
  }

  test("manifestStream: row-sliced micro-batches equal the one-scan" +
      " manifest build; snapshot serves the planned read") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_mst")
      .toString + "/store"
    val src = (1L to 400L).map(i => (i, i % 7)).toDF("id", "m")
    src.repartitionByRange(4, col("id")).write.parquet(dir)
    graft.sources.IoOps.commitManifest(spark, dir, dir + "_man", 1,
      keyCol = "id", statsCols = Seq("id", "m"), bits = 4096)
    // set-ops reject MapType columns: compare with the zone maps
    // flattened to sorted entry arrays
    def flat(df: org.apache.spark.sql.DataFrame) =
      df.select(col("_file"), col("n_rows"),
        sort_array(map_entries(col("zmin"))).as("zmin"),
        sort_array(map_entries(col("zmax"))).as("zmax"),
        col("bloom"), col("bits"), col("hashes"))
    val want = flat(
      graft.sources.IoOps.readManifest(spark, dir + "_man", 1))
    val rows = spark.read.parquet(dir)
      .select(col("id"), col("m"), col("_metadata.file_path").as("_file"))

    // two batches sliced BY ROW (not by file) through a MemoryStream
    val st = StreamingOps.manifestStream("id", Seq("id", "m"),
      bits = 4096)
    val input = MemoryStream[(Long, Long, String)]
    val q = input.toDF().toDF("id", "m", "_file")
      .writeStream.foreachBatch(st.sink).start()
    val all = rows.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2)))
    val (b1, b2) = all.partition(_._1 % 2 == 0)
    input.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    input.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    assert(flat(st.snapshot).exceptAll(want).count() === 0)
    assert(want.exceptAll(flat(st.snapshot)).count() === 0)

    // reversed slicing order: same manifest (commutative merges)
    val st2 = StreamingOps.manifestStream("id", Seq("id", "m"),
      bits = 4096)
    st2(b2.toIndexedSeq.toDF("id", "m", "_file"))
    st2(b1.toIndexedSeq.toDF("id", "m", "_file"))
    assert(flat(st2.snapshot).exceptAll(want).count() === 0)

    // the streamed snapshot plans the same pruned read
    val got = graft.sources.IoOps.manifestReadWith(spark, dir,
      st.snapshot, dvV = 0, dvRoot = None, keyCol = "id",
      keys = Seq(17L, 300L), ranges = Nil)
    val direct = src.where(col("id").isin(17L, 300L))
    assert(got.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(got).count() === 0)
  }

  test("accrualStream: late events flip conversion and pull the look" +
      " earlier; final state batch-equal under any slicing") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val df = input.toDF().toDF("u", "f", "d")
    val st = StreamingOps.accrualStream(spark, df, "u", "f", "d")
    val q = st.writeStream.format("memory").queryName("accrual")
      .outputMode("append").start()
    input.addData((1L, 1L, 5L), (1L, 0L, 7L), (2L, 1L, 3L))
    q.processAllAvailable()
    // late batch: user 1 gains a success AND an earlier look
    input.addData((1L, 1L, 2L))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("accrual")
      .groupBy("u").agg(max(struct(col("n_success"),
        col("first_look"))).as("s"))
      .select(col("u"), col("s.n_success"), col("s.first_look"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(last(1L) === ((2L, 2L)))
    assert(last(2L) === ((1L, 3L)))
    // batch-frame run over the same rows yields identical state
    import spark.implicits._
    val batch = StreamingOps.accrualStream(spark,
      Seq((1L, 1L, 5L), (1L, 0L, 7L), (2L, 1L, 3L), (1L, 1L, 2L))
        .toDF("u", "f", "d"), "u", "f", "d")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(batch === last)
  }

  test("streamingBandCollisions remembers band buckets across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    val out = StreamingOps.streamingBandCollisions(spark, df, "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("snd_t")
      .outputMode("append").start()
    val textA = "the quick brown fox jumps over the lazy dog again"
    val textB = "completely different words with no shared shingles here at all"
    // batch 1: A and an identical copy of A (collides on every band),
    // plus unrelated B
    input.addData((0L, textA), (1L, textA), (10L, textB))
    q.processAllAvailable()
    // batch 2: another copy of A — must collide via STATE, not batch
    // contents; and a fresh unrelated doc
    input.addData((2L, textA),
      (11L, "yet more unrelated text that shares nothing with the others"))
    q.processAllAvailable()
    val verdict = StreamingOps
      .nearDupDecisions(spark.table("snd_t")
        .select(col("id").as("doc_id")), "doc_id", spark.table("snd_t"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    q.stop()
    assert(verdict(0L) === false) // first occupant of its buckets
    assert(verdict(1L) === true)  // same batch, larger id
    assert(verdict(2L) === true)  // later batch, collides via state
    assert(verdict(10L) === false)
    assert(verdict(11L) === false)

    // batch mode = pure min-id rule, including the no-shingle edge
    val batch = Seq((5L, textA), (3L, textA), (7L, textB), (8L, "ab"))
      .toDF("doc_id", "text")
    val b = StreamingOps.nearDupDecisions(batch, "doc_id",
      StreamingOps.streamingBandCollisions(spark, batch, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(b === Map(3L -> false, 5L -> true, 7L -> false, 8L -> false))
  }

  test("intervalJoin buffers across micro-batches and bounds the window") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val views = MemoryStream[(java.sql.Timestamp, Int, Long)]
    val clicks = MemoryStream[(java.sql.Timestamp, Int, Long)]
    val out = StreamingOps.intervalJoin(
      views.toDF().toDF("view_ts", "key", "view_id"),
      clicks.toDF().toDF("click_ts", "key", "click_id"),
      Seq("key"), "view_ts", "click_ts",
      expr("interval 0 seconds"), expr("interval 10 seconds"),
      leftWatermark = Some("1 minute"), rightWatermark = Some("1 minute"))
    val q = out.writeStream.format("memory").queryName("ij_t")
      .outputMode("append").start()
    // batch 1: views only — nothing joinable yet
    views.addData((t("2024-01-01 00:00:01"), 0, 100L),
      (t("2024-01-01 00:00:30"), 1, 101L))
    q.processAllAvailable()
    assert(spark.table("ij_t").count() === 0)
    // batch 2: a click 4 s after view 100 (in window, buffered left
    // side joins NOW) and one 29 s after view 101 (outside window)
    clicks.addData((t("2024-01-01 00:00:05"), 0, 200L),
      (t("2024-01-01 00:00:59"), 1, 201L))
    q.processAllAvailable()
    val got = spark.table("ij_t").collect()
      .map(r => (r.getAs[Long]("view_id"), r.getAs[Long]("click_id"))).toSeq
    q.stop()
    assert(got === Seq((100L, 200L)))

    // batch equivalence: same operator on static frames
    val bv = Seq((t("2024-01-01 00:00:01"), 0, 100L),
      (t("2024-01-01 00:00:30"), 1, 101L)).toDF("view_ts", "key", "view_id")
    val bc = Seq((t("2024-01-01 00:00:05"), 0, 200L),
      (t("2024-01-01 00:00:59"), 1, 201L)).toDF("click_ts", "key", "click_id")
    val b = StreamingOps.intervalJoin(bv, bc, Seq("key"),
        "view_ts", "click_ts",
        expr("interval 0 seconds"), expr("interval 10 seconds"))
      .collect().map(r => (r.getAs[Long]("view_id"),
        r.getAs[Long]("click_id"))).toSeq
    assert(b === got)
  }

  test("runningFlagCounts counts flags per window under streaming") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Boolean)]
    val df = input.toDF().toDF("ts", "kind", "flag")
    val agg = StreamingOps.runningFlagCounts(df, "ts", "1 minute",
      col("flag"), Seq("kind"))
    val q = agg.writeStream.format("memory").queryName("flag_counts")
      .outputMode("complete").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(
      (t("2024-01-01 00:00:01"), "a", true),
      (t("2024-01-01 00:00:02"), "a", false),
      (t("2024-01-01 00:00:03"), "b", true))
    q.processAllAvailable()
    val rows = spark.table("flag_counts").collect()
    q.stop()
    val a = rows.find(_.getAs[String]("kind") == "a").get
    assert(a.getAs[Long]("flagged") === 1L && a.getAs[Long]("total") === 2L)
  }

  test("sessionize splits on gap, merges within; ties never split") {
    import spark.implicits._
    val ns = 1000L * 1000 * 1000
    val ev = Seq(
      (1L, 0L * ns, 1.0), (1L, 10L * ns, 2.0),   // session 1
      (1L, 100L * ns, 4.0), (1L, 100L * ns, 8.0), // session 2 (tie inside)
      (2L, 5L * ns, 1.5))                          // other user
      .toDF("user_id", "ts", "value")
    val out = StreamingOps.sessionize(ev, "user_id", "ts",
        gapNs = 30L * ns, "value")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq")) -> r)
      .toMap
    assert(out.size === 3)
    assert(out((1L, 1L)).getAs[Long]("n_events") === 2)
    assert(out((1L, 2L)).getAs[Long]("n_events") === 2)
    assert(out((1L, 2L)).getAs[Double]("value_sum") === 12.0)
    assert(out((1L, 2L)).getAs[Long]("session_start_ns") === 100L * ns)
    assert(out((2L, 1L)).getAs[Long]("n_events") === 1)
  }

  test("sessionizeStream merges gap windows across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val df = input.toDF().toDF("ts", "user_id", "value")
    val agg = StreamingOps.sessionizeStream(df, "ts", "30 seconds",
      Seq("user_id"), "value", watermark = Some("10 minutes"))
    val q = agg.writeStream.format("memory").queryName("sess_t")
      .outputMode("complete").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData((t("2024-01-01 00:00:01"), 1L, 1.0))
    q.processAllAvailable()
    // second batch extends the same session (gap < 30s) and opens a new one
    input.addData((t("2024-01-01 00:00:20"), 1L, 2.0),
      (t("2024-01-01 00:05:00"), 1L, 4.0))
    q.processAllAvailable()
    val rows = spark.table("sess_t").orderBy($"session.start").collect()
    q.stop()
    assert(rows.length === 2)
    assert(rows(0).getAs[Long]("n_events") === 2) // merged across batches
    assert(rows(0).getAs[Double]("value_sum") === 3.0)
    assert(rows(1).getAs[Double]("value_sum") === 4.0)
  }

  test("append-mode window emits ONLY after the watermark passes window end") {
    // the watermark semantics the complete-mode tests can't see: in
    // append mode a window row is withheld until the event-time
    // watermark (max event time - delay) passes its end, then emitted
    // exactly once and its state evicted
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Int, Double, Double)]
    val df = input.toDF().toDF("ts", "key", "v", "w")
    val agg = StreamingOps.windowedAverage(df, "ts", "10 seconds",
      Seq("key"), "v", "w", watermark = Some("5 seconds"))
    val q = agg.writeStream.format("memory").queryName("win_append")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData((t("2024-01-01 00:00:01"), 0, 2.0, 1.0))
    q.processAllAvailable()
    // watermark = 00:00:01 - 5s, window [0,10) not yet closed -> nothing
    assert(spark.table("win_append").count() === 0)
    // advance event time past 00:00:15: watermark -> 00:00:10+, closes [0,10)
    input.addData((t("2024-01-01 00:00:21"), 0, 7.0, 1.0))
    q.processAllAvailable()
    val rows = spark.table("win_append").collect()
    q.stop()
    assert(rows.length === 1)
    assert(rows(0).getAs[Double]("v") === 2.0)
    // a LATE row for the closed window is dropped by the evicted state
    // (asserted implicitly: the emitted row was final at emission)
  }

  test("funnelStream extends chains across micro-batches and matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    val input = MemoryStream[(Long, String, Long)]
    val df = input.toDF().toDF("user_id", "event_type", "ts_ns")
    val out = StreamingOps.funnelStream(spark, df, "user_id",
      "event_type", "ts_ns", steps)
    val q = out.writeStream.format("memory").queryName("funnel_t")
      .outputMode("append").start()
    // batch 1: user 1 views (an early purchase must not chain)
    input.addData((1L, "purchase", 5L), (1L, "view", 10L), (2L, "click", 3L))
    q.processAllAvailable()
    // batch 2: user 1 clicks then purchases; user 2 still never views
    input.addData((1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "purchase", 9L))
    q.processAllAvailable()
    val rows = spark.table("funnel_t").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getSeq[Long](1), r.getInt(2)))
    q.stop()
    // one snapshot per batch the chain grew: (10) then (10,20,30)
    assert(rows.toSet === Set((1L, Seq(10L), 1),
      (1L, Seq(10L, 20L, 30L), 3)))

    // batch form equals SequenceOps.funnelSteps on the same events
    val events = Seq((1L, "purchase", 5L), (1L, "view", 10L),
      (2L, "click", 3L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "purchase", 9L), (3L, "view", 7L), (3L, "click", 7L))
      .toDF("user_id", "event_type", "ts_ns")
    val stream = StreamingOps.funnelStream(spark, events, "user_id",
        "event_type", "ts_ns", steps)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getSeq[Long](1), r.getInt(2)))).toMap
    val batch = operators.SequenceOps.funnelSteps(events, "user_id",
        "event_type", "ts_ns", steps)
      .collect().map { r =>
        val chain = Seq(1, 2, 3).map(i => Option(r.get(i)))
          .takeWhile(_.isDefined).map(_.get.asInstanceOf[Long])
        r.getAs[Long]("user_id") -> ((chain, r.getAs[Int]("depth")))
      }.toMap
    assert(stream === batch)
  }

  test("anomalyStream carries the ring buffer across micro-batches and matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Long)]
    val df = input.toDF().toDF("user_id", "ts_ns", "event_id",
      "value_scaled")
    val out = StreamingOps.anomalyStream(spark, df, "user_id", "ts_ns",
      "event_id", "value_scaled", lookback = 3, minN = 2, threshold = 1.5)
    val q = out.writeStream.format("memory").queryName("anom_t")
      .outputMode("append").start()
    input.addData((1L, 1L, 1L, 10L), (1L, 2L, 2L, 12L))
    q.processAllAvailable()
    input.addData((1L, 3L, 3L, 10L), (1L, 4L, 4L, 12L), (1L, 5L, 5L, 100L))
    q.processAllAvailable()
    val rows = spark.table("anom_t").collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("n_prev"), Option(r.get(r.fieldIndex("z")))
            .map(_.asInstanceOf[Double]), r.getAs[Int]("is_anomaly"))))
      .toMap
    q.stop()
    // row 3 arrived in batch 2 but is scored against state carried from
    // batch 1 ([10, 12]): n=2, z = -1/sqrt(2), below threshold
    assert(rows(3L)._1 === 2L)
    assert(math.abs(rows(3L)._2.get - (-1.0 / math.sqrt(2.0))) < 1e-12)
    assert(rows(3L)._3 === 0)
    // the spike at row 5 flags; rows 1-2 had too little history
    assert(rows(5L)._3 === 1 && rows(1L)._2.isEmpty && rows(2L)._2.isEmpty)

    // batch form is bit-identical to the window operator
    val events = Seq((1L, 1L, 1L, 10.0), (1L, 2L, 2L, 12.0),
      (1L, 3L, 3L, 10.0), (1L, 4L, 4L, 12.0), (1L, 5L, 5L, 100.0),
      (2L, 1L, 6L, 7.0), (2L, 2L, 7L, 7.0))
      .toDF("user_id", "ts_ns", "event_id", "value")
    val viaStream = StreamingOps.anomalyStream(spark,
        events.withColumn("value_scaled",
          org.apache.spark.sql.functions.round(col("value")).cast("long")),
        "user_id", "ts_ns", "event_id", "value_scaled",
        lookback = 3, minN = 2, threshold = 1.5)
      .select("user_id", "ts_ns", "event_id", "value_scaled", "n_prev",
        "z", "is_anomaly")
      .collect().map(_.toSeq).toSet
    val viaBatch = operators.SequenceOps.anomalyZscore(events, "user_id",
        "ts_ns", "event_id", "value", scale = 1L, lookback = 3, minN = 2,
        threshold = 1.5)
      .select("user_id", "ts_ns", "event_id", "value_scaled", "n_prev",
        "z", "is_anomaly")
      .collect().map(_.toSeq).toSet
    assert(viaStream === viaBatch)
  }

  test("scd2Stream closes intervals across micro-batches, snapshots the open row") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val df = input.toDF().toDF("user_id", "ts_ns", "event_id", "event_type")
    val out = StreamingOps.scd2Stream(spark, df, "user_id", "ts_ns",
      "event_id", "event_type")
    val q = out.writeStream.format("memory").queryName("scd2_t")
      .outputMode("append").start()
    input.addData((1L, 1L, 1L, "A"), (1L, 2L, 2L, "A"))
    q.processAllAvailable()
    input.addData((1L, 5L, 3L, "B"), (1L, 6L, 4L, "B"))
    q.processAllAvailable()
    // batch with no state change for the key: nothing emitted
    input.addData((1L, 7L, 5L, "B"))
    q.processAllAvailable()
    val rows = spark.table("scd2_t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]))).toSeq
    q.stop()
    // batch 1: open snapshot A@[1,); batch 2: A closed at 5 + open B@[5,)
    assert(rows.toSet === Set(
      (1L, "A", 1, 1L, None),
      (1L, "A", 1, 1L, Some(5L)),
      (1L, "B", 2, 5L, None)))
    assert(rows.size === 3) // the no-change batch added nothing

    // batch form equals SequenceOps.scd2History on the same events
    val events = Seq((1L, 1L, 1L, "A"), (1L, 2L, 2L, "A"),
      (1L, 3L, 3L, "B"), (1L, 5L, 4L, "A"), (2L, 9L, 5L, "X"))
      .toDF("user_id", "ts_ns", "event_id", "event_type")
    val viaStream = StreamingOps.scd2Stream(spark, events, "user_id",
        "ts_ns", "event_id", "event_type")
      .collect().map(_.toSeq).toSet
    val viaBatch = operators.SequenceOps.scd2History(events, "user_id",
        "ts_ns", "event_id", "event_type")
      .collect().map(_.toSeq).toSet
    assert(viaStream === viaBatch)
  }

  test("attributionStream scores conversions against carried touch state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val df = input.toDF().toDF("user_id", "ts_ns", "event_id", "event_type")
    val out = StreamingOps.attributionStream(spark, df, "user_id", "ts_ns",
      "event_id", "event_type", "view", "purchase")
    val q = out.writeStream.format("memory").queryName("attr_t")
      .outputMode("append").start()
    input.addData((1L, 10L, 1L, "view"), (2L, 5L, 2L, "purchase"))
    q.processAllAvailable()
    // purchase in batch 2 attributes to the view carried from batch 1
    input.addData((1L, 20L, 3L, "purchase"))
    q.processAllAvailable()
    val rows = spark.table("attr_t").collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    q.stop()
    assert(rows(2L) === ((None, None)))
    assert(rows(3L) === ((Some(10L), Some(10L))))

    // batch form equals the window operator
    val events = Seq((1L, 10L, 1L, "view"), (1L, 20L, 2L, "purchase"),
      (1L, 30L, 3L, "view"), (1L, 40L, 4L, "purchase"),
      (2L, 5L, 5L, "purchase"), (3L, 7L, 6L, "view"), (3L, 7L, 7L, "purchase"))
      .toDF("user_id", "ts_ns", "event_id", "event_type")
    val viaStream = StreamingOps.attributionStream(spark, events, "user_id",
        "ts_ns", "event_id", "event_type", "view", "purchase")
      .collect().map(_.toSeq).toSet
    val viaBatch = operators.SequenceOps.lastTouchAttribution(events,
        "user_id", "ts_ns", "event_id", "event_type", "view", "purchase")
      .collect().map(_.toSeq).toSet
    assert(viaStream === viaBatch)
  }

  test("windowedDistinctUsers dedups within windows across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val df = input.toDF().toDF("ts", "user_id")
    val out = StreamingOps.windowedDistinctUsers(df, "ts", "10 minutes",
      "user_id", watermark = Some("1 hour"))
    val q = out.writeStream.format("memory").queryName("wdu_t")
      .outputMode("complete").start()
    def t(min: Int) = new java.sql.Timestamp(min * 60000L)
    input.addData((t(1), 1L), (t(2), 1L), (t(3), 2L)) // window 0: users {1,2}
    q.processAllAvailable()
    input.addData((t(4), 1L), (t(11), 1L))            // dup + window 1: {1}
    q.processAllAvailable()
    val rows = spark.table("wdu_t").collect()
      .map(r => r.getStruct(0).getTimestamp(0).getTime / 60000 ->
        r.getAs[Long]("n_users")).toMap
    q.stop()
    assert(rows === Map(0L -> 2L, 10L -> 1L))
  }

  test("linfitStream accumulates exact sums across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val df = input.toDF().toDF("user_id", "ts_ns", "value_scaled")
    val out = StreamingOps.linfitStream(spark, df, "user_id", "ts_ns",
      "value_scaled")
    val q = out.writeStream.format("memory").queryName("linfit_t")
      .outputMode("append").start()
    def ns(sec: Long) = sec * 1000000000L
    input.addData((1L, ns(0), 10L), (1L, ns(10), 20L))
    q.processAllAvailable()
    input.addData((1L, ns(20), 30L), (2L, ns(5), 7L))
    q.processAllAvailable()
    val rows = spark.table("linfit_t").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    q.stop()
    // batch 1 snapshot: points (0,10),(10,20) -> slope 1, intercept 10
    assert(rows((1L, 2L)) === ((1.0, 10.0)))
    // batch 2 extends the same state: (0,10),(10,20),(20,30)
    assert(rows((1L, 3L)) === ((1.0, 10.0)))
    // a single-instant user never emits (denominator 0)
    assert(!rows.keySet.exists(_._1 == 2L))
  }

  test("firstSeenPeriods suppresses repeat periods across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val df = input.toDF().toDF("user_id", "ts_ns")
    val out = StreamingOps.firstSeenPeriods(spark, df, "user_id",
      "ts_ns", periodNs = 10L)
    val q = out.writeStream.format("memory").queryName("fsp_t")
      .outputMode("append").start()
    input.addData((1L, 5L), (1L, 7L), (2L, 25L)) // user1 p0 (twice), user2 p2
    q.processAllAvailable()
    input.addData((1L, 8L), (1L, 15L), (2L, 21L)) // p0 repeat, p1 new, p2 repeat
    q.processAllAvailable()
    val rows = spark.table("fsp_t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    q.stop()
    assert(rows === Seq((1L, 0L, 0L), (1L, 0L, 1L), (2L, 2L, 2L)))
  }

  test("funnelStream rejects non-integral key/time columns loudly") {
    val bad = Seq(("u1", "view", 10L)).toDF("user_id", "event_type", "ts_ns")
    val e = intercept[IllegalArgumentException] {
      StreamingOps.funnelStream(spark, bad, "user_id", "event_type",
        "ts_ns", Seq("view"))
    }
    assert(e.getMessage.contains("integral"))
  }

  test("enrich joins a stream against a static dimension statelessly") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "base")).toDF("k", "tier")
    val input = MemoryStream[(Long, Long)]
    val facts = input.toDF().toDF("id", "k")
    val out = StreamingOps.enrich(facts, dim, Seq("k"), Seq("tier"))
    val q = out.writeStream.format("memory").queryName("enrich_t")
      .outputMode("append").start()
    input.addData((10L, 1L), (11L, 3L))
    q.processAllAvailable()
    input.addData((12L, 2L))
    q.processAllAvailable()
    val rows = spark.table("enrich_t").orderBy("id").collect()
    q.stop()
    assert(rows.map(r => (r.getAs[Long]("id"), r.getAs[String]("tier")))
      .toSeq === Seq((10L, "gold"), (11L, null), (12L, "base")))
  }

  test("rollingMedianStream carries the ring buffer across micro-batches and matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Double)]
    val df = input.toDF().toDF("user_id", "ts_ns", "event_id", "value")
    val out = StreamingOps.rollingMedianStream(spark, df, "user_id",
      "ts_ns", "event_id", "value", lookback = 3)
    val q = out.writeStream.format("memory").queryName("rmed_t")
      .outputMode("append").start()
    input.addData((1L, 1L, 1L, 5.0), (1L, 2L, 2L, 1.0))
    q.processAllAvailable()
    input.addData((1L, 3L, 3L, 100.0)) // spike against carried [5, 1]
    q.processAllAvailable()
    val rows = spark.table("rmed_t").collect()
      .map(r => r.getAs[Long]("ts_ns") -> r.getAs[Double]("rolling_median"))
      .toMap
    q.stop()
    assert(rows(1L) === 5.0)
    assert(rows(2L) === 1.0) // lower median of [1, 5]
    assert(rows(3L) === 5.0) // median of [1, 5, 100] rejects the spike
    val events = Seq((1L, 1L, 1L, 5.0), (1L, 2L, 2L, 1.0),
      (1L, 3L, 3L, 100.0), (2L, 1L, 4L, 7.0))
      .toDF("user_id", "ts_ns", "event_id", "value")
    val viaStream = StreamingOps.rollingMedianStream(spark, events,
        "user_id", "ts_ns", "event_id", "value", lookback = 3)
      .collect().map(_.toSeq).toSet
    val viaBatch = operators.SequenceOps.rollingMedian(events, "user_id",
        "ts_ns", "event_id", "value", lookback = 3)
      .select("user_id", "ts_ns", "event_id", "rolling_median")
      .collect().map(_.toSeq).toSet
    assert(viaStream === viaBatch)
  }

  test("ewmaStream carries the ring buffer across micro-batches and matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Double)]
    val df = input.toDF().toDF("user_id", "ts_ns", "event_id", "value")
    val out = StreamingOps.ewmaStream(spark, df, "user_id", "ts_ns",
      "event_id", "value", alpha = 0.5, lookback = 8)
    val q = out.writeStream.format("memory").queryName("ewma_t")
      .outputMode("append").start()
    input.addData((1L, 1L, 1L, 4.0), (1L, 2L, 2L, 8.0))
    q.processAllAvailable()
    input.addData((1L, 3L, 3L, 16.0))
    q.processAllAvailable()
    val rows = spark.table("ewma_t").collect()
      .map(r => r.getAs[Long]("ts_ns") -> r.getAs[Double]("ewma")).toMap
    q.stop()
    // row 3 arrived alone in batch 2, smoothed against carried [4, 8]:
    // (0.25*4 + 0.5*8 + 16) / 1.75 = 12 — and every value is
    // bit-identical to the batch window operator
    assert(rows(1L) === 4.0)
    assert(math.abs(rows(2L) - 10.0 / 1.5) < 1e-12)
    assert(rows(3L) === 12.0)
    val events = Seq((1L, 1L, 1L, 4.0), (1L, 2L, 2L, 8.0),
      (1L, 3L, 3L, 16.0), (2L, 1L, 4L, 5.0), (2L, 2L, 5L, 7.0))
      .toDF("user_id", "ts_ns", "event_id", "value")
    val viaStream = StreamingOps.ewmaStream(spark, events, "user_id",
        "ts_ns", "event_id", "value", alpha = 0.5, lookback = 8)
      .collect().map(_.toSeq).toSet
    val viaBatch = operators.SequenceOps.ewmaSmooth(events, "user_id",
        "ts_ns", "event_id", "value", alpha = 0.5, lookback = 8)
      .select("user_id", "ts_ns", "event_id", "ewma")
      .collect().map(_.toSeq).toSet
    assert(viaStream === viaBatch)
  }

  test("hllStream: register state across batches equals batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val df = input.toDF().toDF("g", "id")
    val out = StreamingOps.hllStream(spark, df, "g", "id")
    val q = out.writeStream.format("memory").queryName("hll_t")
      .outputMode("update").start()
    input.addData((1L to 30L).map(i => (0L, i)): _*)
    q.processAllAvailable()
    // second batch replays half the ids (idempotent) and adds new ones
    input.addData((16L to 60L).map(i => (0L, i)): _*)
    q.processAllAvailable()
    q.stop()
    val last = spark.table("hll_t").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).last
    // batch operator over the union of both batches
    import spark.implicits._
    val batch = operators.SketchOps.hllDistinct(
      (1L to 60L).toDF("id").withColumn("g", lit(0L)), "id", Seq("g"))
      .head()
    assert(last._1 === batch.getAs[Long]("zero_regs"))
    assert(last._2 === batch.getAs[Double]("hll_est")) // bit-exact
  }

  test("burstStream: histogram state across batches equals batch " +
      "burstDetect") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Long)]
    val df = input.toDF().toDF("g", "win")
    val out = StreamingOps.burstStream(spark, df, "g", "win")
    val q = out.writeStream.format("memory").queryName("burst_t")
      .outputMode("update").start()
    // windows 0..7 at 1 event each, then window 8 spikes — split so
    // the spike's events straddle the two micro-batches
    val quiet = (0L to 7L).map(w => ("a", w))
    val spike = Seq.fill(6)(("a", 8L))
    input.addData(quiet ++ spike.take(2): _*)
    q.processAllAvailable()
    input.addData(spike.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val last = spark.table("burst_t").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).last
    val batch = operators.SequenceOps.burstDetect(
      (quiet ++ spike).toDF("g", "win"), "g", "win").head()
    assert(last === ((batch.getAs[Long]("n_windows"),
      batch.getAs[Long]("n_bursts"),
      batch.getAs[Long]("burst_windows"))))
    // the spike is actually detected
    assert(last._2 >= 1L && last._3 >= 1L)
  }

  test("pageHinkleyStream: histogram state across batches equals " +
      "batch pageHinkley bit-exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Long)]
    val df = input.toDF().toDF("g", "win")
    val out = StreamingOps.pageHinkleyStream(spark, df, "g", "win",
      delta = 0.0, lambda = 0.5)
    val q = out.writeStream.format("memory").queryName("ph_t")
      .outputMode("update").start()
    // flat counts then an upward step; split mid-step so arrival
    // order across micro-batches differs from window order
    val rows = Seq.fill(4)(("a", 1L)) ++ Seq.fill(4)(("a", 2L)) ++
      Seq.fill(6)(("a", 3L)) ++ Seq.fill(6)(("a", 4L))
    input.addData(rows.take(9): _*)
    q.processAllAvailable()
    input.addData(rows.drop(9): _*)
    q.processAllAvailable()
    q.stop()
    val last = spark.table("ph_t").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4))).last
    val batch = operators.DiagnosticsOps.pageHinkley(
      rows.toDF("g", "win"), "g", "win", delta = 0.0,
      lambda = 0.5).head()
    // BIT equality, not approx — the twin replays the identical IEEE
    // expressions over the merged histogram
    assert(last === ((batch.getAs[Long]("n_windows"),
      batch.getAs[Double]("ph_final"),
      batch.getAs[Double]("max_excess"),
      batch.getAs[Long]("alarm_windows"))))
    assert(last._4 >= 1L) // the step actually alarms
  }

  test("drawdownStream: integer peak/drawdown state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Long)]
    val df = input.toDF().toDF("k", "ts", "tie", "vq")
    val out = StreamingOps.drawdownStream(spark, df, "k", "ts", "tie",
      "vq")
    val q = out.writeStream.format("memory").queryName("dd_t")
      .outputMode("append").start()
    input.addData((1L, 0L, 0L, 10L), (1L, 1L, 1L, 20L),
      (1L, 2L, 2L, 15L))
    q.processAllAvailable()
    input.addData((1L, 3L, 3L, 25L), (1L, 4L, 4L, 5L))
    q.processAllAvailable()
    q.stop()
    val snaps = spark.table("dd_t").collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(snaps(3L) === ((20L, 5L, 2L)))  // after batch 1
    assert(snaps(5L) === ((25L, 20L, 4L))) // resumed across batches
    // single-batch fold equals the two-batch result
    import spark.implicits._
    val whole = StreamingOps.drawdownStream(spark,
      Seq((1L, 0L, 0L, 10L), (1L, 1L, 1L, 20L), (1L, 2L, 2L, 15L),
        (1L, 3L, 3L, 25L), (1L, 4L, 4L, 5L)).toDF("k", "ts", "tie",
        "vq"), "k", "ts", "tie", "vq").head()
    assert((whole.getLong(2), whole.getLong(3), whole.getLong(4)) ===
      ((25L, 20L, 4L)))
  }

  test("cusumStream carries integer CUSUM state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Long)]
    val df = input.toDF().toDF("user_id", "ts_ns", "event_id", "xq")
    val out = StreamingOps.cusumStream(spark, df, "user_id", "ts_ns",
      "event_id", "xq", refUp = 12L, refDown = 8L, threshold = 15L)
    val q = out.writeStream.format("memory").queryName("cusum_t")
      .outputMode("append").start()
    // k1 = [10,10,20,20,20] split across batches: S+ = [0,0,8,16,24]
    input.addData((1L, 0L, 0L, 10L), (1L, 1L, 1L, 10L), (1L, 2L, 2L, 20L))
    q.processAllAvailable()
    input.addData((1L, 3L, 3L, 20L), (1L, 4L, 4L, 20L))
    q.processAllAvailable()
    val snaps = spark.table("cusum_t").collect()
      .map(r => r.getLong(1) -> r).toMap // keyed by n
    q.stop()
    val b1 = snaps(3L) // after batch 1: S+ peaked at 8, no alarm yet
    assert(b1.getLong(2) === 8L && b1.isNullAt(4))
    val b2 = snaps(5L) // resumed state: S+ = 24, alarm stamped at ts 3
    assert(b2.getLong(2) === 24L && b2.getLong(4) === 3L)
    // and the batch-frame fold equals the batch operator exactly
    import spark.implicits._
    val frame = Seq((1L, 0L, 0L, 10L), (1L, 1L, 1L, 10L),
      (1L, 2L, 2L, 20L), (1L, 3L, 3L, 20L), (1L, 4L, 4L, 20L))
      .toDF("user_id", "ts_ns", "event_id", "xq")
    val viaStream = StreamingOps.cusumStream(spark, frame, "user_id",
      "ts_ns", "event_id", "xq", 12L, 8L, 15L).collect().map(_.toSeq)
    val viaBatch = operators.SequenceOps.cusumChange(frame,
      Seq("user_id"), "ts_ns", "event_id", "xq", 12L, 8L, 15L)
      .collect().map(_.toSeq)
    assert(viaStream.toSet === viaBatch.toSet)
  }

  test("aggStateStream: order-free five-slot monoid across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val df = input.toDF().toDF("k", "v")
    val out = StreamingOps.aggStateStream(spark, df, "k", "v")
    val q = out.writeStream.format("memory").queryName("aggstate_t")
      .outputMode("append").start()
    input.addData(("a", 5L), ("a", -2L))
    q.processAllAvailable()
    input.addData(("a", 9L), ("b", 1L)) // deliberately out of any order
    q.processAllAvailable()
    val snaps = spark.table("aggstate_t").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    q.stop()
    val a1 = snaps(("a", 2L))
    assert(a1.getLong(2) === 3L && a1.getLong(3) === -2L &&
      a1.getLong(4) === 5L && a1.getLong(5) === 29L)
    val a2 = snaps(("a", 3L)) // resumed: min/max/sums extended
    assert(a2.getLong(2) === 12L && a2.getLong(3) === -2L &&
      a2.getLong(4) === 9L && a2.getLong(5) === 110L)
    // batch-frame fold equals the batch operator (any order)
    import spark.implicits._
    val frame = Seq(("a", 9L), ("a", 5L), ("a", -2L), ("b", 1L))
      .toDF("k", "v")
    val viaStream = StreamingOps.aggStateStream(spark, frame, "k", "v")
      .collect().map(_.toSeq).toSet
    val viaBatch = operators.StatsOps.aggState(frame, Seq("k"), "v")
      .collect().map(_.toSeq).toSet
    assert(viaStream === viaBatch)
  }

  test("conversionStream accumulates per-key successes across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val df = input.toDF().toDF("user_id", "is_hit")
    val out = StreamingOps.conversionStream(spark, df, "user_id", "is_hit")
    val q = out.writeStream.format("memory").queryName("conv_t")
      .outputMode("append").start()
    input.addData((1L, 1L), (1L, 0L), (2L, 1L))
    q.processAllAvailable()
    input.addData((1L, 1L), (3L, 0L))
    q.processAllAvailable()
    val rows = spark.table("conv_t").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_success")))
      .toSeq
    q.stop()
    // batch 1 snapshots: user 1 -> 1, user 2 -> 1; batch 2 CONTINUES
    // user 1's state (1 + 1 = 2) and opens user 3 at 0
    assert(rows.sorted === Seq((1L, 1L), (1L, 2L), (2L, 1L), (3L, 0L)))

    // order-free: a shuffled batch frame folds to the same totals
    val frame = Seq((7L, 1L), (7L, 1L), (7L, 0L), (8L, 1L)).toDF("u", "f")
    val a = StreamingOps.conversionStream(spark, frame, "u", "f")
      .collect().map(_.toSeq).toSet
    val b = StreamingOps.conversionStream(
      spark, frame.repartition(5).orderBy(rand(42)), "u", "f")
      .collect().map(_.toSeq).toSet
    assert(a === b && a === Set(Seq(7L, 2L), Seq(8L, 1L)))
  }
}
