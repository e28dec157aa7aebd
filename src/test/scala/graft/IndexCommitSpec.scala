package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.IndexCommits

/** The round-18 crash-safety surface: both persisted index stores
  * (ANN — SimilarityOps, BM25 — TextOps) mutate through versioned
  * snapshots (stage new files, ONE atomic pointer rename, vacuum).
  * These tests pin the protocol's invariants directly:
  *
  *   - staged maintenance files are INVISIBLE to every read until the
  *     pointer swap (the simulated-crash window: served rows identical
  *     before, during the debris, and after recovery);
  *   - the next maintenance op heals debris (vacuum), after which the
  *     on-disk data-file set equals the snapshot exactly;
  *   - commit history is bounded (one live version after vacuum, no
  *     half-written .tmp attempts survive);
  *   - the LSM auto-flush sawtooth bounds the append log;
  *   - BM25 append dup-arbitration reads ONLY the suspects'
  *     `docbucket=` doclens partitions (plan-captured) — the sparse
  *     twin of the ANN side's list-pruned arbitration.
  */
class IndexCommitSpec extends SparkSpec {
  import spark.implicits._

  private def annVecs = (0 until 40).map { i =>
    val base = if (i % 2 == 0) 0.0f else 10.0f
    (i.toLong, Array.tabulate(64)(d => base + (i / 2) * 0.01f + d * 0.001f))
  }.toDF("vec_id", "embedding")

  private def bmCorpus = Seq(
    (0L, "spark joins data with hash joins"),
    (1L, "hash tables back the join"),
    (2L, "completely unrelated prose here"),
    (3L, "spark spark spark"),
    (4L, "the quick brown fox"),
    (5L, "join join hash spark"),
    (6L, "spark hash join spark hash")).toDF("doc_id", "text")

  /** Every data file (part-*) under root's served subdirectories. */
  private def dataFiles(root: String, subs: Seq[String]): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    subs.flatMap { sub =>
      val base = new java.io.File(s"$root/$sub")
      if (!base.exists()) Seq.empty
      else walk(base).filter(_.getName.startsWith("part-"))
        .map(_.getPath)
    }.toSet
  }

  private def commitDirs(root: String): Seq[String] = {
    val d = new java.io.File(s"$root/commits")
    if (!d.exists()) Seq.empty else d.listFiles().map(_.getName).toSeq
  }

  test("ANN flush crash window: staged fold invisible until the" +
      " pointer swap; the real flush heals debris; one live version" +
      " and zero orphans after; served rows identical throughout") {
    val root = java.nio.file.Files.createTempDirectory("graft_icf")
      .toString + "/idx"
    val vecs = annVecs
    SimilarityOps.indexWrite(vecs.where(col("vec_id") < 20),
      "vec_id", "embedding", root, k = 2, iters = 2, m = 8, dsub = 8,
      ksub = 4)
    assert(IndexCommits.currentVersion(spark, root) === Some(1L))
    SimilarityOps.indexAppend(vecs.where(col("vec_id") >= 30),
      "vec_id", "embedding", root, buffered = true)
    SimilarityOps.indexAppend(
      vecs.where(col("vec_id") >= 20 && col("vec_id") < 30),
      "vec_id", "embedding", root, buffered = true)
    // each mutation = exactly one committed version
    assert(IndexCommits.currentVersion(spark, root) === Some(3L))
    val queries = vecs.where(col("vec_id") < 4)
    val want = SimilarityOps.indexSearch(queries, root,
      "vec_id", "embedding", k = 3, nProbe = 2).collect().toSeq
    // simulated crash: the fold's files are staged on disk but the
    // pointer was never swapped
    assert(SimilarityOps.prepareFlush(spark, root).isDefined)
    assert(IndexCommits.currentVersion(spark, root) === Some(3L))
    val live = IndexCommits.readEntries(spark, root).map(_.file).toSet
    val disk = dataFiles(root, Seq("vectors", "applog"))
    assert((disk -- live).nonEmpty, "expected staged debris on disk")
    // debris-blind serve: snapshot-planned reads can't see the stage
    assert(SimilarityOps.indexSearch(queries, root,
      "vec_id", "embedding", k = 3, nProbe = 2).collect().toSeq === want)
    // recovery: the real flush vacuums the debris, folds, swaps
    SimilarityOps.indexFlush(spark, root)
    assert(SimilarityOps.indexSearch(queries, root,
      "vec_id", "embedding", k = 3, nProbe = 2).collect().toSeq === want)
    val after = IndexCommits.readEntries(spark, root)
    assert(IndexCommits.filesOf(after, "applog").isEmpty)
    // zero orphans: on-disk data files == the snapshot, exactly
    assert(dataFiles(root, Seq("vectors", "applog", "deletes")) ===
      after.map(_.file).toSet)
    // bounded history: one live version, no half-written attempts
    val cd = commitDirs(root)
    assert(cd.count(_.startsWith("v=")) === 1, cd.mkString(","))
    assert(!cd.exists(_.startsWith(".tmp")), cd.mkString(","))
  }

  test("ANN compact crash window: staged survivors invisible until" +
      " the swap; recovery compacts for real; sidecar retired;" +
      " served rows identical throughout") {
    val root = java.nio.file.Files.createTempDirectory("graft_icc")
      .toString + "/idx"
    val vecs = annVecs
    SimilarityOps.indexWrite(vecs, "vec_id", "embedding", root,
      k = 2, iters = 2, m = 8, dsub = 8, ksub = 4)
    SimilarityOps.indexDelete(
      vecs.where(col("vec_id") % 2 === 0 && col("vec_id") >= 20),
      "vec_id", root, vecCol = "embedding")
    val queries = vecs.where(col("vec_id") < 4)
    val want = SimilarityOps.indexSearch(queries, root,
      "vec_id", "embedding", k = 3, nProbe = 2).collect().toSeq
    val v0 = IndexCommits.currentVersion(spark, root)
    // simulated crash inside the old delete-then-rename window
    assert(SimilarityOps.prepareCompact(spark, root).isDefined)
    assert(IndexCommits.currentVersion(spark, root) === v0)
    assert(SimilarityOps.indexSearch(queries, root,
      "vec_id", "embedding", k = 3, nProbe = 2).collect().toSeq === want)
    // recovery: heal, stage again, swap — merge-on-read result kept
    SimilarityOps.indexCompact(spark, root)
    assert(SimilarityOps.indexSearch(queries, root,
      "vec_id", "embedding", k = 3, nProbe = 2).collect().toSeq === want)
    val after = IndexCommits.readEntries(spark, root)
    assert(IndexCommits.filesOf(after, "deletes").isEmpty)
    assert(!new java.io.File(s"$root/deletes").exists())
    assert(dataFiles(root, Seq("vectors", "applog", "deletes")) ===
      after.map(_.file).toSet)
  }

  test("BM25 compact crash window: staged survivors invisible until" +
      " the swap; recovery compacts; served rows identical throughout") {
    val root = java.nio.file.Files.createTempDirectory("graft_icb")
      .toString + "/idx"
    TextOps.invertedIndexWrite(bmCorpus, "doc_id", "text", root,
      nBuckets = 16)
    TextOps.invertedIndexDelete(bmCorpus.where(col("doc_id") % 3 === 0),
      "doc_id", root)
    val terms = Seq("spark", "join", "hash")
    val want = TextOps.bm25SearchIndexed(spark, root, terms, k = 10)
      .collect().toSeq
    val v0 = IndexCommits.currentVersion(spark, root)
    assert(TextOps.prepareInvertedCompact(spark, root).isDefined)
    assert(IndexCommits.currentVersion(spark, root) === v0)
    assert(TextOps.bm25SearchIndexed(spark, root, terms, k = 10)
      .collect().toSeq === want)
    TextOps.invertedIndexCompact(spark, root)
    assert(TextOps.bm25SearchIndexed(spark, root, terms, k = 10)
      .collect().toSeq === want)
    val after = IndexCommits.readEntries(spark, root)
    assert(IndexCommits.filesOf(after, "deletes").isEmpty)
    assert(dataFiles(root, Seq("postings", "doclens", "deletes")) ===
      after.map(_.file).toSet)
  }

  test("auto-flush sawtooth: the buffered sink (the streaming-ingest" +
      " default) folds inline at the segment threshold, so the log" +
      " never outgrows it and serving stays row-identical to direct") {
    val vecs = annVecs
    val direct = java.nio.file.Files.createTempDirectory("graft_icd")
      .toString + "/idx"
    SimilarityOps.indexWrite(vecs.where(col("vec_id") < 20),
      "vec_id", "embedding", direct, k = 2, iters = 2, m = 8, dsub = 8,
      ksub = 4)
    SimilarityOps.indexAppend(vecs.where(col("vec_id") >= 20),
      "vec_id", "embedding", direct)
    val queries = vecs.where(col("vec_id") < 4)
    val want = SimilarityOps.indexSearch(queries, direct,
      "vec_id", "embedding", k = 3, nProbe = 2).collect().toSeq
    val root = java.nio.file.Files.createTempDirectory("graft_icaf")
      .toString + "/idx"
    SimilarityOps.indexWrite(vecs.where(col("vec_id") < 20),
      "vec_id", "embedding", root, k = 2, iters = 2, m = 8, dsub = 8,
      ksub = 4)
    val sink = graft.streaming.StreamingOps.indexAppendBufferedSink(
      "vec_id", "embedding", root, autoFlushSegments = 2)
    def logSegs(): Int = IndexCommits.filesOf(
      IndexCommits.readEntries(spark, root), "applog").size
    sink(vecs.where(col("vec_id") >= 30), 0L)
    assert(logSegs() === 1) // below threshold: no fold
    sink(vecs.where(col("vec_id") >= 20 && col("vec_id") < 30), 1L)
    assert(logSegs() === 0) // threshold reached: folded inline
    assert(SimilarityOps.indexSearch(queries, root,
      "vec_id", "embedding", k = 3, nProbe = 2).collect().toSeq === want)
    // the sawtooth restarts: the next batch is one fresh segment
    sink(vecs.select((col("vec_id") + 100L).as("vec_id"),
      col("embedding")), 2L)
    assert(logSegs() === 1)
  }

  test("maintenance policies are threshold-gated: below both" +
      " thresholds indexMaintain / invertedIndexMaintain are no-ops" +
      " (no pointer swap); above them they fold and compact") {
    val root = java.nio.file.Files.createTempDirectory("graft_icm")
      .toString + "/idx"
    val vecs = annVecs
    SimilarityOps.indexWrite(vecs.where(col("vec_id") < 20),
      "vec_id", "embedding", root, k = 2, iters = 2, m = 8, dsub = 8,
      ksub = 4)
    SimilarityOps.indexAppend(vecs.where(col("vec_id") >= 20),
      "vec_id", "embedding", root, buffered = true)
    SimilarityOps.indexDelete(vecs.where(col("vec_id") === 5),
      "vec_id", root, vecCol = "embedding")
    val v0 = IndexCommits.currentVersion(spark, root)
    // 1 segment < 16; 1 deleted of 40 = 2.5% < 50%: nothing runs
    assert(SimilarityOps.indexMaintain(spark, root,
      flushSegments = 16, compactDeletedFraction = 0.5) === (false, false))
    assert(IndexCommits.currentVersion(spark, root) === v0)
    // 1 segment >= 1; 2.5% >= 1%: both run
    assert(SimilarityOps.indexMaintain(spark, root,
      flushSegments = 1, compactDeletedFraction = 0.01) === (true, true))
    val after = IndexCommits.readEntries(spark, root)
    assert(IndexCommits.filesOf(after, "applog").isEmpty)
    assert(IndexCommits.filesOf(after, "deletes").isEmpty)
    // and a second tick is a clean no-op again
    assert(SimilarityOps.indexMaintain(spark, root,
      flushSegments = 1, compactDeletedFraction = 0.01) === (false, false))
    // BM25 twin
    val bm = java.nio.file.Files.createTempDirectory("graft_icmb")
      .toString + "/idx"
    TextOps.invertedIndexWrite(bmCorpus, "doc_id", "text", bm,
      nBuckets = 16)
    TextOps.invertedIndexDelete(bmCorpus.where(col("doc_id") === 4),
      "doc_id", bm)
    val b0 = IndexCommits.currentVersion(spark, bm)
    // 1 of 7 docs ~ 14% < 50%: no compact
    assert(!TextOps.invertedIndexMaintain(spark, bm,
      compactDeletedFraction = 0.5))
    assert(IndexCommits.currentVersion(spark, bm) === b0)
    assert(TextOps.invertedIndexMaintain(spark, bm,
      compactDeletedFraction = 0.1))
    assert(IndexCommits.filesOf(
      IndexCommits.readEntries(spark, bm), "deletes").isEmpty)
    assert(!TextOps.invertedIndexMaintain(spark, bm,
      compactDeletedFraction = 0.1))
  }

  test("vacuum retention window: a reader planned from the previous" +
      " snapshot survives a compact when graft.index.vacuum.retainMs" +
      " is set; debris reclaims once the window lapses") {
    val root = java.nio.file.Files.createTempDirectory("graft_icr")
      .toString + "/idx"
    val vecs = annVecs
    SimilarityOps.indexWrite(vecs, "vec_id", "embedding", root,
      k = 2, iters = 2, m = 8, dsub = 8, ksub = 4)
    val queries = vecs.where(col("vec_id") < 4)
    // the in-flight reader: planned (snapshot read + probed file list)
    // BEFORE the delete/compact below, collected only after
    val preDf = SimilarityOps.indexSearch(queries, root,
      "vec_id", "embedding", k = 3, nProbe = 2)
    val preWant = SimilarityOps.indexSearch(queries, root,
      "vec_id", "embedding", k = 3, nProbe = 2).collect().toSeq
    SimilarityOps.indexDelete(
      vecs.where(col("vec_id") % 2 === 0 && col("vec_id") >= 20),
      "vec_id", root, vecCol = "embedding")
    val mor = SimilarityOps.indexSearch(queries, root,
      "vec_id", "embedding", k = 3, nProbe = 2).collect().toSeq
    spark.conf.set("graft.index.vacuum.retainMs", "3600000")
    try SimilarityOps.indexCompact(spark, root)
    finally spark.conf.unset("graft.index.vacuum.retainMs")
    // new reads serve the compacted store...
    assert(SimilarityOps.indexSearch(queries, root,
      "vec_id", "embedding", k = 3, nProbe = 2).collect().toSeq === mor)
    // ...while the in-flight reader's superseded files were RETAINED:
    // it still collects its own planned-at snapshot (which predates
    // even the delete sidecar), instead of failing on deleted files
    assert(preDf.collect().toSeq === preWant)
    // superseded files exist but are invisible orphans
    val live = IndexCommits.readEntries(spark, root).map(_.file).toSet
    assert((dataFiles(root, Seq("vectors")) -- live).nonEmpty)
    // window cleared (default 0): the next vacuum reclaims them all
    IndexCommits.vacuum(spark, root,
      Seq("vectors", "applog", "deletes", ".compact"))
    assert(dataFiles(root, Seq("vectors", "applog", "deletes")) === live)
    val cd = commitDirs(root)
    assert(cd.count(_.startsWith("v=")) === 1, cd.mkString(","))
  }

  test("BM25 append dup-arbitration reads only the suspects'" +
      " docbucket= doclens partitions (plan-captured), never the" +
      " whole doclens table") {
    val root = java.nio.file.Files.createTempDirectory("graft_icp")
      .toString + "/idx"
    TextOps.invertedIndexWrite(bmCorpus, "doc_id", "text", root,
      nBuckets = 16)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.sparkPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.rootPaths.foreach(p =>
              seen.add(p.toString))
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // a true dup: the Bloom hits, arbitration must consult doclens —
      // and must consult ONLY the suspect's own docbucket= partition
      val e = intercept[IllegalArgumentException] {
        TextOps.invertedIndexAppend(bmCorpus.where(col("doc_id") === 5),
          "doc_id", "text", root)
      }
      assert(e.getMessage.contains("already indexed"))
      // the listener bus is async: wait for the doclens scan to land
      import scala.jdk.CollectionConverters._
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (!seen.asScala.exists(_.contains("/doclens")) &&
          System.nanoTime() < deadline)
        Thread.sleep(50)
      val lens = seen.asScala.toSeq.filter(_.contains("/doclens"))
      assert(lens.nonEmpty, "no doclens scan captured")
      assert(lens.forall(_.contains("docbucket=")),
        s"arbitration scanned doclens outside the suspect buckets: " +
          lens.mkString(", "))
    } finally spark.listenerManager.unregister(listener)
  }
}
