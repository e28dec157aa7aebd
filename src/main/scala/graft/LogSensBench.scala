package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** LSM log-size sensitivity (round-18 verdict item 2): the buffered
  * index-append path defers folding, so every search unions the
  * unflushed append log behind its probe filter — an UNBOUNDED log
  * would quietly degrade every serve. This harness measures the curve
  * that picks the auto-flush default: on the 100x store (200k vectors,
  * K = 1600 lists — the scale where planning/scan overheads actually
  * show), search wall as a function of unflushed segment count
  * (0 / 1 / 4 / 16 / 64 one-file segments of 500 rows each), then the
  * one flush that folds the whole log and the post-flush serve.
  *
  * The readout backs `indexAppendBufferedSink`'s default
  * autoFlushSegments = 16: the curve is ~flat through 16 segments
  * (each segment is one small parquet file whose row-group stats prune
  * on list_id; the union adds file-open latency, not data volume) and
  * only drifts as the file count grows toward 64+ — so folding every
  * 16 batches keeps serving flat while amortizing the fold's
  * directory commits 16x.
  *
  * `sbt "runMain graft.LogSensBench"` -> one JSON line +
  * BENCH_logsens_r18.json in the CWD. Run QUIET (overlapping sbt builds
  * inflate walls 2-4x).
  */
object LogSensBench {

  private def jnum(d: Double): String =
    (math.floor(d * 1000) / 1000).toString

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val root = s"/tmp/graft_logsens_${ProcessHandle.current().pid()}"
    val par = spark.sparkContext.defaultParallelism
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .repartition(par).localCheckpoint(true)
    val nVec = emb.count()
    val k = 1600
    SimilarityOps.indexWrite(emb, "vec_id", "embedding", root,
      k = k, iters = 2, m = 8, dsub = 8, ksub = 16)
    val queries = emb.where(col("vec_id") < 3)
    def searchWall(): Double = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      SimilarityOps.indexSearch(queries, root, "vec_id", "embedding",
        k = 5, nProbe = 2).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }.min
    // fixed-size segments, id-disjoint from the corpus and each other
    val segRows = 500
    val base = 777L * 1000000000L
    var appended = 0
    val points = Seq(0, 1, 4, 16, 64).map { target =>
      while (appended < target) {
        val delta = emb.limit(segRows).select(
          (col("vec_id") + lit(base + appended.toLong * 10000000L))
            .as("vec_id"), col("embedding"))
        SimilarityOps.indexAppend(delta, "vec_id", "embedding", root,
          buffered = true) // no auto-flush: the curve IS the point
        appended += 1
      }
      val w = searchWall()
      s"""{"segments":$target,"search_s":${jnum(w)}}"""
    }
    val tf0 = System.nanoTime()
    SimilarityOps.indexFlush(spark, root)
    val flushS = (System.nanoTime() - tf0) / 1e9
    val postS = searchWall()
    val line =
      s"""{"metric":"lsm_log_sensitivity","corpus_vectors":$nVec,""" +
        s""""k":$k,"segment_rows":$segRows,""" +
        s""""points":[${points.mkString(",")}],""" +
        s""""flush_s":${jnum(flushS)},""" +
        s""""post_flush_search_s":${jnum(postS)}}"""
    val w = new java.io.PrintWriter("BENCH_logsens_r18.json")
    try w.println(line) finally w.close()
    spark.stop()
    println(line)
  }
}
