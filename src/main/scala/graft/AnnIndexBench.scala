package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Persisted-ANN-index scale rehearsal (round-16 verdict item 1's
  * measurement): show that SEARCH cost through the stored index rides
  * PROBED-LIST volume, not corpus size. Three scenarios:
  *
  *   base    1x corpus,  K lists          — probed rows ~ nProbe/K x N
  *   10x-K   10x corpus, SAME K           — probed volume 10x: search
  *                                          pays it (the honest slope)
  *   10x-10K 10x corpus, 10x K            — per-list volume unchanged:
  *                                          probed rows ~ base, search
  *                                          wall ~ base (the 100 TB
  *                                          operating point: scale K
  *                                          with the corpus)
  *
  * Build (train + store) is timed separately — it runs ONCE per index
  * lifecycle, amortized over every query batch served.
  *
  * `sbt "runMain graft.AnnIndexBench [sfDir]"` -> one JSON line +
  * BENCH_ann_r16.json in the CWD.
  */
object AnnIndexBench {

  private def jnum(d: Double): String =
    (math.floor(d * 1000) / 1000).toString

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    // 10x corpus: id-offset replicas (the ScaleUp recipe) — duplicate
    // POSITIONS are fine for this measurement; list sizes depend only
    // on K and N
    val Off = 1000000000L
    val emb10 = (0 until 10).map(i =>
      emb.withColumn("vec_id", col("vec_id") + lit(i * Off)))
      .reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
    // a SMALL query batch with a low probe count, so the probed-list
    // union stays well under the list count and pruning is visible
    // (10 queries x 3 probes over 8 lists would touch everything)
    val queries = emb.where(col("vec_id") < 3)
    val pid = ProcessHandle.current().pid()

    def scenario(tag: String, corpus: DataFrame, k: Int,
                 nProbe: Int): (String, Double, Double, Long) = {
      val root = s"/tmp/graft_annbench_${pid}_$tag"
      val t0 = System.nanoTime()
      SimilarityOps.indexWrite(corpus, "vec_id", "embedding", root,
        k = k, iters = 2, m = 8, dsub = 8, ksub = 16)
      val buildS = (System.nanoTime() - t0) / 1e9
      // probed rows: the volume the search scan actually touches
      val cents = SimilarityOps.readIndexCentroids(spark, root)
      val probed = queries
        .select(explode(graft.functions.ProbeListIds(
          col("embedding").cast("array<double>"), cents, nProbe))
          .as("list_id"))
        .distinct().collect().map(_.getLong(0))
      val probedRows = spark.read.parquet(s"$root/vectors")
        .where(col("list_id").isin(probed: _*)).count()
      // search wall: min of 2 (second run is codegen-warm — the
      // serving steady state)
      val searchS = (1 to 2).map { _ =>
        val t1 = System.nanoTime()
        SimilarityOps.indexSearch(queries, root, "vec_id", "embedding",
          k = 5, nProbe = nProbe).queryExecution.toRdd.count()
        (System.nanoTime() - t1) / 1e9
      }.min
      (tag, buildS, searchS, probedRows)
    }

    val base = scenario("base", emb, k = 16, nProbe = 2)
    val tenK = scenario("10x_sameK", emb10, k = 16, nProbe = 2)
    val ten10K = scenario("10x_10K", emb10, k = 160, nProbe = 2)
    def sj(s: (String, Double, Double, Long), n: Long): String =
      s""""${s._1}":{"corpus_rows":$n,"build_s":${jnum(s._2)},""" +
        s""""search_s":${jnum(s._3)},"probed_rows":${s._4}}"""
    val n1 = emb.count(); val n10 = emb10.count()
    val line =
      s"""{"metric":"ann_index_scale","sf":"$sfDir","scenarios":{""" +
        s"${sj(base, n1)},${sj(tenK, n10)},${sj(ten10K, n10)}}," +
        s""""search_10x10K_over_base":${jnum(ten10K._3 / base._3)},""" +
        s""""probed_10x10K_over_base":${jnum(
          ten10K._4.toDouble / base._4)}}"""
    val w = new java.io.PrintWriter("BENCH_ann_r16.json")
    try w.println(line) finally w.close()
    spark.stop()
    println(line)
  }
}
