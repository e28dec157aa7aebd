package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ten-minute tour, runnable as `sbt "runMain graft.Quickstart [sfDir]"`.
  *
  * Mirrors the reference's `docs/imaging.ipynb` flow — session bootstrap
  * (`cngi.direct.InitializeFramework`), visibility load, imaging weights,
  * gridding, FFT to a normalized sky image — then one LLM-pipeline
  * operator (MinHash near-dup over the documents table). Every step here
  * is the same call a README reader would paste into `sbt console`.
  *
  * The tour body lives in [[run]] so QuickstartSpec can drive the exact
  * documented path on the shared test session (main's own bootstrap
  * would `stop()` the JVM-wide session other suites share).
  */
object Quickstart {

  /** The documented tour on a caller-provided session. Returns the
    * final sky image, the near-dup pair count, and the stored-index
    * search hit count — the three artifacts the README tells the
    * reader to look at.
    */
  def run(spark: SparkSession, sf: String): (DataFrame, Long, Long) = {
    // 1. A visibility-shaped fact table from the bundled fixtures (the
    //    melted long form every vis operator consumes: one row per
    //    (time, baseline, chan, pol) sample).
    val vis = Tables.lineitem(spark, sf).select(
      lit(0).as("img_chan"), lit(0).as("pol"),
      (col("l_extendedprice") % 60.0 - 30.0).as("u"),
      ((col("l_quantity") * 3.0 + col("l_linenumber")) % 60.0 - 30.0).as("v"),
      col("l_tax").as("re"), col("l_discount").as("im"),
      (col("l_discount") + 0.5).as("weight"), lit(1.5e9).as("freq"))

    // 2. Flagship imaging chain: Briggs imaging weights -> uv grid ->
    //    per-plane FFT -> sum-weight-normalized sky image.
    val p = operators.GridOps.GridParams((32, 32), (0.002, 0.002),
      imageSize = Some((16, 16)))
    val weighted = operators.GridOps
      .makeImagingWeight(vis, p, "briggs", robust = 0.5)
      .withColumn("weight", col("imaging_weight"))
      .select("img_chan", "pol", "u", "v", "re", "im", "weight", "freq")
    val image = operators.GridOps.makeImage(spark, weighted, p)

    // 3. One LLM-pipeline operator: banded MinHash near-duplicate pairs
    //    over the documents table (never all-pairs — LSH buckets only).
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val nDups = operators.DedupOps.minHashNearDup(
      docs, idCol = "doc_id", textCol = "text", threshold = 0.7).count()

    // 4. The retrieval-index lifecycle (crash-safe, self-maintaining):
    //    train the IVF-PQ quantizers once and persist the store, ingest
    //    new vectors through the streaming LSM sink (one segment file
    //    per micro-batch, auto-flushed at the measured threshold), let
    //    the one-call maintenance policy decide whether to fold or
    //    compact, then serve approximate neighbors from the stored
    //    index — the probe is partition pruning, so the scan rides
    //    probed-list volume, never corpus size.
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val idxRoot = java.nio.file.Files
      .createTempDirectory("graft_qs_idx").toString + "/idx"
    operators.SimilarityOps.indexWrite(
      emb.where(col("vec_id") < 100), "vec_id", "embedding", idxRoot,
      k = 8, iters = 2, m = 8, dsub = 8, ksub = 16)
    val ingest = streaming.StreamingOps.indexAppendBufferedSink(
      "vec_id", "embedding", idxRoot, autoFlushSegments = 2)
    ingest(emb.where(col("vec_id") >= 100), 0L)
    operators.SimilarityOps.indexMaintain(spark, idxRoot)
    val nHits = operators.SimilarityOps.indexSearch(
      emb.where(col("vec_id") < 3), idxRoot, "vec_id", "embedding",
      k = 5, nProbe = 2).count()
    (image, nDups, nHits)
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")

    // Session bootstrap — the cngi.direct parity surface. All graft
    // SQL functions (graft_dot, graft_polyhash, ...) are registered.
    val spark = direct.Framework.initializeFramework(
      workers = 8, extraConf = Map("spark.sql.shuffle.partitions" -> "8"))
    spark.sparkContext.setLogLevel("WARN")

    val (image, nDups, nHits) = run(spark, sf)
    println("-- brightest image pixels --")
    image.orderBy(desc("image")).show(3)
    println(s"near-dup pairs at jaccard >= 0.7: $nDups")
    println(s"stored-index ANN hits for 3 queries at k=5: $nHits")

    println("QUICKSTART_OK")
    spark.stop()
  }
}
