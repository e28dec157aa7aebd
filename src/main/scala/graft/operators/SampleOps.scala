package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based splitting and sampling for training-data
  * pipelines.
  *
  * Unlike `rand()`-based `randomSplit`/`sample`, assignment here is a
  * pure function of a key column: re-running the pipeline, adding
  * executors, or reprocessing a partition never moves a row between
  * splits, and hashing on a GROUP key (user_id, domain, doc cluster)
  * makes the split leakage-proof — every row of the group lands on the
  * same side. No shuffle, no state: one codegen'd column expression,
  * and the same exact integer math is replayable in the driver's
  * DuckDB oracle.
  *
  * Bucket = ((key mod M) * A) mod M mod 10000 with the Knuth
  * multiplier A = 2654435761 over M = 1e9+7 — the same engine-portable
  * family as SketchOps/TextOps.
  */
object SampleOps {

  val SplitBuckets = 10000

  /** Deterministic bucket in [0, SplitBuckets) for a numeric key.
    * Reduce mod M BEFORE multiplying so arbitrary long keys cannot
    * overflow int64: (key % M) < 2^30 and A < 2^32 keep the product
    * under 2^62.
    */
  def splitBucket(key: Column): Column =
    pmod(key.cast("long"), lit(TextOps.HashMod)) * SketchOps.KmvMult %
      TextOps.HashMod % SplitBuckets

  /** Adds a `split` label column chosen by cumulative weight over the
    * key's bucket. Weights need not sum to 1 (normalized internally);
    * boundaries are floor(cum * SplitBuckets), so at most 1/10000
    * granularity error.
    */
  def hashSplit(df: DataFrame, keyCol: String, weights: Seq[Double],
                labels: Seq[String]): DataFrame = {
    require(weights.length == labels.length && weights.nonEmpty)
    val total = weights.sum
    val cuts = weights.scanLeft(0.0)(_ + _).tail
      .map(c => math.floor(c / total * SplitBuckets).toLong)
    val b = splitBucket(col(keyCol))
    val assign = cuts.init.zip(labels.init).reverse
      .foldLeft(lit(labels.last)) { case (rest, (cut, lab)) =>
        when(b < cut, lab).otherwise(rest)
      }
    df.withColumn("split", assign)
  }

  /** Keep a deterministic `fraction` of key-groups (bucket < cut). */
  def sampleByHash(df: DataFrame, keyCol: String,
                   fraction: Double): DataFrame =
    df.filter(splitBucket(col(keyCol)) <
      math.floor(fraction * SplitBuckets).toLong)

  /** Mixture sampling: keep each row iff its key's bucket falls under
    * the ROW'S OWN rate (a column in [0,1] — per-domain/per-language
    * mixture weight, a quality score, a curriculum temperature).
    * Deterministic like sampleByHash, and rates nest: raising a rate
    * only ever ADDS rows, so mixture re-tuning is incremental at
    * 100 TB (reprocess nothing, append the delta).
    */
  def sampleByRate(df: DataFrame, keyCol: String,
                   rateCol: Column): DataFrame =
    df.filter(splitBucket(col(keyCol)) <
      floor(rateCol * SplitBuckets).cast("long"))
}
