package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distinct-count sketching with a KMV (k-minimum-values) sketch — the
  * "novel sketch" slot of the builder brief, done Spark-first as a
  * typed `Aggregator` UDAF so it runs inside the normal partial/final
  * hash-aggregate machinery (map-side combine, no shuffle of raw
  * values — the shuffle carries one <= k-element sorted array per
  * group per partition).
  *
  * Versus HyperLogLog (Spark's approx_count_distinct): KMV is fully
  * DETERMINISTIC given the hash — the sketch state is the set of k
  * smallest distinct hash values, independent of partitioning, merge
  * order, or row order. That makes the estimate reproducible across
  * engines and runs (the driver oracle replays it exactly in SQL),
  * while keeping the same O(k) state and mergeability. Estimator:
  * with h uniform on [0, M), E[kth smallest of n distinct] ~ k*M/n,
  * so n_hat = (k-1) * M / h_(k) (the standard unbiased KMV form).
  *
  * The hash is the same Knuth multiplicative family as the LSH /
  * projection operators: (x * 2654435761) mod 1e9+7 — engine-portable
  * exact integer arithmetic.
  */
object SketchOps {

  val KmvMod = 1000000007L
  val KmvMult = 2654435761L

  def kmvHash(x: Long): Long = x * KmvMult % KmvMod

  /** Final sketch row: the k-th smallest distinct hash (the sketch
    * threshold), how many values the sketch holds, and the estimate.
    */
  final case class KmvResult(kth_min: Long, n_sketch: Long, estimate: Double)

  /** Buffer = sorted array of the <= k smallest DISTINCT hashes seen.
    * All transitions are set operations, so the result is independent
    * of row order and partition layout.
    */
  final class KmvAggregator(k: Int)
      extends Aggregator[Long, Array[Long], KmvResult] {

    override def zero: Array[Long] = Array.empty

    override def reduce(buf: Array[Long], x: Long): Array[Long] = {
      val h = kmvHash(x)
      if (buf.length >= k && h >= buf(buf.length - 1)) buf
      else {
        val i = java.util.Arrays.binarySearch(buf, h)
        if (i >= 0) buf // already present
        else {
          val at = -i - 1
          val grown = new Array[Long](math.min(buf.length + 1, k))
          Array.copy(buf, 0, grown, 0, at)
          grown(at) = h
          Array.copy(buf, at, grown, at + 1,
            math.min(buf.length - at, k - at - 1))
          grown
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // sorted-distinct merge, capped at k
      val out = new Array[Long](math.min(a.length + b.length, k))
      var (i, j, n) = (0, 0, 0)
      while (n < out.length && (i < a.length || j < b.length)) {
        val take =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) {
            val v = a(i); if (j < b.length && b(j) == v) j += 1; i += 1; v
          } else { val v = b(j); j += 1; v }
        if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
      }
      if (n == out.length) out else out.take(n)
    }

    override def finish(buf: Array[Long]): KmvResult =
      if (buf.isEmpty) KmvResult(0L, 0L, 0.0)
      else if (buf.length < k)
        KmvResult(buf.last, buf.length, buf.length.toDouble)
      else KmvResult(buf.last, k, (k - 1).toDouble * KmvMod / buf.last)

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

    override def outputEncoder: Encoder[KmvResult] = Encoders.product[KmvResult]
  }

  /** Column form: KMV sketch of a LONG column, usable in any
    * groupBy(...).agg(...). Returns a struct (kth_min, n_sketch,
    * estimate).
    */
  def kmvDistinct(c: Column, k: Int): Column =
    udaf(new KmvAggregator(k)).apply(c)

  /** Per-group distinct-count estimates for `valueCol`. */
  def distinctSketch(df: DataFrame, keys: Seq[String], valueCol: String,
                     k: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(kmvDistinct(col(valueCol).cast("long"), k).as("sk"))
      .select(keys.map(col) :+ col("sk.kth_min").as("kth_min") :+
        col("sk.n_sketch").as("n_sketch") :+
        col("sk.estimate").as("estimate"): _*)

  // ------------------------------------------------------ Count-Min sketch

  /** Count-Min frequency sketch. State = depth x width counters; point
    * estimate = min over depth of the counter each row-hash lands in
    * (never under-counts; over-counts by collisions ~ N/width).
    *
    * Spark shape: the BUILD is one hash aggregate over a depth-fold
    * posexplode — map-side partial counting means the shuffle carries
    * at most depth*width counter rows per partition, independent of
    * input rows. The sketch itself is a bounded depth*width-row
    * DataFrame, always broadcast on the estimate side. Like KMV (and
    * unlike Spark's CountMinSketchAgg, which seeds from murmur), the
    * hash family ((a_i*x + b_i) mod P) mod width over the Mersenne
    * prime P=2^31-1 is exact integer math both engines replay
    * identically, so the driver oracle checks the sketch bit-for-bit.
    *
    * Inputs must be nonnegative hashes < 2^31 (e.g. TextOps.polyHash)
    * so a*x stays within int64.
    */
  val CmsP = 2147483647L // 2^31 - 1, Mersenne

  /** Deterministic per-depth (a, b) seeds, engine-portable constants. */
  def cmsSeeds(depth: Int): Seq[(Long, Long)] =
    (1 to depth).map { i =>
      val a = KmvMult * i % CmsP
      val b = 1099511628211L * i % CmsP
      (if (a == 0) 1L else a, b)
    }

  private def cmsBuckets(x: Column, depth: Int, width: Int): Column =
    array(cmsSeeds(depth).map { case (a, b) =>
      ((x * a + b) % CmsP % width).cast("int")
    }: _*)

  /** Build the sketch: (depth_i, bucket, cnt), <= depth*width rows. */
  def cmsSketch(df: DataFrame, hashCol: String, depth: Int,
                width: Int): DataFrame =
    df.select(posexplode(cmsBuckets(col(hashCol), depth, width))
        .as(Seq("depth_i", "bucket")))
      .groupBy("depth_i", "bucket").agg(count(lit(1)).as("cnt"))

  /** Point estimates for `items` (any columns + `hashCol`): appends
    * `est` = min over depth of the matching counters. The sketch side
    * is broadcast (bounded by construction); the only shuffle is the
    * per-item min, carrying depth rows per item.
    */
  def cmsEstimate(sketch: DataFrame, items: DataFrame, hashCol: String,
                  depth: Int, width: Int): DataFrame = {
    val itemCols = items.columns.toSeq
    items.select(itemCols.map(col) :+
        posexplode(cmsBuckets(col(hashCol), depth, width))
          .as(Seq("depth_i", "bucket")): _*)
      .join(broadcast(sketch), Seq("depth_i", "bucket"))
      .groupBy(itemCols.map(col): _*)
      .agg(min("cnt").as("est"))
  }

  /** Top-k heavy hitters of `keyCol` by sketch estimate, with the true
    * count alongside (demonstrates est >= true_cnt; at 100 TB the
    * candidate set comes from a sample / external stream and only the
    * sketch is consulted — the exact count here is for validation).
    * Deterministic tie-break (est desc, key asc).
    */
  def cmsHeavyHitters(df: DataFrame, keyCol: String, hashCol: String,
                      depth: Int, width: Int, k: Int): DataFrame = {
    val sketch = cmsSketch(df, hashCol, depth, width)
    val cand = df.groupBy(keyCol, hashCol).agg(count(lit(1)).as("true_cnt"))
    cmsEstimate(sketch, cand, hashCol, depth, width)
      .select(col(keyCol), col("est"), col("true_cnt"))
      .orderBy(col("est").desc, col(keyCol))
      .limit(k)
  }
}
