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
}
