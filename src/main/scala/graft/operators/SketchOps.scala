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
  /** Second multiplicative-hash constant (xxHash's PRIME32_2) for
    * operators that need a SECOND hash genuinely independent of the
    * [[KmvMult]] family — a salt added before a shared multiply is a
    * constant offset, not an independent gate (the capture-recapture
    * lesson).
    */
  val KmvMult2 = 2246822519L

  /** Pre-reducing x into [0, M) before the multiply keeps the product
    * under 2^62 for ANY int64 input — without it, ids >= ~3.5e9 (easy
    * in a 100 TB id space) overflow silently and the negative "hashes"
    * all sort below every honest value, corrupting the bottom-k set.
    * The reduction is mod the SAME prime as the hash range, so it costs
    * nothing in collision structure (the hash range was [0, M) anyway)
    * and stays exact-integer-replayable in SQL:
    * ((x % 1000000007) * 2654435761) % 1000000007.
    */
  def kmvHash(x: Long): Long =
    java.lang.Math.floorMod(x, KmvMod) * KmvMult % KmvMod

  /** Final sketch row: the k-th smallest distinct hash (the sketch
    * threshold), how many values the sketch holds, and the estimate.
    */
  final case class KmvResult(kth_min: Long, n_sketch: Long, estimate: Double)

  /** Buffer = sorted array of the <= k smallest DISTINCT hashes seen.
    * All transitions are set operations, so the result is independent
    * of row order and partition layout. NULL inputs are skipped —
    * matching count(DISTINCT) semantics, so the sketch composes with
    * nullable columns (profile_table's approx path) without a
    * pre-filter.
    */
  final class KmvAggregator(k: Int)
      extends Aggregator[java.lang.Long, Array[Long], KmvResult] {

    override def zero: Array[Long] = Array.empty

    override def reduce(buf: Array[Long], x: java.lang.Long): Array[Long] = {
      if (x == null) return buf
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

  // -------------------------------------------- Bottom-k quantile sketch

  /** Quantile sketch = the k rows with the SMALLEST row-id hash — a
    * deterministic mergeable uniform sample (bottom-k sampling: the
    * "k minimum values" idea applied to whole rows instead of distinct
    * hashes). Quantile estimate = lower-rank order statistic of the
    * sample: value at rank floor(q*(n-1)) of the sample sorted
    * ascending. Standard error ~ sqrt(q(1-q)/k) in rank space — k=256
    * gives ~3% rank error, plenty for partition sizing / filter-rate
    * estimation over a 100 TB corpus.
    *
    * Versus GK / KLL / t-digest: those compact adaptively and their
    * state depends on merge order, so no cross-engine oracle can check
    * them exactly. The bottom-k sample is ORDER-INVARIANT by
    * construction — the kept set is the k smallest elements of the
    * (hash, value) multiset under a total order, identical for every
    * partitioning and merge tree — so the driver's DuckDB oracle
    * replays the whole sketch bit-for-bit (rank the hashes, keep k,
    * take order statistics). Same trade as KMV vs HLL above.
    *
    * Spark shape: typed Aggregator → runs in the normal partial/final
    * hash-aggregate with map-side combine; the shuffle carries one
    * <= k-pair buffer per group per partition, never raw rows. Any
    * int64 row id is safe: [[kmvHash]] pre-reduces into [0, M) before
    * multiplying, so nothing overflows (property-tested near 2^62).
    */
  final case class QsBuf(hs: Array[Long], vs: Array[Double])
  final case class QsResult(n_sample: Long, quants: Array[Double])

  final class QuantileSketchAggregator(k: Int, qs: Seq[Double])
      extends Aggregator[(Long, Double), QsBuf, QsResult] {

    override def zero: QsBuf = QsBuf(Array.empty, Array.empty)

    // total order (h, v); ties beyond that are interchangeable (equal v)
    private def lt(h1: Long, v1: Double, h2: Long, v2: Double): Boolean =
      h1 < h2 || (h1 == h2 && v1 < v2)

    override def reduce(buf: QsBuf, x: (Long, Double)): QsBuf = {
      val h = kmvHash(x._1); val v = x._2
      val n = buf.hs.length
      if (n >= k && !lt(h, v, buf.hs(n - 1), buf.vs(n - 1))) buf
      else {
        var lo = 0; var hi = n
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (lt(buf.hs(mid), buf.vs(mid), h, v)) lo = mid + 1 else hi = mid
        }
        val m = math.min(n + 1, k)
        val hs = new Array[Long](m); val vs = new Array[Double](m)
        Array.copy(buf.hs, 0, hs, 0, lo)
        Array.copy(buf.vs, 0, vs, 0, lo)
        hs(lo) = h; vs(lo) = v
        val tail = math.min(n - lo, m - lo - 1)
        Array.copy(buf.hs, lo, hs, lo + 1, tail)
        Array.copy(buf.vs, lo, vs, lo + 1, tail)
        QsBuf(hs, vs)
      }
    }

    override def merge(a: QsBuf, b: QsBuf): QsBuf = {
      val m = math.min(a.hs.length + b.hs.length, k)
      val hs = new Array[Long](m); val vs = new Array[Double](m)
      var i = 0; var j = 0; var n = 0
      while (n < m) {
        val takeA = j >= b.hs.length || (i < a.hs.length &&
          !lt(b.hs(j), b.vs(j), a.hs(i), a.vs(i)))
        if (takeA) { hs(n) = a.hs(i); vs(n) = a.vs(i); i += 1 }
        else { hs(n) = b.hs(j); vs(n) = b.vs(j); j += 1 }
        n += 1
      }
      QsBuf(hs, vs)
    }

    override def finish(buf: QsBuf): QsResult = {
      val sorted = buf.vs.sorted
      val n = sorted.length
      if (n == 0) QsResult(0L, qs.map(_ => Double.NaN).toArray)
      else QsResult(n.toLong,
        qs.map(q => sorted(math.floor(q * (n - 1)).toInt)).toArray)
    }

    override def bufferEncoder: Encoder[QsBuf] = Encoders.product[QsBuf]
    override def outputEncoder: Encoder[QsResult] = Encoders.product[QsResult]
  }

  /** Per-group quantile estimates of `valueCol` from a bottom-k sample
    * keyed by `idCol` (a unique row id; the sample is the k rows whose
    * kmvHash(id) is smallest). `qs` = (output column name, quantile).
    */
  def quantileSketch(df: DataFrame, keys: Seq[String], idCol: Column,
                     valueCol: Column, k: Int,
                     qs: Seq[(String, Double)]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(udaf(new QuantileSketchAggregator(k, qs.map(_._2)))
        .apply(idCol.cast("long"), valueCol.cast("double")).as("sk"))
      .select(keys.map(col) ++
        (col("sk.n_sample").as("n_sample") +:
          qs.zipWithIndex.map { case ((nm, _), i) =>
            col("sk.quants")(i).as(nm)
          }): _*)

  /** Misra-Gries frequent-items summary (capacity k): O(k) state per
    * group whatever the value cardinality, mergeable, and with the
    * classical guarantee that EVERY value of true frequency > n/(k+1)
    * survives in the summary — the candidate set can only over-include,
    * never miss a heavy hitter. The candidate VALUES depend on arrival
    * order (inherent to MG); [[heavyHitters]] restores determinism with
    * an exact recount.
    */
  final class MisraGriesAggregator(k: Int)
      extends Aggregator[Long, Map[Long, Long], Array[Long]] {

    override def zero: Map[Long, Long] = Map.empty

    override def reduce(m: Map[Long, Long], v: Long): Map[Long, Long] =
      m.get(v) match {
        case Some(c) => m.updated(v, c + 1)
        case None if m.size < k => m.updated(v, 1L)
        case None => // decrement-all step: drop counters reaching 0
          m.collect { case (key, c) if c > 1 => key -> (c - 1) }
      }

    /** Canonical MG summary merge (Agarwal et al., "Mergeable
      * Summaries"): sum counters, then subtract the (k+1)-th largest
      * combined count from every counter and keep the positives —
      * at most k survive and the error guarantee is preserved.
      */
    override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
      val sum = b.foldLeft(a) { case (acc, (key, c)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        val t = sum.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        sum.collect { case (key, c) if c > t => key -> (c - t) }
      }
    }

    override def finish(m: Map[Long, Long]): Array[Long] =
      m.keys.toArray.sorted

    override def bufferEncoder: Encoder[Map[Long, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Exact per-group frequent items at threshold n/(k+1) — over the
    * NON-NULL values of `valueCol`, with n_group counting the same
    * (NULLs are dropped up front: the typed aggregator's primitive
    * input would otherwise read them as value 0 and fabricate a
    * hitter; callers wanting null-share semantics should pre-encode
    * nulls to a sentinel value) — priced like a sketch: pass 1 runs
    * the O(k)-state Misra-Gries aggregate to get a per-group candidate
    * array (bounded, broadcastable); pass 2 semi-joins the fact down
    * to candidate rows only and recounts them EXACTLY; the final
    * filter `cnt·(k+1) > n_group` keeps precisely the true heavy
    * hitters. Because MG can never miss one, the output
    * is deterministic — independent of row order and partitioning —
    * even though the intermediate candidate sets are not. This is the
    * standard two-pass exact-heavy-hitters shape at corpus scale: the
    * full-width groupBy((keys, value)) count it avoids is the thing
    * that melts at 100 TB value cardinality.
    */
  def heavyHitters(df: DataFrame, keys: Seq[String], valueCol: String,
                   k: Int): DataFrame = {
    // drop NULL values explicitly: the typed Aggregator's primitive
    // Long input would silently read them as 0 and could fabricate a
    // heavy hitter at value 0
    val fact = df.select((keys.map(col) :+
      col(valueCol).cast("long").as("_v")): _*)
      .where(col("_v").isNotNull)
    // candidates AND group totals from ONE scan/aggregate (the count
    // rides the same partial/final machinery as the MG summary), so
    // the operator reads the fact exactly twice: sketch pass + the
    // semi-join-pruned exact recount.
    val summary = fact.groupBy(keys.map(col): _*)
      .agg(udaf(new MisraGriesAggregator(k)).apply(col("_v")).as("_cands"),
        count(lit(1)).as("n_group"))
    val cands = summary
      .select((keys.map(col) :+ col("n_group") :+
        explode(col("_cands")).as("_v")): _*)
    fact.join(broadcast(cands.select((keys :+ "_v").map(col): _*)),
        keys :+ "_v", "left_semi")
      .groupBy((keys :+ "_v").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(cands), keys :+ "_v")
      .where(col("cnt") * lit(k + 1L) > col("n_group"))
      .select((keys.map(col) :+ col("_v").as("value") :+
        col("cnt") :+ col("n_group")): _*)
  }

  /** HyperLogLog distinct estimate per group — the REGISTER-side
    * sibling of the KMV sketch above, built entirely from relational
    * primitives: register = h mod m, rho = trailing-zeros(h div m)+1
    * (geometric under the uniform hash, P(rho > k) ~ 2^-k), register
    * state = groupBy(group, register).max(rho), estimate = the
    * standard bias-corrected harmonic mean with the linear-counting
    * small-range correction. At 100 TB the shuffle carries at most
    * m = 2^p rows per group regardless of row count — the whole point
    * of HLL — and map-side combine collapses the fact before exchange.
    *
    * Determinism across engines: the hash is the exact-integer Knuth
    * family ([[kmvHash]]) hardened with two xor-shift rounds — a bare
    * multiplicative hash assigns SEQUENTIAL ids (the common key shape)
    * to registers with a constant stride coprime to m, which packs
    * registers collision-free and wrecks the estimator; the xor of
    * high bits into low breaks that lattice while staying exact
    * integer (the intermediate stays < 2^30, so the second multiply
    * fits int64 in engines that error on overflow). rho comes from
    * the BINARY STRING of the suffix (both engines' bin() emit
    * minimal-width binary, so trailing-zero counting is exact string
    * arithmetic, no float log2 boundary risk); and the harmonic sum
    * Σ2^-rho is a sum of dyadic rationals >= 2^-26 whose partial sums
    * are all exactly representable in double (exponent span + m fits
    * the 53-bit mantissa), so it is order-free without quantization.
    */
  def hllDistinct(df: DataFrame, keyCol: String, groupCols: Seq[String],
                  p: Int = 6): DataFrame = {
    require(p >= 2 && p <= 12, s"hllDistinct: p must be in [2,12], got $p")
    val m = 1 << p
    // alpha_m from the HLL paper; m >= 128 uses the asymptotic form
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val g = groupCols.map(col)
    // pmod, not %: Spark's % keeps the dividend's sign, so a negative
    // int64 key would yield a negative hash and a negative register
    // index — pmod matches kmvHash's floorMod convention and the
    // streaming twin (StreamingOps.hllStream), keeping batch/stream
    // bit-equality for ALL int64 keys, not just non-negative ones
    val h = expr(
      s"((pmod($keyCol, ${KmvMod}L)) * ${KmvMult}L) % ${KmvMod}L")
    val mixed = df.where(col(keyCol).isNotNull)
      .select((g :+ h.as("_h0")): _*)
      .withColumn("_g1", expr("_h0 ^ shiftright(_h0, 15)"))
      .withColumn("_g2", expr(s"(_g1 * ${KmvMult}L) % ${KmvMod}L"))
      .withColumn("_hm", expr("_g2 ^ shiftright(_g2, 15)"))
    val regs = mixed
      .select((g :+ (col("_hm") % lit(m.toLong)).as("_reg") :+
        expr(s"_hm div ${m.toLong}L").as("_w")): _*)
      .withColumn("_rho", when(col("_w") === 0, lit(26))
        .otherwise(length(expr("bin(_w)")) -
          length(expr("trim(TRAILING '0' FROM bin(_w))")) + lit(1)))
      .groupBy((g :+ col("_reg")): _*)
      .agg(max(col("_rho")).as("_mr"))
    val perGroup = regs.groupBy(g: _*)
      .agg(count(lit(1)).as("_v"),
        sum(lit(1.0) / expr("shiftleft(1L, cast(_mr as int))")).as("_sp"))
    val zeros = (lit(m.toLong) - col("_v"))
    val sumAll = col("_sp") + zeros.cast("double")
    val raw = lit(alpha * m * m) / sumAll
    val est = when(raw <= lit(2.5 * m) && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(raw)
    perGroup.select((g :+ zeros.as("zero_regs") :+
      est.as("hll_est")): _*)
  }

  /** HLL set algebra between two cohorts' key sets — union by
    * REGISTER MAX (the HLL identity: the sketch of a union is the
    * elementwise max of the sketches), intersection by
    * inclusion-exclusion, Jaccard from the two — the "how much do
    * these two crawls overlap" readout priced at 2^p longs total,
    * never a join of the key sets. Both cohorts' registers and the
    * union's accumulate in ONE register-domain aggregate (conditional
    * maxes), so the fact is scanned once. Same exact-integer hash,
    * string-binary rho, and dyadic harmonic sums as [[hllDistinct]];
    * each estimate is the same mirrored closed form. Intersection is
    * clamped at 0 (inclusion-exclusion of estimates can go slightly
    * negative for disjoint sets).
    */
  def hllSetOps(df: DataFrame, keyCol: String, cohortCol: String,
                cohortA: String, cohortB: String,
                p: Int = 6): DataFrame = {
    require(p >= 2 && p <= 12, s"hllSetOps: p must be in [2,12], got $p")
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val h = expr(
      s"((pmod($keyCol, ${KmvMod}L)) * ${KmvMult}L) % ${KmvMod}L")
    val mixed = df.where(col(keyCol).isNotNull &&
        col(cohortCol).isin(cohortA, cohortB))
      .select(col(cohortCol).as("_c"), h.as("_h0"))
      .withColumn("_g1", expr("_h0 ^ shiftright(_h0, 15)"))
      .withColumn("_g2", expr(s"(_g1 * ${KmvMult}L) % ${KmvMod}L"))
      .withColumn("_hm", expr("_g2 ^ shiftright(_g2, 15)"))
    val regs = mixed
      .select(col("_c"), (col("_hm") % lit(m.toLong)).as("_reg"),
        expr(s"_hm div ${m.toLong}L").as("_w"))
      .withColumn("_rho", when(col("_w") === 0, lit(26))
        .otherwise(length(expr("bin(_w)")) -
          length(expr("trim(TRAILING '0' FROM bin(_w))")) + lit(1)))
      .groupBy(col("_reg"))
      .agg(max(when(col("_c") === cohortA, col("_rho"))).as("_ma"),
        max(when(col("_c") === cohortB, col("_rho"))).as("_mb"))
    val agg = regs.agg(
      count(col("_ma")).as("_va"),
      sum(when(col("_ma").isNotNull,
        lit(1.0) / expr("shiftleft(1L, cast(_ma as int))"))).as("_spa"),
      count(col("_mb")).as("_vb"),
      sum(when(col("_mb").isNotNull,
        lit(1.0) / expr("shiftleft(1L, cast(_mb as int))"))).as("_spb"),
      count(lit(1)).as("_vu"),
      // coalesce before greatest: engines disagree on greatest's
      // null handling; rho >= 1 makes 0 a neutral floor
      sum(lit(1.0) / expr("shiftleft(1L, cast(greatest(" +
        "coalesce(_ma, 0), coalesce(_mb, 0)) as int))")).as("_spu"))
    def est(v: Column, sp: Column): Column = {
      val zeros = (lit(m.toLong) - v).cast("double")
      // coalesce: an EMPTY cohort has a null harmonic sum (sum over
      // zero rows) — left null it poisons raw and short-circuits the
      // linear-counting branch that correctly returns m·ln(m/m) = 0
      val raw = lit(alpha * m * m) / (coalesce(sp, lit(0.0)) + zeros)
      when(raw <= lit(2.5 * m) && zeros > 0,
        lit(m.toDouble) * log(lit(m.toDouble) / zeros)).otherwise(raw)
    }
    val ea = est(col("_va"), col("_spa"))
    val eb = est(col("_vb"), col("_spb"))
    val eu = est(col("_vu"), col("_spu"))
    val inter = greatest(lit(0.0), ea + eb - eu)
    agg.select(lit(m.toLong).as("m"), ea.as("est_a"), eb.as("est_b"),
      eu.as("est_union"), inter.as("est_intersection"),
      try_divide(inter, eu).as("jaccard_est"))
  }

  /** Chapman capture-recapture population estimate from two
    * INDEPENDENT deterministic hash samples of a keyed corpus —
    * "how big is the population we only see samples of" (dedup's
    * abundance question: overlap between two crawl snapshots bounds
    * the web corpus the same way two net hauls bound the fish):
    *   N̂ = (n₁+1)(n₂+1)/(m+1) − 1,
    * unbiased for m ≥ 0 where Lincoln-Petersen diverges. The two
    * gates MUST be independent — a salt added before a shared multiply
    * yields h₂ = h₁ + const (mod M), perfectly correlated gates, m ≡ 0
    * at disjoint thresholds and N̂ ~ N²/16. Each gate therefore uses
    * its OWN multiplier ([[KmvMult]] vs [[KmvMult2]]) with two
    * xor-shift mixing rounds (the [[hllDistinct]] lattice-breaker);
    * the pair of %100 digits is then equidistributed (property-tested:
    * N̂ within 1% of truth on 2e5 sequential ids). Membership stays
    * reproducible in SQL; all censuses are one conditional-sum pass.
    */
  def captureRecapture(df: DataFrame, keyCol: String,
                       rate1Pct: Int = 25,
                       rate2Pct: Int = 25): DataFrame = {
    require(rate1Pct > 0 && rate1Pct < 100 &&
      rate2Pct > 0 && rate2Pct < 100, "rates in (0,100)")
    def gate(mult: Long, pct: Int) = {
      val h0 = s"(pmod($keyCol, ${KmvMod}L) * ${mult}L) % ${KmvMod}L"
      val g1 = s"(($h0) ^ shiftright($h0, 15))"
      val g2 = s"(($g1 * ${mult}L) % ${KmvMod}L)"
      expr(s"($g2 ^ shiftright($g2, 15)) % 100") < pct
    }
    val g1 = gate(KmvMult, rate1Pct)
    val g2 = gate(KmvMult2, rate2Pct)
    val agg = df.where(col(keyCol).isNotNull)
      .agg(count(lit(1)).as("n_true"),
        sum(when(g1, 1L).otherwise(0L)).as("n1"),
        sum(when(g2, 1L).otherwise(0L)).as("n2"),
        sum(when(g1 && g2, 1L).otherwise(0L)).as("m"))
    def D(c: String) = col(c).cast("double")
    agg.select(col("n_true"), col("n1"), col("n2"), col("m"),
      ((D("n1") + 1) * (D("n2") + 1) / (D("m") + 1) - 1)
        .as("n_chapman"))
  }
}
