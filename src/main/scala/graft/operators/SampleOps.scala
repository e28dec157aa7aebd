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
    keyHash(key) % SplitBuckets

  /** The one multiplicative key hash every deterministic sampler here
    * derives from — [0, HashMod), a pure function of the key. */
  private def keyHash(key: Column): Column =
    pmod(key.cast("long"), lit(TextOps.HashMod)) * SketchOps.KmvMult %
      TextOps.HashMod

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

  /** Deterministic per-group bottom-k sample: the k rows per group
    * whose multiplicative key hash is smallest ((hash, id) order — a
    * reproducible stand-in for "k uniform rows per group", the
    * eyeball-sample / debug-slice every curation run wants without
    * rand()'s nondeterminism). Same hash family as [[splitBucket]], so
    * samples are stable across runs and engines.
    *
    * Scale: the `row_number() <= k` shape is exactly the partial
    * WindowGroupLimit pattern (plan-asserted with the other top-k
    * queries) — at most k rows per group per partition ever shuffle.
    */
  def bottomKSample(df: DataFrame, keys: Seq[String], idCol: String,
                    k: Int): DataFrame = {
    require(k > 0, "bottomKSample needs k > 0")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_h"), col(idCol))
    df.withColumn("_h", keyHash(col(idCol)))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k)
      .withColumn("sample_rank", col("_rn"))
      .drop("_h", "_rn")
  }

  /** Deterministic WEIGHTED per-group sample (Efraimidis-Spirakis
    * A-Res with the hash standing in for the uniform draw): keep the k
    * rows per group with the largest u^(1/w), computed as the
    * monotone-equivalent ln(u)/w (one ln + one division — steadier
    * cross-engine than pow). u = (bucket+0.5)/10000 from the same
    * multiplicative hash family as [[splitBucket]], so a row's draw is
    * a pure function of its key: samples are reproducible across runs,
    * engines, and — the property A-Res is famous for — across
    * re-weightings, where only rows whose RELATIVE weight changed can
    * enter or leave. Weights must be positive.
    *
    * Scale: row_number <= k over (score desc, id) — the partial
    * WindowGroupLimit top-k shape; at most k rows per group per
    * partition shuffle.
    */
  def weightedSample(df: DataFrame, keys: Seq[String], idCol: String,
                     weightCol: String, k: Int): DataFrame = {
    require(k > 0, "weightedSample needs k > 0")
    import org.apache.spark.sql.expressions.Window
    val u = (splitBucket(col(idCol)).cast("double") + 0.5) / SplitBuckets
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_score").desc, col(idCol))
    df.where(col(weightCol) > 0)
      .withColumn("_score", log(u) / col(weightCol).cast("double"))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k)
      .withColumn("sample_rank", col("_rn"))
      .withColumn("sample_score", col("_score"))
      .drop("_score", "_rn")
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

  /** One DoReMi-flavored exponentiated-gradient step over per-domain
    * losses: domains whose documents score a higher mean loss (harder,
    * under-trained) get up-weighted,
    *   w_dom ∝ exp(η · mean_loss_dom),  normalized over domains —
    * the data-mixture re-tuning primitive next to mixture_sample /
    * temperature_mix (which apply a GIVEN mixture; this derives one
    * from measured loss).
    *
    * Exactness: `lossScaledCol` must be a pre-quantized integer (the
    * caller fixes the grid), so the per-domain sums and means are
    * exact and the exp() argument is the identical double everywhere.
    * The normalizer folds the domain weights in DOMAIN-sorted order —
    * a fixed-order fold over a |domains|-bounded list, never a
    * parallel float sum.
    *
    * Plan shape: one hash aggregate to |domains| rows, one 1-row fold,
    * one broadcast join-back. Nothing fact-sized past the first
    * aggregate.
    */
  def domainReweight(df: DataFrame, domainCol: String,
                     lossScaledCol: String, scale: Double,
                     eta: Double): DataFrame = {
    val g = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(lossScaledCol)).as("_sl"))
      .withColumn("mean_loss",
        col("_sl").cast("double") / col("n_docs") / lit(scale))
    // softmax is shift-invariant: subtracting the max mean loss (a
    // 1-row broadcast) keeps every exp() argument <= 0, so a large eta
    // or loss scale can't overflow to Infinity and NaN the weights
    val mx = g.agg(max(col("mean_loss")).as("_mx"))
    val gw = g.crossJoin(broadcast(mx))
      .withColumn("_w", exp(lit(eta) * (col("mean_loss") - col("_mx"))))
    val tot = gw.agg(expr(
      s"""aggregate(array_sort(collect_list(struct($domainCol, _w))),
         |cast(0.0 as double), (acc, x) -> acc + x._w)""".stripMargin)
      .as("_tot"))
    gw.crossJoin(broadcast(tot))
      .select(col(domainCol), col("n_docs"), col("mean_loss"),
        (col("_w") / col("_tot")).as("weight"))
  }

  /** Temperature-scaled mixture resampling (the Gopher / multilingual-
    * LLaMA data-mixing move): acceptance rate per stratum
    * rate_s = sqrt(n_min / n_s) — i.e. target shares ∝ n_s^0.5, the
    * α = 0.5 temperature that upweights tail languages — quantized to
    * a 1e-6 grid and applied through the deterministic
    * [[sampleByRate]] hash gate, so the kept set is reproducible
    * across runs, partitionings and engines (the keep DECISION
    * compares an exact integer bucket to an arithmetic chain both
    * engines evaluate identically).
    *
    * Scale shape: one stratum-count aggregate (|strata| rows), a
    * 1-row global min crossed in (single-row cartesian, bounded by
    * construction), one broadcast rate join, one codegen filter over
    * the corpus. Raising the temperature only ever ADDS rows per
    * stratum (rates nest like sampleByRate's), so re-mixing at 100 TB
    * appends a delta instead of reprocessing.
    */
  def temperatureMix(df: DataFrame, stratumCol: String,
                     keyCol: String): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("_n"))
    val nMin = counts.agg(min(col("_n")).as("_nmin"))
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col(stratumCol),
        (floor(sqrt(col("_nmin").cast("double") / col("_n").cast("double"))
          * lit(1e6)) / lit(1e6)).as("rate"))
    sampleByRate(df.join(broadcast(rates), Seq(stratumCol)), keyCol,
      col("rate"))
  }

  /** Exact-quota stratified sampling: the first `n` rows of each
    * stratum under a deterministic hash order — the "exactly 30 docs
    * per language" eval-set builder that [[sampleByRate]]'s
    * rate-based cousin can't promise (rates give binomial counts).
    * The (hash, id) order makes the selection reproducible across
    * runs, partitionings and engines, and quotas NEST: the top-10 set
    * is a prefix of the top-30 set, so growing an eval set never
    * resamples it.
    *
    * Scale shape: one shuffle on the stratum, and the rank ≤ n filter
    * is the WindowGroupLimit pattern — Spark pushes a partial top-n
    * below the exchange, so each map task forwards at most n rows per
    * stratum, never the stratum's full population.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, "stratifiedSample needs a positive per-stratum quota")
    val hk = TextOps.polyHash(col(idCol).cast("string"))
    val w = Window.partitionBy(col(stratumCol)).orderBy(hk, col(idCol))
    df.withColumn("rk", row_number().over(w)).where(col("rk") <= n)
  }

  /** DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    * score every document by the log importance ratio
    * `log_w = logp_target(x) − logp_raw(x)` between a unigram LM of
    * the target domain (`targetCol == targetLabel`) and one of the
    * complement, then draw k documents WITHOUT replacement with
    * probability ∝ exp(log_w) via deterministic Gumbel-top-k: each
    * doc's key is `log_w + g(id)` where `g = −ln(−ln(u))` and
    * `u = (bucket(id)+0.5)/10000` — reproducible noise from the split
    * hash, no RNG state. Keys are quantized (6 decimals) BEFORE the
    * top-k so the selection is a discrete choice over exact decimal
    * values in any engine.
    *
    * 100 TB story: two linear LM-score passes (vocab-sized count
    * tables, map-side-combined; see unigramLmScore), then top-k by
    * sort+limit — Spark plans TakeOrdered (per-partition bounded
    * heaps merged on the driver, k rows ever moved), NEVER a global
    * sort; the final rank window touches only the k selected rows.
    */
  def dsirSample(docs: DataFrame, idCol: String, textCol: String,
                 targetCol: String, targetLabel: String,
                 k: Int): DataFrame = {
    // Both LMs share ONE exploded word-hash frame: the target and raw
    // scores ride the same scan, the same two count-table joins, and a
    // single per-doc aggregate — not two independent unigramLmScore
    // pipelines (which would explode the corpus twice and double the
    // heaviest shuffle at 100 TB).
    val w = docs
      .withColumn("_dom",
        when(col(targetCol) === targetLabel, lit("t")).otherwise(lit("r")))
      .select(col(idCol), col("_dom"),
        explode(TextOps.wordHashes(col(textCol))).as("wh"))
    val ct = w.filter(col("_dom") === "t")
      .groupBy("wh").agg(count(lit(1)).as("c_t"))
    val cr = w.filter(col("_dom") === "r")
      .groupBy("wh").agg(count(lit(1)).as("c_r"))
    val tt = ct.agg(sum("c_t").as("total_t"), count(lit(1)).as("vocab_t"))
    val tr = cr.agg(sum("c_r").as("total_r"), count(lit(1)).as("vocab_r"))
    val perDoc = w
      .join(ct, Seq("wh"), "left").join(cr, Seq("wh"), "left")
      .crossJoin(broadcast(tt)).crossJoin(broadcast(tr))
      .withColumn("logp_t",
        log((coalesce(col("c_t"), lit(0L)) + 1).cast("double") /
          (col("total_t") + col("vocab_t")).cast("double")))
      .withColumn("logp_r",
        log((coalesce(col("c_r"), lit(0L)) + 1).cast("double") /
          (col("total_r") + col("vocab_r")).cast("double")))
      .groupBy(col(idCol))
      .agg((sum("logp_t") / count(lit(1))).as("logp_target"),
        (sum("logp_r") / count(lit(1))).as("logp_raw"))
    def q6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    val u = (splitBucket(col(idCol)).cast("double") + 0.5) / SplitBuckets
    val scored = perDoc
      .withColumn("log_w", q6(col("logp_target") - col("logp_raw")))
      .withColumn("gumbel_key",
        q6(col("logp_target") - col("logp_raw") - log(-log(u))))
    val top = scored
      .sort(col("gumbel_key").desc, col(idCol)) // TakeOrdered with limit
      .limit(k)
      .select(col(idCol), col("log_w"), col("gumbel_key"))
    // rank over exactly k rows — bounded, not a fact-sized window
    top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("gumbel_key").desc, col(idCol))))
  }
}
