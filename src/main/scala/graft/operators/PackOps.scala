package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget packs
  * (training contexts) deterministically and in parallel.
  *
  * Packing is inherently order-dependent, so a single global stream
  * would serialize on one partition. Instead the corpus is hash-
  * sharded (`shards` independent streams — the cluster-width knob);
  * within a shard, docs are laid out in key order and each doc joins
  * the pack where its first token lands (offset-addressed packing:
  * pack boundaries every `budget` tokens of the shard's running
  * stream; a doc straddling a boundary stays in the pack it starts
  * in, so a pack overflows by at most one document — the loader-side
  * truncate/continue convention).
  *
  * Plan shape: one window aggregate partitioned by shard. No global
  * sort, no driver state; every column is exact integer math the
  * driver oracle replays as a SQL window.
  */
object PackOps {

  val PackStride = 1000000000L // pack_id = shard * stride + seq within shard

  /** Adds (shard, start_tok, pack_id) for each row. `tokenCol` is the
    * row's token count; `budget` the pack capacity in tokens.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Long, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0)
    val w = Window.partitionBy("shard").orderBy(idCol)
    df.withColumn("shard",
        (SampleOps.splitBucket(col(idCol)) % shards).cast("long"))
      .withColumn("start_tok",
        sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("pack_id",
        col("shard") * PackStride +
          floor(col("start_tok") / budget).cast("long"))
  }

  /** Similarity-ordered sequence packing — the in-context-pretraining
    * layout (Shi et al. 2023: train on sequences of RELATED documents
    * instead of hash-random neighbors). Each document's embedding is
    * assigned to its nearest trained centroid (the IVF coarse
    * quantizer, a closure-embedded codegen argmin — one scan, no
    * shuffle for the assignment), documents are laid out within the
    * cell by (quantized distance to the centroid asc, id), and that
    * order packs greedily into token-budget sequences with the same
    * offset-addressed boundaries as [[packSequences]] — so a pack's
    * members share a semantic neighborhood by construction.
    *
    * Plan shape: one broadcast join (k centroid rows), one window
    * aggregate partitioned by cell. The per-cell sort is the
    * operator's contract (a total order within each neighborhood);
    * cell sizes are bounded by sizing k to the corpus, exactly like
    * the IVF lists it reuses. Output adds (list_id, centroid_dist,
    * start_tok, pack_id).
    *
    * CONTRACT: `docs.idCol` and `emb.embIdCol` must align 1:1 — the
    * doc<->embedding join is INNER, so a document without an embedding
    * row is dropped from the packing (and an embedding without a
    * document contributes nothing). Run the id-alignment audit
    * (ValidateOps / fk_orphans) upstream if the two tables come from
    * independent pipelines; packing is a layout op, not a reconciler.
    */
  def similarityPack(docs: DataFrame, idCol: String, tokenCol: String,
                     emb: DataFrame, embIdCol: String, vecCol: String,
                     cents: Seq[(Long, Array[Double])], budget: Long,
                     qdec: Int = 8): DataFrame = {
    require(budget > 0, s"similarityPack budget must be positive: $budget")
    require(cents.nonEmpty,
      "similarityPack needs a non-empty centroid table (trainIvf on an " +
        "empty embedding corpus yields none)")
    val spark = docs.sparkSession
    import spark.implicits._
    val scale = math.pow(10, qdec)
    val centDf = cents.map { case (id, v) => (id, v.toSeq) }
      .toDF("list_id", "_cv")
    val vecD = col(vecCol).cast(
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))
    val assigned = emb
      .select(col(embIdCol).as(idCol), vecD.as("_v"))
      .withColumn("list_id",
        graft.functions.NearestCentroidId(col("_v"), cents))
      .join(broadcast(centDf), Seq("list_id"))
      .withColumn("centroid_dist",
        floor(graft.functions.SquaredDistance(col("_v"), col("_cv"))
          * lit(scale) + lit(0.5)) / lit(scale))
      .select(col(idCol), col("list_id"), col("centroid_dist"))
    val w = Window.partitionBy("list_id")
      .orderBy(col("centroid_dist"), col(idCol))
    docs.join(assigned, Seq(idCol))
      .withColumn("start_tok",
        sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("pack_id",
        col("list_id") * PackStride +
          floor(col("start_tok") / budget).cast("long"))
  }

  /** Per-pack summary (n_docs, tokens) — the capacity/overflow audit. */
  def packStats(packed: DataFrame, tokenCol: String): DataFrame =
    packed.groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum(tokenCol).as("pack_tokens"))

  /** EXACT global running total of `tokenCol` in `idCol` order — the
    * distributed prefix-sum (scan) primitive Spark has no operator
    * for, without ever materializing a single global sort partition.
    *
    * Two-phase scan: rows are bucketed by a MONOTONE function of the
    * id (bucket = floor(id * buckets / (max_id + 1)) — order-preserving
    * across buckets, deterministic, no sampled range boundaries), each
    * bucket computes its local window cumsum, and each bucket's start
    * offset is the running total of the (buckets-sized, broadcast)
    * per-bucket sums. Output = input + `start_tok` (global tokens
    * strictly before the row) — so downstream sharding/packing reads
    * an exact global layout.
    *
    * 100 TB story: one tiny aggregate for max_id, one hash aggregate
    * for per-bucket totals (buckets rows — the offset table stays
    * dimension-sized and broadcasts), one shuffle to bucket + an
    * in-bucket sort for the window. No global Window.orderBy (which
    * would serialize the corpus through one partition), no driver
    * loop. Dense-ish ids spread evenly; for adversarially-clustered
    * ids swap the monotone bucketer for quantile boundaries upstream.
    */
  def globalCumsum(df: DataFrame, idCol: String, tokenCol: String,
                   buckets: Int = 32): DataFrame = {
    require(buckets > 0)
    val mm = df.agg(min(col(idCol)).cast("long"), max(col(idCol)).cast("long"))
      .head()
    // empty input: any width works (no rows to bucket)
    val mx = (if (mm.isNullAt(1)) 0L else mm.getLong(1)) + 1
    require(mm.isNullAt(0) || mm.getLong(0) >= 0,
      s"globalCumsum needs non-negative $idCol (DIV bucketing monotonicity)")
    // exact integer DIV by a width, not id * buckets (which overflows
    // Long for snowflake-scale ids), and never a double `/` (which
    // rounds above 2^53): bucket = id DIV ceil(mx / buckets),
    // monotone in id with range [0, buckets)
    val width = math.max(1L, (mx + buckets - 1) / buckets)
    val withB = df.withColumn("_b",
      expr(s"CAST($idCol AS BIGINT) DIV $width"))
    val offsets = withB.groupBy("_b")
      .agg(sum(col(tokenCol)).as("_btok"))
      .withColumn("_offset",
        coalesce(sum(col("_btok")).over(
          Window.orderBy("_b").rowsBetween(
            Window.unboundedPreceding, -1)), lit(0L)))
      .select("_b", "_offset") // buckets rows: broadcast side
    // ROWS frame, not the default RANGE frame: RANGE gives every row
    // of a tied id group the full group total, silently corrupting
    // start_tok for duplicate ids. With the ROWS frame duplicates
    // instead get distinct consecutive offsets; ids are REQUIRED
    // unique for a well-defined global order (asserted by callers /
    // property tests — duplicates have no meaningful cumsum position).
    val w = Window.partitionBy("_b").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(offsets), Seq("_b"))
      .withColumn("start_tok",
        col("_offset") + sum(col(tokenCol)).over(w) - col(tokenCol))
      .drop("_b", "_offset")
  }

  /** Token-budget sharding in exact global id order: shard k holds the
    * rows whose global token prefix lands in [k*budget, (k+1)*budget)
    * — balanced training shards with at most one boundary-straddling
    * document each (the loader truncate/continue convention), laid out
    * identically no matter the cluster width. Cost = [[globalCumsum]].
    */
  def shardByTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
                         budget: Long, buckets: Int = 32): DataFrame = {
    require(budget > 0)
    // integer DIV: `/` is double division, which rounds the shard id
    // once the global token prefix passes 2^53
    globalCumsum(df, idCol, tokenCol, buckets)
      .withColumn("shard", expr(s"start_tok DIV $budget"))
  }

  /** Deterministic global SHUFFLE + token-budget packing — the
    * training-order layout step: a pretraining corpus must be read in
    * pseudorandom document order (breaking crawl/source/temporal
    * locality that biases SGD) yet REPRODUCIBLY, so a re-run or a
    * resumed job sees the identical order. Order = (shuffle_key, id)
    * where shuffle_key is the house multiplicative hash (pure
    * function of the id — no rand(), replayable in any engine);
    * positions are the exact two-phase prefix sum of
    * [[globalCumsum]] re-keyed to the HASH domain: bucket = key DIV
    * width is monotone in the shuffled order, offsets are a
    * buckets-row broadcast, the rank window partitions by bucket —
    * no global window, no driver sort, no skew (the multiplicative
    * hash spreads any id distribution uniformly over [0, M)).
    * Output adds (shuffle_key, start_tok, pack_id).
    *
    * CONTRACT: ids must be UNIQUE — the same requirement (and for the
    * same reason) as [[globalCumsum]]: the intra-bucket order is
    * (shuffle_key, id), and shuffle_key is a pure function of the id,
    * so duplicate ids tie on BOTH keys and their relative start_tok
    * would differ across runs, breaking the reproducible-order claim.
    * Callers keyed by a dedup'd corpus satisfy this by construction;
    * anything else should `require` distinctness first.
    */
  def shuffledPack(df: DataFrame, idCol: String, tokenCol: String,
                   budget: Long, buckets: Int = 32): DataFrame = {
    require(budget > 0 && buckets > 0)
    val m = graft.operators.TextOps.HashMod
    val mult = graft.operators.SketchOps.KmvMult
    val width = (m + buckets - 1) / buckets
    val withK = df
      .withColumn("shuffle_key",
        pmod(col(idCol).cast("long"), lit(m)) * lit(mult) % lit(m))
      .withColumn("_b", expr(s"shuffle_key DIV $width"))
    val offsets = withK.groupBy("_b")
      .agg(sum(col(tokenCol)).as("_btok"))
      .withColumn("_offset",
        coalesce(sum(col("_btok")).over(
          Window.orderBy("_b").rowsBetween(
            Window.unboundedPreceding, -1)), lit(0L)))
      .select("_b", "_offset") // buckets rows: broadcast side
    withK.join(broadcast(offsets), Seq("_b"))
      .withColumn("start_tok",
        col("_offset") + coalesce(sum(col(tokenCol)).over(
          Window.partitionBy("_b")
            .orderBy(col("shuffle_key"), col(idCol))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pack_id", expr(s"start_tok DIV $budget"))
      .drop("_b", "_offset")
  }
}
