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

  /** Per-pack summary (n_docs, tokens) — the capacity/overflow audit. */
  def packStats(packed: DataFrame, tokenCol: String): DataFrame =
    packed.groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum(tokenCol).as("pack_tokens"))
}
