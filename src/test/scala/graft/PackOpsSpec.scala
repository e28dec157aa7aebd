package graft

import org.apache.spark.sql.functions._
import graft.operators.PackOps

class PackOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pack: offset rule, bounded overflow, shard independence") {
    // one shard so the stream layout is fully predictable
    val docs = Seq((0L, 100L), (7L, 100L), (14L, 100L), (21L, 30L),
      (28L, 200L), (35L, 10L))
      .toDF("doc_id", "toks")
    val out = PackOps.packSequences(docs, "doc_id", "toks",
        budget = 256, shards = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("pack_id")))
    // running starts: 0,100,200,300,330,530
    assert(out.map(_._2).toSeq === Seq(0L, 100L, 200L, 300L, 330L, 530L))
    // packs every 256 tokens of the stream: 0,0,0,1,1,2
    assert(out.map(_._3).toSeq === Seq(0L, 0L, 0L, 1L, 1L, 2L))
    // overflow bound: a pack exceeds budget by < the doc that straddles
    val stats = PackOps.packStats(
      PackOps.packSequences(docs, "doc_id", "toks", 256, 1), "toks")
      .collect().map(r => r.getAs[Long]("pack_tokens"))
    assert(stats.forall(_ <= 256 + 200))
  }

  test("pack: deterministic under repartitioning, shards partition ids") {
    val docs = (0L until 400L).map(i => (i, 1L + i % 50))
      .toDF("doc_id", "toks")
    val a = PackOps.packSequences(docs, "doc_id", "toks", 128, 8)
    val b = PackOps.packSequences(docs.repartition(11), "doc_id", "toks",
      128, 8)
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
    // every doc_id in exactly one shard; shard = bucket mod 8
    assert(a.select("shard").distinct().count() === 8)
    assert(a.filter(floor(col("pack_id") / PackOps.PackStride)
      =!= col("shard")).count() === 0)
  }

  test("globalCumsum: exact global prefix over sparse, clustered ids") {
    // clustered ids stress the monotone bucketer: most land in few
    // buckets, some buckets are empty — offsets must still chain.
    val rows = (Seq(3L, 4L, 5L, 6L) ++ Seq(900L, 901L) ++ Seq(9999L))
      .map(i => (i, i % 7 + 1))
    val df = rows.toDF("doc_id", "n").repartition(5)
    val out = PackOps.globalCumsum(df, "doc_id", "n", buckets = 8)
      .orderBy("doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("start_tok"))
    val expect = rows.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (id, n)) => (id, acc + n) }
      .dropRight(1).zip(rows.sortBy(_._1))
      .map { case ((_, acc), (id, _)) => id -> acc }
    assert(out.toSeq === expect)
  }

  test("globalCumsum: explicit ROWS frame keeps tied ids at distinct offsets") {
    // ids are contractually unique, but the window frame must still be
    // ROWS: the default RANGE frame hands every member of a tied id
    // group the full group total (here both rows would start at 5
    // and no row at 0). The multiset of offsets pins the frame.
    val df = Seq((7L, 5L), (7L, 5L), (9L, 3L)).toDF("doc_id", "n")
      .repartition(3)
    val out = PackOps.globalCumsum(df, "doc_id", "n", buckets = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_tok")))
    assert(out.filter(_._1 == 7L).map(_._2).sorted.toSeq === Seq(0L, 5L))
    assert(out.find(_._1 == 9L).get._2 === 10L)
  }

  test("shardByTokenBudget: shards are contiguous global token ranges") {
    val docs = (0L until 300L).map(i => (i, 10L)).toDF("doc_id", "n")
    val out = PackOps.shardByTokenBudget(docs, "doc_id", "n",
        budget = 500, buckets = 16)
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard")))
    // 10 tokens/doc, 500/shard -> 50 docs per shard, in id order
    assert(out.forall { case (id, s) => s === id / 50 })
  }
}
