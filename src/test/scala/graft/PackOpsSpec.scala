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
}
