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

  test("similarityPack: cell assignment, distance order, budget boundaries") {
    // two well-separated centroids in 2-D; docs 0-2 near (0,0),
    // docs 10-12 near (10,0); distances force the within-cell order
    // 0 < 1 < 2 and 11 < 10 < 12
    val emb = Seq(
      (0L, Seq(0.0, 0.1)), (1L, Seq(0.0, 0.5)), (2L, Seq(0.9, 0.0)),
      (10L, Seq(10.0, 0.4)), (11L, Seq(10.0, 0.2)), (12L, Seq(9.0, 0.0)))
      .toDF("vec_id", "embedding")
    val docs = Seq((0L, 60L), (1L, 60L), (2L, 60L),
      (10L, 60L), (11L, 60L), (12L, 60L)).toDF("doc_id", "toks")
    val cents = Seq((0L, Array(0.0, 0.0)), (1L, Array(10.0, 0.0)))
    val out = PackOps.similarityPack(docs, "doc_id", "toks",
        emb, "vec_id", "embedding", cents, budget = 100L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("list_id"), r.getAs[Long]("start_tok"),
          r.getAs[Long]("pack_id")))).toMap
    // cell assignment: nearest centroid
    assert(Seq(0L, 1L, 2L).forall(out(_)._1 == 0L))
    assert(Seq(10L, 11L, 12L).forall(out(_)._1 == 1L))
    // within-cell distance order drives the stream offsets
    assert(out(0L)._2 === 0L)   // d^2=0.01
    assert(out(1L)._2 === 60L)  // d^2=0.25
    assert(out(2L)._2 === 120L) // d^2=0.81
    assert(out(11L)._2 === 0L)  // d^2=0.04
    assert(out(10L)._2 === 60L) // d^2=0.16
    assert(out(12L)._2 === 120L) // d^2=1.0
    // packs split every 100 tokens within the cell stream, per cell
    assert(out(0L)._3 === 0L && out(1L)._3 === 0L && out(2L)._3 === 1L)
    assert(out(11L)._3 === PackOps.PackStride)
    assert(out(12L)._3 === PackOps.PackStride + 1L)
    // a pack never mixes cells
    assert(out.values.forall { case (cell, _, pid) =>
      pid / PackOps.PackStride == cell
    })
  }

  test("shuffledPack: exact tiling in shuffled order, reproducible," +
      " and genuinely order-breaking") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, 10L + i % 3))
      .toDF("doc_id", "n_tok")
    val out = PackOps.shuffledPack(docs, "doc_id", "n_tok",
        budget = 100, buckets = 8)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("shuffle_key"), r.getAs[Long]("n_tok"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("pack_id")))
    // exact tiling: sorted by (shuffle_key, id), each start_tok is the
    // running total of everything before it — no gaps, no overlaps
    val ordered = out.sortBy(t => (t._2, t._1))
    var acc = 0L
    for ((_, _, tok, st, _) <- ordered) {
      assert(st === acc); acc += tok
    }
    assert(acc === out.map(_._3).sum)
    // reproducible: a second run is identical
    val again = PackOps.shuffledPack(docs, "doc_id", "n_tok",
        budget = 100, buckets = 8)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("start_tok"))).toMap
    assert(out.forall { case (id, _, _, st, _) => again(id) == st })
    // order-breaking: the shuffled rank order is far from id order
    // (Spearman footrule distance well above a small perturbation)
    val rankByShuffle = ordered.map(_._1).zipWithIndex.toMap
    val footrule = (0L until 200L)
      .map(id => math.abs(rankByShuffle(id) - id)).sum
    assert(footrule > 200L * 200L / 10) // ~uniform permutation scale
  }
}
