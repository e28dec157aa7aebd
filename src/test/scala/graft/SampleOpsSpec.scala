package graft

import org.apache.spark.sql.functions._
import graft.operators.SampleOps

class SampleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: proportions, determinism, group coherence") {
    val keys = (0L until 10000L).toDF("user_id")
    val out = SampleOps.hashSplit(keys, "user_id",
      Seq(0.8, 0.1, 0.1), Seq("train", "val", "test"))
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 10000L)
    assert(math.abs(counts("train") - 8000L) < 300, counts)
    assert(math.abs(counts("val") - 1000L) < 150, counts)
    assert(math.abs(counts("test") - 1000L) < 150, counts)
    // determinism across evaluations
    assert(SampleOps.hashSplit(keys, "user_id", Seq(0.8, 0.1, 0.1),
      Seq("train", "val", "test")).except(out).count() === 0)
    // group coherence: many rows per key, one split per key
    val grouped = keys.crossJoin(Seq(1, 2, 3).toDF("rep"))
    val g = SampleOps.hashSplit(grouped, "user_id",
      Seq(0.5, 0.5), Seq("a", "b"))
    assert(g.select("user_id", "split").distinct().count() === 10000L)
  }

  test("sampleByRate: per-row rates, nesting when a rate is raised") {
    val df = (0L until 4000L)
      .map(k => (k, if (k % 2 == 0) "hi" else "lo")).toDF("k", "grp")
    val rate = when(col("grp") === "hi", 0.9).otherwise(0.1)
    val out = SampleOps.sampleByRate(df, "k", rate)
    val counts = out.groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("hi") - 1800L) < 150, counts)
    assert(math.abs(counts("lo") - 200L) < 100, counts)
    // raising lo's rate to 0.3 only ADDS rows (incremental retuning)
    val raised = SampleOps.sampleByRate(df, "k",
      when(col("grp") === "hi", 0.9).otherwise(0.3))
    assert(out.except(raised).count() === 0)
  }

  test("sampleByHash: approximate fraction and nested subsets") {
    val keys = (0L until 10000L).toDF("k")
    val s10 = SampleOps.sampleByHash(keys, "k", 0.10)
    val s20 = SampleOps.sampleByHash(keys, "k", 0.20)
    assert(math.abs(s10.count() - 1000L) < 150)
    assert(math.abs(s20.count() - 2000L) < 200)
    // threshold sampling nests: the 10% sample is inside the 20% one
    assert(s10.except(s20).count() === 0)
  }

  test("dsirSample prefers target-domain-like docs, deterministic") {
    // target domain speaks 'aaa bbb'; raw domain speaks 'xxx yyy'.
    // Unlabeled docs 100-103 mimic the target, 104-107 the raw side.
    val docs = ((0L until 8L).map(i => (i, "tgt", "aaa bbb aaa bbb")) ++
      (8L until 16L).map(i => (i, "raw", "xxx yyy xxx yyy")) ++
      (100L until 104L).map(i => (i, "pool", "aaa bbb aaa")) ++
      (104L until 108L).map(i => (i, "pool", "xxx yyy xxx")))
      .toDF("doc_id", "domain", "text")
    val out = SampleOps.dsirSample(docs, "doc_id", "text",
      "domain", "tgt", k = 30)
    val byId = out.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_w")).toMap
    // every target-mimic outweighs every raw-mimic
    val mimicT = (100L until 104L).map(byId)
    val mimicR = (104L until 108L).map(byId)
    assert(mimicT.min > mimicR.max)
    // deterministic: a rerun selects the identical ranked set
    val again = SampleOps.dsirSample(docs, "doc_id", "text",
      "domain", "tgt", k = 30)
    assert(out.except(again).count() === 0 &&
      again.except(out).count() === 0)
  }
}
