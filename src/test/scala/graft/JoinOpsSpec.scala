package graft

import org.apache.spark.sql.functions._
import graft.operators.JoinOps

/** Port of the reference's join-semantics matrix
  * (/root/reference/tests/test_vis_ddijoin.py:19-107): identity join,
  * disjoint-time join doubles length, conflict detection.
  */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def vis(timeOffset: Int = 0) =
    (for (t <- 0 until 4; b <- 0 until 3)
      yield (t + timeOffset, b, (t * 10 + b).toDouble, t + b * 0.5))
      .toDF("time", "baseline", "v", "w")

  private val keys = Seq("time", "baseline")
  private val values = Seq("v", "w")

  test("join same everything is identity (test_join_same_everything)") {
    val a = vis()
    val j = JoinOps.joinVis(a, vis(), keys, values)
    assert(j.count() === a.count())
    assert(j.except(a).isEmpty && a.except(j).isEmpty)
  }

  test("join of disjoint-time copies doubles length (test_join_different_coords)") {
    val a = vis()
    val b = vis(timeOffset = 100)
    val j = JoinOps.joinVis(a, b, keys, values)
    assert(j.count() === a.count() * 2)
    // rows restricted to a's times equal a
    val jA = j.where($"time" < 100)
    assert(jA.except(a).isEmpty && a.except(jA).isEmpty)
  }

  test("overlapping cells coalesce left-first") {
    val a = Seq((0, 0, 1.0), (0, 1, 2.0)).toDF("time", "baseline", "v")
    val b = Seq((0, 1, 99.0), (0, 2, 3.0)).toDF("time", "baseline", "v")
    val j = JoinOps.joinVis(a, b, keys, Seq("v")).orderBy("baseline")
    assert(j.select("v").as[Double].collect().toSeq === Seq(1.0, 2.0, 3.0))
  }

  test("null cells on one side fill from the other") {
    val a = Seq((0, 0, Option.empty[Double]), (0, 1, Some(2.0)))
      .toDF("time", "baseline", "v")
    val b = Seq((0, 0, Some(7.0)), (0, 1, Option.empty[Double]))
      .toDF("time", "baseline", "v")
    val j = JoinOps.joinVis(a, b, keys, Seq("v")).orderBy("baseline")
    assert(j.select("v").as[Double].collect().toSeq === Seq(7.0, 2.0))
  }

  test("conflict detection counts disagreeing overlap cells") {
    val a = vis()
    val b = vis().withColumn("v",
      when($"time" === 1, $"v" + 1).otherwise($"v"))
    // 3 baselines at time==1 disagree
    assert(JoinOps.joinConflicts(a, b, keys, values) === 3L)
    assert(JoinOps.joinConflicts(a, vis(), keys, values) === 0L)
  }

  test("inputs are not modified by join (test_join_different_coords_inputs_unchanged)") {
    val a = vis()
    val before = a.collect().toSeq
    JoinOps.joinVis(a, vis(100), keys, values).count()
    assert(a.collect().toSeq === before)
  }

  test("semiJoinPrune keeps only referenced dim rows") {
    val dim = Seq((0, "a"), (1, "b"), (2, "c")).toDF("id", "name")
    val fact = Seq((0, 1.0), (0, 2.0), (2, 3.0)).toDF("fid", "x")
    val pruned = JoinOps.semiJoinPrune(dim, fact, "id", "fid")
    assert(pruned.select("id").as[Int].collect().sorted.toSeq === Seq(0, 2))
  }

  test("unionWithKeyRemap renumbers colliding keys past max(a)") {
    val dimA = Seq((0, "x"), (5, "y")).toDF("id", "name")
    val dimB = Seq((0, "p"), (3, "q")).toDF("id", "name")
    val (union, remap) = JoinOps.unionWithKeyRemap(dimA, dimB, "id")
    assert(union.count() === 4)
    val remapped = remap.as[(Long, Long)].collect().toMap
    assert(remapped === Map(0L -> 6L, 3L -> 7L))
    val ids = union.select(col("id").cast("long")).as[Long].collect().sorted
    assert(ids.toSeq === Seq(0L, 5L, 6L, 7L))
  }

  test("remapFactKey rewrites referencing columns through the map") {
    val remap = Seq((0L, 6L), (3L, 7L)).toDF("old_key", "new_key")
    val fact = Seq((0, 1.0), (3, 2.0), (9, 3.0)).toDF("k", "x")
    val out = JoinOps.remapFactKey(fact, "k", remap)
    assert(out.select(col("k").cast("long")).as[Long].collect().sorted.toSeq
      === Seq(6L, 7L, 9L))
  }
}
