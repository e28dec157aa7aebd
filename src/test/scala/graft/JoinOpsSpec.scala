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

  test("asofJoin: backward inclusive, per key, null before first right") {
    val left = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 20L, "c"),
      (2L, 7L, "d")).toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 15L, 200.0), (2L, 9L, 300.0))
      .toDF("k", "rt", "v")
    val out = JoinOps.asofJoin(left, right, Seq("k"), "t", "rt",
        payload = Seq("rt" -> "asof_t", "v" -> "asof_v"), tieCol = "rt")
      .collect().map(r => r.getAs[String]("tag") -> r).toMap
    assert(out("a").getAs[Double]("asof_v") === 100.0) // inclusive tie t=rt=5
    assert(out("b").getAs[Double]("asof_v") === 100.0) // 15 > 10, stays at 5
    assert(out("c").getAs[Double]("asof_v") === 200.0)
    assert(out("d").isNullAt(out("d").fieldIndex("asof_v"))) // 9 > 7: none
  }

  test("asofJoin: greatest tieCol wins among equal right times") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, 1L, 111.0), (1L, 10L, 2L, 222.0))
      .toDF("k", "rt", "seq", "v")
    val out = JoinOps.asofJoin(left, right, Seq("k"), "t", "rt",
      payload = Seq("v" -> "asof_v"), tieCol = "seq").head()
    assert(out.getAs[Double]("asof_v") === 222.0)
  }

  test("rangeJoin matches the naive non-equi join exactly, no dupes") {
    val points = (0 until 200).map(i => (i, i * 0.37)).toDF("pid", "x")
    val intervals = (0 until 40).map(i =>
      (i, i * 1.7, i * 1.7 + 2.5)).toDF("iid", "lo", "hi")
    val binned = JoinOps.rangeJoin(points, intervals, "x", "lo", "hi",
        binWidth = 2.0)
      .select("pid", "iid").as[(Int, Int)].collect().sorted.toSeq
    val naive = points.join(intervals,
        col("x") >= col("lo") && col("x") < col("hi"))
      .select("pid", "iid").as[(Int, Int)].collect().sorted.toSeq
    assert(binned === naive)
    assert(binned.distinct.size === binned.size) // exactly-once per pair
    assert(binned.nonEmpty)
  }

  test("saltedJoin equals the plain join and keys the exchange on the salt") {
    val big = (0 until 2000).map(i => (i % 3, i.toDouble))
      .toDF("k", "v") // key 0/1/2, heavily repeated (the skew shape)
    val dim = Seq((0, "a"), (1, "b"), (2, "c"), (9, "unmatched"))
      .toDF("k", "tag")
    val salted = JoinOps.saltedJoin(big, dim, Seq("k"), salts = 4)
    val plain = big.join(dim, Seq("k"))
    assert(salted.select("k", "v", "tag").as[(Int, Double, String)]
      .collect().sorted.toSeq ===
      plain.select("k", "v", "tag").as[(Int, Double, String)]
        .collect().sorted.toSeq)
    // the shuffle must be keyed on (k, _salt) — that IS the skew split
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = JoinOps.saltedJoin(big, dim, Seq("k"), salts = 4)
        .queryExecution.executedPlan.toString
      assert(plan.contains("_salt"),
        s"salt column vanished from the join plan:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
