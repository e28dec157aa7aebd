package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SimpleMode

/** Plan-regression tripwire (round-3 verdict item 7): structural
  * invariants of the hot physical plans, asserted in CI so churn
  * can't silently reintroduce a cartesian product, a shuffle on a
  * bucket-co-located join, or a non-broadcast dimension join. Plans
  * are checked as explain strings — robust across AQE wrapping.
  */
class PlanInvariantsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Queries.all(name).fn(spark, d).queryExecution
      .explainString(SimpleMode)

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(SimpleMode)

  // Every fact-path query that must never degenerate to a cartesian
  // product. ann_topk and friends are EXCLUDED by design: their
  // brute-force all-pairs scan is the declared exact baseline.
  private val noCartesian = Seq(
    "chan_average", "apply_flags", "join_vis", "split_dataset",
    "flag_summary", "imaging_weight_briggs", "dedup_exact", "url_dedup",
    "line_dedup", "shard_by_tokens", "semantic_dedup", "dsir_sample",
    "reframe", "auto_tfcrop", "stream_enrich", "asof_join",
    "degrid_vis_join", "dedup_minhash", "decontaminate_bloom")

  test("no CartesianProduct in any fact-path plan") {
    for (name <- noCartesian) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plan degenerated to a cartesian product:\n$p")
    }
  }

  test("bucketed_join: the join itself reads bucketed scans with no Exchange below it") {
    val p = plan("bucketed_join")
    // the join must consume the two bucketed scans without a SHUFFLE
    // under it. At tiny SF the optimizer may broadcast the dimension
    // side instead of bucket-wise sort-merge — also shuffle-free, also
    // fine; what must never appear below the join is an
    // `Exchange hashpartitioning` repartitioning a bucketed scan.
    val joinIdx = math.max(p.indexOf("SortMergeJoin"), p.indexOf("BroadcastHashJoin"))
    assert(joinIdx >= 0, s"expected a shuffle-free join over buckets:\n$p")
    val below = p.substring(joinIdx)
    assert(!below.contains("Exchange hashpartitioning"),
      s"shuffle reintroduced under the bucketed join:\n$p")
    assert(below.contains("Bucketed: true"),
      s"join no longer reads bucketed scans:\n$p")
  }

  test("dimension joins broadcast the dimension side") {
    for (name <- Seq("stream_enrich", "split_mxds", "apply_gains")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$name dimension join is no longer broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$name shuffles a dimension join:\n$p")
    }
  }

  test("degrid join path is a real distributed join, not a driver collect") {
    // construct the join path directly: the grid side must appear as a
    // join operand in the plan (the broadcast path, by contrast,
    // collects the grid eagerly and its plan is a pure projection)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vis = (0 until 50).map { i =>
      (0, 0, i * 0.1 - 2.5, i * 0.07 - 1.75, 1.0, 0.0, 1.0, 1.5e9)
    }.toDF("img_chan", "pol", "u", "v", "re", "im", "weight", "freq")
      .withColumn("rid", monotonically_increasing_id())
    val p32 = operators.GridOps.GridParams((32, 32), (0.002, 0.002))
    val (grid, _) = operators.GridOps.makeGrid(spark, vis, p32)
    val joined = operators.GridOps.degridVisJoin(vis, grid, p32, Seq("rid"))
    val p = planOf(joined)
    assert(p.contains("Join"), s"degrid join path lost its join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"degrid join degenerated to cartesian:\n$p")
  }

  test("filter pushdown reaches the parquet scan on a partition-pruned read") {
    val df = Tables.lineitem(spark, d).where("l_linenumber = 3")
      .select("l_orderkey", "l_quantity")
    val p = planOf(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_linenumber), EqualTo(l_linenumber,3)]")
      || p.contains("EqualTo(l_linenumber,3)"),
      s"filter no longer pushed to the scan:\n$p")
    assert(p.contains("ReadSchema") &&
      !p.substring(p.indexOf("ReadSchema")).takeWhile(_ != '\n').contains("l_comment"),
      s"column pruning lost — scan reads unprojected columns:\n$p")
  }
}
