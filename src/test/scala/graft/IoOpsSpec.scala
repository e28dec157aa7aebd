package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.IoOps

class IoOpsSpec extends SparkSpec {
  import spark.implicits._

  private def vis = (for (ddi <- 0 until 2; t <- 0 until 5; b <- 0 until 3)
    yield (ddi, t, b, t * 10.0 + b)).toDF("ddi", "time", "baseline", "v")

  test("writeVis/readVis round-trip is lossless and partition-prunes") {
    val dir = Files.createTempDirectory("graft_io").toString + "/store"
    IoOps.writeVis(vis, dir, partitionBy = Seq("ddi"))
    val all = IoOps.readVis(spark, dir)
    assert(all.count() === vis.count())
    val pruned = IoOps.readVis(spark, dir, Map("ddi" -> Seq(1)))
    assert(pruned.count() === 15)
    // pruning reaches the plan: only one partition directory is scanned
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || pruned.count() == 15)
    // values survive exactly
    val got = pruned.orderBy("time", "baseline").select("v").as[Double].collect()
    val want = vis.where($"ddi" === 1).orderBy("time", "baseline")
      .select("v").as[Double].collect()
    assert(got.toSeq === want.toSeq)
  }

  test("describeVis summarizes per partition") {
    val df = vis.withColumn("chan", lit(0)).withColumn("pol", lit(0))
    val out = IoOps.describeVis(df, "ddi", "time", "baseline", "chan", "pol")
      .collect()
    assert(out.length === 2)
    assert(out.head.getAs[Long]("rows") === 15)
    assert(out.head.getAs[Long]("times") === 5)
    assert(out.head.getAs[Long]("baselines") === 3)
  }

  test("sidecar column append joins back without rewriting the base") {
    val dir = Files.createTempDirectory("graft_io").toString
    val base = dir + "/base"
    val side = dir + "/side"
    IoOps.writeVis(vis, base)
    val newCols = vis.select($"ddi", $"time", $"baseline",
      ($"v" * 2).as("v2"))
    IoOps.appendColumns(vis, side, Seq("ddi", "time", "baseline"), newCols)
    val joined = IoOps.readWithSidecar(spark, base, side,
      Seq("ddi", "time", "baseline"))
    assert(joined.columns.contains("v2"))
    assert(joined.where($"v2" =!= $"v" * 2).count() === 0)
  }

  test("compactSidecar merges base + sidecar into a join-free store") {
    val dir = Files.createTempDirectory("graft_io").toString
    val (base, side, out) = (dir + "/base", dir + "/side", dir + "/out")
    val keys = Seq("ddi", "time", "baseline")
    IoOps.writeVis(vis, base)
    IoOps.appendColumns(vis, side, keys,
      vis.select($"ddi", $"time", $"baseline", ($"v" * 2).as("v2")))
    IoOps.compactSidecar(spark, base, side, keys, out)
    val compacted = spark.read.parquet(out)
    val joined = IoOps.readWithSidecar(spark, base, side, keys)
    assert(compacted.count() === joined.count())
    assert(compacted.columns.sorted.toSeq === joined.columns.sorted.toSeq)
    assert(compacted.where($"v2" =!= $"v" * 2).count() === 0)
    // no join in the compacted read plan
    assert(!compacted.queryExecution.executedPlan.toString.contains("Join"))
  }

  test("bucketed join: co-located, no shuffle on either side") {
    val dir = Files.createTempDirectory("graft_bkt").toString
    val facts = (0 until 100).map(i => (i % 10, i.toDouble))
      .toDF("key", "v")
    val dims = (0 until 10).map(i => (i, s"dim_$i")).toDF("dkey", "name")
    IoOps.writeVisBucketed(facts, "bkt_facts_t", s"$dir/facts",
      Seq("key"), numBuckets = 4)
    IoOps.writeVisBucketed(dims, "bkt_dims_t", s"$dir/dims",
      Seq("dkey"), numBuckets = 4)
    // force the sort-merge path (broadcast would hide the bucketing)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.table("bkt_facts_t")
      val b = spark.table("bkt_dims_t")
      val joined = a.join(b, a("key") === b("dkey"))
      assert(joined.count() === 100)
      // the whole point: bucketed+sorted layout joins with NO exchange
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("writeTable/readTable: ORC keeps types, JSONL needs the writer's schema") {
    import spark.implicits._
    val src = Seq((1L, 2, "x", 1.5), (2L, 3, "y", -0.25))
      .toDF("id", "k", "tag", "v")
    val orcPath = "/tmp/graft_iospec_orc"
    IoOps.writeTable(src, orcPath, "orc")
    val orc = IoOps.readTable(spark, orcPath, "orc")
    // compare names+types; nullability flags legitimately relax on read
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(orc) === shape(src))
    assert(orc.as[(Long, Int, String, Double)].collect().sorted.toSeq ===
      Seq((1L, 2, "x", 1.5), (2L, 3, "y", -0.25)))
    val jPath = "/tmp/graft_iospec_jsonl"
    IoOps.writeTable(src.drop("v"), jPath, "json")
    // with the writer's schema the integer types survive exactly
    val j = IoOps.readTable(spark, jPath, "json",
      Some(src.drop("v").schema))
    assert(shape(j) === shape(src.drop("v")))
    assert(j.as[(Long, Int, String)].collect().sorted.toSeq ===
      Seq((1L, 2, "x"), (2L, 3, "y")))
    // without it, inference widens: the round-trip contract is REAL
    val inferred = IoOps.readTable(spark, jPath, "json")
    assert((inferred.schema("id").dataType != src.schema("id").dataType) ||
      (inferred.schema("k").dataType != src.schema("k").dataType))
  }

  test("mergeUpsert: update replaces, delete drops, insert appends, rest survives") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "tag", "v")
    val changes = Seq(
      (2L, "b2", 99.0, false), // update
      (3L, "c", 30.0, true),   // delete
      (4L, "d", 40.0, false))  // insert
      .toDF("id", "tag", "v", "_del")
    val out = IoOps.mergeUpsert(target, changes, Seq("id"),
        deleteCol = Some("_del"))
      .as[(Long, String, Double)].collect().sorted.toSeq
    assert(out === Seq((1L, "a", 10.0), (2L, "b2", 99.0), (4L, "d", 40.0)))
  }

  test("deletion vector: predicate delete == filtered complement, row-identical") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dv").toString + "/store"
    val src = (1 to 100).map(i => (i.toLong, i % 7, s"r$i"))
      .toDF("id", "m", "tag")
    IoOps.writeVis(src, dir, repartitionTo = Some(3))
    val lin = IoOps.readWithLineage(spark, dir)
    val dv = IoOps.buildDeleteVector(lin, $"m" === 3)
    val got = IoOps.applyDeleteVector(lin, dv)
    assert(got.count() === src.where($"m" =!= 3).count())
    assert(got.exceptAll(src.where($"m" =!= 3)).count() === 0)
    assert(src.where($"m" =!= 3).exceptAll(got).count() === 0)
    // no lineage columns leak into the served schema
    assert(!got.columns.exists(c => c == "_file" || c == "_pos"))
  }

  test("deletion vector addresses physical rows: one (file,pos) drops exactly that row") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dv1").toString + "/store"
    val src = (1 to 50).map(i => (i.toLong, s"r$i")).toDF("id", "tag")
    IoOps.writeVis(src, dir, repartitionTo = Some(4))
    val lin = IoOps.readWithLineage(spark, dir)
    val victim = lin.where($"id" === 17L)
      .select($"_file", $"_pos").collect()
    assert(victim.length === 1)
    val dv = Seq((victim.head.getString(0), victim.head.getLong(1)))
      .toDF("_file", "_pos")
    val got = IoOps.applyDeleteVector(lin, dv)
    assert(got.count() === 49)
    assert(got.where($"id" === 17L).count() === 0)
  }

  test("bloom index: genuine file skipping, no false negatives, exact reads") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_bloom").toString + "/store"
    // 8 range-partitioned files over 800 keys -> a point key lives in 1
    val src = (1L to 800L).map(i => (i, s"v$i")).toDF("id", "tag")
    src.repartitionByRange(8, $"id").write.parquet(dir)
    val idx = IoOps.bloomIndex(spark, dir, "id", bits = 4096, hashes = 3)
    val nFiles = idx.count()
    assert(nFiles === 8)
    // present keys: candidates must be a strict subset of the files
    val cand = IoOps.bloomProbeFiles(idx, Seq(17L, 600L), 4096, 3)
    assert(cand.nonEmpty && cand.size < nFiles)
    // read equality vs the direct filter (no false negatives)
    val got = IoOps.bloomSkipRead(spark, dir, idx, "id",
      Seq(17L, 600L), 4096, 3)
    val want = src.where($"id".isin(17L, 600L))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
    // an absent key returns empty (bloom may pass files; the exact
    // re-filter drops the rows)
    assert(IoOps.bloomSkipRead(spark, dir, idx, "id",
      Seq(100000L), 4096, 3).count() === 0)
    // an empty key list short-circuits to an empty frame, not an error
    assert(IoOps.bloomSkipRead(spark, dir, idx, "id",
      Nil, 4096, 3).count() === 0)
    // probing with mismatched (bits, hashes) would compute different
    // positions -> silent false negatives; the recorded build params
    // make it fail loudly instead
    intercept[IllegalArgumentException](
      IoOps.bloomProbeFiles(idx, Seq(17L), bits = 8192, hashes = 3))
    intercept[IllegalArgumentException](
      IoOps.bloomProbeFiles(idx, Seq(17L), bits = 4096, hashes = 2))
  }

  test("snapshot manifest: one planning read serves zone + bloom + DV" +
      " legs; genuine pruning; per-version DV visibility") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_man").toString
    val (base, dvRoot, manRoot) =
      (root + "/base", root + "/dv", root + "/man")
    // 8 range-partitioned files over 800 keys
    val src = (1L to 800L).map(i => (i, i % 10, s"v$i"))
      .toDF("id", "m", "tag")
    src.repartitionByRange(8, $"id").write.parquet(base)
    val lin = IoOps.readWithLineage(spark, base)
    IoOps.commitDeleteVector(
      IoOps.buildDeleteVector(lin, $"m" === 0), dvRoot, version = 1)
    IoOps.commitManifest(spark, base, manRoot, version = 1,
      keyCol = "id", statsCols = Seq("id", "m"), dvVersion = 1,
      bits = 4096)
    val man = IoOps.readManifest(spark, manRoot, 1)
    assert(man.count() === 8)
    // zone pruning: a tight id range keeps ~1 file of 8
    val zoneFiles = IoOps.manifestCandidateFiles(man, Nil,
      Seq(("id", 10.0, 20.0)))
    assert(zoneFiles.nonEmpty && zoneFiles.size < 8)
    // bloom pruning: a point key keeps a strict subset
    val keyFiles = IoOps.manifestCandidateFiles(man, Seq(17L), Nil)
    assert(keyFiles.nonEmpty && keyFiles.size < 8)
    // combined read = exact predicate + DV applied
    val got = IoOps.manifestRead(spark, base, manRoot, 1, Some(dvRoot),
      "id", keys = Seq(17L, 600L, 100000L), ranges = Seq(("id", 1.0, 700.0)))
    val want = src.where($"id".isin(17L, 600L) && $"m" =!= 0)
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
    // a second snapshot with more deletes: each manifest version
    // serves its own DV visibility
    IoOps.commitDeleteVector(
      IoOps.buildDeleteVector(lin, $"m" <= 1), dvRoot, version = 2)
    IoOps.commitManifest(spark, base, manRoot, version = 2,
      keyCol = "id", statsCols = Seq("id", "m"), dvVersion = 2,
      bits = 4096)
    val v1 = IoOps.manifestRead(spark, base, manRoot, 1, Some(dvRoot),
      "id", Nil, Nil)
    val v2 = IoOps.manifestRead(spark, base, manRoot, 2, Some(dvRoot),
      "id", Nil, Nil)
    assert(v1.count() === 720) // m == 0 hidden
    assert(v2.count() === 640) // m <= 1 hidden
    // an uncommitted version fails loudly, never serves stale data
    intercept[IllegalArgumentException](
      IoOps.manifestRead(spark, base, manRoot, 3, Some(dvRoot),
        "id", Nil, Nil))
  }

  test("time travel: versioned DV commits read AS OF, idempotent overlaps, purge compacts") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_tt").toString
    val (base, dvRoot, out) = (root + "/base", root + "/dv", root + "/out")
    val src = (1 to 100).map(i => (i.toLong, i % 10)).toDF("id", "m")
    IoOps.writeVis(src, base, repartitionTo = Some(2))
    val lin = IoOps.readWithLineage(spark, base)
    IoOps.commitDeleteVector(
      IoOps.buildDeleteVector(lin, $"m" === 0), dvRoot, version = 1)
    // v2 overlaps v1 (m in {0,1}): the anti-join must not double-drop
    IoOps.commitDeleteVector(
      IoOps.buildDeleteVector(lin, $"m" <= 1), dvRoot, version = 2)
    assert(IoOps.readAsOf(spark, base, dvRoot, 0).count() === 100)
    assert(IoOps.readAsOf(spark, base, dvRoot, 1).count() === 90)
    assert(IoOps.readAsOf(spark, base, dvRoot, 2).count() === 80)
    // re-committing a version is idempotent (dynamic partition overwrite)
    IoOps.commitDeleteVector(
      IoOps.buildDeleteVector(lin, $"m" <= 1), dvRoot, version = 2)
    assert(IoOps.readAsOf(spark, base, dvRoot, 2).count() === 80)
    // purge materializes the v2 view; the compacted store needs no DV
    IoOps.purgeDeletes(spark, base, dvRoot, 2, out)
    val purged = spark.read.parquet(out)
    assert(purged.count() === 80)
    assert(purged.where($"m" <= 1).count() === 0)
    // a mistyped dvRoot must fail loudly for version > 0 (serving the
    // plain scan would silently resurrect the deletes)...
    intercept[IllegalArgumentException](
      IoOps.readAsOf(spark, base, root + "/no_such_dv", 1))
    // ...while version 0 never needs the DV store at all
    assert(IoOps.readAsOf(spark, base, root + "/no_such_dv", 0)
      .count() === 100)
  }
}
