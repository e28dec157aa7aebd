package graft

import org.apache.spark.sql.functions._

class MxdsSpec extends SparkSpec {
  import spark.implicits._

  private def mxds = {
    val xds0 = Seq((0, 0, 1, 1.0), (1, 0, 2, 2.0)).toDF("time", "ant1", "ant2", "v")
    val xds1 = Seq((0, 2, 3, 3.0)).toDF("time", "ant1", "ant2", "v")
    val antenna = Seq((0, "a0"), (1, "a1"), (2, "a2"), (3, "a3"), (4, "unused"))
      .toDF("antenna_id", "name")
    Mxds(
      partitions = Map("xds0" -> xds0, "xds1" -> xds1),
      subtables = Map("ANTENNA" -> antenna),
      subtableKeys = Map("ANTENNA" -> (("antenna_id", Seq("ant1", "ant2")))))
  }

  test("split prunes subtables to rows referenced by kept partitions") {
    val s = mxds.split(Seq("xds0"))
    assert(s.partitions.keySet === Set("xds0"))
    // xds0 references antennas 0,1,2 via both legs; 3 and 4 pruned
    val ids = s.subtables("ANTENNA").select("antenna_id").as[Int].collect().sorted
    assert(ids.toSeq === Seq(0, 1, 2))
  }

  test("split with all partitions keeps every referenced antenna") {
    val s = mxds.split(Seq("xds0", "xds1"))
    val ids = s.subtables("ANTENNA").select("antenna_id").as[Int].collect().sorted
    assert(ids.toSeq === Seq(0, 1, 2, 3)) // only 'unused' pruned
  }

  test("joinDataset renumbers colliding antenna ids and rewrites fact legs") {
    val a = mxds
    val b = mxds // identical store: every key collides
    val j = a.joinDataset(b)
    // partitions: originals + renamed copies
    assert(j.partitions.keySet === Set("xds0", "xds1", "xds0_b", "xds1_b"))
    // antenna table doubled with non-overlapping ids
    val ids = j.subtables("ANTENNA").select(col("antenna_id").cast("long"))
      .as[Long].collect().sorted
    assert(ids.length === 10 && ids.distinct.length === 10)
    // incoming facts reference the REMAPPED ids (old 0 -> max(4)+1 = 5)
    val b0 = j.partitions("xds0_b")
    val legs = b0.select(col("ant1").cast("long")).as[Long].collect().toSet
    assert(!legs.contains(0L) && legs.contains(5L))
    // original facts untouched
    assert(j.partitions("xds0").select(col("ant1").cast("long"))
      .as[Long].collect().toSet.contains(0L))
  }

  test("describe summarizes each partition") {
    val d = mxds.copy(partitions = mxds.partitions.map { case (k, df) =>
      k -> df.withColumn("chan", lit(0)).withColumn("pol", lit(0))
        .withColumnRenamed("ant1", "baseline")
    }).describe("time", "baseline", "chan", "pol")
    val rows = d.collect()
    assert(rows.length === 2)
    assert(rows.find(_.getAs[String]("xds") == "xds0").get.getAs[Long]("rows") === 2)
  }
}
