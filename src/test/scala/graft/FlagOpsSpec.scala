package graft

import org.apache.spark.sql.functions._
import graft.operators.FlagOps
import graft.operators.FlagOps.SelCmd

class FlagOpsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (0, 0, 1.0, false), (0, 1, 2.0, true),
    (1, 0, 3.0, false), (1, 1, 4.0, true))
    .toDF("time", "ant", "v", "flag")

  test("applyFlags nulls data wherever flag is set (apply_flags.py:49-53)") {
    val out = FlagOps.applyFlags(df, col("flag"), Seq("v"))
    val vs = out.orderBy("time", "ant").select("v").collect().map(r => Option(r.get(0)))
    assert(vs.toSeq === Seq(Some(1.0), None, Some(3.0), None))
  }

  test("autoClip ORs magnitude range violations into the flag") {
    val out = FlagOps.autoClip(df, "flag", col("v"), 2.0, 3.0)
    val fs = out.orderBy("time", "ant").select("flag").as[Boolean].collect()
    assert(fs.toSeq === Seq(true, true, false, true))
  }

  test("manualFlag ORs selection predicates") {
    val out = FlagOps.manualFlag(df, "flag",
      Seq(SelCmd(ranges = Map("time" -> (1, 1)))))
    val fs = out.orderBy("time", "ant").select("flag").as[Boolean].collect()
    assert(fs.toSeq === Seq(false, true, true, true))
  }

  test("manualUnflag with empty command list clears all (manual_unflag.py:54-55)") {
    val out = FlagOps.manualUnflag(df, "flag", Nil)
    assert(out.where(col("flag")).count() === 0)
  }

  test("manualUnflag clears only the selection") {
    val out = FlagOps.manualUnflag(df, "flag",
      Seq(SelCmd(isin = Map("ant" -> Seq(1)))))
    val fs = out.orderBy("time", "ant").select("flag").as[Boolean].collect()
    assert(fs.toSeq === Seq(false, false, false, false) ||
      fs.toSeq === Seq(false, false, false, false))
    // time=0/ant=1 and time=1/ant=1 were the flagged rows; both cleared
  }

  test("antenna selection flags both baseline legs (_antenna_to_baseline)") {
    val bl = Seq((0, 1, false), (1, 2, false), (2, 3, false))
      .toDF("ant1", "ant2", "flag")
    val out = FlagOps.manualFlag(bl, "flag",
      Seq(SelCmd(antenna = Some(("ant1", "ant2", Seq(2))))))
    val fs = out.orderBy("ant1").select("flag").as[Boolean].collect()
    assert(fs.toSeq === Seq(false, true, true))
  }

  test("flag manager add/list/remove") {
    val withV = FlagOps.managerAdd(df, "flag_v1", "flag")
    assert(withV.columns.contains("flag_v1"))
    assert(FlagOps.managerList(withV).toSet === Set("flag", "flag_v1"))
    assert(!FlagOps.managerRemove(withV, "flag_v1").columns.contains("flag_v1"))
  }

  test("summary grouping sets: grand total + per-key rows in one pass") {
    val out = FlagOps.summary(df, col("flag"), Seq("time"))
    // sets: (), (time) -> 1 + 2 rows
    assert(out.count() === 3)
    val grand = out.where(col("time").isNull).head()
    assert(grand.getAs[Long]("flagged") === 2L && grand.getAs[Long]("total") === 4L)
  }

  test("quack flags scan edges in the requested mode") {
    val scan = Seq((1, 0L, false), (1, 5L, false), (1, 50L, false),
      (1, 97L, false), (2, 10L, false))
      .toDF("scan", "t", "flag")
    def flagged(mode: String) =
      FlagOps.quack(scan, "flag", Seq("scan"), "t", widthNs = 10L, mode)
        .where(col("flag")).select("scan", "t").collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSet
    // beg: within (min, min+10) exclusive of rows at >= min+10
    assert(flagged("beg") === Set((1, 0L), (1, 5L), (2, 10L)))
    assert(flagged("end") === Set((1, 97L), (2, 10L)))
    assert(flagged("both") === Set((1, 0L), (1, 5L), (1, 97L), (2, 10L)))
  }

  test("extendFlags bridges a gap surrounded by flags, leaves isolates") {
    // chans 0..4, flags T _ T F F: chan 1 has 2/3 flagged -> grows;
    // chan 3 has 1/3 -> stays; edge chan 0 (frame {0,1}) 1/2 -> stays
    val cells = Seq((1, 0, true), (1, 1, false), (1, 2, true),
      (1, 3, false), (1, 4, false)).toDF("k", "chan", "flag")
    val out = FlagOps.extendFlags(cells, "flag", Seq("k"), "chan",
        k = 1, threshold = 0.5)
      .collect().map(r => r.getInt(1) -> r.getBoolean(2)).toMap
    assert(out === Map(0 -> true, 1 -> true, 2 -> true,
      3 -> false, 4 -> false))
  }
}
