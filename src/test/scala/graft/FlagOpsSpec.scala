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

  test("autoRflag flags the MAD outlier, keeps well-behaved samples") {
    // ants 0..2, one chan; ant 0 carries a gross outlier at t=4.
    val rows =
      (0 until 5).map(t => (0, 0, t, if (t == 4) 100.0 else 10.0 + 0.1 * t)) ++
        (0 until 5).map(t => (1, 0, t, 20.0 + 0.2 * t)) ++
        (0 until 5).map(t => (2, 0, t, 30.0 + 0.3 * t))
    val df = rows.toDF("ant", "chan", "t", "amp").withColumn("flag", lit(false))
    val out = FlagOps.autoRflag(df, "flag", Seq("ant"), "chan",
        col("amp"), nSigma = 5.0)
      .select("ant", "t", "flag")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getBoolean(2)).toMap
    assert(out((0, 4)), "gross outlier must be flagged")
    assert(!out((1, 2)) && !out((2, 0)), "clean baselines stay unflagged")
  }

  test("autoTfcrop keeps a perfect quadratic bandpass unflagged, crops RFI") {
    val clean = (0 until 8).map(x => (0, x, 1.0 + 2.0 * x + 0.5 * x * x))
    val df = clean.toDF("bl", "chan", "amp").withColumn("flag", lit(false))
    val none = FlagOps.autoTfcrop(df, "flag", Seq("bl"), "chan", col("amp"))
      .where(col("flag")).count()
    assert(none === 0, "zero residuals must not flag")

    val rfi = clean.map { case (b, x, y) =>
      (b, x, if (x == 3) y + 1000.0 else y) }
    val df2 = rfi.toDF("bl", "chan", "amp").withColumn("flag", lit(false))
    val out = FlagOps.autoTfcrop(df2, "flag", Seq("bl"), "chan", col("amp"),
        nSigma = 2.0)
      .collect().map(r => r.getInt(1) -> r.getBoolean(3)).toMap
    assert(out(3), "the RFI spike must be cropped")
  }
}
