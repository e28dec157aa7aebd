package graft

import org.apache.spark.sql.functions._
import graft.sources.IngestOps

/** Ingest derivations against an MSv2-shaped fixture in RAW main-table
  * row order (VERDICT r4 task 7b; real casacore stores are impossible
  * in this sandbox — no casacore, no .ms fixtures — so this models the
  * part that matters: the row ordering and raggedness convert_ms
  * actually sees).
  *
  * A real MS main table arrives DDI-interleaved and scan-grouped, NOT
  * in the TIME,ANTENNA1,ANTENNA2 order the reference imposes with TAQL
  * (cngi/_utils/_table_conversion.py:232-242) before assigning ids via
  * np.unique (:254-257). Our derivations are declarative and must be
  * (a) invariant to the raw order and (b) exactly np.unique-ranked, so
  * both conversions agree row-for-row.
  */
class IngestFixtureSpec extends SparkSpec {
  import spark.implicits._

  /** MSv2-raw-order fixture: 2 DDIs interleaved per timestep (the
    * casacore filler writes one block per DDI per integration), 4
    * antennas with autos + crosses, dual feeds on antenna 0 (so
    * same-antenna cross-feed rows exist), a baseline (2,3) that drops
    * out of later times (ragged), and sigma with a zero and a null.
    */
  private lazy val raw = {
    val times = Seq(5.0e9, 5.0e9 + 10, 5.0e9 + 20)
    val rows = for {
      t    <- times
      ddi  <- Seq(0, 1) // DDI-interleaved, the raw casacore layout
      (a1, a2, f1, f2) <- Seq(
        (0, 0, 0, 0), (0, 0, 0, 1), // auto + same-antenna cross-feed
        (1, 1, 0, 0), (2, 2, 0, 0), (3, 3, 0, 0),
        (0, 1, 0, 0), (0, 2, 0, 0), (0, 3, 0, 0),
        (1, 2, 0, 0), (1, 3, 0, 0), (2, 3, 0, 0))
      if !(a1 == 2 && a2 == 3 && t > times.head) // ragged: drops out
    } yield (t, ddi, a1, a2, f1, f2,
      if (a1 == 1 && a2 == 2) 0.0 else 0.5 + a1 + a2)
    rows.toDF("time", "data_desc_id", "antenna1", "antenna2",
        "feed1", "feed2", "sigma")
      .withColumn("sigma", when(col("antenna1") === 3 &&
        col("antenna2") === 3, lit(null)).otherwise(col("sigma")))
  }

  test("assignBaselineIds matches np.unique rank over sorted distinct pairs") {
    val out = IngestOps.assignBaselineIds(raw, "antenna1", "antenna2")
      .select("antenna1", "antenna2", "baseline").distinct()
      .as[(Int, Int, Int)].collect().sortBy(r => (r._1, r._2))
    // np.unique(pairs, return_inverse) ranks pairs lexicographically
    val expected = out.map(r => (r._1, r._2)).distinct.sorted.zipWithIndex.toMap
    assert(out.length == expected.size) // one id per distinct pair
    out.foreach { case (a1, a2, id) => assert(id == expected((a1, a2)),
      s"baseline ($a1,$a2) got id $id, np.unique rank is ${expected((a1, a2))}") }
  }

  test("ingest derivations are invariant to raw row order") {
    // Permute the fixture deterministically (hash order != raw order)
    val shuffled = raw.orderBy(xxhash64(col("time"), col("antenna1"),
      col("antenna2"), col("feed2"), col("data_desc_id")))
    def derive(df: org.apache.spark.sql.DataFrame) =
      IngestOps.deriveDataWeight(
        IngestOps.assignBaselineIds(df, "antenna1", "antenna2"), "sigma")
        .select("time", "data_desc_id", "antenna1", "antenna2", "feed1",
          "feed2", "baseline", "data_weight")
        .as[(Double, Int, Int, Int, Int, Int, Int, Option[Double])]
        .collect().sortBy(_.toString)
    assert(derive(raw).toSeq == derive(shuffled).toSeq)
  }

  test("auto/cross split is FEED-aware and partitions the table") {
    val (auto, cross) = IngestOps.splitAutoCross(raw, "antenna1",
      "antenna2", feed1 = Some("feed1"), feed2 = Some("feed2"))
    val (nAuto, nCross, nAll) = (auto.count(), cross.count(), raw.count())
    assert(nAuto + nCross == nAll) // disjoint + complete
    // same-antenna cross-feed rows land in CROSS (convert_ms.py:105-106)
    assert(cross.where(col("antenna1") === col("antenna2")).count() > 0)
    assert(auto.where(col("feed1") =!= col("feed2")).count() == 0)
    // feed-less overload keeps the antenna-only predicate
    val (autoNoFeed, _) = IngestOps.splitAutoCross(raw, "antenna1", "antenna2")
    assert(autoNoFeed.count() ==
      raw.where(col("antenna1") === col("antenna2")).count())
  }

  test("deriveDataWeight nulls zero/null sigma, else 1/sigma^2") {
    val w = IngestOps.deriveDataWeight(raw, "sigma")
      .select("antenna1", "antenna2", "sigma", "data_weight")
      .as[(Int, Int, Option[Double], Option[Double])].collect()
    w.foreach {
      case (_, _, Some(s), dw) if s != 0.0 =>
        assert(dw.exists(x => approx(x, 1.0 / (s * s))))
      case (_, _, _, dw) => assert(dw.isEmpty) // sigma 0 or null
    }
    assert(w.exists(_._3.isEmpty) && w.exists(_._3.contains(0.0)))
  }

  test("addRowId ranks by the requested ordering regardless of input order") {
    val ant = Seq((3, "d"), (1, "b"), (0, "a"), (2, "c"))
      .toDF("antenna_id", "name")
    val ids = IngestOps.addRowId(ant, Seq("antenna_id"))
      .select("antenna_id", "row_id").as[(Int, Long)].collect().toMap
    assert(ids == Map(0 -> 0L, 1 -> 1L, 2 -> 2L, 3 -> 3L))
  }
}
