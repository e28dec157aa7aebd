package graft

import org.apache.spark.sql.functions._
import graft.operators.SketchOps

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  test("kmv: exact below k, partition-layout independent, dup-proof") {
    val df = Seq.tabulate(300)(i => (i % 3, (i % 30).toLong))
      .toDF("g", "v") // 10 distinct values per group, heavy duplication
    val out = SketchOps.distinctSketch(df, Seq("g"), "v", k = 64)
      .collect().map(r => r.getAs[Int]("g") -> r).toMap
    assert(out.size === 3)
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_sketch") === 10)
      assert(r.getAs[Double]("estimate") === 10.0) // exact below k
    }
    // same result under a hostile partition layout (merge path)
    val out7 = SketchOps.distinctSketch(df.repartition(7), Seq("g"), "v", 64)
      .collect().map(r => r.getAs[Int]("g") -> r.getAs[Long]("kth_min")).toMap
    assert(out7 === out.map { case (g, r) => g -> r.getAs[Long]("kth_min") })
  }

  test("cms: never under-counts, exact when collision-free, layout-independent") {
    // zipf-ish: value v appears 101-v times, v in 1..100
    val rows = (1 to 100).flatMap(v => Seq.fill(101 - v)(v.toLong))
    val df = rows.toDF("x")
    val truth = rows.groupBy(identity).map { case (v, g) => (v, g.size.toLong) }
    val est = SketchOps
      .cmsEstimate(SketchOps.cmsSketch(df, "x", 4, 1024),
        df.distinct(), "x", 4, 1024)
      .collect().map(r => r.getAs[Long]("x") -> r.getAs[Long]("est")).toMap
    truth.foreach { case (v, n) => assert(est(v) >= n, s"under-count at $v") }
    // 100 values into 4x1024 buckets: expect exactness here
    assert(truth.forall { case (v, n) => est(v) == n })
    // merge path: same sketch regardless of partitioning
    val a = SketchOps.cmsSketch(df, "x", 4, 64).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val b = SketchOps.cmsSketch(df.repartition(13), "x", 4, 64).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(a === b)
  }

  test("cms: heavy hitters rank by estimate with deterministic ties") {
    val df = (Seq.fill(50)("alpha") ++ Seq.fill(30)("beta") ++
      Seq.fill(30)("gamma") ++ (1 to 20).map(i => s"w$i"))
      .toDF("word")
      .withColumn("x", graft.functions.PolyHash(col("word")))
    val top = SketchOps.cmsHeavyHitters(df, "word", "x", 4, 2048, 3)
      .collect().map(r => (r.getString(0), r.getAs[Long]("est"),
        r.getAs[Long]("true_cnt")))
    assert(top(0) === ("alpha", 50L, 50L))
    // beta/gamma tie at 30 -> word-ascending order
    assert(top(1)._1 === "beta" && top(2)._1 === "gamma")
    assert(top.forall { case (_, e, t) => e >= t })
  }

  test("quantile sketch: matches sequential replay, layout-invariant, " +
      "exact below k") {
    val n = 2000
    val rows = Seq.tabulate(n)(i => (i % 2, i.toLong, (i * 37 % 997).toDouble))
    val df = rows.toDF("g", "id", "v")
    val qs = Seq("q25" -> 0.25, "q50" -> 0.5, "q90" -> 0.9)
    val out = SketchOps.quantileSketch(df, Seq("g"), col("id"), col("v"),
        k = 128, qs)
      .collect().map(r => r.getAs[Int]("g") ->
        (r.getAs[Long]("n_sample"),
          r.getAs[Double]("q25"), r.getAs[Double]("q50"),
          r.getAs[Double]("q90"))).toMap
    // sequential replay: k smallest by (hash, v), then order statistics
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val samp = grp.map(t => (SketchOps.kmvHash(t._2), t._3))
        .sortBy(identity).take(128).map(_._2).sorted
      val want = qs.map { case (_, q) =>
        samp(math.floor(q * (samp.length - 1)).toInt) }
      assert(out(g) === ((128L, want(0), want(1), want(2))), s"group $g")
    }
    // merge path: identical under a hostile partition layout
    val out13 = SketchOps.quantileSketch(df.repartition(13), Seq("g"),
        col("id"), col("v"), k = 128, qs)
      .collect().map(r => r.getAs[Int]("g") ->
        (r.getAs[Long]("n_sample"),
          r.getAs[Double]("q25"), r.getAs[Double]("q50"),
          r.getAs[Double]("q90"))).toMap
    assert(out13 === out)
    // below k the sample is the whole group: exact quantiles
    val small = Seq.tabulate(10)(i => (0, i.toLong, i.toDouble)).toDF("g", "id", "v")
    val r = SketchOps.quantileSketch(small, Seq("g"), col("id"), col("v"),
        k = 128, Seq("q50" -> 0.5)).head()
    assert(r.getAs[Long]("n_sample") === 10L)
    assert(r.getAs[Double]("q50") === 4.0) // floor(0.5*9) = 4
  }

  test("kmvHash: safe across the full int64 id domain (no overflow)") {
    // ids near 2^62 would overflow x * 2654435761 without the
    // pre-reduction; with it, every hash is in [0, M) and equals the
    // hash of the reduced id — a huge-id sketch must therefore match a
    // small-id control built from the reduced ids.
    val big = Seq.tabulate(500)(i => (1L << 62) + i * 2654435761L)
    big.foreach { x =>
      val h = SketchOps.kmvHash(x)
      assert(h >= 0 && h < SketchOps.KmvMod, s"hash $h out of range")
      assert(h === SketchOps.kmvHash(java.lang.Math.floorMod(
        x, SketchOps.KmvMod)), s"id $x")
    }
    assert(SketchOps.kmvHash(-7L) >= 0) // floorMod, not %
    val qs = Seq("q50" -> 0.5)
    val bigDf = big.zipWithIndex
      .map { case (id, i) => (0, id, (i * 37 % 997).toDouble) }
      .toDF("g", "id", "v")
    val ctlDf = big.zipWithIndex
      .map { case (id, i) =>
        (0, java.lang.Math.floorMod(id, SketchOps.KmvMod),
          (i * 37 % 997).toDouble) }
      .toDF("g", "id", "v")
    val a = SketchOps.quantileSketch(bigDf, Seq("g"), col("id"), col("v"),
      k = 64, qs).head()
    val b = SketchOps.quantileSketch(ctlDf, Seq("g"), col("id"), col("v"),
      k = 64, qs).head()
    assert(a.getAs[Double]("q50") === b.getAs[Double]("q50"))
    assert(a.getAs[Long]("n_sample") === b.getAs[Long]("n_sample"))
  }

  test("kmv: estimate within ~2/sqrt(k) above k; threshold is kth hash") {
    val n = 5000
    val df = Seq.tabulate(n)(i => i.toLong).toDF("v").withColumn("g", lit(0))
    val r = SketchOps.distinctSketch(df, Seq("g"), "v", k = 256).head()
    assert(r.getAs[Long]("n_sketch") === 256)
    val est = r.getAs[Double]("estimate")
    assert(math.abs(est - n) / n < 0.25, s"estimate $est vs $n")
    // threshold equals the 256th smallest distinct hash, recomputed
    val want = (0 until n).map(i => SketchOps.kmvHash(i.toLong))
      .distinct.sorted.apply(255)
    assert(r.getAs[Long]("kth_min") === want)
  }

  test("hll: matches a scala replay exactly; sane on 5000 distinct") {
    // scala replay of the register pipeline (m = 64)
    def replay(keys: Seq[Long]): (Long, Double) = {
      val m = 64
      val regs = keys.map(SketchOps.kmvHash)
        .map { h0 =>
          val g1 = h0 ^ (h0 >> 15)
          val g2 = g1 * SketchOps.KmvMult % SketchOps.KmvMod
          g2 ^ (g2 >> 15)
        }
        .map(h => (h % m, h / m))
        .map { case (r, w) =>
          (r, if (w == 0) 26
              else java.lang.Long.numberOfTrailingZeros(w) + 1) }
        .groupBy(_._1).map { case (r, xs) => r -> xs.map(_._2).max }
      val v = regs.size.toLong
      val zeros = m - v
      val sp = regs.values.toSeq.sorted
        .map(rho => 1.0 / (1L << rho)).sum + zeros.toDouble
      val raw = 0.709 * m * m / sp
      val est = if (raw <= 2.5 * m && zeros > 0)
        m.toDouble * StrictMath.log(m.toDouble / zeros) else raw
      (zeros, est)
    }
    val small = (1L to 40L)
    val r1 = SketchOps.hllDistinct(small.toDF("k").withColumn("g", lit(0)),
      "k", Seq("g")).head()
    val (z1, e1) = replay(small)
    assert(r1.getAs[Long]("zero_regs") === z1)
    assert(r1.getAs[Double]("hll_est") === e1) // exact: dyadic sums
    // 40 distinct keys: linear-counting regime, estimate in range
    assert(math.abs(e1 - 40.0) / 40.0 < 0.35, s"est $e1")
    // large: raw harmonic-mean regime, ~13% rse at m=64
    val big = (1L to 5000L)
    val r2 = SketchOps.hllDistinct(big.toDF("k").withColumn("g", lit(0)),
      "k", Seq("g")).head()
    val e2 = r2.getAs[Double]("hll_est")
    assert(math.abs(e2 - 5000.0) / 5000.0 < 0.4, s"est $e2")
    // nulls skipped, groups independent
    val r3 = SketchOps.hllDistinct(
      (small.map(k => (java.lang.Long.valueOf(k), 0)) :+
        ((null: java.lang.Long), 0)).toDF("k", "g"), "k", Seq("g")).head()
    assert(r3.getAs[Double]("hll_est") === e1)
  }
}
