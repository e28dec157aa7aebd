package graft

import org.scalacheck.Gen
import graft.operators.{DedupOps, GridOps, RegressionOps, TextOps}

/** Randomized property tests (SURVEY.md §5: algebraic identities the
  * reference documents, plus kernel invariants). Uses raw ScalaCheck
  * generators sampled from ScalaTest (the scalatest-plus bridge is not
  * in the offline dependency cache).
  */
class PropertySpec extends SparkSpec {

  private def forSamples[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    var seed = seed0
    (1 to n).foreach { _ =>
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
    }
  }

  private def forSamples2[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forSamples(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  private val finiteD = Gen.choose(-1e6, 1e6)

  test("property: polyHash is stable, in range, and order-sensitive") {
    forSamples2(Gen.alphaNumStr, Gen.alphaNumStr) { (a: String, b: String) =>
      val h = TextOps.polyHashFn(a)
      assert(h >= 0 && h < TextOps.HashMod)
      assert(h === TextOps.polyHashFn(a)) // deterministic
      whenever(a != b) {
        // different strings rarely collide; at minimum concat order matters
        if (a.nonEmpty && b.nonEmpty)
          assert(TextOps.polyHashFn(a + b) === {
            var acc = TextOps.polyHashFn(a)
            var i = 0
            while (i < b.length) {
              acc = (acc * TextOps.HashBase + b.charAt(i).toInt) % TextOps.HashMod
              i += 1
            }
            acc
          }) // rolling property: hash(a+b) extends hash(a)
      }
    }
  }

  test("property: minhash signature entries are min-stable under duplication") {
    forSamples(Gen.nonEmptyListOf(Gen.choose(0L, TextOps.HashMod - 1))) { sh =>
      val sig = DedupOps.minHashSignatureFn(sh, 8)
      val sigDup = DedupOps.minHashSignatureFn(sh ++ sh, 8) // set semantics
      assert(sig.toSeq === sigDup.toSeq)
    }
  }

  test("property: shingle sets of a doc and itself have jaccard 1 ingredients") {
    forSamples(Gen.listOfN(6, Gen.identifier)) { ws =>
      whenever(ws.length >= 3) {
        val sh = TextOps.shingleHashesFn(ws.mkString(" "), 3)
        assert(sh.distinct.length === sh.length) // distinct by construction
      }
    }
  }

  test("property: solveNormal recovers random order-2 polynomials") {
    val coefGen = Gen.choose(-5.0, 5.0)
    forSamples(Gen.zip(coefGen, coefGen, coefGen)) { case (c0, c1, c2) =>
      val xs = (0 to 6).map(_.toDouble)
      val ys = xs.map(x => c0 + c1 * x + c2 * x * x)
      val moments = (0 to 4).map(k => xs.map(math.pow(_, k)).sum)
      val rhs = (0 to 2).map(k => xs.zip(ys).map { case (x, y) => y * math.pow(x, k) }.sum)
      val Some(sol) = RegressionOps.solveNormal(moments, rhs)
      assert(approx(sol(0), c0, 1e-6) && approx(sol(1), c1, 1e-6) &&
        approx(sol(2), c2, 1e-6))
    }
  }

  test("property: PSWF kernel is symmetric, bounded, zero outside support") {
    forSamples(Gen.choose(-2.0, 2.0)) { u =>
      val k = GridOps.kernelValue(u)
      assert(approx(k, GridOps.kernelValue(-u)))
      if (math.abs(u) >= 1.0) assert(k <= 0.0 + 1e-12) // (1-u^2) <= 0 at edge
      else assert(k >= 0.0 && k <= 1.0)
    }
  }

  test("property: simhash of identical docs equal; hamming within bit count") {
    forSamples(Gen.nonEmptyListOf(Gen.identifier)) { ws =>
      val s = ws.mkString(" ")
      val h1 = DedupOps.simHashFn(s, 16)
      assert(h1 === DedupOps.simHashFn(s, 16))
      assert(h1 >= 0 && h1 < (1L << 16))
    }
  }

  test("property: complex c_mul/c_div roundtrip on the driver-side model") {
    // mirrors the column expressions' math on plain doubles
    forSamples(Gen.zip(finiteD, finiteD, finiteD, finiteD)) { case (ar, ai, br, bi) =>
      whenever(math.abs(br) + math.abs(bi) > 1e-6) {
        // (a*b)/b == a
        val mr = ar * br - ai * bi
        val mi = ar * bi + ai * br
        val d = br * br + bi * bi
        val rr = (mr * br + mi * bi) / d
        val ri = (mi * br - mr * bi) / d
        assert(approx(rr, ar, 1e-6) && assertOk(ri, ai))
      }
    }
  }

  private def assertOk(a: Double, b: Double): Boolean = {
    assert(approx(a, b, 1e-6)); true
  }

  test("property: piiScrub is idempotent and PII-free after one pass") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val texts = Seq(
      "a@b.co and c.d@e-f.org", "1.2.3.4 10.255.0.1", "555-123-4567",
      "mixed a@b.co 1.2.3.4 555-000-1111 tail", "clean prose only",
      "x@y.io x@y.io twice", "<EMAIL> already scrubbed")
      .zipWithIndex.map(_.swap).toDF("id", "text")
    val once = graft.operators.TextOps.piiScrub(texts, "text")
      .select(col("id"), col("text_scrubbed").as("text"))
    val twice = graft.operators.TextOps.piiScrub(once, "text")
    val rows = twice.collect().map(r => r.getString(1) -> r.getString(2))
    rows.foreach { case (a, b) => assert(a === b, "scrub must be idempotent") }
    rows.foreach { case (_, b) =>
      assert(!b.matches(".*[0-9]{3}-[0-9]{3}-[0-9]{4}.*"), b)
      assert(!b.matches(".*[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}.*"), b)
    }
  }

  test("property: lineDedup is idempotent — survivors are corpus-unique") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // random multi-line docs over a tiny line alphabet (forces heavy
    // cross-doc duplication)
    val lineGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    forSamples(Gen.listOfN(6, Gen.listOfN(4, lineGen)), n = 20) { docLines =>
      val df = docLines.zipWithIndex
        .map { case (ls, i) => (i.toLong, ls.mkString("\n")) }
        .toDF("doc_id", "text")
      val once = DedupOps.lineDedup(df, "doc_id", "text")
        .select(col("doc_id"), col("text_dedup").as("text"))
      val onceMap = once.collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
      val twiceMap = DedupOps.lineDedup(once, "doc_id", "text")
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[String]("text_dedup")).toMap
      // empty docs: splitting "" yields one empty line per doc, which is
      // itself corpus-frequent when several docs emptied — so compare
      // only non-empty survivors (the meaningful fixpoint)
      onceMap.filter(_._2.nonEmpty).foreach { case (id, a) =>
        assert(twiceMap(id) === a, "second pass must keep every unique survivor")
      }
    }
  }

  test("property: globalCumsum matches the sequential scan on random data") {
    import spark.implicits._
    val rowGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 5000L), Gen.choose(1L, 99L)))
    forSamples(rowGen, n = 15) { raw =>
      val rows = raw.toMap.toSeq // distinct ids
      whenever(rows.nonEmpty) {
        val df = rows.toDF("id", "n").repartition(7)
        val out = graft.operators.PackOps
          .globalCumsum(df, "id", "n", buckets = 8)
          .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("start_tok"))
          .toMap
        var acc = 0L
        rows.sortBy(_._1).foreach { case (id, n) =>
          assert(out(id) === acc, s"prefix at id=$id")
          acc += n
        }
      }
    }
  }

  test("property: pqEncode and semanticDedup invariant under repartitioning") {
    import spark.implicits._
    val emb = (0L until 40L)
      .map(i => (i, Array.tabulate(8)(j => ((i * 7 + j * 3) % 11).toFloat)))
      .toDF("vec_id", "embedding")
    val cb = graft.operators.SimilarityOps.pqCodebooks(emb, "vec_id",
      "embedding", m = 2, dsub = 4, ksub = 4)
    val a = graft.operators.SimilarityOps.pqEncode(emb, "vec_id", "embedding", cb)
    val b = graft.operators.SimilarityOps.pqEncode(emb.repartition(13),
      "vec_id", "embedding", cb)
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
    val s1 = graft.operators.SimilarityOps.semanticDedup(emb, "vec_id",
      "embedding", k = 4, iters = 1, threshold = 0.8)
    val s2 = graft.operators.SimilarityOps.semanticDedup(emb.repartition(7),
      "vec_id", "embedding", k = 4, iters = 1, threshold = 0.8)
    assert(s1.except(s2).count() === 0 && s2.except(s1).count() === 0)
  }

  test("property: semanticDedup/nearDupPairs cap degenerate clusters instead of going quadratic") {
    import spark.implicits._
    // 30 identical vectors (one degenerate cluster) + 10 spread ones
    val emb = ((0L until 30L).map(i => (i, Array.tabulate(8)(_ => 1.0f))) ++
        (30L until 40L).map(i =>
          (i, Array.tabulate(8)(j => ((i * 7 + j * 3) % 11).toFloat))))
      .toDF("vec_id", "embedding")
    // cap below the degenerate cluster's size: its members must ALL be
    // kept (excluded from pair scoring, never dropped) and the op must
    // not emit any within-degenerate-cluster drop
    val capped = graft.operators.SimilarityOps.semanticDedup(emb, "vec_id",
      "embedding", k = 4, iters = 1, threshold = 0.99, maxCluster = 10)
    val kept = capped.where($"vec_id" < 30 && $"keep").count()
    assert(kept === 30L, "capped degenerate cluster must keep all members")
    // uncapped control: the same cluster dedups down to one survivor
    val full = graft.operators.SimilarityOps.semanticDedup(emb, "vec_id",
      "embedding", k = 4, iters = 1, threshold = 0.99)
    assert(full.where($"vec_id" < 30 && $"keep").count() === 1L)
    // nearDupPairs: same policy on the hyperplane buckets — capped run
    // emits no pairs from the degenerate bucket, uncapped emits ~n^2/2
    val pairsCapped = graft.operators.SimilarityOps.nearDupPairs(
      emb, "vec_id", "embedding", dim = 8, threshold = 0.99,
      maxBucket = 10)
    assert(pairsCapped.where($"id1" < 30 && $"id2" < 30).count() === 0L)
    val pairsFull = graft.operators.SimilarityOps.nearDupPairs(
      emb, "vec_id", "embedding", dim = 8, threshold = 0.99)
    assert(pairsFull.where($"id1" < 30 && $"id2" < 30).count() === 435L)
  }

  test("property: skyline2D equals the brute-force dominance filter") {
    import spark.implicits._
    val gen = Gen.listOfN(24, Gen.zip(Gen.choose(0, 10), Gen.choose(0, 10)))
    forSamples(gen, n = 6) { pts0 =>
      val pts = pts0.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      val out = graft.operators.StatsOps.skyline2D(
          pts.toDF("id", "x", "y"), "x", "y")
        .collect().map(_.getLong(0)).toSet
      val brute = pts.filter { case (_, x, y) =>
        !pts.exists { case (_, x2, y2) =>
          x2 >= x && y2 >= y && (x2 > x || y2 > y)
        }
      }.map(_._1).toSet
      assert(out === brute, s"skyline mismatch on $pts")
    }
  }

  test("property: anomalyZscore and anomalyStream are bit-identical") {
    import spark.implicits._
    val gen = Gen.listOfN(30,
      Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 2000L)))
    forSamples(gen, n = 4) { rows0 =>
      val rows = rows0.zipWithIndex.map { case ((k, v), i) =>
        (k, i.toLong, i.toLong, v) // unique ts per row keeps order total
      }
      val df = rows.toDF("user_id", "ts_ns", "event_id", "value_scaled")
      val batch = graft.operators.SequenceOps.anomalyZscore(
          df.withColumn("value",
            org.apache.spark.sql.functions.col("value_scaled").cast("double")),
          "user_id", "ts_ns", "event_id", "value", scale = 1L,
          lookback = 5, minN = 3, threshold = 2.0)
        .select("user_id", "ts_ns", "event_id", "value_scaled", "n_prev",
          "z", "is_anomaly").collect().map(_.toSeq).toSet
      val stream = graft.streaming.StreamingOps.anomalyStream(spark, df,
          "user_id", "ts_ns", "event_id", "value_scaled",
          lookback = 5, minN = 3, threshold = 2.0)
        .select("user_id", "ts_ns", "event_id", "value_scaled", "n_prev",
          "z", "is_anomaly").collect().map(_.toSeq).toSet
      assert(batch === stream)
    }
  }

  test("property: phraseSearch equals the brute-force window scan") {
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c")
    val gen = Gen.listOfN(4, Gen.listOfN(12, word))
    val phrase = Seq("a", "b", "a")
    forSamples(gen, n = 6) { docs0 =>
      val docs = docs0.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.mkString(" "))
      }
      val out = graft.operators.TextOps.phraseSearch(
          docs.toDF("doc_id", "text"), "doc_id", "text", phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val brute = docs.map { case (id, t) =>
        val ws = t.split(" ", -1)
        id -> (0 to ws.length - phrase.length).count(i =>
          phrase.indices.forall(j => ws(i + j) == phrase(j))).toLong
      }.filter(_._2 > 0).toMap
      assert(out === brute, s"phrase mismatch on $docs")
    }
  }

  test("property: winsorize clamp is the identity on all-equal groups") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, col, when}
    // each group holds ONE repeated value — every quantile must equal
    // it exactly, so the p05/p95 clamp must change nothing
    val gen = Gen.listOfN(5, Gen.zip(Gen.identifier, Gen.choose(-500.0, 500.0)))
    forSamples(gen, n = 6) { groups0 =>
      val groups = groups0.toMap.toSeq // distinct keys
      whenever(groups.nonEmpty) {
        val df = groups.flatMap { case (k, v) =>
          (0 until 7).map(i => (k, i.toLong, v))
        }.toDF("grp", "row_id", "value")
        val q = graft.operators.StatsOps.groupedQuantiles(
            df.select(col("grp"), col("value")),
            Seq("grp"), "value", Seq(0.05, 0.95))
          .select(col("grp"), col("q_0").as("_lo"), col("q_1").as("_hi"))
        val out = df.join(broadcast(q), Seq("grp"))
          .select(col("grp"), col("value"),
            when(col("value") < col("_lo"), col("_lo"))
              .when(col("value") > col("_hi"), col("_hi"))
              .otherwise(col("value")).as("clamped"))
          .collect()
        out.foreach { r =>
          assert(r.getDouble(1) === r.getDouble(2),
            s"all-equal group ${r.getString(0)} was clamped")
        }
      }
    }
  }

  test("property: resampleFfill leaves leading grid points (no fill source) null") {
    import spark.implicits._
    // key observations start mid-grid: the aligned grid begins at
    // t0 div step (BEFORE the first observation when t0 % step != 0 is
    // large), so grid points preceding the first obs must surface null
    val step = 1000L
    val gen = Gen.listOfN(6, Gen.zip(Gen.choose(1L, 3L),
      Gen.choose(500L, 9999L), Gen.choose(-50L, 50L)))
    forSamples(gen, n = 8) { rows0 =>
      val rows = rows0.zipWithIndex.map { case ((k, ts, v), i) =>
        (k, ts, i.toLong, v.toDouble)
      }
      val df = rows.toDF("user_id", "ts_ns", "event_id", "value")
      val out = graft.operators.SequenceOps.resampleFfill(
          df, "user_id", "ts_ns", "event_id", "value", step)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      // brute force: per key, grid from t0 div step to t1 div step; a
      // grid point carries the LAST observation at ts <= grid ts
      // (grid sorts after obs at equal ts), else null
      val byKey = rows.groupBy(_._1)
      for ((k, ts, v) <- out) {
        val obs = byKey(k)
        val expected = obs.filter(_._2 <= ts)
          .sortBy(o => (o._2, o._3)).lastOption.map(_._4)
        assert(v === expected, s"ffill($k, $ts)")
        val t0 = obs.map(_._2).min
        if (ts < t0) assert(v.isEmpty, s"leading grid point $ts filled from nothing")
      }
      // the leading-gap case actually occurred for at least one key
      // whenever some key's first obs is off-grid (usual for this gen)
    }
  }

  test("property: groupCorrelation yields null corr and zero covariance on zero-variance keys") {
    import spark.implicits._
    val gen = Gen.listOfN(8, Gen.zip(Gen.choose(-100L, 100L), Gen.choose(-100L, 100L)))
    forSamples(gen, n = 6) { ys0 =>
      whenever(ys0.size >= 2) {
        // key "zx": x constant, y varies -> corr null, covar 0 exactly
        // key "zy": y constant, x varies -> corr null
        // key "ok": both vary linearly -> corr == 1 exactly
        val rows =
          ys0.map { case (_, y) => ("zx", 7L, y) } ++
          ys0.map { case (x, _) => ("zy", x, -3L) } ++
          ys0.indices.map(i => ("ok", i.toLong, 2L * i + 5L))
        val out = graft.operators.StatsOps.groupCorrelation(
            rows.toDF("grp", "x", "y"), Seq("grp"), "x", "y")
          .collect().map(r => r.getString(0) ->
            ((if (r.isNullAt(2)) None else Some(r.getDouble(2))),
             r.getDouble(3))).toMap
        assert(out("zx")._1.isEmpty, "constant x must yield null corr")
        assert(out("zx")._2 === 0.0, "covariance with a constant must be 0")
        assert(out("zy")._1.isEmpty, "constant y must yield null corr")
        if (ys0.size >= 2)
          assert(approx(out("ok")._1.get, 1.0, 1e-9),
            "exact linear relation must score corr 1")
      }
    }
  }

  test("property: anomalyZscore stays null-z below minN and on constant windows") {
    import spark.implicits._
    val gen = Gen.listOfN(4, Gen.choose(0L, 100L))
    forSamples(gen, n = 6) { vs =>
      // key 1: only |vs| (< minN=5 prior) events -> every z null, flag 0
      // key 2: constant values, many rows -> variance 0 -> z null, flag 0
      val rows = vs.zipWithIndex.map { case (v, i) =>
          (1L, i.toLong, i.toLong, v) } ++
        (0 until 12).map(i => (2L, i.toLong, i.toLong, 42L))
      val df = rows.toDF("user_id", "ts_ns", "event_id", "raw")
        .withColumn("value",
          org.apache.spark.sql.functions.col("raw").cast("double"))
      val out = graft.operators.SequenceOps.anomalyZscore(df, "user_id",
          "ts_ns", "event_id", "value", scale = 1L, lookback = 10,
          minN = 5, threshold = 2.0)
        .collect().map(r => (r.getLong(0), r.isNullAt(5), r.getInt(6)))
      out.foreach { case (k, zNull, flag) =>
        assert(zNull, s"key $k: z must be null (short window or zero variance)")
        assert(flag === 0, s"key $k: no anomaly may fire without a defined z")
      }
    }
  }

  test("property: heavyHitters equals the brute-force frequent-items set") {
    import spark.implicits._
    // skewed generator: values drawn from a small domain with geometric
    // bias so some exceed the n/(k+1) threshold and most don't
    val valGen = Gen.frequency((8, Gen.const(1L)), (4, Gen.const(2L)),
      (2, Gen.const(3L)), (1, Gen.choose(4L, 30L)))
    val gen = Gen.listOfN(120, Gen.zip(Gen.choose(1, 2), valGen))
    forSamples(gen, n = 5) { rows =>
      val df = rows.map { case (g, v) => (s"g$g", v) }.toDF("k", "v")
        .repartition(5)
      for (k <- Seq(3, 6)) {
        val got = operators.SketchOps.heavyHitters(df, Seq("k"), "v", k)
          .collect().map(r => (r.getString(0), r.getLong(1)) ->
            ((r.getLong(2), r.getLong(3)))).toMap
        val brute = rows.groupBy(_._1).flatMap { case (g, grp) =>
          val n = grp.size.toLong
          grp.groupBy(_._2).collect {
            case (v, occ) if occ.size.toLong * (k + 1) > n =>
              (s"g$g", v) -> ((occ.size.toLong, n))
          }
        }.toMap
        assert(got === brute, s"k=$k on $rows")
      }
    }
  }

  test("property: containmentPairs matches brute-force containment on random corpora") {
    import spark.implicits._
    val word = Gen.oneOf((1 to 12).map(i => s"w$i"))
    val gen = Gen.listOfN(5, Gen.choose(4, 14).flatMap(Gen.listOfN(_, word)))
    forSamples(gen, n = 5) { docs0 =>
      val docs = docs0.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.mkString(" "))
      }
      val out = operators.DedupOps.containmentPairs(
          docs.toDF("doc_id", "text"), "doc_id", "text",
          maxDf = 1000, minShared = 1, minContainment = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5))
        .toMap
      def sh(t: String) =
        operators.TextOps.shingleHashesFn(t, 3).toSet
      val brute = (for {
        (i1, t1) <- docs; (i2, t2) <- docs if i1 < i2
        s1 = sh(t1); s2 = sh(t2)
        m = math.min(s1.size, s2.size) if m > 0
        c = (s1 & s2).size.toDouble / m if c >= 0.5
      } yield (i1, i2) -> c).toMap
      assert(out === brute, s"containment mismatch on $docs")
    }
  }

  test("property: zarr write/read round-trips random arrays bit-exactly") {
    val gen = Gen.zip(Gen.choose(1, 40),
      Gen.choose(1, 7), Gen.listOf(Gen.choose(-1e12, 1e12)))
    forSamples(gen, n = 6) { case (n, chunk, seed0) =>
      val rng = new scala.util.Random(n * 31 + chunk)
      val vals = Array.fill(n)(rng.nextDouble() * 2e6 - 1e6)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_zarr_prop").toString + "/a"
      graft.sources.ZarrSource.writeVar1D(vals, dir, chunk)
      val got = graft.sources.ZarrSource.readVar(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.size === n, s"n=$n chunk=$chunk")
      vals.indices.foreach(i =>
        assert(got(i.toLong) === vals(i), s"i=$i n=$n chunk=$chunk"))
    }
  }

  test("property: blosc unshuffle inverts the spec shuffle for any typesize") {
    val gen = Gen.zip(Gen.choose(1, 16), Gen.listOfN(64, Gen.choose(-128, 127)))
    forSamples(gen, n = 40) { case (ts, bytes0) =>
      val bytes = bytes0.map(_.toByte).toArray
      // forward shuffle per the public spec: byte-plane concatenation
      // over full elements, raw tail
      val nElem = bytes.length / ts
      val out = new Array[Byte](bytes.length)
      for (b <- 0 until ts; i <- 0 until nElem)
        out(b * nElem + i) = bytes(i * ts + b)
      System.arraycopy(bytes, nElem * ts, out, nElem * ts,
        bytes.length - nElem * ts)
      assert(graft.sources.ZarrSource.unshuffle(out, ts).toSeq ===
        bytes.toSeq, s"typesize=$ts")
    }
  }

  test("property: canonicalizeUrl is idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    forSamples(Gen.oneOf(
      "https://www.A.com/x?q=1", "http://a.com/x/", "a.com/x#f",
      "HTTPS://WWW.B.ORG/", "www.c.net/p/q/r?a=b#c", "d.io"), n = 6) { u =>
      val df = Seq((1, u)).toDF("id", "url")
      val once = graft.operators.TextOps.canonicalizeUrl(df, "url")
        .select(col("id"), col("url_canonical").as("url"))
      val c1 = once.collect()(0).getString(1)
      val c2 = graft.operators.TextOps.canonicalizeUrl(once, "url")
        .collect()(0).getString(2)
      assert(c1 === c2, s"canonical($u) not a fixpoint: $c1 vs $c2")
    }
  }

  test("property: cusumChange closed form equals the max-reset recursion") {
    import spark.implicits._
    val gen = Gen.listOfN(12, Gen.choose(-20L, 20L))
    forSamples(gen, n = 8) { vs =>
      whenever(vs.nonEmpty) {
        val df = vs.zipWithIndex
          .map { case (v, i) => ("k", i.toLong, i.toLong, v) }
          .toDF("k", "ts", "tie", "v")
        val r = graft.operators.SequenceOps.cusumChange(df, Seq("k"),
          "ts", "tie", "v", refUp = 3L, refDown = -3L, threshold = 10L)
          .collect()(0)
        // reference: the literal textbook recursion
        var sp = 0L; var sn = 0L; var maxP = 0L; var maxN = 0L
        var firstP = Option.empty[Long]; var firstN = Option.empty[Long]
        for ((v, i) <- vs.zipWithIndex) {
          sp = math.max(0L, sp + (v - 3L)); sn = math.max(0L, sn + (-3L - v))
          maxP = math.max(maxP, sp); maxN = math.max(maxN, sn)
          if (sp > 10L && firstP.isEmpty) firstP = Some(i.toLong)
          if (sn > 10L && firstN.isEmpty) firstN = Some(i.toLong)
        }
        assert(r.getLong(2) === maxP && r.getLong(3) === maxN, s"vs=$vs")
        assert((if (r.isNullAt(4)) None else Some(r.getLong(4))) === firstP)
        assert((if (r.isNullAt(5)) None else Some(r.getLong(5))) === firstN)
      }
    }
  }

  test("property: mannWhitney U equals brute-force midranks; z is centered") {
    import spark.implicits._
    val gen = Gen.zip(Gen.listOfN(8, Gen.choose(0, 5)),
      Gen.listOfN(10, Gen.choose(0, 5)))
    forSamples(gen, n = 8) { case (as, bs) =>
      val df = (as.map(v => ("a", v.toDouble)) ++
        bs.map(v => ("b", v.toDouble))).toDF("c", "v")
      val r = graft.operators.StatsOps.mannWhitney(df, "c", "a", "b", "v")
        .collect()(0)
      // brute-force midranks over the combined sample
      val all = (as ++ bs).sorted
      val midrank = all.distinct.map { v =>
        val lo = all.indexOf(v) + 1; val hi = all.lastIndexOf(v) + 1
        v -> (lo + hi) / 2.0
      }.toMap
      val ra = as.map(midrank).sum
      val ua = ra - as.size * (as.size + 1) / 2.0
      assert(approx(r.getDouble(2), ua, 1e-9), s"as=$as bs=$bs")
    }
  }

  test("property: autocorrelation matches the direct estimator; lag-0 analog is 1") {
    import spark.implicits._
    val gen = Gen.listOfN(10, Gen.choose(0L, 9L))
    forSamples(gen, n = 8) { vs =>
      whenever(vs.distinct.size > 1) {
        val df = vs.zipWithIndex
          .map { case (v, i) => ("k", i.toLong, i.toLong, v) }
          .toDF("k", "ts", "tie", "v")
        val got = graft.operators.StatsOps
          .autocorrelation(df, Seq("k"), "ts", "tie", "v", maxLag = 2)
          .collect().map(r => r.getInt(1) ->
            (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
        val n = vs.size; val mean = vs.sum.toDouble / n
        val den = vs.map(v => (v - mean) * (v - mean)).sum
        for (l <- 1 to 2) {
          val num = (0 until n - l)
            .map(t => (vs(t) - mean) * (vs(t + l) - mean)).sum
          assert(approx(got(l).get, num / den, 1e-9),
            s"lag $l on $vs: got ${got(l)}")
          assert(got(l).get >= -1.0 - 1e-9 && got(l).get <= 1.0 + 1e-9)
        }
      }
    }
  }

  test("property: information-theoretic bounds — JSD in [0, ln2], chi2 >= 0, 0 <= MI <= min(H)") {
    import spark.implicits._
    val gen = Gen.listOfN(24, Gen.zip(Gen.oneOf("a", "b"),
      Gen.choose(0, 3), Gen.choose(0, 2)))
    forSamples(gen, n = 6) { rows =>
      whenever(rows.exists(_._1 == "a") && rows.exists(_._1 == "b")) {
        val df = rows.map { case (c, x, y) => (c, x.toString, y.toString) }
          .toDF("c", "x", "y")
        val jsd = operators.StatsOps.jsDivergence(df, "c", "a", "b", "x")
          .collect()(0).getDouble(2)
        assert(jsd >= -1e-12 && jsd <= math.log(2.0) + 1e-12, s"jsd=$jsd")
        val chi2 = operators.StatsOps.chi2Drift(df, "c", "a", "b", "x")
          .collect()(0).getDouble(3)
        assert(chi2 >= -1e-12, s"chi2=$chi2")
        val mi = operators.StatsOps.mutualInformation(df, "x", "y")
          .collect()(0)
        val (hx, hy, hxy, m) = (mi.getDouble(1), mi.getDouble(2),
          mi.getDouble(3), mi.getDouble(4))
        assert(m >= -1e-9, s"MI=$m negative")
        assert(m <= math.min(hx, hy) + 1e-9, s"MI=$m > min(H)")
        assert(approx(hx + hy - m, hxy, 1e-9),
          "identity: H(X,Y) = H(X) + H(Y) - MI")
      }
    }
  }

  test("property: rougePairs scores stay in [0,1] and recall <= ov/ref") {
    import spark.implicits._
    val word = Gen.oneOf("u", "v", "w", "x")
    val gen = Gen.zip(Gen.listOfN(5, word), Gen.listOfN(4, word))
    forSamples(gen, n = 6) { case (ws1, ws2) =>
      val docs = Seq((1L, ws1.mkString(" ")), (2L, ws2.mkString(" ")))
        .toDF("doc_id", "text")
      val pairs = Seq((1L, 2L)).toDF("id1", "id2")
      val r = operators.TextOps.rougePairs(pairs, docs, "doc_id", "text")
        .collect()(0)
      for (i <- Seq(6, 7, 8)) {
        val v = r.getDouble(i)
        assert(v >= 0.0 && v <= 1.0 + 1e-12, s"score $i out of [0,1]: $v")
      }
      assert(r.getLong(4) <= math.min(r.getLong(2), r.getLong(3)),
        "overlap bounded by both gram totals")
    }
  }

  test("property: repetitionScore fractions in [0,1]; all-duplicate doc saturates") {
    import spark.implicits._
    val gen = Gen.listOfN(12, Gen.oneOf("aa", "bb", "cc", "dd"))
    forSamples(gen, n = 8) { ws =>
      val df = Seq((1L, ws.mkString(" "))).toDF("doc_id", "text")
      val r = operators.TextOps.repetitionScore(df, "doc_id", "text")
        .collect()(0)
      for (i <- Seq(2, 3, 4, 5)) {
        val v = r.getDouble(i)
        assert(v >= 0.0 && v <= 1.0 + 1e-12, s"frac $i out of [0,1]: $ws")
      }
      // a doc of ONE repeated word saturates coverage: every word
      // position is inside a duplicated 5-gram, so the fraction is
      // exactly (word chars)/(total chars) — the separator chars are
      // the only uncovered mass
      val sat = Seq((2L, Seq.fill(12)("xx").mkString(" ")))
        .toDF("doc_id", "text")
      val rs = operators.TextOps.repetitionScore(sat, "doc_id", "text")
        .collect()(0)
      assert(rs.getDouble(4) === 24.0 / 35,
        "uniform doc: all word chars covered")
    }
  }

  test("property: ccnetBuckets covers every row and tertiles are mass-ordered") {
    import spark.implicits._
    val gen = Gen.listOfN(10, Gen.choose(0, 5))
    forSamples(gen, n = 8) { raw =>
      val df = raw.zipWithIndex
        .map { case (s, i) => ("en", s.toDouble, i.toLong) }
        .toDF("lang", "score", "doc_id")
      val out = operators.TextOps.ccnetBuckets(df, "lang", "score")
        .collect().map(r => (r.getDouble(1), r.getString(3)))
      assert(out.length === raw.size, "every input row labeled once")
      // bucket boundaries respect score order: max(tail) <= min(head),
      // and no tail score exceeds a middle score's … (monotone labels)
      def scores(b: String) = out.filter(_._2 == b).map(_._1)
      for (t <- scores("tail"); m <- scores("middle"))
        assert(t <= m, s"tail $t above middle $m in $raw")
      for (m <- scores("middle"); h <- scores("head"))
        assert(m <= h, s"middle $m above head $h in $raw")
      for (t <- scores("tail"); h <- scores("head"))
        assert(t < h || raw.distinct.size == 1,
          s"tail $t not below head $h in $raw")
    }
  }

  // ---- round-13: distribution-shaped degenerate inputs the 0/1-row
  // EmptySweep can't reach (VERDICT r12 next-round #7) ----

  private def winDf(ys: Seq[Int], g: String = "g") = {
    import spark.implicits._
    ys.zipWithIndex.flatMap { case (y, w) =>
      Seq.fill(y)((g, w.toLong))
    }.toDF("g", "win")
  }

  test("property: holtLinear drops 1/2-window series, 3 windows emit finite state") {
    assert(operators.SequenceOps.holtLinear(
      winDf(Seq(2)), "g", "win").count() === 0)
    assert(operators.SequenceOps.holtLinear(
      winDf(Seq(2, 3)), "g", "win").count() === 0)
    val r = operators.SequenceOps.holtLinear(
      winDf(Seq(2, 3, 5)), "g", "win").head()
    Seq("level", "trend", "forecast", "sse").foreach { c =>
      val v = r.getAs[Double](c)
      assert(!v.isNaN && !v.isInfinite, c)
    }
  }

  test("property: changepointSplit degenerate series — 1 window empty, constant series zero reduction") {
    assert(operators.SequenceOps.changepointSplit(
      winDf(Seq(4)), "g", "win").count() === 0)
    val two = operators.SequenceOps.changepointSplit(
      winDf(Seq(1, 5)), "g", "win").head()
    assert(two.getAs[Long]("split_at") === 1L)
    assert(two.getAs[Double]("mean_left") === 1.0)
    assert(two.getAs[Double]("mean_right") === 5.0)
    val const = operators.SequenceOps.changepointSplit(
      winDf(Seq(3, 3, 3, 3, 3)), "g", "win").head()
    assert(math.abs(const.getAs[Double]("sse_reduction")) < 1e-9)
  }

  test("property: gmm1dEm sigma floor on an all-equal group") {
    import spark.implicits._
    val df = Seq.fill(40)(("g", 5.0)).toDF("g", "v")
    val r = operators.StatsOps.gmm1dEm(df, "g", "v").head()
    // both components collapse onto the constant value with the
    // 0.25-grid variance floor (sqrt(0.25)/scale at quantDigits=1)
    assert(r.getAs[Double]("mu1") === 5.0)
    assert(r.getAs[Double]("mu2") === 5.0)
    assert(r.getAs[Double]("sigma1") === 0.05)
    assert(r.getAs[Double]("sigma2") === 0.05)
    Seq("w1").foreach { c =>
      val v = r.getAs[Double](c)
      assert(!v.isNaN && v >= 0.0 && v <= 1.0)
    }
  }

  test("property: kruskalWallis all-ties gives null h_corr, finite h") {
    import spark.implicits._
    val df = (Seq.fill(10)(("a", 7.0)) ++ Seq.fill(15)(("b", 7.0)))
      .toDF("g", "v")
    val r = operators.StatsOps.kruskalWallis(df, "g", "v").head()
    assert(r.isNullAt(r.fieldIndex("h_corr")),
      "tie correction denominator is 0 — h_corr must be null")
    assert(!r.getAs[Double]("h").isNaN)
  }

  test("property: theilIndex single source — between exactly 0, within == total bit-exactly") {
    import spark.implicits._
    val df = Seq(("s", 10L), ("s", 20L), ("s", 20L), ("s", 70L))
      .toDF("g", "v")
    val r = operators.StatsOps.theilIndex(df, "g", "v").head()
    assert(r.getAs[Double]("theil_between") === 0.0)
    assert(r.getAs[Double]("theil_within") ===
      r.getAs[Double]("theil_total"))
  }

  test("property: kaplanMeier/rmst with every lifetime censored — no death rows, rmst = tau, S = 1") {
    import spark.implicits._
    val dayNs = 86400000000000L
    // 3 users all spanning day 0..10; end = 10, censorDays = 7 ->
    // nobody satisfies d1 <= end - 7: all censored
    val ev = (1 to 3).flatMap(u =>
      Seq((u.toLong, 0L), (u.toLong, 10L * dayNs))).toDF("user", "ts")
    assert(operators.SequenceOps.kaplanMeier(ev, "user", "ts")
      .count() === 0)
    val r = operators.SequenceOps.rmst(ev, "user", "ts",
      censorDays = 7, tauDays = 7).head()
    assert(r.getAs[Long]("n_death_times") === 0L)
    assert(r.getAs[Double]("rmst") === 7.0)
    assert(r.getAs[Double]("s_final") === 1.0)
  }

  test("property: saxEncode constant series emits null z and symbol") {
    import spark.implicits._
    val df = (0 until 6).map(w => ("g", w.toLong, 4.0))
      .toDF("g", "win", "v")
    val rows = operators.SequenceOps.saxEncode(df, "g", "win", "v")
      .collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("z")), "z must be null at std=0")
      assert(r.isNullAt(r.fieldIndex("symbol")),
        "symbol must be null at std=0")
    }
  }

  test("property: kendallTau C/D equal the brute-force pair census") {
    import spark.implicits._
    // random paired (x, y) count series; the O(T log T) inversion
    // identity must match direct enumeration incl. every tie mode
    val rnd = new scala.util.Random(11)
    (0 until 25).foreach { _ =>
      val t = 3 + rnd.nextInt(10)
      val xs = Seq.fill(t)(1 + rnd.nextInt(3))
      val ys = Seq.fill(t)(1 + rnd.nextInt(3))
      val rows = (0 until t).flatMap { w =>
        Seq.fill(xs(w))(("A", w.toLong)) ++
          Seq.fill(ys(w))(("B", w.toLong))
      }
      val df = rows.toDF("c", "h")
      val r = operators.DiagnosticsOps.kendallTau(df, "c", "A", "B",
        "h").head()
      val pairs = for {
        i <- 0 until t; j <- 0 until t if i < j
      } yield (xs(i) - xs(j), ys(i) - ys(j))
      val cBrute = pairs.count { case (dx, dy) =>
        (dx < 0 && dy < 0) || (dx > 0 && dy > 0) }
      val dBrute = pairs.count { case (dx, dy) =>
        (dx < 0 && dy > 0) || (dx > 0 && dy < 0) }
      assert(r.getAs[Long]("concordant") === cBrute.toLong,
        s"C: $xs / $ys")
      assert(r.getAs[Long]("discordant") === dBrute.toLong,
        s"D: $xs / $ys")
    }
  }

  test("property: wilcoxonSignedRank W+ equals the brute-force midrank sum") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    (0 until 25).foreach { _ =>
      val n = 2 + rnd.nextInt(10)
      val ds = Seq.fill(n)(rnd.nextInt(9) - 4) // deltas in [-4, 4]
      val df = ds.zipWithIndex.map { case (d, i) =>
        (s"k$i", 0.0, d.toDouble)
      }.toDF("k", "pre", "post")
      val out = operators.DiagnosticsOps.wilcoxonSignedRank(df, "k",
        "pre", "post", quantDigits = 0).collect()
      val nz = ds.filter(_ != 0)
      if (nz.isEmpty) assert(out.head.getAs[Long]("n") === 0L)
      else {
        val sorted = nz.map(math.abs).sorted
        def midrank(a: Int): Double = {
          val lo = sorted.indexOf(a) + 1
          val hi = sorted.lastIndexOf(a) + 1
          (lo + hi) / 2.0
        }
        val wPlus = nz.filter(_ > 0).map(d => midrank(math.abs(d))).sum
        assert(out.head.getAs[Long]("n") === nz.length.toLong, s"$ds")
        assert(approx(out.head.getAs[Double]("w_plus"), wPlus), s"$ds")
      }
    }
  }

  test("property: mannKendall S equals the brute-force pair census on random series") {
    import spark.implicits._
    // 40 random series as 40 groups in ONE call (one Spark job)
    val rnd = new scala.util.Random(7)
    val series = (0 until 40).map { gi =>
      s"g$gi" -> Seq.fill(3 + rnd.nextInt(12))(1 + rnd.nextInt(4))
    }
    val df = series.flatMap { case (g, ys) =>
      ys.zipWithIndex.flatMap { case (y, w) =>
        Seq.fill(y)((g, w.toLong))
      }
    }.toDF("g", "win")
    val got = operators.StatsOps.mannKendall(df, "g", "win")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("m"), r.getAs[Long]("s")))).toMap
    series.foreach { case (g, ys) =>
      val brute = (for {
        i <- ys.indices; j <- ys.indices if i < j
      } yield math.signum(ys(j) - ys(i))).sum.toLong
      assert(got(g) === ((ys.length.toLong, brute)), s"$g: $ys")
    }
  }

  test("property: mannKendall monotone/constant closed forms") {
    val up = operators.StatsOps.mannKendall(
      winDf((1 to 8).toSeq), "g", "win").head()
    assert(up.getAs[Long]("s") === 28L) // C(8,2): all concordant
    assert(up.getAs[Double]("z") > 0)
    val down = operators.StatsOps.mannKendall(
      winDf((8 to 1 by -1).toSeq), "g", "win").head()
    assert(down.getAs[Long]("s") === -28L)
    assert(down.getAs[Double]("z") < 0)
    val const = operators.StatsOps.mannKendall(
      winDf(Seq.fill(6)(3)), "g", "win").head()
    assert(const.getAs[Long]("s") === 0L)
    assert(const.getAs[Double]("var_s") === 0.0) // full tie correction
    assert(const.getAs[Double]("z") === 0.0)
  }

  test("property: burstDetect constant-rate series has zero bursts") {
    val r = operators.SequenceOps.burstDetect(
      winDf(Seq.fill(10)(3)), "g", "win").head()
    assert(r.getAs[Long]("n_windows") === 10L)
    assert(r.getAs[Long]("n_bursts") === 0L)
    assert(r.getAs[Long]("burst_windows") === 0L)
  }

  test("property: gini within [0, (n-1)/n], HHI within [1/n, 1]") {
    import spark.implicits._
    val gen = Gen.listOfN(9, Gen.choose(0L, 50L))
    forSamples(gen, n = 8) { vs =>
      whenever(vs.sum > 0) {
        val df = vs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
          .toDF("k", "id", "v")
        val r = graft.operators.StatsOps
          .concentration(df, Seq("k"), "v", "id").collect()(0)
        val n = vs.size
        assert(r.getDouble(3) >= -1e-12 &&
          r.getDouble(3) <= (n - 1.0) / n + 1e-12, s"gini out of range: $vs")
        assert(r.getDouble(4) >= 1.0 / n - 1e-12 &&
          r.getDouble(4) <= 1.0 + 1e-12, s"hhi out of range: $vs")
      }
    }
  }
}
