package graft

import org.apache.spark.sql.functions._
import graft.operators.ClassifierOps

class ClassifierOpsSpec extends SparkSpec {
  import spark.implicits._

  // Linearly separable toy set: y = 1 iff x1 + x2 > 1
  private lazy val toy = {
    val rows = for {
      i <- 0 until 40; j <- 0 until 40
    } yield {
      val (x1, x2) = (i / 40.0, j / 40.0)
      (x1, x2, if (x1 + x2 > 1.0) 1.0 else 0.0)
    }
    rows.toDF("x1", "x2", "y")
  }

  test("GD separates a linearly separable set") {
    val w = ClassifierOps.trainLogistic(toy, Seq("x1", "x2"), "y",
      iters = 50, lr = 2.0)
    val acc = ClassifierOps.scoreLogistic(toy, Seq("x1", "x2"), w)
      .select(avg(when((col("score") >= 0.5) === (col("y") === 1.0), 1.0)
        .otherwise(0.0)))
      .as[Double].head()
    assert(acc > 0.95, s"accuracy $acc")
    // the learned boundary x1 + x2 = 1 has equal positive weights and
    // a negative bias of about their sum
    assert(w(0) > 0 && w(1) > 0 && w(2) < 0)
  }

  test("training is invariant to row order and partitioning") {
    val a = ClassifierOps.trainLogistic(toy, Seq("x1", "x2"), "y", iters = 5)
    val b = ClassifierOps.trainLogistic(
      toy.repartition(7).orderBy(xxhash64(col("x1"), col("x2"))),
      Seq("x1", "x2"), "y", iters = 5)
    // per-iteration 1e-9 quantization absorbs float sum-order noise, so
    // the trajectories are identical, not merely close
    assert(a.toSeq == b.toSeq)
  }

  test("log-loss decreases over iterations") {
    def loss(w: Array[Double]): Double =
      ClassifierOps.scoreLogistic(toy, Seq("x1", "x2"), w)
        .select(avg(-(col("y") * log(col("score")) +
          (lit(1.0) - col("y")) * log(lit(1.0) - col("score")))))
        .as[Double].head()
    val steps = Seq(1, 3, 10).map(k =>
      loss(ClassifierOps.trainLogistic(toy, Seq("x1", "x2"), "y", iters = k)))
    assert(steps == steps.sorted.reverse, s"loss not decreasing: $steps")
  }

  test("weight arity is validated") {
    intercept[IllegalArgumentException] {
      ClassifierOps.scoreLogistic(toy, Seq("x1", "x2"), Array(1.0, 2.0))
    }
  }

  test("rocAuc: separation 1.0, anti-separation 0.0, ties midranked") {
    def auc(rows: Seq[(Int, Double)]): (Long, Long, Double) = {
      val r = ClassifierOps.rocAuc(rows.toDF("label", "score"),
        "label", "score").head()
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) Double.NaN
       else r.getDouble(2))
    }
    // perfect ranking: every positive above every negative
    assert(auc(Seq((1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1))) ==
      ((2L, 2L, 1.0)))
    // inverted ranking
    assert(auc(Seq((0, 0.9), (0, 0.8), (1, 0.2), (1, 0.1))) ==
      ((2L, 2L, 0.0)))
    // all tied at one score: AUC is exactly 1/2 from the tie half-count
    assert(auc(Seq((1, 0.5), (0, 0.5), (1, 0.5), (0, 0.5))) ==
      ((2L, 2L, 0.5)))
    // hand case: pos at {0.8, 0.4}, neg at {0.6, 0.4}. Pairs:
    // 0.8 beats both (2) + 0.4 beats none, ties one (0.5) = 2.5 of 4
    assert(auc(Seq((1, 0.8), (1, 0.4), (0, 0.6), (0, 0.4))) ==
      ((2L, 2L, 0.625)))
  }

  test("rocAuc: degenerate one-class input yields null, not a throw") {
    val r = ClassifierOps.rocAuc(
      Seq((1, 0.7), (1, 0.3)).toDF("label", "score"), "label", "score")
      .head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.isNullAt(2))
  }

  test("rocAuc is invariant to row order and partitioning") {
    val rows = (0 until 400).map { i =>
      (i % 3 min 1, ((i * 37) % 100) / 100.0)
    }
    val a = ClassifierOps.rocAuc(rows.toDF("label", "score"),
      "label", "score").head()
    val b = ClassifierOps.rocAuc(
      rows.toDF("label", "score").repartition(7), "label", "score").head()
    assert(a == b)
  }

  test("cohensKappa: perfect agreement 1, known 2x2 hand value") {
    def kap(rows: Seq[(String, String)]): Double =
      ClassifierOps.cohensKappa(rows.toDF("a", "b"), "a", "b")
        .head().getDouble(2)
    assert(kap(Seq(("x", "x"), ("y", "y"), ("z", "z"))) == 1.0)
    // classic 2x2: cells yy=20, yn=5, ny=10, nn=15, n=50
    // po = 35/50; pe = (25*30 + 25*20)/2500 = 0.5; kappa = 0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    assert(math.abs(kap(rows) - 0.4) < 1e-12)
  }

  test("liftCurve: perfect ranking concentrates lift, ties stay together") {
    def curve(rows: Seq[(Int, Double)], k: Int) =
      ClassifierOps.liftCurve(rows.toDF("label", "score"), "label",
          "score", buckets = k)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
        .toMap
    // 10 rows, both positives carry the 2 highest scores; 2 buckets
    val rows = (0 until 10).map(i =>
      (if (i < 2) 1 else 0, 1.0 - i * 0.1))
    val c = curve(rows, 2)
    // top half: 5 rows, 2 of 2 positives -> gain 1, lift = 2·10/(5·2)
    assert(c(0L) === ((5L, 2L, 1.0, 2.0)))
    assert(c(1L) === ((5L, 0L, 1.0, 0.0)))
    // one fully-tied score: ONE bucket holds everything, lift exactly 1
    val tied = curve((0 until 8).map(i => (i % 2, 0.5)), 4)
    assert(tied === Map(0L -> ((8L, 4L, 1.0, 1.0))))
    // no positives: gain/lift null, never a throw
    val none = ClassifierOps.liftCurve(
      Seq((0, 0.9), (0, 0.1)).toDF("label", "score"), "label", "score")
      .collect()
    assert(none.forall(r => r.isNullAt(3) && r.isNullAt(4)))
  }

  test("cohensKappa: independent raters near 0, constant rater exact 0") {
    import graft.operators.ClassifierOps.cohensKappa
    // a constant rater makes observed agreement equal chance agreement
    val const = Seq(("y", "p"), ("n", "p"), ("y", "p"), ("n", "p"))
    assert(cohensKappa(const.toDF("a", "b"), "a", "b")
      .head().getDouble(2) == 0.0)
    // both raters constant and agreeing: p_e = 1 → undefined → null
    val degen = Seq(("p", "p"), ("p", "p"))
    assert(cohensKappa(degen.toDF("a", "b"), "a", "b").head().isNullAt(2))
    // multi-class disagreement beyond chance goes negative
    val anti = Seq(("x", "y"), ("y", "x"), ("x", "y"), ("y", "x"))
    assert(cohensKappa(anti.toDF("a", "b"), "a", "b")
      .head().getDouble(2) == -1.0)
  }

  test("isotonicCalibrate pools adjacent violators (hand PAV case)") {
    // bucket means 0.75, 0.25, 1.0 -> classic PAV pools the first two
    // to 0.5 and leaves 1.0: iso = [0.5, 0.5, 1.0]
    val rows =
      Seq.fill(3)((0.01, 1)) ++ Seq((0.01, 0)) ++
      Seq((0.31, 1)) ++ Seq.fill(3)((0.31, 0)) ++
      Seq.fill(2)((0.61, 1))
    val out = ClassifierOps.isotonicCalibrate(
        rows.toDF("score", "label"), "label", "score", bins = 50)
      .orderBy("bucket").collect()
    assert(out.map(_.getAs[Long]("bucket")).toSeq === Seq(0L, 15L, 30L))
    assert(out.map(_.getAs[Double]("iso_p")).toSeq === Seq(0.5, 0.5, 1.0))
    // monotone by construction
    assert(out.map(_.getAs[Double]("iso_p")).toSeq ===
      out.map(_.getAs[Double]("iso_p")).sorted.toSeq)
    // frac_pos reports the raw (unpooled) per-bucket rate
    assert(out.map(_.getAs[Double]("frac_pos")).toSeq ===
      Seq(0.75, 0.25, 1.0))
  }

  test("conformalInterval: exact-linear data gives zero-width intervals") {
    val df = (0L until 400L).map(k => (k, k % 10, 10 * (k % 10) + 7))
      .toDF("k", "x", "y")
    val r = ClassifierOps.conformalInterval(df, "k", "x", "y", alpha = 0.1)
      .head()
    assert(approx(r.getAs[Double]("slope"), 10.0, 1e-9))
    assert(approx(r.getAs[Double]("intercept"), 7.0, 1e-9))
    assert(r.getAs[Long]("qhat") === 0L)
    assert(r.getAs[Double]("coverage") === 1.0)
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_cal") +
      r.getAs[Long]("n_test") === 400L)
  }

  test("conformalInterval qhat is the ceil((n+1)(1-alpha))-th residual") {
    import graft.operators.SampleOps
    // y = 10x plus a key-parity bump of 5 -> residuals are a known
    // two-point distribution; replicate the split + rank rule in
    // plain Scala as an independent check of the rank-select
    val rows = (0L until 1000L).map { k =>
      (k, k % 10, 10 * (k % 10) + (if (k % 2 == 0) 0L else 5L))
    }
    val df = rows.toDF("k", "x", "y")
    val r = ClassifierOps.conformalInterval(df, "k", "x", "y",
      alpha = 0.2).head()
    // independent replica: buckets via the same public splitBucket,
    // OLS + residuals + quantile in plain Scala collections
    val buckets = df.select(col("k"),
        SampleOps.splitBucket(col("k")).as("b"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val train = rows.filter(t => buckets(t._1) < 6000)
    val n = train.size.toDouble
    val (sx, sy) = (train.map(_._2).sum.toDouble, train.map(_._3).sum.toDouble)
    val sxx = train.map(t => t._2 * t._2).sum.toDouble
    val sxy = train.map(t => t._2 * t._3).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    def rq(t: (Long, Long, Long)): Long =
      math.floor(math.abs(t._3.toDouble - (icept + slope * t._2)) *
        100.0 + 0.5).toLong
    val cal = rows.filter(t =>
      buckets(t._1) >= 6000 && buckets(t._1) < 8000).map(rq).sorted
    val k = math.min(cal.size.toLong,
      math.ceil((cal.size + 1).toDouble * 0.8).toLong)
    assert(r.getAs[Long]("qhat") === cal((k - 1).toInt))
    val test = rows.filter(t => buckets(t._1) >= 8000)
    val covered = test.count(t => rq(t) <= r.getAs[Long]("qhat"))
    assert(r.getAs[Long]("n_covered") === covered.toLong)
  }

  test("bradleyTerry: two-player MLE exact, transitive ordering, sum 1") {
    // A beats B 3-1: two-player BT MLE is exactly (0.75, 0.25)
    val ab = Seq(("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"))
    val r = ClassifierOps.bradleyTerry(ab.toDF("w", "l"), "w", "l")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r("A") === ((3L, 4L, 0.75)))
    assert(r("B") === ((1L, 4L, 0.25)))
    // A > B > C dominance survives; ratings normalize to 1
    val abc = Seq(("A", "B"), ("A", "B"), ("B", "C"), ("B", "C"),
      ("A", "C"), ("C", "A"))
    val r3 = ClassifierOps.bradleyTerry(abc.toDF("w", "l"), "w", "l")
      .collect().map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(r3("A") > r3("B") && r3("B") > r3("C"))
    assert(approx(r3.values.sum, 1.0, 1e-12))
  }

  test("passAtK: hand combinatorics, degenerate cases, n<k dropped") {
    // A: n=3 c=1 -> pass@1 = 1/3; B: n=5 c=0 -> 0; C: n=5 c=5 -> 1
    val rows = Seq(("A", 1L), ("A", 0L), ("A", 0L)) ++
      (1 to 5).map(_ => ("B", 0L)) ++ (1 to 5).map(_ => ("C", 1L))
    val out = ClassifierOps.passAtK(rows.toDF("t", "y"), "t", "y")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 === 3L)
    // per-task pass snaps to 1e-9 before the mean
    val third = math.floor(1.0 / 3 * 1e9 + 0.5) / 1e9
    assert(approx(out(1L)._2, (third + 0.0 + 1.0) / 3, 1e-12))
    assert(out(5L) === ((2L, 0.5))) // A dropped (n < 5)
    assert(!out.contains(10L))      // nobody has 10 samples
    // pass@2 on n=4 c=2: 1 - (2/4)(1/3) = 5/6
    val two = ClassifierOps.passAtK(
      Seq(("d", 1L), ("d", 1L), ("d", 0L), ("d", 0L)).toDF("t", "y"),
      "t", "y", ks = Seq(2)).head()
    assert(approx(two.getDouble(2), 5.0 / 6, 1e-9))
  }

  test("stumpTrain: perfect split beats noise feature, hand gain") {
    // feature f: y == x exactly -> split at 1, gain 0.5, acc 1
    // feature g: y independent of x -> gain 0
    val rows = Seq(("f", 0L, 0L), ("f", 0L, 0L), ("f", 1L, 1L),
      ("f", 1L, 1L), ("g", 0L, 0L), ("g", 0L, 1L), ("g", 1L, 0L),
      ("g", 1L, 1L))
    val r = ClassifierOps.stumpTrain(rows.toDF("f", "x", "y"),
      "f", "x", "y").head()
    assert(r.getString(0) === "f")
    assert(r.getLong(1) === 1L)
    assert(approx(r.getDouble(2), 0.5))
    assert(approx(r.getDouble(3), 1.0))
    assert(r.getLong(4) === 4L)
  }

  test("pinballEval: matches an independent sorted-rank replay") {
    val P = 1000000007L
    val A = 2654435761L
    def bucket(k: Long): Long = Math.floorMod(k, P) * A % P % 10000
    val rows = (1L to 300L).map(k => ("g", k, (k % 37).toDouble / 3.0))
    val df = rows.toDF("g", "k", "v")
    val out = ClassifierOps.pinballEval(df, "g", "k", "v")
      .collect().map(r => r.getDouble(1) ->
        ((r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    val grid = (v: Double) => math.floor(v * 100 + 0.5).toLong
    val train = rows.filter(r => bucket(r._2) < 8000).map(r => grid(r._3))
      .sorted
    val test = rows.filter(r => bucket(r._2) >= 8000).map(r => grid(r._3))
    assert(train.nonEmpty && test.nonEmpty)
    for (k <- Seq(1, 5, 9)) {
      val rank = (k * train.size + 9) / 10
      val qhat = train(rank - 1)
      val loss = test.map(v =>
        math.max(k * (v - qhat), (k - 10) * (v - qhat))).sum
      val (oQhat, oN, oPin) = out(k / 10.0)
      assert(oQhat === qhat / 100.0)
      assert(oN === test.size.toLong)
      assert(approx(oPin, loss.toDouble / 10.0 / 100.0 / test.size))
    }
  }

  test("fleissKappa: hand value, unbalanced items dropped not biased") {
    // item 1 = (A,A,A): pn 6; item 2 = (A,A,B): pn 2
    // pbar = 8/12; col sums A=5 B=1 -> pe = 26/36; kappa = -0.2
    val base = Seq((1L, "A"), (1L, "A"), (1L, "A"),
      (2L, "A"), (2L, "A"), (2L, "B"))
    val r = ClassifierOps.fleissKappa(base.toDF("i", "c"), "i", "c", 3)
      .head()
    assert(r.getAs[Long]("n_items") === 2L)
    assert(r.getAs[Long]("n_dropped") === 0L)
    assert(approx(r.getAs[Double]("p_bar"), 8.0 / 12))
    assert(approx(r.getAs[Double]("p_e"), 26.0 / 36))
    assert(approx(r.getAs[Double]("kappa"), -0.2))
    // a 2-rating item is dropped and leaves the statistic unchanged
    val withBad = base ++ Seq((3L, "A"), (3L, "B"))
    val r2 = ClassifierOps.fleissKappa(withBad.toDF("i", "c"), "i", "c", 3)
      .head()
    assert(r2.getAs[Long]("n_dropped") === 1L)
    assert(approx(r2.getAs[Double]("kappa"), -0.2))
    // perfect agreement across all items -> kappa 1 when pe < 1
    val perfect = Seq((1L, "A"), (1L, "A"), (2L, "B"), (2L, "B"))
    val r3 = ClassifierOps.fleissKappa(perfect.toDF("i", "c"), "i", "c", 2)
      .head()
    assert(approx(r3.getAs[Double]("kappa"), 1.0))
  }
}
