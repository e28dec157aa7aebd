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
}
