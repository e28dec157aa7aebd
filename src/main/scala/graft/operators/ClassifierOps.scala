package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear-classifier training (beyond-parity: the
  * fastText-style quality/language filter every web-scale pretraining
  * pipeline runs between heuristic gating and tokenization — cf.
  * CCNet / GPT-3 WebText quality classifiers).
  *
  * Full-batch gradient-descent logistic regression as ONE hash
  * aggregate per iteration: the gradient is d+1 `sum()` columns
  * (partial/final aggregation, map-side combined — no shuffle of fact
  * rows, no per-row state), and the only driver state is the
  * (d+1)-double weight vector. k iterations = k scans at 100 TB, the
  * same access pattern as MLlib's iterative optimizers; at that scale
  * the input would be the (tiny) featurized projection of the corpus,
  * which Catalyst prunes to d+2 columns off the parquet scan.
  *
  * Determinism: weights are quantized to the 1e-9 grid after every
  * step, in the same arithmetic order on both engines, so the whole
  * trajectory is engine-exact and oracle-replayable (the last-ulp
  * noise of float sum order and libm exp stays ~1e-13, far inside the
  * grid — the round-4 CLEAN-oracle technique).
  */
object ClassifierOps {

  /** floor(x*1e9 + 0.5)/1e9 — the per-iteration weight grid. */
  private def q9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  /** z = w(0)*f0 + w(1)*f1 + ... + bias, built left-associated so the
    * SQL mirror `w1*f1 + w2*f2 + ... + b` is bit-identical.
    */
  private def margin(features: Seq[String], w: Array[Double]): Column = {
    val terms = features.zipWithIndex.map { case (f, j) => col(f) * lit(w(j)) }
    terms.reduceLeft(_ + _) + lit(w.last)
  }

  /** Train on `features` (double columns) against a 0/1 double
    * `label`; returns d weights + bias (last). lr and iters are part
    * of the model's identity — mirror them in any oracle.
    */
  def trainLogistic(df: DataFrame, features: Seq[String], label: String,
                    iters: Int = 5, lr: Double = 0.5): Array[Double] = {
    require(features.nonEmpty && iters >= 0)
    val d = features.size
    var w = Array.fill(d + 1)(0.0)
    for (_ <- 1 to iters) {
      val sig = lit(1.0) / (lit(1.0) + exp(-margin(features, w)))
      val err = sig - col(label)
      val gradCols = features.map(f => sum(err * col(f))) :+ sum(err)
      val row = df.agg(count(lit(1)).as("_n"),
        gradCols.zipWithIndex.map { case (c, j) => c.as(s"_g$j") }: _*)
        .collect()(0)
      require(row.getLong(0) > 0,
        "trainLogistic needs a non-empty corpus (0 rows after filtering)")
      val n = row.getLong(0).toDouble
      w = Array.tabulate(d + 1)(j => q9(w(j) - lr * row.getDouble(j + 1) / n))
    }
    w
  }

  /** Score rows with a trained model: sigmoid(margin), pure codegen
    * projection (weights are literals in the plan — broadcast-free,
    * shuffle-free, scan-shaped at any scale).
    */
  def scoreLogistic(df: DataFrame, features: Seq[String],
                    w: Array[Double], out: String = "score"): DataFrame = {
    require(w.length == features.size + 1,
      s"got ${w.length} weights for ${features.size} features + bias")
    df.withColumn(out, lit(1.0) / (lit(1.0) + exp(-margin(features, w))))
  }
}
