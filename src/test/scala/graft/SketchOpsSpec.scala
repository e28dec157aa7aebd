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
}
