package graft

import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.SimilarityOps

/** The native ANN kernels (functions/VectorKernels.scala) replace the
  * round-1..7 Scala-UDF folds on the hottest corpus scans, so their
  * WHOLE-STAGE-CODEGEN path must be bit-identical to the plain Scala
  * reference folds they displaced. Each test drives the expression
  * through a DataFrame (codegen path) and checks every row against
  * the reference implementation computed driver-side.
  */
class VectorKernelsSpec extends SparkSpec {

  import spark.implicits._

  // deterministic pseudo-random vectors (no RNG state)
  private def vec(seed: Int, dim: Int): Array[Double] =
    Array.tabulate(dim)(j => ((seed * 31 + j) * 2654435761L % 997L) / 997.0 - 0.5)

  private val dim = 12
  private val vecs = (0 until 40).map(i => (i.toLong, vec(i, dim)))
  private lazy val df = vecs.toDF("id", "v")

  private val cents: Seq[(Long, Array[Double])] =
    (0L until 5L).map(c => (c, vec(1000 + c.toInt, dim)))

  test("SquaredDistance matches the sqDistFn fold through codegen") {
    val out = df.select($"id", SquaredDistance($"v", lit(vec(999, dim))).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, v) <- vecs)
      assert(out(id) == SimilarityOps.sqDistFn(v.toSeq, vec(999, dim).toSeq),
        s"id $id")
  }

  test("SquaredDistance widens float arrays like the oracle's ::DOUBLE[] cast") {
    val fdf = vecs.map { case (id, v) => (id, v.map(_.toFloat)) }.toDF("id", "v")
    val out = fdf.select($"id",
        SquaredDistance($"v", lit(vec(999, dim))).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, v) <- vecs)
      assert(out(id) == SimilarityOps.sqDistFn(
        v.map(x => x.toFloat.toDouble).toSeq, vec(999, dim).toSeq), s"id $id")
  }

  test("NearestCentroidId reproduces the asc-id first-wins argmin") {
    val out = df.select($"id", NearestCentroidId($"v", cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, v) <- vecs) {
      val expect = cents.map { case (cid, ct) =>
        (SimilarityOps.sqDistFn(v.toSeq, ct.toSeq), cid) }.min._2
      assert(out(id) == expect, s"id $id")
    }
  }

  test("ProbeListIds reproduces sortBy((dist, id)).take(nProbe)") {
    val nProbe = 3
    val out = df.select($"id", ProbeListIds($"v", cents, nProbe).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for ((id, v) <- vecs) {
      val expect = cents.map { case (cid, ct) =>
        (SimilarityOps.sqDistFn(v.toSeq, ct.toSeq), cid) }
        .sortBy(identity).take(nProbe).map(_._2)
      assert(out(id) == expect, s"id $id")
    }
  }

  test("PqCodes / PqDistTable / AdcFromTable compose to the direct ADC sum") {
    val m = 3; val dsub = 4; val ksub = 4
    val codebooks = Array.tabulate(m, ksub)((s, c) =>
      vec(2000 + s * ksub + c, dsub))
    val qv = vec(3000, dim)
    val codesOut = df.select($"id", PqCodes($"v", codebooks).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    for ((id, v) <- vecs; s <- 0 until m) {
      val sub = v.slice(s * dsub, s * dsub + dsub)
      val expect = (0 until ksub).map(c =>
        (SimilarityOps.sqDistFn(sub.toSeq, codebooks(s)(c).toSeq), c)).min._2
      assert(codesOut(id)(s) == expect, s"id $id subspace $s")
    }
    val scale = 1e6
    val adcOut = df.select($"id", AdcFromTable(
        PqDistTable(lit(qv), codebooks), PqCodes($"v", codebooks),
        ksub, scale).as("adc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, v) <- vecs) {
      var acc = 0.0
      for (s <- 0 until m) {
        val sub = qv.slice(s * dsub, s * dsub + dsub)
        acc += SimilarityOps.sqDistFn(sub.toSeq,
          codebooks(s)(codesOut(id)(s)).toSeq)
      }
      assert(adcOut(id) == math.floor(acc * scale + 0.5) / scale, s"id $id")
    }
  }

  test("HyperplaneSig reproduces the sign-bit bucket") {
    val nplanes = 6
    val planes = Array.tabulate(nplanes, dim)((i, j) =>
      SimilarityOps.hyperplane(i, j))
    val out = df.select($"id", HyperplaneSig($"v", planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, v) <- vecs) {
      var expect = 0L
      for (i <- 0 until nplanes)
        if (SimilarityOps.dotFn(v.toSeq, planes(i).toSeq) > 0)
          expect += (1L << i)
      assert(out(id) == expect, s"id $id")
    }
  }

  test("ProjectVector reproduces the JL sign-matrix fold") {
    val outDim = 4
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val mat = Array.tabulate(outDim, dim)((d, j) =>
      SimilarityOps.projSign(d, j).toDouble)
    val out = df.select($"id", ProjectVector($"v", mat, scale).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for ((id, v) <- vecs; d <- 0 until outDim) {
      var acc = 0.0
      for (j <- 0 until dim) acc += v(j) * SimilarityOps.projSign(d, j)
      assert(out(id)(d) == acc * scale, s"id $id out_dim $d")
    }
  }

  test("interpreted eval matches codegen (spot check via expression eval)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val v = vec(7, dim)
    val litV = Literal.create(v, org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val sorted = cents.sortBy(_._1).toArray
    val nc = functions.NearestCentroidId(litV, sorted.map(_._1), sorted.map(_._2))
    val expect = cents.map { case (cid, ct) =>
      (SimilarityOps.sqDistFn(v.toSeq, ct.toSeq), cid) }.min._2
    assert(nc.eval(null) == expect)
    val pl = functions.ProbeListIds(litV, sorted.map(_._1), sorted.map(_._2), 2)
    val expectP = cents.map { case (cid, ct) =>
      (SimilarityOps.sqDistFn(v.toSeq, ct.toSeq), cid) }
      .sortBy(identity).take(2).map(_._2)
    assert(pl.eval(null).asInstanceOf[ArrayData].toLongArray.toSeq == expectP)
  }

  test("ProbeListIds truncates (no crash) when a NaN query voids all distances") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val nanV = Array.fill(dim)(Double.NaN)
    val litV = Literal.create(nanV, org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val sorted = cents.sortBy(_._1).toArray
    val pl = functions.ProbeListIds(litV, sorted.map(_._1), sorted.map(_._2), 2)
    assert(pl.eval(null).asInstanceOf[ArrayData].numElements() === 0)
  }

  test("PqDistTable rejects ragged codebooks at construction") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val litV = Literal.create(Array(0.0, 1.0),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))
    val ragged = Array(
      Array(Array(0.0), Array(1.0)), // ksub 2
      Array(Array(0.0)))             // ksub 1
    intercept[IllegalArgumentException] {
      functions.PqDistTable(litV, ragged)
    }
  }

  test("scalarQuantize8: endpoints exact, midpoint error, flat dim 0") {
    // dim0 range [0,1], dim1 range [10,20], dim2 flat (code 0, err 0)
    val df = Seq((1L, Seq(0f, 10f, 7f), "x"),
      (2L, Seq(1f, 20f, 7f), "x"),
      (3L, Seq(0.5f, 15f, 7f), "x")).toDF("id", "v", "lab")
    val r = SimilarityOps.scalarQuantize8(df, "id", "v", "lab").head()
    assert(r.getAs[Long]("n_dims") === 9L)
    // endpoints reconstruct exactly; midpoints code to 128 with
    // err (1/510)^2 resp. (10/510)^2, each snapped to the 1e-12 grid
    def eq(x: Double, lo: Double, hi: Double): Long = {
      val code = math.floor((x - lo) / (hi - lo) * 255.0 + 0.5)
      val recon = lo + code / 255.0 * (hi - lo)
      math.floor((x - recon) * (x - recon) * 1.0e12 + 0.5).toLong
    }
    val want = (eq(0.5, 0, 1) + eq(15, 10, 20)).toDouble / 1.0e12 / 9
    assert(approx(r.getAs[Double]("mse"), want, 1e-12))
  }

  test("featureMi: predictive dim scores ln2, constant dim scores 0") {
    val df = Seq((1L, Seq(0f, 0.5f), 0), (2L, Seq(0f, 0.5f), 0),
      (3L, Seq(1f, 0.5f), 1), (4L, Seq(1f, 0.5f), 1))
      .toDF("id", "v", "label")
    val out = SimilarityOps.featureMi(df, "v", "label").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(0L)._1 === 4L)
    assert(approx(out(0L)._2, math.log(2.0), 1e-12))
    assert(out(1L)._2 === 0.0)
  }

  test("pcaPower: rank-1 cloud recovers its axis, lambda, and sign") {
    // all points on span{(3,4)}: top PC = (0.6, 0.8) with sign fixed
    // by v0 = e0 (first Gram column is positive), lambda = 62.5
    val df = Seq((1L, Seq(3f, 4f)), (2L, Seq(-3f, -4f)),
      (3L, Seq(6f, 8f)), (4L, Seq(-6f, -8f))).toDF("id", "v")
    val out = SimilarityOps.pcaPower(df, "id", "v").collect()
      .map(r => r.getInt(1) -> ((r.getDouble(2), r.getDouble(3),
        r.getLong(4)))).toMap
    assert(out(0)._3 === 4L)
    assert(approx(out(0)._1, 0.6, 1e-9))
    assert(approx(out(1)._1, 0.8, 1e-9))
    assert(approx(out(0)._2, 62.5, 1e-9))
    // centering: a constant offset must not change the component
    val shifted = Seq((1L, Seq(13f, 24f)), (2L, Seq(7f, 16f)),
      (3L, Seq(16f, 28f)), (4L, Seq(4f, 12f))).toDF("id", "v")
    val s0 = SimilarityOps.pcaPower(shifted, "id", "v").collect()
      .map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(approx(s0(0), 0.6, 1e-9) && approx(s0(1), 0.8, 1e-9))
  }

  test("pcaPower deflation: orthogonal second component + eigenvalues") {
    // span{(0.6,0.8)} with lambda 250/6 plus span{(0.8,-0.6)} with
    // lambda 50/6: deflation must recover both axes in order
    val df = Seq((1L, Seq(3f, 4f)), (2L, Seq(-3f, -4f)),
      (3L, Seq(6f, 8f)), (4L, Seq(-6f, -8f)),
      (5L, Seq(4f, -3f)), (6L, Seq(-4f, 3f))).toDF("id", "v")
    val out = SimilarityOps.pcaPower(df, "id", "v", components = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(approx(out((1, 0))._1, 0.6, 1e-4))
    assert(approx(out((1, 1))._1, 0.8, 1e-4))
    assert(approx(out((1, 0))._2, 250.0 / 6, 1e-4))
    assert(approx(out((2, 0))._1, 0.8, 1e-4))
    assert(approx(out((2, 1))._1, -0.6, 1e-4))
    assert(approx(out((2, 0))._2, 50.0 / 6, 1e-4))
  }
}
