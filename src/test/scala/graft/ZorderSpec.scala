package graft

import java.io.File
import org.apache.spark.sql.functions._
import graft.sources.IoOps

/** The property that makes writeZordered worth a rewrite at 100 TB:
  * after Z-ordering, each output file covers a small hypercube of the
  * (x, y) domain, so parquet footer min/max stats can prune a 2-d
  * range predicate. A hash-partitioned write gives every file the FULL
  * domain on both axes — nothing is ever skippable.
  */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  private def meanNormRange(dir: String, cols: Seq[String],
                            lo: Seq[Double], hi: Seq[Double]): Seq[Double] = {
    val files = new File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).toSeq
    assert(files.size >= 4, s"expected several files, got ${files.size}")
    val perFile = files.map { f =>
      val aggs = cols.flatMap(c => Seq(min(col(c)).cast("double"),
        max(col(c)).cast("double")))
      val r = spark.read.parquet(f).agg(aggs.head, aggs.tail: _*).head()
      cols.indices.map(i =>
        (r.getDouble(2 * i + 1) - r.getDouble(2 * i)) / (hi(i) - lo(i)))
    }
    cols.indices.map(i => perFile.map(_(i)).sum / perFile.size)
  }

  test("zorderKey interleaves bits (locality: nearby points share prefixes)") {
    val df = Seq((0.0, 0.0), (1.0, 1.0), (0.0, 1.0), (1.0, 0.0))
      .toDF("x", "y")
    val keys = df.select(IoOps.zorderKey(Seq(col("x"), col("y")),
        Seq(0.0, 0.0), Seq(1.0, 1.0), bits = 2).as("z"))
      .collect().map(_.getLong(0))
    // 2-bit quantization: 0.0 -> 00, 1.0 -> 11. Interleaved (bit j of
    // col i at position 2j+i): (x=3,y=3) -> 1111=15, (x=0,y=3) ->
    // 1010=10, (x=3,y=0) -> 0101=5.
    assert(keys.toSeq == Seq(0L, 15L, 10L, 5L))
  }

  test("zorderKey: bijective on the quantized grid, monotone per axis") {
    // every (qx, qy) cell maps to a distinct key (no two cells ever
    // collide into one sort position), and with the other axis fixed
    // the key grows with the coordinate — the two properties that make
    // range-partitioning the key equivalent to tiling the plane
    val n = 8 // 3-bit grid exercised through the full 16-bit key path
    val grid = (0 until n).flatMap(x => (0 until n).map(y =>
      (x.toDouble, y.toDouble))).toDF("x", "y")
    val rows = grid.select(col("x"), col("y"),
        IoOps.zorderKey(Seq(col("x"), col("y")),
          Seq(0.0, 0.0), Seq(n - 1.0, n - 1.0), bits = 3).as("z"))
      .collect().map(r => (r.getDouble(0).toInt, r.getDouble(1).toInt) ->
        r.getLong(2)).toMap
    assert(rows.values.toSeq.distinct.size === n * n)
    for (fixed <- 0 until n; i <- 1 until n) {
      assert(rows((i, fixed)) > rows((i - 1, fixed)))
      assert(rows((fixed, i)) > rows((fixed, i - 1)))
    }
  }

  test("writeZordered handles empty input and 4 columns at default bits") {
    val empty = spark.emptyDataFrame
      .withColumn("a", lit(1.0)).withColumn("b", lit(2.0)).limit(0)
    IoOps.writeZordered(empty, "/tmp/graft_zorder_spec_empty", Seq("a", "b"))
    assert(spark.read.parquet("/tmp/graft_zorder_spec_empty").count() === 0)
    // 4 z-columns at the default bits=16 auto-clamp to 15 bits/col
    val four = Seq((1.0, 2.0, 3.0, 4.0), (5.0, 6.0, 7.0, 8.0))
      .toDF("a", "b", "c", "d")
    IoOps.writeZordered(four, "/tmp/graft_zorder_spec_four",
      Seq("a", "b", "c", "d"), numFiles = 1)
    assert(spark.read.parquet("/tmp/graft_zorder_spec_four").count() === 2)
  }

  test("Z-ordered files cover small hypercubes; hash layout covers everything") {
    val sf = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val stats = li.agg(
      min("l_extendedprice").cast("double"), max("l_extendedprice").cast("double"),
      min("l_quantity").cast("double"), max("l_quantity").cast("double")).head()
    val lo = Seq(stats.getDouble(0), stats.getDouble(2))
    val hi = Seq(stats.getDouble(1), stats.getDouble(3))
    val cols = Seq("l_extendedprice", "l_quantity")

    val zDir = "/tmp/graft_zorder_spec_z"
    IoOps.writeZordered(li, zDir, cols, numFiles = 16)
    val zRange = meanNormRange(zDir, cols, lo, hi)

    val hDir = "/tmp/graft_zorder_spec_h"
    li.repartition(16).write.mode("overwrite").parquet(hDir)
    val hRange = meanNormRange(hDir, cols, lo, hi)

    // 16 files over a 2-d Morton curve -> each file spans roughly a
    // 1/4 x 1/4 tile (plus curve-boundary spill); hash layout spans
    // ~the whole domain per file on both axes.
    assert(zRange.forall(_ < 0.6),
      s"z-ordered per-file footprint too wide: $zRange")
    assert(hRange.forall(_ > 0.8),
      s"hash baseline unexpectedly clustered: $hRange")
    assert(cols.indices.forall(i => zRange(i) < hRange(i) / 2),
      s"z-order not clearly tighter than hash: $zRange vs $hRange")

    // and the rewrite is lossless
    assert(spark.read.parquet(zDir).count() === li.count())
  }

  test("hilbertKey pins the xy2d orientation and walks the grid in unit steps") {
    // order-2 pinned values of the public-domain xy2d transform:
    // the first quadrant visits (0,0),(1,0),(1,1),(0,1), and (1,2)=7
    val pts = Seq((0L, 0L), (1L, 0L), (1L, 1L), (0L, 1L), (1L, 2L))
      .toDF("x", "y")
    val d = pts.select(graft.functions.HilbertIndex(
        col("x"), col("y"), bits = 2).as("d"))
      .collect().map(_.getLong(0))
    assert(d.toSeq === Seq(0L, 1L, 2L, 3L, 7L))

    // exhaustive at bits=4 (16x16): the key is a bijection onto
    // [0, 256) and consecutive keys are GRID NEIGHBORS (|dx|+|dy| = 1)
    // — the defining Hilbert property Morton lacks, and the reason
    // range-partitioned files have no diagonal seams
    val n = 16
    val grid = (0 until n).flatMap(x => (0 until n).map(y =>
      (x.toLong, y.toLong))).toDF("x", "y")
    val cells = grid.select(col("x"), col("y"),
        graft.functions.HilbertIndex(col("x"), col("y"), bits = 4).as("d"))
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    assert(cells.map(_._1).toSeq === (0L until (n * n).toLong))
    cells.sliding(2).foreach { case Array((_, (x0, y0)), (_, (x1, y1))) =>
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) === 1L,
        s"non-unit step ($x0,$y0) -> ($x1,$y1)")
    }

    // interpreted eval (no codegen) agrees with the codegen path
    val interp = new graft.functions.HilbertIndex(
      org.apache.spark.sql.catalyst.expressions.Literal(1L),
      org.apache.spark.sql.catalyst.expressions.Literal(2L), 2)
      .eval(null)
    assert(interp === 7L)
  }

  test("Hilbert files cover small blobs too, and the rewrite is lossless") {
    val sf = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val stats = li.agg(
      min("l_extendedprice").cast("double"), max("l_extendedprice").cast("double"),
      min("l_quantity").cast("double"), max("l_quantity").cast("double")).head()
    val lo = Seq(stats.getDouble(0), stats.getDouble(2))
    val hi = Seq(stats.getDouble(1), stats.getDouble(3))
    val cols = Seq("l_extendedprice", "l_quantity")
    val dir = "/tmp/graft_zorder_spec_hilbert"
    IoOps.writeHilberted(li, dir, cols(0), cols(1), numFiles = 16)
    val r = meanNormRange(dir, cols, lo, hi)
    assert(r.forall(_ < 0.6), s"hilbert per-file footprint too wide: $r")
    assert(spark.read.parquet(dir).count() === li.count())
  }
}
