package graft

import org.apache.spark.sql.functions._
import graft.sources.ZarrSource

/** Pure-JVM zarr v2 reader against AUTHORITATIVE fixtures: the raw and
  * zlib stores were written by numpy/python-zlib directly (the exact
  * byte layouts real zarr writers emit for those compressors), the
  * blosc frames follow the public c-blosc1 container spec (memcpy
  * flag; block-offset table; per-block [csize][payload] with
  * csize == raw size marking stored blocks; per-block byte shuffle)
  * with python-zlib payloads. The zstd inner-codec path is covered by
  * a spec-conformant frame built here with the standard zstd library.
  */
class ZarrSourceSpec extends SparkSpec {

  private val fx = "src/test/resources/zarr_fixtures"

  // value formula the python generator used: a[i, j] = (i*7 + j)*100 + 7
  private def expect2d(i: Long, j: Long): Double = (i * 7 + j) * 100 + 7

  test("raw (compressor null) 2-D store: edge chunks honored, missing chunk omitted") {
    val df = ZarrSource.readVar(spark, s"$fx/real2d_raw")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // full shape 5x7 = 35, minus the deleted chunk (1,1) covering
    // rows 3-4 x cols 4-6 = 6 elements
    assert(got.size === 29)
    got.foreach { case ((i, j), v) => assert(v === expect2d(i, j), s"($i,$j)") }
    assert(!got.contains((4L, 6L)), "deleted chunk's cells must be absent")
    assert(got((4L, 3L)) === expect2d(4, 3), "edge chunk (1,0) must read")
  }

  test("zlib store decodes identically to the raw store") {
    val raw = ZarrSource.readVar(spark, s"$fx/real2d_raw")
    val zl = ZarrSource.readVar(spark, s"$fx/real2d_zlib")
    // zlib store has ALL chunks; restrict to the raw store's
    assert(zl.count() === 35)
    val j = raw.as("a").join(zl.as("b"), Seq("i0", "i1"))
    assert(j.where(col("a.value") =!= col("b.value")).count() === 0)
  }

  test("complex <c16 store yields value_re/value_im") {
    val got = ZarrSource.readVar(spark, s"$fx/cplx1d_zlib")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(got.size === 10)
    (0 until 10).foreach { i =>
      assert(got(i.toLong) === ((i + 0.5, -i.toDouble)), s"i=$i")
    }
  }

  test("int <i4 store reads as doubles") {
    val got = ZarrSource.readVar(spark, s"$fx/int1d_raw")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(0L -> 3.0, 1L -> -1.0, 2L -> 4.0, 3L -> 1.0,
      4L -> -5.0, 5L -> 9.0))
  }

  test("blosc memcpy frame decodes") {
    val got = ZarrSource.readVar(spark, s"$fx/blosc_memcpy_1d")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(0L -> 1.5, 1L -> -2.5, 2L -> 3.25, 3L -> 0.0,
      4L -> 7.125, 5L -> -0.5))
  }

  test("blosc memcpy frame with DOSHUFFLE also set decodes WITHOUT unshuffling") {
    // c-blosc's incompressible fallback memcpys the ORIGINAL bytes and
    // may leave the shuffle flag set (flags 0x03) — unshuffling here
    // would scramble every value (round-10 review finding)
    val got = ZarrSource.readVar(spark, s"$fx/blosc_memcpy_shuffled_1d")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(0L -> 9.5, 1L -> -8.25, 2L -> 7.125, 3L -> 0.0,
      4L -> -1.5, 5L -> 2.75))
  }

  test("unsigned <u2 dtype reads the upper half of the range as positive") {
    val got = ZarrSource.readVar(spark, s"$fx/uint1d_raw")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(0L -> 40000.0, 1L -> 65535.0, 2L -> 0.0,
      3L -> 123.0))
  }

  test("blosc zlib-inner multi-block frame with byte shuffle decodes") {
    val got = ZarrSource.readVar(spark, s"$fx/blosc_zlib_shuffle_1d")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = (Seq.fill(7)(1.0) ++ Seq(2.0, 3.0, 4.0)).zipWithIndex
      .map { case (v, i) => i.toLong -> v }.toMap
    assert(got === want)
  }

  test("blosc zstd-inner frame (spec-conformant, standard zstd payload) decodes") {
    // same container layout the python-validated zlib-inner fixture
    // pins, with the inner codec swapped to zstd (code 4)
    val values = Array.tabulate(12)(i => i * 1.25 - 3.0)
    val bb = java.nio.ByteBuffer.allocate(96)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    values.foreach(bb.putDouble)
    val payload = bb.array()
    val comp = com.github.luben.zstd.Zstd.compress(payload, 3)
    val useComp = comp.length < payload.length
    val blockBytes =
      if (useComp) comp else payload
    val csize = if (useComp) comp.length else payload.length
    val out = java.nio.ByteBuffer
      .allocate(16 + 4 + 4 + blockBytes.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(2.toByte).put(1.toByte)
      .put((4 << 5).toByte) // flags: no shuffle, codec zstd
      .put(8.toByte) // typesize
      .putInt(payload.length).putInt(payload.length) // nbytes, blocksize
      .putInt(16 + 4 + 4 + blockBytes.length) // cbytes
      .putInt(20) // bstarts[0]: header (16) + offset table (4)
      .putInt(csize)
    out.put(blockBytes)
    val dec = ZarrSource.bloscDecompress(out.array())
    val rb = java.nio.ByteBuffer.wrap(dec)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    values.indices.foreach(i => assert(rb.getDouble(i * 8) === values(i)))
  }

  test("readVars full-outer joins sibling variables on the index columns") {
    val df = ZarrSource.readVars(spark, fx,
      Seq("blosc_memcpy_1d", "int1d_raw"))
    assert(df.columns.toSet ===
      Set("i0", "blosc_memcpy_1d", "int1d_raw"))
    val r = df.where(col("i0") === 2).collect()(0)
    assert(r.getAs[Double]("blosc_memcpy_1d") === 3.25)
    assert(r.getAs[Double]("int1d_raw") === 4.0)
  }

  test("readVarNamed maps xarray _ARRAY_DIMENSIONS onto the index columns") {
    val df = ZarrSource.readVarNamed(spark, s"$fx/real2d_raw")
    assert(df.columns.toSeq === Seq("time", "chan", "value"))
    assert(df.where(col("time") === 4 && col("chan") === 3).collect()(0)
      .getDouble(2) === expect2d(4, 3))
  }

  test("describeStore reads consolidated .zmetadata (one fetch) and dir-walk alike") {
    val viaZmeta = ZarrSource.describeStore(spark, s"$fx/xds_store")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getString(4), r.getString(5))))
      .toMap
    assert(viaZmeta("DATA") === (("row", "6", "<f8", "blosc")))
    assert(viaZmeta("WEIGHT") === (("row", "6", "<i4", "null")))
    // same store described by walking .zarray files: delete nothing,
    // just point at a dir with NO .zmetadata (the fixtures root has
    // array subdirs but no consolidated metadata)
    val walked = ZarrSource.describeStore(spark, fx)
      .collect().map(_.getString(0)).toSet
    assert(walked.contains("real2d_raw") && walked.contains("cplx1d_zlib"))
  }

  test("writeVar2D -> readVarNamed round-trip (edge chunks, named dims)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zarr2d").toString + "/img"
    val vals = Array.tabulate(5, 7)((i, j) => i * 10.0 + j + 0.25)
    ZarrSource.writeVar2D(vals, dir, chunkRows = 3, chunkCols = 4)
    val df = ZarrSource.readVarNamed(spark, dir)
    assert(df.columns.toSeq === Seq("l", "m", "value"))
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size === 35)
    for (i <- 0 until 5; j <- 0 until 7)
      assert(got((i.toLong, j.toLong)) === vals(i)(j), s"($i,$j)")
  }

  test("consolidateMetadata writes the real zarr convention describeStore reads back") {
    val store = java.nio.file.Files
      .createTempDirectory("graft_zarr_store").toString
    ZarrSource.writeVar1D(Array(1.0, 2.0, 3.0), s"$store/A", chunk = 2)
    ZarrSource.writeVar2D(Array(Array(1.0, 2.0), Array(3.0, 4.0)),
      s"$store/B", 2, 2)
    ZarrSource.consolidateMetadata(store)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(store, ".zmetadata")))
    // consolidated read equals the dir walk
    val viaMeta = ZarrSource.describeStore(spark, store)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(viaMeta === Set(("A", "", "3"), ("B", "l,m", "2x2")))
    // the file follows the real convention: metadata + format stamp
    val doc = new com.fasterxml.jackson.databind.ObjectMapper().readValue(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(store, ".zmetadata")), "UTF-8"),
      classOf[java.util.Map[String, Any]])
    assert(doc.get("zarr_consolidated_format") == 1)
    assert(doc.containsKey("metadata"))
  }

  test("writeVar1D -> readVar round-trip (zlib, partial tail chunk)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zarr").toString + "/arr"
    val values = Array.tabulate(11)(i => math.sin(i.toDouble) * 10)
    ZarrSource.writeVar1D(values, dir, chunk = 4)
    val got = ZarrSource.readVar(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size === 11)
    values.indices.foreach(i => assert(got(i.toLong) === values(i)))
  }

  test("blosc SPLIT-block lz4+shuffle frame (the numcodecs/xarray default) decodes") {
    // c-blosc splits each block into `typesize` streams for lz4 with
    // typesize <= 16 and blocksize/typesize >= 128 — the DEFAULT
    // xarray compressor (Blosc cname='lz4', shuffle=SHUFFLE). Build a
    // spec-conformant split frame: shuffle, then per byte-plane
    // [csize][lz4-payload] streams, DONT_SPLIT bit CLEAR.
    val n = 256 // 2048 bytes: blocksize/typesize = 256 >= 128 -> split
    val values = Array.tabulate(n)(i => i * 0.5 - 17.0)
    val raw = java.nio.ByteBuffer.allocate(n * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    values.foreach(raw.putDouble)
    val shuffled = ZarrSource.shuffleBytes(raw.array(), 8)
    val lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
    val planeLen = n // bytes per byte-plane stream
    val streams = (0 until 8).map { p =>
      val plane = java.util.Arrays.copyOfRange(
        shuffled, p * planeLen, (p + 1) * planeLen)
      val comp = lz4.compress(plane)
      if (comp.length < planeLen) (comp.length, comp)
      else (planeLen, plane) // raw stream
    }
    val body = streams.map(_._2.length + 4).sum
    val out = java.nio.ByteBuffer.allocate(16 + 4 + body)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(2.toByte).put(1.toByte)
      .put((0x1 | (1 << 5)).toByte) // shuffle, codec lz4, SPLIT
      .put(8.toByte)
      .putInt(n * 8).putInt(n * 8) // nbytes, blocksize: one block
      .putInt(16 + 4 + body) // cbytes
      .putInt(20) // bstarts[0]
    streams.foreach { case (csize, bytes) =>
      out.putInt(csize); out.put(bytes)
    }
    val dec = ZarrSource.bloscDecompress(out.array())
    val rb = java.nio.ByteBuffer.wrap(dec)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    values.indices.foreach(i => assert(rb.getDouble(i * 8) === values(i)))
  }

  test("INDEPENDENT python-built blosc-lz4 SPLIT store reads exactly " +
      "(tools/zarr_crosscheck.py gen-lz4)") {
    // The store was generated by a pure-python lz4 block-format
    // COMPRESSOR (tools/zarr_crosscheck.py gen-lz4) sharing zero code
    // with this reader or the jpountz library: multi-block frames
    // (blocksize 1024 < chunk 2048 -> a real offset table), SPLIT
    // byte-plane streams, shuffle on, real lz4 sequences with matches,
    // padded edge chunk. The closest achievable stand-in for a true
    // numcodecs/xarray-written store while zarr-python can't install
    // in this sandbox — it validates frame layout, split predicate,
    // shuffle order and lz4 sequence decoding against a second,
    // foreign implementation.
    val got = ZarrSource.readVar(spark, s"$fx/blosc_lz4_split_1d")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size === 400)
    (0 until 400).foreach { i =>
      assert(got(i.toLong) === (i % 32) * 0.5, s"i=$i")
    }
  }

  test("writer blosc codecs round-trip through the reader (shuffle + zstd/zlib payloads)") {
    for (codec <- Seq("blosc-zstd", "blosc-zlib")) {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_zarr_bl").toString + "/arr"
      val vals = Array.tabulate(6, 9)((i, j) => i * 3.5 - j * 0.125)
      ZarrSource.writeVar2D(vals, dir, chunkRows = 4, chunkCols = 5,
        codec = codec, zlibLevel = 3)
      // metadata advertises the real blosc compressor config
      val meta = ZarrSource.readMeta(dir)
      assert(meta.compressor("id") === "blosc", codec)
      assert(meta.compressor("shuffle") === 1, codec)
      val got = ZarrSource.readVar(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      assert(got.size === 54, codec)
      for (i <- 0 until 6; j <- 0 until 9)
        assert(got((i.toLong, j.toLong)) === vals(i)(j), s"$codec ($i,$j)")
    }
  }

  test("consolidated multi-codec store round-trips both directions") {
    // one store, three vars, three codecs — written by OUR writer,
    // consolidated, then read back through BOTH describeStore paths
    // and readVars
    val store = java.nio.file.Files
      .createTempDirectory("graft_zarr_mc").toString
    val a = Array.tabulate(10)(i => i * 1.5)
    val b = Array.tabulate(10)(i => 100.0 - i)
    val c = Array.tabulate(10)(i => i * i * 0.25)
    ZarrSource.writeVar1D(a, s"$store/A", chunk = 4, codec = "zlib")
    ZarrSource.writeVar1D(b, s"$store/B", chunk = 4, codec = "blosc-zstd")
    ZarrSource.writeVar1D(c, s"$store/C", chunk = 4, codec = "blosc-zlib")
    ZarrSource.consolidateMetadata(store)
    val desc = ZarrSource.describeStore(spark, store)
      .collect().map(r => r.getString(0) -> r.getString(5)).toMap
    assert(desc("A") === "zlib" && desc("B") === "blosc" &&
      desc("C") === "blosc")
    val df = ZarrSource.readVars(spark, store, Seq("A", "B", "C"))
    val rows = df.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(rows.size === 10)
    (0 until 10).foreach { i =>
      assert(rows(i.toLong) === ((a(i), b(i), c(i))), s"i=$i")
    }
  }
}
