package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pure-JVM zarr v2 store reader (+ a minimal writer for round-trip
  * verification) — the physical-format half of the reference's store
  * layer (`cngi/dio/read_vis.py:181-199` opens xarray zarr stores;
  * every `cngi` dataset on disk IS a zarr v2 directory). Implements
  * the public zarr v2 spec: `.zarray` JSON metadata (shape / chunks /
  * dtype / order / compressor / fill_value), C-order chunk files named
  * `i.j.k`, little-endian primitive dtypes, and the three compressors
  * the scientific-python stack actually emits — `null` (raw bytes),
  * `zlib`, and `blosc` (the xarray default: blosc container around
  * zstd/lz4/zlib, with the byte-shuffle filter and intra-chunk block
  * structure).
  *
  * Output is the engine's melted long form: one row per in-bounds
  * array element, index columns `i0..i{d-1}` plus `value` (or
  * `value_re`/`value_im` for complex dtypes) — exactly the shape every
  * downstream operator consumes, so `readVar` is the `read_vis` /
  * `read_image` physical entry point once pointed at a real store.
  *
  * Scale shape: the chunk list is parallelized and each task decodes
  * its chunks independently (the same per-chunk independence the
  * reference's dask graphs rely on); no driver-side data, no shuffle.
  * A store chunked at the reference's recommended sizes lands one
  * task per chunk.
  *
  * Validation story (no zarr/numcodecs in this sandbox): the raw and
  * zlib paths are pinned against fixtures written by numpy/python-zlib
  * directly (authoritative byte layouts); the blosc container paths
  * are pinned against spec-conformant frames (memcpy flag, block
  * offsets, per-block csize prefix, shuffle filter) with standard
  * zstd/zlib payloads — see ZarrSourceSpec. First thing to run against
  * a REAL xarray-written store when one is available.
  */
object ZarrSource {

  final case class ZarrayMeta(shape: Array[Int], chunks: Array[Int],
                              dtype: String, order: String,
                              compressor: Map[String, Any])

  // ----------------------------------------------------------- metadata

  private def parseJsonMap(s: String): Map[String, Any] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val m = mapper.readValue(s, classOf[java.util.Map[String, Any]])
    scala.jdk.CollectionConverters.MapHasAsScala(m).asScala.toMap
  }

  private def intArray(v: Any): Array[Int] =
    scala.jdk.CollectionConverters.ListHasAsScala(
        v.asInstanceOf[java.util.List[Any]]).asScala
      .map(x => x.asInstanceOf[Number].intValue()).toArray

  def readMeta(arrayDir: String): ZarrayMeta =
    metaFromMap(parseJsonMap(new String(
      Files.readAllBytes(Paths.get(arrayDir, ".zarray")), "UTF-8")))

  private def metaFromMap(m: Map[String, Any]): ZarrayMeta = {
    val comp = m.get("compressor") match {
      case Some(null) | None => Map.empty[String, Any]
      case Some(c: java.util.Map[_, _]) =>
        scala.jdk.CollectionConverters.MapHasAsScala(
          c.asInstanceOf[java.util.Map[String, Any]]).asScala.toMap
      case Some(other) =>
        throw new IllegalArgumentException(s"bad compressor: $other")
    }
    val meta = ZarrayMeta(intArray(m("shape")), intArray(m("chunks")),
      m("dtype").toString, m.getOrElse("order", "C").toString, comp)
    require(meta.order == "C",
      s"zarr order '${meta.order}' unsupported (C-order only)")
    require(meta.shape.length == meta.chunks.length && meta.shape.nonEmpty,
      "zarr shape/chunks rank mismatch")
    meta
  }

  // --------------------------------------------------------- decompress

  /** Blosc v1 frame decode (public c-blosc format): 16-byte header
    * [version, versionlz, flags, typesize, nbytes i32, blocksize i32,
    * cbytes i32], then either the raw payload (memcpy flag) or a table
    * of int32 block offsets — one per ceil(nbytes/blocksize) block,
    * offsets from frame start. Each block holds one or more STREAMS of
    * [csize i32][payload] back to back (csize == the stream's
    * uncompressed size meaning "stored raw").
    *
    * Split blocks: c-blosc SPLITS each block into `typesize` streams
    * (one per shuffled byte plane) for the fast codecs — blosclz and
    * lz4, when 1 < typesize <= 16 and blocksize/typesize >= the
    * 128-byte minimum (`split_block()` in blosc.c, the default
    * FORWARD_COMPAT policy) — which is exactly the numcodecs/xarray
    * DEFAULT compressor configuration (Blosc cname='lz4',
    * shuffle=SHUFFLE). Writers record the decision in header flag
    * 0x10 (DONT_SPLIT, c-blosc >= 1.12); older frames omit the bit,
    * so the decoder honors the bit when set and otherwise recomputes
    * the same predicate — matching both writer generations. The
    * byte-shuffle filter, when flagged, was applied per BLOCK before
    * splitting/compression and is inverted here after the streams are
    * reassembled.
    */
  private[graft] def bloscDecompress(frame: Array[Byte]): Array[Byte] = {
    require(frame.length >= 16, "blosc frame shorter than its header")
    val bb = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
    val flags = frame(2) & 0xff
    val typesize = frame(3) & 0xff
    val nbytes = bb.getInt(4)
    val blocksize0 = bb.getInt(8)
    val shuffled = (flags & 0x1) != 0
    val memcpyed = (flags & 0x2) != 0
    val bitshuffled = (flags & 0x4) != 0
    val dontSplit = (flags & 0x10) != 0
    require(!bitshuffled, "blosc bit-shuffle filter unsupported")
    val codec = (flags >> 5) & 0x7 // 0 blosclz 1 lz4 2 snappy 3 zlib 4 zstd
    val out = new Array[Byte](nbytes)
    if (memcpyed) {
      // c-blosc's incompressible fallback memcpys the ORIGINAL
      // (pre-filter) bytes and may leave DOSHUFFLE set alongside
      // MEMCPYED — reference decoders check MEMCPYED first and never
      // unshuffle such frames; doing so would scramble every value
      System.arraycopy(frame, 16, out, 0, nbytes)
      return out
    }
    val blocksize = if (blocksize0 <= 0) nbytes else blocksize0
    val split = !dontSplit && (codec == 0 || codec == 1) &&
      typesize > 1 && typesize <= 16 && blocksize / typesize >= 128
    val nblocks = (nbytes + blocksize - 1) / blocksize
    var j = 0
    while (j < nblocks) {
      val bstart = bb.getInt(16 + 4 * j)
      val neblock = math.min(blocksize, nbytes - j * blocksize)
      val nstreams = if (split) typesize else 1
      require(neblock % nstreams == 0,
        s"blosc split block $neblock not divisible into $nstreams streams")
      val streamLen = neblock / nstreams
      val block = new Array[Byte](neblock)
      var pos = bstart
      var sIdx = 0
      while (sIdx < nstreams) {
        val csize = bb.getInt(pos)
        pos += 4
        if (csize == streamLen) { // stored raw
          System.arraycopy(frame, pos, block, sIdx * streamLen, streamLen)
        } else {
          val dec = bloscInnerDecode(codec, frame, pos, csize, streamLen)
          System.arraycopy(dec, 0, block, sIdx * streamLen, streamLen)
        }
        pos += csize
        sIdx += 1
      }
      val placed = if (shuffled) unshuffle(block, typesize) else block
      System.arraycopy(placed, 0, out, j * blocksize, neblock)
      j += 1
    }
    out
  }

  /** One compressed blosc stream → `expected` raw bytes. */
  private def bloscInnerDecode(codec: Int, frame: Array[Byte], off: Int,
                               csize: Int, expected: Int): Array[Byte] =
    codec match {
      case 4 => // zstd
        val dst = new Array[Byte](expected)
        com.github.luben.zstd.Zstd.decompressByteArray(
          dst, 0, expected, frame, off, csize)
        dst
      case 3 => // zlib
        zlibInflate(frame, off, csize, expected)
      case 1 => // lz4 (block format)
        val dec = net.jpountz.lz4.LZ4Factory.fastestInstance()
          .fastDecompressor()
        val dst = new Array[Byte](expected)
        dec.decompress(frame, off, dst, 0, expected)
        dst
      case other => throw new IllegalArgumentException(
        s"blosc inner codec $other unsupported (zstd/zlib/lz4 only)")
    }

  /** Inverse of blosc's byte-shuffle: input holds all byte-0s of every
    * element, then all byte-1s, ...; the remainder bytes past the last
    * full element are stored unshuffled at the tail (blosc semantics).
    */
  private[graft] def unshuffle(a: Array[Byte], typesize: Int): Array[Byte] = {
    if (typesize <= 1) return a
    val nElem = a.length / typesize
    val body = nElem * typesize
    val out = new Array[Byte](a.length)
    var b = 0
    while (b < typesize) {
      var i = 0
      while (i < nElem) {
        out(i * typesize + b) = a(b * nElem + i)
        i += 1
      }
      b += 1
    }
    System.arraycopy(a, body, out, body, a.length - body)
    out
  }

  private def zlibInflate(src: Array[Byte], off: Int, len: Int,
                          expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(src, off, len)
    val out = new Array[Byte](expected)
    var done = 0
    var stalled = false
    while (done < expected && !inf.finished() && !stalled) {
      val n = inf.inflate(out, done, expected - done)
      done += n
      // a truncated/corrupt stream makes inflate() return 0 while
      // asking for more input — fail loudly instead of spinning
      stalled = n == 0 && (inf.needsInput() || inf.needsDictionary())
    }
    inf.end()
    require(!stalled,
      s"zlib chunk truncated/corrupt after $done of $expected bytes")
    require(done == expected,
      s"zlib chunk inflated to $done bytes, expected $expected")
    out
  }

  private[graft] def decompressChunk(raw: Array[Byte],
                                       comp: Map[String, Any],
                                       expected: Int): Array[Byte] =
    comp.get("id").map(_.toString) match {
      case None => raw // compressor: null -> raw C-order bytes
      case Some("blosc") => bloscDecompress(raw)
      case Some("zlib") => zlibInflate(raw, 0, raw.length, expected)
      case Some(other) => throw new IllegalArgumentException(
        s"zarr compressor '$other' unsupported (null/zlib/blosc)")
    }

  // -------------------------------------------------------------- read

  private def dtypeBytes(dtype: String): Int = dtype match {
    case "<f8" | "<i8" => 8
    case "<f4" | "<i4" | "<u4" => 4
    case "<c16" => 16
    case "<c8" => 8
    case "<i2" | "<u2" => 2
    case "|i1" | "|u1" | "|b1" => 1
    case other => throw new IllegalArgumentException(
      s"zarr dtype '$other' unsupported")
  }

  private def isComplex(dtype: String) = dtype == "<c16" || dtype == "<c8"

  /** Read one zarr array as the melted long form: columns i0..i{d-1}
    * (long) + value (double) — or value_re/value_im for complex
    * dtypes. Missing chunk files are treated as absent data (their
    * elements are omitted — the melted analog of an all-fill chunk).
    */
  def readVar(spark: SparkSession, arrayDir: String): DataFrame = {
    val meta = readMeta(arrayDir)
    val rank = meta.shape.length
    val nChunks = meta.shape.indices
      .map(i => (meta.shape(i) + meta.chunks(i) - 1) / meta.chunks(i))
    val grid = nChunks.foldLeft(Seq(Seq.empty[Int])) { (acc, n) =>
      acc.flatMap(prefix => (0 until n).map(prefix :+ _))
    }
    val existing = grid.filter(idx =>
      Files.exists(Paths.get(arrayDir, idx.mkString("."))))
    val shape = meta.shape; val chunks = meta.chunks
    val dtype = meta.dtype; val comp = meta.compressor
    val dir = arrayDir
    val complex = isComplex(dtype)
    require(rank <= 4, s"zarr rank $rank unsupported (<= 4)")
    // each row: (global indices padded to 4, re, im) — the real path
    // ignores im; padding keeps one RDD element type for all ranks
    val rows = spark.sparkContext
      .parallelize(existing, math.max(1, math.min(existing.size, 64)))
      .flatMap { chunkIdx =>
        val raw = Files.readAllBytes(Paths.get(dir, chunkIdx.mkString(".")))
        val elemBytes = dtypeBytes(dtype)
        val nElem = chunks.product
        val bytes = decompressChunk(raw, comp, nElem * elemBytes)
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        def scalar(off: Int): Double = dtype match {
          case "<f8" | "<c16" => bb.getDouble(off)
          case "<f4" | "<c8" => bb.getFloat(off).toDouble
          case "<i8" => bb.getLong(off).toDouble
          case "<i4" => bb.getInt(off).toDouble
          // unsigned dtypes: widen through the unsigned reinterpretation
          // or the upper half of the range would come back negative
          case "<u4" => (bb.getInt(off) & 0xffffffffL).toDouble
          case "<i2" => bb.getShort(off).toDouble
          case "<u2" => (bb.getShort(off) & 0xffff).toDouble
          case "|i1" | "|b1" => bytes(off).toDouble
          case "|u1" => (bytes(off) & 0xff).toDouble
        }
        // C-order walk of the chunk; emit only in-bounds elements
        val starts = chunkIdx.indices.map(i => chunkIdx(i).toLong * chunks(i))
        val idx = new Array[Int](rank)
        (0 until nElem).iterator.flatMap { flat =>
          var rem = flat
          var i = rank - 1
          while (i >= 0) { idx(i) = rem % chunks(i); rem /= chunks(i); i -= 1 }
          val global = Array.tabulate(rank)(i => starts(i) + idx(i))
          if (global.indices.exists(i => global(i) >= shape(i))) None
          else {
            val off = flat * elemBytes
            val re = scalar(off)
            val im = if (complex) scalar(off + elemBytes / 2) else 0.0
            val g = global.padTo(4, 0L)
            Some((g(0), g(1), g(2), g(3), re, im))
          }
        }.toVector
      }
    import spark.implicits._
    val idxCols = (0 until rank).map(i => col(s"i$i"))
    val df = rows.toDF("i0", "i1", "i2", "i3", "value_re", "value_im")
    if (complex)
      df.select((idxCols :+ col("value_re") :+ col("value_im")): _*)
    else
      df.select((idxCols :+ col("value_re").as("value")): _*)
  }

  /** Read several sibling arrays of ONE store (shared dims, the
    * xarray data_vars layout) into a single table: full outer join on
    * the index columns, one value column per variable — the zarr
    * analog of IoOps.mergeImageArtifacts.
    */
  def readVars(spark: SparkSession, storeDir: String,
               vars: Seq[String]): DataFrame = {
    require(vars.nonEmpty)
    val frames = vars.map { v =>
      val df = readVar(spark, s"$storeDir/$v")
      val idxCols = df.columns.filter(_.startsWith("i")).toSeq
      // complex vars surface as <v>_re/<v>_im — a plain rename of
      // "value" would leave every complex frame with the SAME
      // value_re/value_im names and make the join output ambiguous
      val named = df
        .withColumnRenamed("value", v)
        .withColumnRenamed("value_re", s"${v}_re")
        .withColumnRenamed("value_im", s"${v}_im")
      (idxCols, named)
    }
    val keys = frames.head._1
    frames.map(_._2).reduce((a, b) => a.join(b, keys, "full_outer"))
  }

  // ------------------------------------------------- xarray awareness

  /** Dimension NAMES of one array, from the `_ARRAY_DIMENSIONS`
    * attribute xarray writes into `.zattrs` (the public convention
    * that makes a zarr store an xarray dataset). Empty when absent.
    */
  def arrayDimensions(arrayDir: String): Seq[String] = {
    val p = Paths.get(arrayDir, ".zattrs")
    if (!Files.exists(p)) return Nil
    parseJsonMap(new String(Files.readAllBytes(p), "UTF-8"))
      .get("_ARRAY_DIMENSIONS") match {
      case Some(l: java.util.List[_]) =>
        scala.jdk.CollectionConverters.ListHasAsScala(l).asScala
          .map(_.toString).toSeq
      case _ => Nil
    }
  }

  /** Store inventory — one row per array with dims/shape/chunks/dtype/
    * compressor, read from consolidated `.zmetadata` when present
    * (one JSON fetch, the reason xarray consolidates: object stores
    * charge per request) and by walking `.zarray` files otherwise.
    * This is the describe_vis analog at the physical layer.
    */
  /** Top-level array directories of a store (dirs carrying a
    * `.zarray`), sorted — shared by describeStore's fallback walk and
    * consolidateMetadata so the two scans cannot drift; the directory
    * stream is closed (Files.list leaks an FD otherwise).
    */
  private def listArrayDirs(root: java.nio.file.Path): Seq[String] = {
    val stream = Files.list(root)
    try {
      val it = stream.iterator()
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val p = it.next()
        if (Files.isDirectory(p) && Files.exists(p.resolve(".zarray")))
          names += p.getFileName.toString
      }
      names.sorted.toSeq
    } finally stream.close()
  }

  def describeStore(spark: SparkSession, storeDir: String): DataFrame = {
    import spark.implicits._
    val zm = Paths.get(storeDir, ".zmetadata")
    val entries: Seq[(String, ZarrayMeta, Seq[String])] =
      if (Files.exists(zm)) {
        val all = parseJsonMap(new String(Files.readAllBytes(zm), "UTF-8"))
        val metaMap = all("metadata").asInstanceOf[java.util.Map[String, Any]]
        val m = scala.jdk.CollectionConverters
          .MapHasAsScala(metaMap).asScala
        val arrays = m.keys.filter(_.endsWith("/.zarray"))
          .map(_.stripSuffix("/.zarray")).toSeq.sorted
        arrays.map { name =>
          val meta = metaFromMap(scala.jdk.CollectionConverters
            .MapHasAsScala(m(s"$name/.zarray")
              .asInstanceOf[java.util.Map[String, Any]]).asScala.toMap)
          val dims = m.get(s"$name/.zattrs") match {
            case Some(attrs: java.util.Map[_, _]) =>
              scala.jdk.CollectionConverters.MapHasAsScala(
                attrs.asInstanceOf[java.util.Map[String, Any]]).asScala
                .get("_ARRAY_DIMENSIONS") match {
                case Some(l: java.util.List[_]) =>
                  scala.jdk.CollectionConverters.ListHasAsScala(l)
                    .asScala.map(_.toString).toSeq
                case _ => Nil
              }
            case _ => Nil
          }
          (name, meta, dims)
        }
      } else {
        listArrayDirs(Paths.get(storeDir)).map { name =>
          (name, readMeta(s"$storeDir/$name"),
            arrayDimensions(s"$storeDir/$name"))
        }
      }
    entries.map { case (name, meta, dims) =>
      (name, dims.mkString(","), meta.shape.mkString("x"),
        meta.chunks.mkString("x"), meta.dtype,
        meta.compressor.get("id").map(_.toString).getOrElse("null"))
    }.toDF("variable", "dims", "shape", "chunks", "dtype", "compressor")
  }

  /** Read one array with its xarray dimension NAMES as the index
    * columns (time/baseline/chan/pol instead of i0..i3) — the
    * read_vis-shaped entry point over a real store. Falls back to
    * i0.. when the store carries no `_ARRAY_DIMENSIONS`.
    */
  def readVarNamed(spark: SparkSession, arrayDir: String): DataFrame = {
    val df = readVar(spark, arrayDir)
    val dims = arrayDimensions(arrayDir)
    val idxCols = df.columns.filter(_.startsWith("i")).toSeq
    if (dims.length != idxCols.length) df
    else idxCols.zip(dims).foldLeft(df) { case (acc, (from, to)) =>
      acc.withColumnRenamed(from, to)
    }
  }

  // ------------------------------------------------------------- write

  /** Minimal zarr v2 writer for 1-D double arrays (round-trip
    * verification + interchange): `.zarray` metadata and C-order chunk
    * files, `compressor` "zlib" (spec-standard, java.util.zip) or null.
    * The driver collects NOTHING — each task writes the chunks covering
    * its partition of a PRE-SORTED, contiguously-indexed column.
    */
  // ------------------------------------------------------------ write

  /** Writer codecs: plain `zlib`, or a blosc v1 frame with the
    * byte-shuffle filter and a zstd/zlib payload (`blosc-zstd` /
    * `blosc-zlib`) — the container xarray's default compressor
    * family emits, so the reader's blosc path is exercised by bytes
    * OUR writer produced, not only hand-authored fixtures. The
    * blosc-zlib variant is additionally decodable by stock
    * python/numpy + zlib (tools/zarr_crosscheck.py), giving an
    * engine-independent check on the frame layout and shuffle.
    */
  private def compressorJson(codec: String, level: Int): String =
    codec match {
      case "zlib" => s"""{"id": "zlib", "level": $level}"""
      case "blosc-zstd" =>
        s"""{"id": "blosc", "cname": "zstd", "clevel": $level,
           | "shuffle": 1, "blocksize": 0}""".stripMargin
      case "blosc-zlib" =>
        s"""{"id": "blosc", "cname": "zlib", "clevel": $level,
           | "shuffle": 1, "blocksize": 0}""".stripMargin
      case other =>
        throw new IllegalArgumentException(s"writer codec '$other'")
    }

  private def zlibDeflate(raw: Array[Byte], level: Int): Array[Byte] = {
    val deflater = new java.util.zip.Deflater(level)
    deflater.setInput(raw); deflater.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished())
      out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    out.toByteArray
  }

  /** Forward of blosc's byte-shuffle (see [[unshuffle]]). */
  private[graft] def shuffleBytes(a: Array[Byte], typesize: Int)
      : Array[Byte] = {
    if (typesize <= 1) return a
    val nElem = a.length / typesize
    val body = nElem * typesize
    val out = new Array[Byte](a.length)
    var b = 0
    while (b < typesize) {
      var i = 0
      while (i < nElem) {
        out(b * nElem + i) = a(i * typesize + b)
        i += 1
      }
      b += 1
    }
    System.arraycopy(a, body, out, body, a.length - body)
    out
  }

  /** One chunk's raw C-order bytes → stored file bytes. The blosc
    * frames are single-block, DONT_SPLIT (header bit 0x10, matching
    * what c-blosc >= 1.12 records for zstd/zlib payloads), shuffle
    * applied before compression; a payload that doesn't compress is
    * stored as a raw stream (csize == nbytes), still inside the
    * frame.
    */
  private[graft] def encodeChunk(raw: Array[Byte], codec: String,
                                 level: Int,
                                 typesize: Int = 8): Array[Byte] =
    codec match {
      case "zlib" => zlibDeflate(raw, level)
      case "blosc-zstd" | "blosc-zlib" =>
        val innerId = if (codec == "blosc-zstd") 4 else 3
        val shuffled = shuffleBytes(raw, typesize)
        val comp =
          if (innerId == 4)
            com.github.luben.zstd.Zstd.compress(shuffled, level)
          else zlibDeflate(shuffled, level)
        val (payload, csize) =
          if (comp.length < raw.length) (comp, comp.length)
          else (shuffled, raw.length) // raw stream
        val frame = ByteBuffer.allocate(16 + 4 + 4 + payload.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        frame.put(0, 2.toByte) // format version
        frame.put(1, 1.toByte) // codec format version
        frame.put(2, (0x1 | 0x10 | (innerId << 5)).toByte)
        frame.put(3, typesize.toByte)
        frame.putInt(4, raw.length) // nbytes
        frame.putInt(8, raw.length) // blocksize: single block
        frame.putInt(12, 16 + 4 + 4 + payload.length) // cbytes
        frame.putInt(16, 20) // block 0 offset
        frame.putInt(20, csize)
        frame.position(24)
        frame.put(payload)
        frame.array()
      case other =>
        throw new IllegalArgumentException(s"writer codec '$other'")
    }

  /** 2-D companion to [[writeVar1D]] — the write_image interchange
    * path (sky images, PSFs, beams are (l, m) planes): row-major
    * C-order chunk files over a (chunkRows × chunkCols) grid.
    * Dimension names land in `.zattrs` so xarray (and readVarNamed)
    * sees named axes.
    */
  def writeVar2D(values: Array[Array[Double]], arrayDir: String,
                 chunkRows: Int, chunkCols: Int,
                 dims: (String, String) = ("l", "m"),
                 zlibLevel: Int = 1,
                 codec: String = "zlib"): Unit = {
    val nR = values.length
    val nC = if (nR == 0) 0 else values(0).length
    require(values.forall(_.length == nC), "ragged 2-D array")
    val dir = Paths.get(arrayDir)
    Files.createDirectories(dir)
    val metaJson =
      s"""{"zarr_format": 2, "shape": [$nR, $nC],
         |"chunks": [$chunkRows, $chunkCols], "dtype": "<f8",
         |"order": "C",
         |"compressor": ${compressorJson(codec, zlibLevel)},
         |"fill_value": null, "filters": null}""".stripMargin
    Files.write(dir.resolve(".zarray"), metaJson.getBytes("UTF-8"))
    Files.write(dir.resolve(".zattrs"),
      s"""{"_ARRAY_DIMENSIONS": ["${dims._1}", "${dims._2}"]}"""
        .getBytes("UTF-8"))
    for (cr <- 0 until (nR + chunkRows - 1) / chunkRows;
         cc <- 0 until (nC + chunkCols - 1) / chunkCols) {
      val bb = ByteBuffer.allocate(chunkRows * chunkCols * 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      for (i <- 0 until chunkRows; j <- 0 until chunkCols) {
        val (gi, gj) = (cr * chunkRows + i, cc * chunkCols + j)
        if (gi < nR && gj < nC)
          bb.putDouble((i * chunkCols + j) * 8, values(gi)(gj))
      }
      Files.write(dir.resolve(s"$cr.$cc"),
        encodeChunk(bb.array(), codec, zlibLevel))
    }
  }

  /** Consolidate a store's metadata into `.zmetadata` (and stamp the
    * root `.zgroup`) — the xarray/zarr convention that lets object-
    * store readers open a dataset with ONE fetch instead of one per
    * array. Collects every `.zarray`/`.zattrs` under the store root;
    * [[describeStore]] reads the result back.
    */
  def consolidateMetadata(storeDir: String): Unit = {
    val root = Paths.get(storeDir)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val metadata = new java.util.LinkedHashMap[String, Any]()
    metadata.put(".zgroup", mapper.readValue(
      """{"zarr_format": 2}""", classOf[java.util.Map[String, Any]]))
    for (name <- listArrayDirs(root)) {
      for (f <- Seq(".zarray", ".zattrs")) {
        val p = root.resolve(name).resolve(f)
        if (Files.exists(p))
          metadata.put(s"$name/$f", mapper.readValue(
            new String(Files.readAllBytes(p), "UTF-8"),
            classOf[java.util.Map[String, Any]]))
      }
    }
    val doc = new java.util.LinkedHashMap[String, Any]()
    doc.put("metadata", metadata)
    doc.put("zarr_consolidated_format", 1)
    Files.write(root.resolve(".zgroup"),
      """{"zarr_format": 2}""".getBytes("UTF-8"))
    Files.write(root.resolve(".zmetadata"),
      mapper.writeValueAsString(doc).getBytes("UTF-8"))
  }

  def writeVar1D(values: Array[Double], arrayDir: String, chunk: Int,
                 zlibLevel: Int = 1, codec: String = "zlib"): Unit = {
    val dir = Paths.get(arrayDir)
    Files.createDirectories(dir)
    val metaJson =
      s"""{"zarr_format": 2, "shape": [${values.length}],
         |"chunks": [$chunk], "dtype": "<f8", "order": "C",
         |"compressor": ${compressorJson(codec, zlibLevel)},
         |"fill_value": null, "filters": null}""".stripMargin
    Files.write(dir.resolve(".zarray"), metaJson.getBytes("UTF-8"))
    var c = 0
    while (c * chunk < values.length) {
      val lo = c * chunk
      val n = math.min(chunk, values.length - lo)
      // zarr chunks are always FULL chunk-size buffers; the tail past
      // the array shape is padding readers must ignore
      val bb = ByteBuffer.allocate(chunk * 8).order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < n) { bb.putDouble(i * 8, values(lo + i)); i += 1 }
      Files.write(dir.resolve(c.toString),
        encodeChunk(bb.array(), codec, zlibLevel))
      c += 1
    }
  }
}
