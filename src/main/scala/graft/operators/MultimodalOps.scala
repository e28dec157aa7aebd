package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (builder brief): image/audio/video as
  * opaque BINARY columns with typed metadata, plus decode /
  * feature-extract / frame-sample kernels.
  *
  * The Spark-side plumbing is real — schema, encoders, partition-wise
  * batch iteration (the JVM analog of mapInPandas: one iterator per
  * partition, rows processed in a tight loop without per-row task
  * overhead). The actual codec call is STUBBED with a deterministic
  * fake (this container has no image/audio libraries): `decodeStub`
  * derives "pixels" from the bytes themselves, so the pipeline shape,
  * schema and partitioning are fully testable.
  *
  * 100 TB story: media rows are large (MBs); the operators keep
  * binary columns out of shuffles (feature extraction happens before
  * any aggregation, and only the small feature/metadata columns
  * travel). Partition sizing is byte-based (files.maxPartitionBytes),
  * not row-based.
  */
object MultimodalOps {

  final case class MediaRow(media_id: Long, format: String,
                            width: Int, height: Int, content: Array[Byte])

  final case class MediaFeatures(media_id: Long, format: String,
                                 n_bytes: Long, byte_sum: Long,
                                 byte_mean: Double, frames_sampled: Int)

  /** Pack a table with a fake media payload derived from a text column
    * (deterministic stand-in for reading real image bytes).
    */
  def packMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("img/fake").as("format"),
      (length(col(textCol)) % 64 + 1).cast("int").as("width"),
      (length(col(textCol)) % 48 + 1).cast("int").as("height"),
      encode(col(textCol), "utf-8").as("content"))

  /** STUB decode: a real implementation would call an image codec on
    * `content`; the deterministic fake treats the bytes as pixels.
    * Marked clearly per the builder brief. Kept as the fallback for
    * the `img/fake` format; REAL codecs below handle image/png and
    * audio/wav.
    */
  private def decodeStub(content: Array[Byte]): Array[Int] =
    content.map(b => b & 0xff)

  // ------------------------------------------------ REAL JVM codecs
  // The JVM ships lossless image and WAV codecs (javax.imageio reads
  // PNG/JPEG/BMP/GIF; javax.sound.sampled reads RIFF/WAVE PCM) — no
  // external libraries needed, so the decode step is no longer a
  // stub for these formats.

  /** Encode an 8-bit grayscale raster (row-major, values 0..255) as a
    * real PNG via javax.imageio — PNG is lossless, so
    * decodeImageGray(encodePngGray(px)) == px bit for bit.
    */
  def encodePngGray(width: Int, height: Int, px: Array[Int]): Array[Byte] = {
    require(px.length == width * height, "raster size mismatch")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < px.length) {
      raster.setSample(i % width, i / width, 0, px(i)); i += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.setUseCache(false) // keep codec I/O in memory on executors
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL image decode via javax.imageio (PNG/JPEG/BMP/GIF): returns
    * (width, height, row-major grayscale pixels). Multi-band (color)
    * images are collapsed with the integer ITU-R 601 luma
    * (299 r + 587 g + 114 b) / 1000 so the result is engine-exact.
    */
  def decodeImageGray(content: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    ImageIO.setUseCache(false)
    Option(ImageIO.read(new ByteArrayInputStream(content))).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val bands = raster.getNumBands
      val px = new Array[Int](w * h)
      var i = 0
      while (i < px.length) {
        val (x, y) = (i % w, i / w)
        // bands: 1 = gray, 2 = gray+alpha (alpha ignored), 3 = RGB,
        // 4 = RGB+alpha (alpha ignored) — indexing band 2 on a 2-band
        // gray+alpha raster would throw inside the executor otherwise
        px(i) =
          if (bands <= 2) raster.getSample(x, y, 0)
          else {
            val r = raster.getSample(x, y, 0)
            val g = raster.getSample(x, y, 1)
            val b = raster.getSample(x, y, 2)
            (299 * r + 587 * g + 114 * b) / 1000
          }
        i += 1
      }
      (w, h, px)
    }
  }

  /** Encode PCM16 mono samples as a real RIFF/WAVE container via
    * javax.sound.sampled (lossless — decodeWavPcm16 round-trips).
    */
  def encodeWavPcm16(samples: Array[Int],
                     sampleRate: Float = 8000f): Array[Byte] = {
    val bytes = new Array[Byte](2 * samples.length)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val stream = new AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL WAV decode via javax.sound.sampled: parses the RIFF header
    * and returns PCM16 little-endian mono samples. Streams whose
    * actual format differs (8/24-bit, big-endian, multi-channel,
    * float, compressed) are CONVERTED through the codec's resampler
    * when possible rather than silently reinterpreted as PCM16LE
    * mono — and rejected loudly when no converter exists.
    */
  def decodeWavPcm16(content: Array[Byte]): Array[Int] = {
    val raw = AudioSystem.getAudioInputStream(new ByteArrayInputStream(content))
    val fmt = raw.getFormat
    val want = new AudioFormat(fmt.getSampleRate, 16, 1, true, false)
    val in =
      if (fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        !fmt.isBigEndian) raw
      else {
        require(AudioSystem.isConversionSupported(want, fmt),
          s"unsupported WAV format $fmt: cannot convert to PCM16LE mono")
        AudioSystem.getAudioInputStream(want, raw)
      }
    val bytes = in.readAllBytes()
    in.close()
    val n = bytes.length / 2
    Array.tabulate(n) { k =>
      val v = (bytes(2 * k) & 0xff) + 256 * (bytes(2 * k + 1) & 0xff)
      if (v >= 32768) v - 65536 else v
    }
  }

  /** Format-dispatched decode: real codecs for image formats and wav,
    * the declared stub for the fake format.
    */
  private def decodeAny(format: String, content: Array[Byte]): Array[Int] =
    if (format.startsWith("image/"))
      decodeImageGray(content).map(_._3).getOrElse(Array.empty[Int])
    else if (format == "audio/wav") decodeWavPcm16(content)
    else decodeStub(content)

  /** Pack a REAL PNG payload per row: deterministic grayscale pixels
    * derived from the row id — px(i) = (id * 31 + i * 7) mod 256 —
    * encoded through javax.imageio. Because PNG is lossless, any
    * consumer that decodes these bytes with a real codec recovers the
    * formula exactly, which is what lets the driver oracle the decoded
    * statistics without being able to parse PNG itself.
    */
  def packPngMedia(df: DataFrame, idCol: String,
                   width: Int = 24, height: Int = 16,
                   rasterMod: Long = 0L): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        // rasterMod > 0 derives the raster from id % rasterMod while
        // keeping media_id unique — the duplicate-amplified corpus the
        // image near-dup path needs (same trick as dupCorpus for text)
        val rid = if (rasterMod > 0) id % rasterMod else id
        val px = Array.tabulate(width * height)(i =>
          ((rid * 31 + i * 7) % 256).toInt)
        MediaRow(id, "image/png", width, height,
          encodePngGray(width, height, px))
      }
    }
  }

  /** Perceptual average-hash (aHash) of each image — the multimodal
    * member of the dedup family: decode through the REAL codec,
    * block-average down to a gridW x gridH thumbnail, set bit b when
    * block b's mean is strictly above the global mean. Near-identical
    * images (recompressions, tiny edits) land within a few bits;
    * unrelated images differ in ~half of them — feed the output to
    * [[DedupOps.hashNearDup]] for the banded pair search.
    *
    * Exactness: all comparisons are INTEGER (blockSum·nBlocks vs
    * pixel total — no mean division ever happens), so the hash is
    * engine-exact and oracle-replayable. Codec-bound row work in a
    * mapPartitions kernel, scan-shaped at any scale; images whose
    * dimensions the grid does not divide are dropped (this corpus
    * packs fixed 24x16 rasters; a production caller resizes first).
    */
  def imageAHash(spark: SparkSession, media: DataFrame,
                 gridW: Int = 8, gridH: Int = 8): DataFrame = {
    import spark.implicits._
    require(gridW * gridH <= 64, "hash must fit one long")
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        decodeImageGray(r.content).collect {
          case (w, h, px) if w % gridW == 0 && h % gridH == 0 =>
            val bw = w / gridW; val bh = h / gridH
            val nBlocks = gridW * gridH
            val sums = new Array[Long](nBlocks)
            var i = 0
            while (i < px.length) {
              val bx = (i % w) / bw; val by = (i / w) / bh
              sums(by * gridW + bx) += px(i)
              i += 1
            }
            var total = 0L
            var b = 0
            while (b < nBlocks) { total += sums(b); b += 1 }
            var hash = 0L
            b = 0
            while (b < nBlocks) {
              if (sums(b) * nBlocks > total) hash |= (1L << b)
              b += 1
            }
            (r.media_id, hash)
        }
      }
    }.toDF("media_id", "ahash")
  }

  /** Pack a REAL RIFF/WAVE payload per row: deterministic PCM16
    * samples s(k) = ((id * 17 + k * 13) mod 4096) - 2048, encoded
    * through javax.sound.sampled (lossless container).
    */
  def packWavMedia(df: DataFrame, idCol: String,
                   nSamples: Int = 256): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val samples = Array.tabulate(nSamples)(k =>
          ((id * 17 + k * 13) % 4096).toInt - 2048)
        MediaRow(id, "audio/wav", nSamples, 1, encodeWavPcm16(samples))
      }
    }
  }

  /** Partition-wise feature extraction over the typed Dataset — the
    * mapInPandas-shaped kernel: one batch iterator per partition,
    * primitive loops inside.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      frameStride: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val px = decodeAny(r.format, r.content) // real codec for image/*, audio/wav
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += px(i); i += 1 }
        val mean = if (px.length > 0) sum.toDouble / px.length else 0.0
        val frames = (px.length + frameStride - 1) / frameStride
        MediaFeatures(r.media_id, r.format, px.length.toLong, sum, mean, frames)
      }
    }
  }

  /** Resize stub: a real implementation would decode + rescale pixels;
    * the deterministic fake block-averages the byte-pixels down to
    * (newW x newH). The Spark-side shape — binary in, smaller binary +
    * updated metadata out, per-partition batch loop — is the real
    * plumbing per the builder brief.
    */
  def resize(spark: SparkSession, media: DataFrame,
             newW: Int, newH: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val px = decodeStub(r.content) // STUB: codec + rescale go here
        val out = new Array[Byte](newW * newH)
        val n = math.max(px.length, 1)
        var i = 0
        while (i < out.length) {
          // block-average the source range mapping to this target cell
          val from = i.toLong * n / out.length
          val until = math.max(from + 1, (i + 1).toLong * n / out.length)
          var sum = 0L
          var j = from
          while (j < until && j < px.length) { sum += px(j.toInt); j += 1 }
          out(i) = (sum / (until - from)).toByte
          i += 1
        }
        r.copy(width = newW, height = newH, content = out)
      }
    }
  }

  /** Audio path: treat the payload as PCM16 little-endian and emit
    * per-frame RMS energy — the VAD / silence-filter primitive of an
    * audio training-data pipeline. The "decode" is the same honest
    * byte-level stand-in (no codecs in this container); the framing
    * and energy plumbing is the real shape. Integer byte math keeps
    * the energies engine-exact (sums of int squares < 2^53).
    */
  def frameEnergy(spark: SparkSession, media: DataFrame,
                  frameLen: Int = 32): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      // audio/wav goes through the REAL RIFF/WAVE codec; other formats
      // keep the declared raw-PCM16 byte interpretation
      val samples =
        if (r.format == "audio/wav") decodeWavPcm16(r.content)
        else Array.tabulate(r.content.length / 2) { k =>
          val lo = r.content(2 * k) & 0xff
          val hi = r.content(2 * k + 1) & 0xff
          val v = lo + 256 * hi
          if (v >= 32768) v - 65536 else v
        }
      val n = samples.length
      val nFrames = (n + frameLen - 1) / frameLen
      (0 until nFrames).map { f =>
        val until = math.min((f + 1) * frameLen, n)
        var ss = 0.0
        var i = f * frameLen
        while (i < until) {
          ss += samples(i).toDouble * samples(i); i += 1
        }
        val cnt = until - f * frameLen
        (r.media_id, f, math.sqrt(ss / cnt))
      }
    }.toDF("media_id", "frame_idx", "rms_energy")
  }

  /** Voice-activity segments over [[frameEnergy]] — the
    * silence-filter step of an audio curation pipeline: frames with
    * RMS ≥ threshold, grouped into maximal consecutive runs by the
    * islands trick (frame_idx − row_number is constant within a run).
    *
    * Exactness: the threshold compare and the per-segment mean ride
    * 1e-8-grid BIGINT energies — integer compare, integer sum, one
    * final division. Windows are partitioned by media_id (per-file
    * frame counts are bounded by the media length, never corpus-
    * scale).
    */
  def vadSegments(spark: SparkSession, media: DataFrame,
                  frameLen: Int = 32,
                  threshold: Double = 25000.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val thrQ = math.floor(threshold * 1e8 + 0.5).toLong
    val active = frameEnergy(spark, media, frameLen)
      .select(col("media_id"), col("frame_idx"),
        floor(col("rms_energy") * lit(1.0e8) + lit(0.5)).cast("long")
          .as("_e8"))
      .where(col("_e8") >= thrQ)
    val byFrame = Window.partitionBy("media_id").orderBy("frame_idx")
    val bySegStart = Window.partitionBy("media_id").orderBy("seg_start")
    active
      .withColumn("_g", col("frame_idx") - row_number().over(byFrame))
      .groupBy("media_id", "_g")
      .agg(min("frame_idx").as("seg_start"),
        max("frame_idx").as("seg_end"),
        count(lit(1)).as("n_frames"), sum("_e8").as("_se"))
      .withColumn("seg_id", row_number().over(bySegStart))
      .select(col("media_id"), col("seg_id"), col("seg_start"),
        col("seg_end"), col("n_frames"),
        (col("_se").cast("double") /
          (lit(1.0e8) * col("n_frames").cast("double")))
          .as("mean_energy"))
  }

  /** Frame sampling stub for "video" payloads: every strideth block
    * becomes a frame row (media_id, frame_idx, frame_bytes). Long-form
    * explode — the Spark-side shape of video frame extraction.
    */
  def frameSample(spark: SparkSession, media: DataFrame,
                  blockSize: Int = 16, stride: Int = 4): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val nBlocks = (r.content.length + blockSize - 1) / blockSize
      (0 until nBlocks by stride).map { b =>
        val from = b * blockSize
        val until = math.min(from + blockSize, r.content.length)
        (r.media_id, b, r.content.slice(from, until))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Per-patch raster statistics: treat the payload as an 8-bit
    * grayscale image of width `patchW` pixels and slice it into
    * horizontal bands of `patchH` rows (so one patch = patchH * patchW
    * consecutive bytes, row-major). Emits per-patch pixel count, mean,
    * min, max, variance — the screening stats an image-dedup /
    * quality-filter pipeline computes before any expensive model.
    * The DECODE step is the same declared stub as extractFeatures
    * (bytes ARE the pixels); the partitioned batch shape is real.
    *
    * 100 TB story: flatMap scan, no shuffle; per-patch sums are exact
    * integer arithmetic (pixels are u8, patches are small), so mean
    * and variance are single exact-int divisions — engine-portable
    * with no float-order noise.
    */
  def imagePatchStats(spark: SparkSession, media: DataFrame,
                      patchW: Int = 16, patchH: Int = 8): DataFrame = {
    import spark.implicits._
    val patchLen = patchW * patchH
    media.as[MediaRow].flatMap { r =>
      val px = decodeAny(r.format, r.content) // real codec for image/*
      val nPatches = (px.length + patchLen - 1) / patchLen
      (0 until nPatches).map { p =>
        val from = p * patchLen
        val until = math.min(from + patchLen, px.length)
        var s = 0L; var ss = 0L; var mn = 255; var mx = 0
        var i = from
        while (i < until) {
          val v = px(i)
          s += v; ss += v.toLong * v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        val n = until - from
        val mean = s.toDouble / n
        // E[x^2] - E[x]^2 with exact integer sums: (n*ss - s^2)/n^2
        val variance = (n.toLong * ss - s * s).toDouble / (n.toLong * n)
        (r.media_id, p, n, mn, mx, mean, variance)
      }
    }.toDF("media_id", "patch_idx", "n_px", "px_min", "px_max",
      "px_mean", "px_var")
  }
}
