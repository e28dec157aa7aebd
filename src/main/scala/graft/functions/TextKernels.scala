package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftExpressionBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-statistic kernels — per-row scans over the raw UTF-8
  * bytes of a string column, emitted straight into whole-stage codegen
  * (same discipline as [[SquaredDistance]]: no UDF, so no UTF8String →
  * java.lang.String copy per row on the corpus scan).
  */

/** Shannon entropy (nats) of the BYTE distribution of a string's UTF-8
  * encoding — the character-distribution quality signal of a filtering
  * pipeline (binary junk / base64 blobs / single-char spam score far
  * from natural text). For ASCII text bytes == characters; for
  * multi-byte text this is byte entropy, documented as such.
  *
  * Float determinism: the fold visits byte values in ascending order
  * accumulating `acc + (-(p) * ln(p))` in double — the oracle replays
  * the identical order via `list(cnt ORDER BY ch)` + list_reduce, so
  * both engines produce bit-identical doubles (ln parity is already
  * proven by lang_id / bm25). Empty string → 0.0.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy expects STRING, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    CharEntropy.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.CharEntropy.entropy($s)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  /** Compiled kernel shared by eval and codegen (one virtual call per
    * row; the histogram loop itself JITs tight).
    */
  def entropy(s: UTF8String): Double = {
    val n = s.numBytes()
    if (n == 0) return 0.0
    val hist = new Array[Int](256)
    var i = 0
    while (i < n) { hist(s.getByte(i) & 0xff) += 1; i += 1 }
    val nd = n.toDouble
    var acc = 0.0
    var v = 0
    while (v < 256) {
      val c = hist(v)
      // StrictMath.log, not Math.log: Spark's own Log expression uses
      // StrictMath, and that is the flavor whose DuckDB-ln parity the
      // oracle suite has proven — Math.log's intrinsic can differ by
      // one ulp.
      if (c > 0) { val p = c / nd; acc += -(p) * StrictMath.log(p) }
      v += 1
    }
    acc
  }

  def apply(c: Column): Column = toColumn(CharEntropy(toExpression(c)))
}

/** Per-word polynomial hash array — the native form of
  * TextOps.wordHashes, the first stage of every shingle/minhash/simhash
  * corpus scan. Same kernel function, minus the Scala-UDF wrapper
  * (serializer round-trip + boxed WrappedArray per row).
  */
case class WordHashArr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_hashes expects STRING, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    WordHashArr.kernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.WordHashArr.kernel($s)")
  override protected def withNewChildInternal(newChild: Expression): WordHashArr =
    copy(child = newChild)
}

object WordHashArr {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  def kernel(s: UTF8String): ArrayData =
    new GenericArrayData(graft.operators.TextOps.wordHashesFn(s.toString))
  def apply(c: Column): Column = toColumn(WordHashArr(toExpression(c)))
}

/** Distinct n-word shingle hashes — native TextOps.shingleHashes. */
case class ShingleHashArr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects STRING, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    ShingleHashArr.kernel(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.ShingleHashArr.kernel($s, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashArr =
    copy(child = newChild)
}

object ShingleHashArr {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  def kernel(s: UTF8String, n: Int): ArrayData =
    new GenericArrayData(
      graft.operators.TextOps.shingleHashesFn(s.toString, n))
  def apply(c: Column, n: Int): Column =
    toColumn(ShingleHashArr(toExpression(c), n))
}

/** POSITIONAL (non-distinct) n-word shingle hashes — native
  * TextOps.positionalShingleHashes: array index = token position, the
  * anchor stream of the exact-substring dedup run extension.
  */
case class PosShingleHashArr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pos_shingle_hashes expects STRING, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    PosShingleHashArr.kernel(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.PosShingleHashArr.kernel($s, $n)")
  override protected def withNewChildInternal(newChild: Expression): PosShingleHashArr =
    copy(child = newChild)
}

object PosShingleHashArr {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  def kernel(s: UTF8String, n: Int): ArrayData =
    new GenericArrayData(
      graft.operators.TextOps.positionalShingleHashesFn(s.toString, n))
  def apply(c: Column, n: Int): Column =
    toColumn(PosShingleHashArr(toExpression(c), n))
}

/** Winnowed fingerprint set — native TextOps.winnowFingerprints. */
case class WinnowFpArr(child: Expression, n: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fp expects STRING, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    WinnowFpArr.kernel(input.asInstanceOf[UTF8String], n, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.WinnowFpArr.kernel($s, $n, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFpArr =
    copy(child = newChild)
}

object WinnowFpArr {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  def kernel(s: UTF8String, n: Int, w: Int): ArrayData =
    new GenericArrayData(
      graft.operators.TextOps.winnowFingerprintsFn(s.toString, n, w))
  def apply(c: Column, n: Int, w: Int): Column =
    toColumn(WinnowFpArr(toExpression(c), n, w))
}

/** SimHash signature — native DedupOps.simHash (long out). */
case class SimHash64(child: Expression, nbits: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash expects STRING, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    SimHash64.kernel(input.asInstanceOf[UTF8String], nbits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.SimHash64.kernel($s, $nbits)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def kernel(s: UTF8String, nbits: Int): Long =
    graft.operators.DedupOps.simHashFn(s.toString, nbits)
  def apply(c: Column, nbits: Int): Column =
    toColumn(SimHash64(toExpression(c), nbits))
}

/** MinHash signature over a shingle-hash array — native
  * DedupOps.minHashSignature. Primitive getLong per element, no
  * WrappedArray; null for an empty shingle set (the no-shingle doc
  * drops out of banding via explode-of-null, same as the UDF).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.ArrayData
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects ARRAY<BIGINT>, got ${t.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    MinHashSig.kernel(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.functions.MinHashSig.kernel($a, $numHashes);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  def kernel(a: ArrayData, k: Int): ArrayData = {
    import graft.operators.{DedupOps, TextOps}
    val n = a.numElements()
    if (n == 0) return null
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      val aj = DedupOps.minHashA(j); val bj = DedupOps.minHashB(j)
      var best = Long.MaxValue
      var i = 0
      while (i < n) {
        val h = (aj * a.getLong(i) + bj) % TextOps.HashMod
        if (h < best) best = h
        i += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }
  def apply(c: Column, numHashes: Int): Column =
    toColumn(MinHashSig(toExpression(c), numHashes))
}

/** LSH band hashes over a MinHash signature — native
  * DedupOps.bandHashesFn (same positional base-combine arithmetic).
  */
case class BandHashArr(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.ArrayData
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"band_hashes expects ARRAY<BIGINT>, got ${t.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    BandHashArr.kernel(input.asInstanceOf[ArrayData], bands, rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.BandHashArr.kernel($a, $bands, $rowsPerBand)")
  override protected def withNewChildInternal(newChild: Expression): BandHashArr =
    copy(child = newChild)
}

object BandHashArr {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  def kernel(a: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    import graft.operators.TextOps
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var r = 0
      while (r < rowsPerBand) {
        // weight = HashBase^(rowsPerBand-1-r) mod M, as in bandHashesFn
        var w = 1L
        var t = 0
        while (t < rowsPerBand - 1 - r) { w = w * TextOps.HashBase % TextOps.HashMod; t += 1 }
        acc += a.getLong(b * rowsPerBand + r) * w % TextOps.HashMod
        r += 1
      }
      out(b) = acc % TextOps.HashMod
      b += 1
    }
    new GenericArrayData(out)
  }
  def apply(c: Column, bands: Int, rowsPerBand: Int): Column =
    toColumn(BandHashArr(toExpression(c), bands, rowsPerBand))
}

/** Per-document term-frequency vector against a FIXED query-term array
  * — native form of bm25Score's tf scan (one int per term per doc, no
  * explode, no UDF).
  */
case class TermFreqs(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  // Seq field (value equality) so equals/semanticEquals dedupe
  // identical expressions — an Array field is reference-equal only and
  // defeats common-subexpression elimination and exchange reuse. The
  // kernel loops over a lazily-materialized Array for primitive speed.
  @transient private lazy val termsArr: Array[String] = terms.toArray
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"term_freqs expects STRING, got ${child.dataType.sql}")
  def kernel(s: UTF8String): Any = {
    val terms = termsArr
    val ws = graft.operators.TextOps.wordsFn(s.toString)
    val out = new Array[Int](terms.length)
    var i = 0
    while (i < terms.length) {
      val t = terms(i)
      var c = 0
      var j = 0
      while (j < ws.length) { if (ws(j) == t) c += 1; j += 1 }
      out(i) = c
      i += 1
    }
    new GenericArrayData(out)
  }
  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, classOf[TermFreqs].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.kernel($s);")
  }
  override protected def withNewChildInternal(newChild: Expression): TermFreqs =
    copy(child = newChild)
}

object TermFreqs {
  def apply(c: Column, terms: Seq[String]): Column =
    toColumn(TermFreqs(toExpression(c), terms.toList))
}

/** Rank-ordered BPE merge replay on one word — native form of
  * bpeApply's per-word tokenizer scan. The merge table rides the
  * expression as a reference object; greedy left-to-right,
  * non-overlapping, exactly the Scala UDF's loop.
  */
case class BpeApplySyms(child: Expression, mergesLS: Seq[String],
                        mergesRS: Seq[String])
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  // Seq fields for value equality (see TermFreqs); arrays built once
  // per task for the kernel's indexed loop.
  @transient private lazy val mergesL: Array[String] = mergesLS.toArray
  @transient private lazy val mergesR: Array[String] = mergesRS.toArray
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_apply expects STRING, got ${child.dataType.sql}")
  def kernel(s: UTF8String): Any = {
    val w = s.toString
    var syms: Array[String] =
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    var k = 0
    while (k < mergesL.length) {
      val l = mergesL(k); val r = mergesR(k)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          out += l + r; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toArray
      k += 1
    }
    new GenericArrayData(syms.map(UTF8String.fromString))
  }
  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, classOf[BpeApplySyms].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.kernel($s);")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeApplySyms =
    copy(child = newChild)
}

object BpeApplySyms {
  def apply(c: Column, merges: Seq[(String, String)]): Column =
    toColumn(BpeApplySyms(toExpression(c),
      merges.map(_._1).toList, merges.map(_._2).toList))
}

/** Unigram-LM (SentencePiece-style) Viterbi segmentation of one word —
  * the maximum-likelihood tokenization under a piece table of
  * 1e-9-grid-quantized integer log-probabilities (exact BIGINT sums, so
  * the argmax is engine-portable). DP over codepoint positions:
  * best(j) = max over in-vocab spans w[i..j) of best(i) + score; ties
  * broken toward the SMALLEST i (= longest last piece) by ascending-i
  * iteration with a strict `>` update — the oracle replays the same
  * order with the same strict compare. A single codepoint absent from
  * the table falls back to `unkScore`, so every word is segmentable;
  * tables built by TextOps.unigramTrain contain every corpus codepoint
  * and never exercise the fallback. The piece table is tokenizer-sized
  * and rides the expression as a reference object — the corpus pass is
  * ONE codegen scan, no shuffle, no state (the bpeApply shape).
  */
case class UnigramViterbiSyms(child: Expression, piecesS: Seq[String],
                              scoresS: Seq[Long], maxPieceLen: Int,
                              unkScore: Long)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  // Seq fields for value equality (see TermFreqs); the hash map is
  // built once per task for O(1) piece lookups in the DP inner loop.
  @transient private lazy val pieceMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](piecesS.size * 2)
    piecesS.iterator.zip(scoresS.iterator).foreach { case (p, s) =>
      m.put(p, java.lang.Long.valueOf(s))
    }
    m
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_viterbi expects STRING, got ${child.dataType.sql}")
  def kernel(s: UTF8String): Any = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef])
    val best = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var chosen = Long.MinValue
      var cbp = -1
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        val piece = new String(cps, i, j - i)
        val sc = pieceMap.get(piece)
        val v =
          if (sc != null) sc.longValue()
          else if (j - i == 1) unkScore
          else Long.MinValue
        if (v != Long.MinValue) {
          val cand = best(i) + v
          if (cand > chosen) { chosen = cand; cbp = i }
        }
        i += 1
      }
      best(j) = chosen
      bp(j) = cbp
      j += 1
    }
    var p = n
    val rev = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    while (p > 0) {
      val i = bp(p)
      rev += UTF8String.fromString(new String(cps, i, p - i))
      p = i
    }
    new GenericArrayData(rev.reverseIterator.toArray[AnyRef])
  }
  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, classOf[UnigramViterbiSyms].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.kernel($s);")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramViterbiSyms =
    copy(child = newChild)
}

object UnigramViterbiSyms {
  def apply(c: Column, vocab: Seq[(String, Long)], maxPieceLen: Int,
            unkScore: Long): Column = {
    require(maxPieceLen >= 1,
      s"unigram_viterbi maxPieceLen must be >= 1, got $maxPieceLen " +
        "(0 would leave every position uncoverable)")
    toColumn(UnigramViterbiSyms(toExpression(c),
      vocab.map(_._1).toList, vocab.map(_._2).toList, maxPieceLen,
      unkScore))
  }
}

/** Gopher repetition statistics in one pass — native form of
  * gopherQuality's kernel scan. Emits the struct
  * (n_words, n_distinct_words, dup_word_frac, top_bigram,
  * top_bigram_char_frac, top_trigram_char_frac) with the same
  * (count desc, string asc) top-n-gram tie-break the oracle replays.
  */
case class GopherStats(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_distinct_words", IntegerType, nullable = false),
    StructField("dup_word_frac", DoubleType, nullable = false),
    StructField("top_bigram", StringType, nullable = false),
    StructField("top_bigram_char_frac", DoubleType, nullable = false),
    StructField("top_trigram_char_frac", DoubleType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gopher_stats expects STRING, got ${child.dataType.sql}")
  def kernel(s: UTF8String): Any = {
    val text = s.toString
    val ws = graft.operators.TextOps.wordsFn(text)
    def topNgram(n: Int): (String, Int) = {
      if (ws.length < n) return ("", 0)
      val counts = scala.collection.mutable.HashMap.empty[String, Int]
      var i = 0
      while (i <= ws.length - n) {
        val t = ws.slice(i, i + n).mkString(" ")
        counts(t) = counts.getOrElse(t, 0) + 1
        i += 1
      }
      counts.toSeq.minBy { case (t, c) => (-c, t) }
    }
    val nWords = ws.length
    val nDistinct = ws.distinct.length
    val nChars = text.length
    val dupFrac =
      if (nWords > 0) (nWords - nDistinct).toDouble / nWords else 0.0
    val (bg, bgc) = topNgram(2)
    val (tg, tgc) = topNgram(3)
    val bgFrac = if (nChars > 0) bgc.toLong * bg.length / nChars.toDouble
                 else 0.0
    val tgFrac = if (nChars > 0) tgc.toLong * tg.length / nChars.toDouble
                 else 0.0
    new GenericInternalRow(Array[Any](nWords, nDistinct, dupFrac,
      UTF8String.fromString(bg), bgFrac, tgFrac))
  }
  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, classOf[GopherStats].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.kernel($s);")
  }
  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

object GopherStats {
  def apply(c: Column): Column = toColumn(GopherStats(toExpression(c)))
}
