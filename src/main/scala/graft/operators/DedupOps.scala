package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextOps.{HashMod, shingleHashes}

/** Deduplication operators for training-data pipelines: exact,
  * MinHash-LSH near-dup, SimHash, and n-gram Jaccard verification.
  *
  * 100 TB story (stated per the builder brief):
  *  - exactDedup is one hash aggregate on the text hash — map-side
  *    combine collapses duplicates before the shuffle, so the shuffle
  *    carries one row per distinct hash, not per document.
  *  - MinHash-LSH never forms all pairs: documents are exploded to
  *    (band, bandHash) keys (b rows/doc) and candidates come from a
  *    self-equi-join on those keys — the classic banding scheme whose
  *    cost is proportional to the number of truly-colliding pairs.
  *    The exact-Jaccard verification runs only on candidates.
  *  - Band skew (a degenerate band bucket with k docs producing k^2
  *    pairs) is the known hot spot: bucket sizes are bounded by
  *    `maxBucket` (drop pathological buckets, standard practice).
  */
object DedupOps {

  /** Lineage truncation policy for the iterative graph operators
    * ([[connectedComponents]], [[kCore]]): `None` → eager
    * `localCheckpoint` (executor-local blocks — fastest, but executor
    * loss on a real cluster drops the truncated lineage); `Some(dir)` →
    * durable `checkpoint` to `dir` (HDFS/S3 on a cluster), which
    * survives executor loss at the cost of one replicated write per
    * round. Returns the per-round truncation function so the choice is
    * an ARGUMENT, not scaladoc advice.
    */
  private def truncator(sample: DataFrame,
                        checkpointDir: Option[String]): DataFrame => DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = sample.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df => df.checkpoint(true)
      case None =>
        df => df.localCheckpoint(true)
    }

  /** Exact dedup by content hash: one row per distinct text with the
    * smallest id as representative and the duplicate count. Keys on
    * the 128-bit composite (two independent polynomial hashes): a
    * single ~2^30 hash space birthday-collides from ~50k documents —
    * guaranteed false merges at web scale; the pair pushes that past
    * 2^59 per-pair.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextOps.polyHash(col(textCol)).as("text_hash"),
        TextOps.polyHash2(col(textCol)).as("text_hash2"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dupes"))

  /** Keep one representative row per distinct text. */
  def dropExactDupes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val reps = exactDedup(df, idCol, textCol).select(idCol)
    df.join(reps, Seq(idCol), "left_semi")
  }

  /** CCNet-style line-level dedup (Wenzek et al. 2020): split each
    * document on `sep`, count every line's occurrences across the
    * whole corpus, and keep only the lines seen at most `maxDf` times
    * — boilerplate (headers, nav bars, cookie banners) repeats across
    * pages and is removed from EVERY document, including the first.
    * Output: (id, text_dedup, n_lines, n_kept); a document whose
    * every line is boilerplate survives with empty text.
    *
    * 100 TB story: lines are exploded once and aggregated on the
    * composite line hash (two independent polynomial hashes, ~2^60
    * joint space — per-pair collision odds ~2^-60, birthday bound at
    * ~1e9 distinct lines; beyond that, widen the hashes or add a
    * within-group string verify). Map-side combine collapses repeats
    * before the shuffle, so the frequency shuffle carries one row per
    * DISTINCT line; the count join shuffles on the same hash key —
    * raw line strings never key a shuffle. Reassembly is one hash
    * aggregate on the doc id. Three shuffles total, each linear.
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
                sep: String = "\n", maxDf: Int = 1): DataFrame = {
    // sep is a LITERAL separator (quoted before the regex split) —
    // the oracle's string_split semantics, safe for "|", ".", etc.
    val sepRe = java.util.regex.Pattern.quote(sep)
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), sepRe, -1))
        .as(Seq("pos", "line")))
      .withColumn("lh", TextOps.polyHash(col("line")))
      .withColumn("lh2", TextOps.polyHash2(col("line")))
    val freq = lines.groupBy("lh", "lh2")
      .agg(count(lit(1)).as("line_count"))
    val kept = lines.join(freq, Seq("lh", "lh2"))
      .where(col("line_count") <= maxDf)
    // TWO-LEVEL reassembly: a single pathological document (book-length,
    // millions of lines) would otherwise materialize one collect_list
    // of millions of (pos, line) structs in a single reducer row. The
    // chunk level caps any one aggregation buffer at 8192 structs; the
    // doc level then concatenates at most n_lines/8192 chunk strings in
    // chunk order. Because chunks partition the positions in order,
    // joining chunk texts with the separator equals the flat join
    // string for string.
    val chunked = kept.withColumn("_chunk", expr("pos DIV 8192"))
      .groupBy(col(idCol), col("_chunk"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x("line")), sep).as("_chunk_text"),
        count(lit(1)).as("_n"))
    val rebuilt = chunked.groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("_chunk"), col("_chunk_text")))),
          x => x("_chunk_text")), sep).as("text_dedup"),
        sum(col("_n")).as("n_kept"))
    df.select(col(idCol),
        size(split(col(textCol), sepRe, -1)).cast("long").as("n_lines"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** MinHash signature as an array column: minhash_j = min over the
    * shingle set S of (a_j * s + b_j) mod M. The (a_j, b_j) constants
    * are deterministic functions of j, shared with the oracle SQL.
    */
  def minHashA(j: Int): Long = (2L * j + 1) * 1299709L % HashMod
  def minHashB(j: Int): Long = (j + 1) * 15485863L % HashMod

  /** Compiled signature kernel (see TextOps perf note): null for docs
    * with no shingles — they drop out of banding via explode-of-null.
    */
  def minHashSignatureFn(sh: Seq[Long], numHashes: Int): Array[Long] =
    if (sh == null || sh.isEmpty) null
    else Array.tabulate(numHashes) { j =>
      val (a, b) = (minHashA(j), minHashB(j))
      var best = Long.MaxValue
      val it = sh.iterator
      while (it.hasNext) {
        val h = (a * it.next() + b) % HashMod
        if (h < best) best = h
      }
      best
    }

  /** Native codegen form (functions.MinHashSig) — primitive getLong
    * over the shingle ArrayData, no WrappedArray boxing on the corpus
    * scan; null for empty shingle sets, same as the old UDF.
    */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    graft.functions.MinHashSig(shingles, numHashes)

  private[graft] def bandHashesFn(sig: Seq[Long], bands: Int,
                                  rowsPerBand: Int): Array[Long] =
    Array.tabulate(bands) { b =>
      var acc = 0L
      var r = 0
      while (r < rowsPerBand) {
        // stepwise mod, identical to BandHashArr.kernel — a plain
        // HashBase^k product overflows Long for rowsPerBand >= 14 and
        // would silently diverge from the native production kernel
        var w = 1L
        var t = 0
        while (t < rowsPerBand - 1 - r) {
          w = w * TextOps.HashBase % HashMod; t += 1
        }
        acc += sig(b * rowsPerBand + r) * w % HashMod
        r += 1
      }
      acc % HashMod
    }

  /** LSH banding: rows (id, band, band_hash), one per band. Native
    * codegen band kernel (functions.BandHashArr; null signature →
    * null array → posexplode drops the doc, as before).
    */
  def lshBands(df: DataFrame, idCol: String, sigCol: String,
               bands: Int, rowsPerBand: Int): DataFrame =
    df.select(col(idCol), posexplode(
        graft.functions.BandHashArr(col(sigCol), bands, rowsPerBand))
      .as(Seq("band", "band_hash")))

  /** Candidate pairs (id1 < id2) from MinHash-LSH banding over n-word
    * shingles, with two skew guards:
    *  - `maxBucket` DROPS degenerate buckets outright (a band hash
    *    shared by >1000 docs is corpus boilerplate, not similarity);
    *  - `bucketCap` (opt-in) SUBSAMPLES surviving buckets to their
    *    `bucketCap` smallest ids before pairing, so a bucket of size m
    *    contributes ≤ C(cap, 2) pairs instead of C(m, 2). The r9 sf1
    *    rehearsal measured 45× candidate growth at 10× data on a
    *    duplication-amplified corpus (exact-dup clusters collide in
    *    every band by construction) — the cap makes the downstream
    *    verify stage's cost corpus-shape-INDEPENDENT, the same
    *    deterministic-subsample discipline theil_sen applies to its
    *    per-key pair space. The id-order subsample is deterministic
    *    across runs/partitionings; the window sort is bucket-bounded
    *    (≤ maxBucket rows per key).
    */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, numHashes: Int = 16,
                        bands: Int = 8, maxBucket: Int = 1000,
                        bucketCap: Int = Int.MaxValue): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigs = df.select(col(idCol),
      minHashSignature(shingleHashes(col(textCol), shingleN), numHashes).as("sig"))
    if (bucketCap != Int.MaxValue) {
      // id-level path: the rank subsample is defined on ids within a
      // bucket, so the banding must stay id-rowed (the oracle's rank
      // filter replays exactly this)
      val bandRows = lshBands(sigs, idCol, "sig", bands, numHashes / bands)
      val bounded = bandRows
        .withColumn("_bn", count(lit(1))
          .over(org.apache.spark.sql.expressions.Window.partitionBy("band", "band_hash")))
        .where(col("_bn") <= maxBucket).drop("_bn")
        .withColumn("_rk", row_number().over(org.apache.spark.sql
          .expressions.Window.partitionBy("band", "band_hash")
          .orderBy(col(idCol))))
        .where(col("_rk") <= bucketCap).drop("_rk")
      val a = bounded.select(col(idCol).as("id1"), col("band"), col("band_hash"))
      val b = bounded.select(col(idCol).as("id2"), col("band"), col("band_hash"))
      a.join(b, Seq("band", "band_hash"))
        .where(col("id1") < col("id2"))
        .select("id1", "id2").distinct()
    } else {
      // DISTINCT-signature banding (default path): exact-duplicate
      // documents share the whole signature and collide in EVERY
      // band, so id-level banding pays |group|² × bands join rows per
      // dup cluster (the same disease hashNearDup had — measured 9×
      // at the 10× duplication rehearsal). Banding the distinct
      // signatures prices the join on the duplication-independent
      // signature space; id pairs re-expand afterwards. Semantics are
      // IDENTICAL to the id-level join: a same-sig group shares every
      // bucket, so its members pair iff any of its buckets survives
      // maxBucket; bucket size for the cap is the ID count
      // (Σ member-counts over the bucket's sigs), exactly as before.
      val groups = sigs.where(col("sig").isNotNull)
        .groupBy(col("sig"))
        .agg(collect_list(col(idCol)).as("_ids"),
          count(lit(1)).as("_m"))
      val bandRows = lshBands(groups, "sig", "sig", bands,
          numHashes / bands)
        .join(groups, Seq("sig"))
      val bounded = bandRows
        .withColumn("_bn", sum(col("_m"))
          .over(org.apache.spark.sql.expressions.Window.partitionBy("band", "band_hash")))
        .where(col("_bn") <= maxBucket).drop("_bn", "_m")
      // same-sig pairs: every within-group (i < j) pair, provided the
      // group survives in at least one bucket; ids are unique, so the
      // pair list needs no dedup
      val same = bounded.select(col("sig"), col("_ids")).distinct()
        .where(size(col("_ids")) >= 2)
        .select(explode(col("_ids")).as("id1"), col("_ids"))
        .select(col("id1"), explode(col("_ids")).as("id2"))
        .where(col("id1") < col("id2"))
        .select("id1", "id2")
      // cross-sig pairs: banded join over distinct signatures (one
      // distinct on sig pairs — a pair may collide in several bands),
      // then expand both member lists; each id pair comes from exactly
      // one sig pair, so the expansion needs no dedup either
      val a = bounded.select(col("band"), col("band_hash"),
        col("sig").as("_s1"), col("_ids").as("_ids1"))
      val b = bounded.select(col("band"), col("band_hash"),
        col("sig").as("_s2"), col("_ids").as("_ids2"))
      val cross = a.join(b, Seq("band", "band_hash"))
        .where(col("_s1") < col("_s2"))
        .select(col("_s1"), col("_s2"), col("_ids1"), col("_ids2"))
        .distinct()
        .select(explode(col("_ids1")).as("_i1"), col("_ids2"))
        .select(col("_i1"), explode(col("_ids2")).as("_i2"))
        .select(least(col("_i1"), col("_i2")).as("id1"),
          greatest(col("_i1"), col("_i2")).as("id2"))
      same.unionByName(cross)
    }
  }

  /** Exact n-gram Jaccard similarity for given id pairs — the
    * verification stage after LSH candidate generation. Set sizes are
    * integers, so the ratio is engine-exact.
    */
  def jaccardOnPairs(pairs: DataFrame, docs: DataFrame, idCol: String,
                     textCol: String, shingleN: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol),
      shingleHashes(col(textCol), shingleN).as("sh"))
    pairs
      .join(sh.select(col(idCol).as("id1"), col("sh").as("sh1")), "id1")
      .join(sh.select(col(idCol).as("id2"), col("sh").as("sh2")), "id2")
      .withColumn("n_inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("n_union", size(array_union(col("sh1"), col("sh2"))))
      .withColumn("jaccard",
        when(col("n_union") > 0,
          col("n_inter").cast("double") / col("n_union")).otherwise(lit(0.0)))
      .select("id1", "id2", "n_inter", "n_union", "jaccard")
  }

  /** Exact shingle CONTAINMENT pairs: c = n_inter / min(n1, n2) — the
    * asymmetric near-dup measure Jaccard misses. A short document
    * fully embedded in a long one (quote farms, boilerplate wrappers,
    * prepended headers) has tiny Jaccard (the union is dominated by
    * the long side) but containment ≈ 1; dedup pipelines filter on
    * max-containment for exactly this "document swallowed by another"
    * case.
    *
    * Candidate generation deliberately does NOT reuse the MinHash-LSH
    * banding: LSH collision probability tracks JACCARD, so it
    * systematically misses the high-containment/low-Jaccard pairs this
    * operator exists for (a 20-shingle doc inside a 120-shingle one is
    * J ≈ 0.17 — essentially invisible to the bands). Instead candidates
    * come from the rare-shingle self-join (the substringDupes /
    * decontaminate discipline): df-prune corpus-boilerplate shingles
    * at `maxDf` BEFORE the join, pair docs sharing ≥ `minShared`
    * surviving shingles, then verify exactly on the full shingle sets.
    * Shuffle is bounded by the pruned posting lists — never all-pairs.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       shingleN: Int = 3, maxDf: Long = 50,
                       minShared: Long = 3,
                       minContainment: Double = 0.8): DataFrame = {
    val sets = df.select(col(idCol),
      shingleHashes(col(textCol), shingleN).as("sh"))
    val ex = sets.select(col(idCol), explode(col("sh")).as("s"))
    val keep = ex.groupBy("s").agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxDf).select("s")
    val pruned = ex.join(keep, "s")
    val cands = pruned.select(col(idCol).as("id1"), col("s"))
      .join(pruned.select(col(idCol).as("id2"), col("s")), Seq("s"))
      .where(col("id1") < col("id2"))
      .groupBy("id1", "id2")
      .agg(count(lit(1)).as("_n_shared"))
      .filter(col("_n_shared") >= minShared)
      .select("id1", "id2")
    cands
      .join(sets.select(col(idCol).as("id1"), col("sh").as("sh1")), "id1")
      .join(sets.select(col(idCol).as("id2"), col("sh").as("sh2")), "id2")
      .withColumn("n_inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("n1", size(col("sh1")))
      .withColumn("n2", size(col("sh2")))
      .withColumn("containment",
        when(least(col("n1"), col("n2")) > 0,
          col("n_inter").cast("double") / least(col("n1"), col("n2")))
          .otherwise(lit(0.0)))
      .where(col("containment") >= minContainment)
      .select("id1", "id2", "n_inter", "n1", "n2", "containment")
  }

  /** LSH banding RECALL/PRECISION against exact Jaccard ground truth
    * on an evaluation corpus — the text-side twin of ann_recall (which
    * scores the embedding indexes): what fraction of the truly-similar
    * pairs do the bands surface, and how much of the candidate volume
    * is noise the verify stage must pay for. The ground truth is a
    * DECLARED all-pairs sweep (eval corpora are sampled small, same
    * contract as ann_topk's brute-force baseline — never run this on
    * the full corpus); candidates are the production banding.
    * Output: one row (n_true, n_cand, n_hit, recall, precision) with
    * exact integer counts and two exact divisions.
    */
  def lshRecall(df: DataFrame, idCol: String, textCol: String,
                threshold: Double, shingleN: Int = 3): DataFrame = {
    val sh = df.select(col(idCol),
      shingleHashes(col(textCol), shingleN).as("sh"))
    val a = sh.select(col(idCol).as("id1"), col("sh").as("sh1"))
    val b = sh.select(col(idCol).as("id2"), col("sh").as("sh2"))
    val truePairs = a.join(b, col("id1") < col("id2"))
      .withColumn("_ni", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("_nu", size(array_union(col("sh1"), col("sh2"))))
      .where(col("_nu") > 0 &&
        col("_ni").cast("double") / col("_nu") >= threshold)
      .select("id1", "id2")
    val cands = minHashCandidates(df, idCol, textCol, shingleN)
    val hits = truePairs.join(cands, Seq("id1", "id2"), "left_semi")
    val nTrue = truePairs.agg(count(lit(1)).as("n_true"))
    val nCand = cands.agg(count(lit(1)).as("n_cand"))
    val nHit = hits.agg(count(lit(1)).as("n_hit"))
    nTrue.crossJoin(nCand).crossJoin(nHit)
      .select(col("n_true"), col("n_cand"), col("n_hit"),
        when(col("n_true") > 0,
          col("n_hit").cast("double") / col("n_true"))
          .otherwise(lit(1.0)).as("recall"),
        when(col("n_cand") > 0,
          col("n_hit").cast("double") / col("n_cand"))
          .otherwise(lit(1.0)).as("precision"))
  }

  /** MinHash Jaccard ESTIMATE next to the exact verify, per LSH
    * candidate pair: est = (matching signature components)/numHashes —
    * the estimator-quality readout used to tune numHashes/bands before
    * trusting the sketch at corpus scale (E[est] = true Jaccard).
    * Cost rides the candidate pairs (never all-pairs); the signature
    * equality count is integer-exact, the two divisions are single
    * int/int ops — engine-portable.
    */
  def minHashJaccardEst(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, numHashes: Int = 16,
                        bands: Int = 8): DataFrame = {
    val sigs = df.select(col(idCol),
      minHashSignature(shingleHashes(col(textCol), shingleN), numHashes)
        .as("sig"))
    val cands = minHashCandidates(df, idCol, textCol, shingleN, numHashes,
      bands)
    val matchUdf = udf((a: Seq[Long], b: Seq[Long]) =>
      a.zip(b).count(p => p._1 == p._2))
    val est = cands
      .join(sigs.select(col(idCol).as("id1"), col("sig").as("_s1")),
        Seq("id1"))
      .join(sigs.select(col(idCol).as("id2"), col("sig").as("_s2")),
        Seq("id2"))
      .withColumn("n_match", matchUdf(col("_s1"), col("_s2")))
      .withColumn("est_jaccard",
        col("n_match").cast("double") / numHashes)
      .select("id1", "id2", "n_match", "est_jaccard")
    jaccardOnPairs(cands, df, idCol, textCol, shingleN)
      .join(est, Seq("id1", "id2"))
      .select(col("id1"), col("id2"), col("n_match"), col("est_jaccard"),
        col("jaccard"))
  }

  /** Eval decontamination: (test_doc, train_doc) pairs that share
    * n-gram shingles, with the shared-shingle count — the standard
    * "is the eval set leaked into the training split" sweep.
    *
    * Scale shape: one shingle-hash equi-join, never all doc pairs.
    * The skew control is DOCUMENT-FREQUENCY pruning: a shingle that
    * appears in more than `maxDf` docs is boilerplate ("the of the")
    * whose join blowup is quadratic in df and whose evidentiary value
    * is nil, so it is dropped before the join — same discipline as
    * the LSH maxBucket cap. Per-doc shingles are already distinct
    * (TextOps.shingleHashes), so (doc, shingle) rows are unique and
    * the pair count is a plain count.
    */
  def contaminationPairs(docs: DataFrame, idCol: String, textCol: String,
                         splitCol: String, trainLabel: String,
                         testLabel: String, shingleN: Int = 3,
                         maxDf: Long = 10): DataFrame = {
    val sh = docs
      .filter(col(splitCol).isin(trainLabel, testLabel))
      .select(col(idCol), col(splitCol),
        explode(shingleHashes(col(textCol), shingleN)).as("sh"))
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df_"))
      .filter(col("df_") <= maxDf)
    // The df prune runs BEFORE any per-shingle collect, so the list
    // aggregate below is bounded by maxDf — no boilerplate-shingle
    // straggler. The join probe's exchange on sh is identical to the
    // df aggregate's input exchange (reused, one pass over the
    // shingles), and the post-join groupBy(sh) needs no new shuffle:
    // the join output is already hash-partitioned by sh.
    val pruned = sh.join(rare.select("sh"), "sh")
    pruned.groupBy("sh").agg(
        collect_list(when(col(splitCol) === testLabel, col(idCol)))
          .as("te_ids"),
        collect_list(when(col(splitCol) === trainLabel, col(idCol)))
          .as("tr_ids"))
      .select(explode(col("te_ids")).as("test_id"), col("tr_ids"))
      .select(col("test_id"), explode(col("tr_ids")).as("train_id"))
      .groupBy("test_id", "train_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Substring-level duplicate pairs via winnowed fingerprints
    * ([[TextOps.winnowFingerprintsFn]]): documents sharing at least
    * `minShared` winnowed fingerprints are flagged — catches long
    * COPIED SPANS (quotes, mirrored passages, licence boilerplate)
    * that whole-document hashing misses and that line dedup only
    * catches when the span aligns with line boundaries. Guarantee:
    * a shared run of >= w + n - 1 words always shares a fingerprint.
    *
    * 100 TB story: only ~2/(w+1) of shingles survive winnowing, so
    * the exploded fingerprint table is a fraction of the shingle
    * stream; `maxDf` drops corpus-boilerplate fingerprints BEFORE the
    * self-join (the same degenerate-bucket cap as LSH banding), and
    * the pair aggregate shuffles only true co-occurrences.
    */
  def substringDupes(df: DataFrame, idCol: String, textCol: String,
                     n: Int = 3, w: Int = 4, minShared: Long = 5,
                     maxDf: Long = 50): DataFrame = {
    val fp = df.select(col(idCol),
      explode(TextOps.winnowFingerprints(col(textCol), n, w)).as("fp"))
    val keep = fp.groupBy("fp").agg(count(lit(1)).as("df_"))
      .filter(col("df_") <= maxDf)
    val pruned = fp.join(keep.select("fp"), "fp")
    val a = pruned.select(col(idCol).as("id1"), col("fp"))
    val b = pruned.select(col(idCol).as("id2"), col("fp"))
    a.join(b, Seq("fp"))
      .where(col("id1") < col("id2"))
      .groupBy("id1", "id2")
      .agg(count(lit(1)).as("n_shared_fp"))
      .filter(col("n_shared_fp") >= minShared)
  }

  /** EXACT shared-substring runs ≥ `minRunTokens` tokens between
    * document pairs — the Lee-et-al "dedup exact substrings" pass that
    * [[substringDupes]]' winnowing only approximates (winnowing says
    * "a long span is shared", this says WHERE and HOW LONG, exactly).
    *
    * Relational suffix-anchor formulation (no suffix array, no
    * per-pair alignment): every position's n-token shingle hash is an
    * anchor `(doc, pos, h)`; corpus-frequent anchors (> `maxDf`
    * occurrences — boilerplate) are pruned BEFORE the posting-list
    * self-join; matched anchors land on a (id1, id2, diagonal =
    * pos1 − pos2) key, where a shared substring of L tokens is exactly
    * a run of L − n + 1 CONSECUTIVE anchors on one diagonal. Runs fall
    * out of the classic islands trick (pos − row_number over the
    * diagonal) — the window partitions by (pair, diagonal), a
    * candidate-bounded domain, never a global sort. Output: one row
    * per maximal run, (id1, id2, start1, start2, run_tokens), 0-based
    * token offsets.
    *
    * Exactness/caveat: with no pruning the longest run per pair EQUALS
    * the longest common token-substring (property-tested vs brute-force
    * DP); a pruned mid-run anchor splits a run in two — the documented
    * price of the df cap, deterministic and disclosed, same discipline
    * as the LSH bucket caps.
    *
    * 100 TB story: the anchor stream is one scan (native positional
    * shingle kernel, codegen); df-prune bounds every posting list to
    * `maxDf`, so the self-join shuffles ≤ maxDf² pairs per surviving
    * anchor value; the islands window rides matched-anchor volume,
    * already pair-bounded. Nothing fact-sized after the prune.
    */
  def exactSubstringRuns(df: DataFrame, idCol: String, textCol: String,
                         shingleN: Int = 3, maxDf: Long = 50,
                         minRunTokens: Long = 10): DataFrame = {
    require(shingleN >= 1 && minRunTokens >= shingleN,
      s"need shingleN >= 1 and minRunTokens >= shingleN; " +
        s"got $shingleN/$minRunTokens")
    val posSh = df.select(col(idCol).as("_id"),
      posexplode(TextOps.positionalShingleHashes(col(textCol), shingleN)))
      .toDF("_id", "_p", "_h")
    val keep = posSh.groupBy("_h").agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxDf).select("_h")
    val pruned = posSh.join(keep, "_h")
    val m = pruned.select(col("_h"), col("_id").as("id1"),
        col("_p").as("_p1"))
      .join(pruned.select(col("_h"), col("_id").as("id2"),
        col("_p").as("_p2")), Seq("_h"))
      .where(col("id1") < col("id2"))
      .withColumn("_diag", col("_p1") - col("_p2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id1", "id2", "_diag").orderBy("_p1")
    m.withColumn("_isl", col("_p1") - row_number().over(w))
      .groupBy("id1", "id2", "_diag", "_isl")
      .agg(min(col("_p1")).cast("long").as("start1"),
        min(col("_p2")).cast("long").as("start2"),
        (count(lit(1)) + (shingleN - 1).toLong).as("run_tokens"))
      .where(col("run_tokens") >= minRunTokens)
      .select("id1", "id2", "start1", "start2", "run_tokens")
  }

  /** APPLY step of exact-substring dedup — the Lee-et-al removal pass:
    * every maximal shared run found by [[exactSubstringRuns]] is CUT
    * from the higher-id document (the lower id keeps the canonical
    * copy), and the corpus is re-emitted with per-doc removal
    * accounting. A doc hit by several partners has its spans merged
    * (interval union per doc — overlapping quotes are removed once);
    * a doc that is only ever the lower id passes through verbatim.
    *
    * Plan: runs → per-doc interval union (islands over a window
    * partitioned by doc, ordered by span start — run count per doc is
    * candidate-bounded) → ONE broadcast-size join back to the corpus →
    * expression-level token filter (`filter(tokens, (t,i) → …)`) and
    * rejoin with a single space; the reconstruction never explodes the
    * token stream into rows. Exactness: all positions are exact
    * integers; text reassembly is a discrete token filter, identical
    * in any engine on single-space-tokenized text.
    */
  def exactSubstringDedupApply(df: DataFrame, idCol: String,
                               textCol: String, shingleN: Int = 3,
                               maxDf: Long = 50,
                               minRunTokens: Long = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val runs = exactSubstringRuns(df, idCol, textCol, shingleN, maxDf,
      minRunTokens)
    val iv = runs.select(col("id2").as("_doc"), col("start2").as("_s"),
      (col("start2") + col("run_tokens")).as("_e"))
    val wp = Window.partitionBy("_doc").orderBy(col("_s"), col("_e"))
    val wr = wp.rowsBetween(Window.unboundedPreceding, -1)
    val wc = wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = iv
      .withColumn("_pm", max(col("_e")).over(wr))
      .withColumn("_new",
        when(col("_pm").isNull || col("_s") > col("_pm"), 1L)
          .otherwise(0L))
      .withColumn("_isl", sum(col("_new")).over(wc))
      .groupBy("_doc", "_isl")
      .agg(min(col("_s")).as("_s"), max(col("_e")).as("_e"))
    // removed token positions per doc — bounded by doc length
    val removed = merged
      .groupBy("_doc")
      .agg(flatten(collect_list(expr("sequence(_s, _e - 1)")))
        .as("_rm"))
    val toks = split(col(textCol), " ")
    df.join(removed, df(idCol) === removed("_doc"), "left")
      .withColumn("_toks", toks)
      .withColumn("_kept",
        when(col("_rm").isNull, col("_toks"))
          .otherwise(filter(col("_toks"),
            (_, i) => !array_contains(col("_rm"), i.cast("long")))))
      .select(col(idCol),
        size(col("_toks")).cast("long").as("n_tokens"),
        size(col("_kept")).cast("long").as("n_kept"),
        (size(col("_toks")) - size(col("_kept"))).cast("long")
          .as("n_removed"),
        array_join(col("_kept"), " ").as("text_deduped"))
  }

  /** Bloom-prefiltered decontamination — IDENTICAL output to
    * [[contaminationPairs]], cheaper scan side. A Bloom filter is
    * built over the eval-split shingle hashes (the small side: eval
    * sets are millions of shingles where the train corpus is
    * trillions) and broadcast in the task closure; train shingles
    * that cannot be in any eval document are dropped BEFORE the
    * frequency aggregate and join, so ~(1 - fpp) of the train-side
    * shuffle volume disappears.
    *
    * Output equality argument (why fpp never leaks into results):
    * a train occurrence of a shingle PRESENT in the eval split always
    * passes the filter (Bloom has no false negatives), so every
    * pair-producing shingle keeps its full occurrence count and the
    * df-prune decides identically; a false-positive train-only
    * shingle joins no eval row and yields no pair. The filter is a
    * pure perf prefilter — the exact join is still the authority.
    */
  /** Per-eval-document contamination RATE — the number people actually
    * report after decontamination: of each test document's distinct
    * shingles, what fraction appears ANYWHERE in the train split?
    * [[contaminationPairs]] names the offending (test, train) pairs;
    * this scores severity per eval doc, deduplicated across train docs
    * (a shingle shared with fifty train documents is still one
    * contaminated shingle). No df-prune: pruning would understate the
    * rate, and the join here is a LEFT SEMI against the
    * distinct-train-shingle set, so boilerplate shingles cost one
    * probe, never a posting-list blowup. Test docs too short to form a
    * shingle have no row (they cannot be scored).
    *
    * Exactness: distinct-shingle counts are exact integers (the
    * shingle kernel emits distinct hashes per doc); the rate is one
    * division. Plan: one shingle scan, one distinct on train shingles,
    * one semi join, two doc-sized aggregates.
    */
  def contaminationRate(docs: DataFrame, idCol: String, textCol: String,
                        splitCol: String, trainLabel: String,
                        testLabel: String,
                        shingleN: Int = 3): DataFrame = {
    val sh = docs
      .filter(col(splitCol).isin(trainLabel, testLabel))
      .select(col(idCol), col(splitCol),
        explode(shingleHashes(col(textCol), shingleN)).as("sh"))
    val testSh = sh.where(col(splitCol) === testLabel)
    val trainShD = sh.where(col(splitCol) === trainLabel)
      .select("sh").distinct()
    val totals = testSh.groupBy(col(idCol).as("test_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val matched = testSh.join(trainShD, Seq("sh"), "left_semi")
      .groupBy(col(idCol).as("test_id"))
      .agg(count(lit(1)).as("n_contaminated"))
    totals.join(matched, Seq("test_id"), "left")
      .select(col("test_id"), col("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        try_divide(
          coalesce(col("n_contaminated"), lit(0L)).cast("double"),
          col("n_shingles").cast("double")).as("contamination_rate"))
  }

  def contaminationPairsBloom(docs: DataFrame, idCol: String,
                              textCol: String, splitCol: String,
                              trainLabel: String, testLabel: String,
                              shingleN: Int = 3, maxDf: Long = 10,
                              fpp: Double = 0.01): DataFrame = {
    val sh = docs
      .filter(col(splitCol).isin(trainLabel, testLabel))
      .select(col(idCol), col(splitCol),
        explode(shingleHashes(col(textCol), shingleN)).as("sh"))
    // cache: the eval shingles feed two driver actions (count sizes
    // the filter, then the bloom aggregate) — without it the eval
    // split is re-shingled per action
    val testSh = sh.filter(col(splitCol) === testLabel).cache()
    val nTestRaw = testSh.count()
    // an empty eval split has nothing to leak against — and Spark's
    // bloomFilter aggregate NPEs on a zero-row build; the exact join
    // below produces the (empty) answer without a prefilter
    if (nTestRaw == 0) { testSh.unpersist(); return sh.limit(0)
      .groupBy("sh").agg(count(lit(1)).as("n_shared"))
      .select(col("sh").as("test_id"), col("sh").as("train_id"),
        col("n_shared")) }
    val bf = testSh.stat.bloomFilter("sh", nTestRaw, fpp)
    testSh.unpersist()
    // Native probe: serialize the filter into a binary literal and use
    // Catalyst's BloomFilterMightContain (the expression behind runtime
    // row-level filtering — same sketch class, same hash arithmetic as
    // bf.mightContainLong, with a real doGenCode). The earlier
    // `udf(bf.mightContainLong)` was the last Scala UDF riding a
    // corpus-scale scan and broke whole-stage codegen on the full-corpus
    // shingle sweep; this keeps the filter inside the codegen'd stage.
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val probe = org.apache.spark.sql.GraftExpressionBridge.toColumn(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          bos.toByteArray,
          org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.GraftExpressionBridge.toExpression(col("sh"))))
    val pre = sh.filter(col(splitCol) === testLabel || probe)
    val rare = pre.groupBy("sh").agg(count(lit(1)).as("df_"))
      .filter(col("df_") <= maxDf)
    val pruned = pre.join(rare.select("sh"), "sh")
    pruned.groupBy("sh").agg(
        collect_list(when(col(splitCol) === testLabel, col(idCol)))
          .as("te_ids"),
        collect_list(when(col(splitCol) === trainLabel, col(idCol)))
          .as("tr_ids"))
      .select(explode(col("te_ids")).as("test_id"), col("tr_ids"))
      .select(col("test_id"), explode(col("tr_ids")).as("train_id"))
      .groupBy("test_id", "train_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Connected components over an undirected near-dup pair list:
    * every document gets the smallest doc id reachable through the
    * pair graph as its cluster id — the canonical "collapse duplicate
    * clusters to one representative" step that follows LSH/SimHash
    * pair generation.
    *
    * Algorithm: min-label propagation with pointer jumping. Each
    * round a node takes the min of (its label, its neighbors' labels,
    * the label of its label); the extra label-of-label hop compresses
    * paths so convergence is O(log diameter) rounds, not O(diameter).
    * Each round is two shuffles (one join + one hash aggregate) over
    * the EDGE list — never all pairs of nodes. Convergence is
    * detected by the strictly-decreasing sum of labels (one scalar
    * action per round). Lineage: each round's labels are checkpointed —
    * `localCheckpoint` by default (fastest on a healthy cluster, but
    * executor loss drops the truncated lineage and fails the job);
    * pass `checkpointDir = Some(hdfsPath)` on a real cluster for a
    * DURABLE `checkpoint`, so a lost executor replays one round from
    * replicated storage, not the whole history. Near-dup clusters are
    * shallow (all copies of one document), so rounds stay in single
    * digits even at web scale.
    */
  def connectedComponents(pairs: DataFrame, id1: String, id2: String,
                          maxIter: Int = 20,
                          checkpointDir: Option[String] = None): DataFrame = {
    val cp = truncator(pairs, checkpointDir)
    // Materialize the pair source ONCE before symmetrizing: the union
    // references it twice, and an unmaterialized source (e.g. the whole
    // LSH pipeline) would execute twice inside the distinct.
    val p = cp(pairs.select(col(id1).as("src"), col(id2).as("dst")))
    val edges = cp(p.union(
      p.select(col("dst").as("src"), col("src").as("dst"))).distinct())
    var labels = cp(edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl")))
    // no edges → no non-trivial components; the convergence sum below
    // would read a NULL aggregate off the empty frame
    if (labels.isEmpty) return labels
    var prevSum = labels.agg(sum("lbl")).head.getLong(0)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // Two jobs per round: one checkpoint of the new labels (join +
      // union + hash aggregate), one scalar sum for convergence.
      val nbr = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("lbl"))
      val lblOfLbl = labels
        .join(labels.toDF("lbl", "lbl2"), Seq("lbl"), "left")
        .select(col("id"), coalesce(col("lbl2"), col("lbl")).as("lbl"))
      val newLabels = cp(labels.union(nbr).union(lblOfLbl)
        .groupBy("id").agg(min("lbl").as("lbl")))
      val s = newLabels.agg(sum("lbl")).head.getLong(0)
      converged = s == prevSum
      prevSum = s
      labels = newLabels
      iter += 1
    }
    labels
  }

  /** Fixed-point integer PageRank over an undirected pair list — the
    * centrality companion to [[connectedComponents]] (which doc is the
    * canonical center of a duplicate cluster; which URL is the hub).
    * Ranks live in integer micro-units and every update is integer
    * multiply/divide — r' = 0.15*U + (sum_u r(u) DIV deg(u)) * 85 DIV
    * 100 — so the trajectory is deterministic in ANY engine at ANY
    * parallelism: no float sum-order hazard, unlike textbook float
    * PageRank whose per-node sums reorder under shuffle.
    *
    * Scale shape: per iteration one edge-list join + one hash
    * aggregate, both keyed — cost rides |edges|, never |V|^2;
    * localCheckpoint truncates the iteration lineage (durable
    * checkpoint on a real cluster).
    */
  def pageRankIntegers(pairs: DataFrame, id1: String, id2: String,
                       iters: Int = 3, unit: Long = 1000000L): DataFrame = {
    val p = pairs.select(col(id1).as("src"), col(id2).as("dst"))
      .localCheckpoint()
    val edges = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    var ranks = deg.select(col("src").as("id"), lit(unit).as("rank"))
    val base = unit * 15L / 100L
    for (_ <- 1 to iters) {
      // every node of `deg` receives >= 1 contribution (edges are
      // symmetric), so the aggregate is total over the node set
      ranks = edges
        .join(ranks.select(col("id").as("src"), col("rank")), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"), expr("rank DIV deg").as("c"))
        .groupBy("id")
        .agg((lit(base) + expr("sum(c) * 85 DIV 100")).as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** Triangle census of an undirected pair list — the graph-density
    * readout next to [[connectedComponents]] (how tightly a duplicate
    * cluster is knit) and [[pageRankIntegers]]. Uses the ordered-
    * triple method: edges canonicalized a < b, wedges (a,b)⋈(b,c)
    * closed against (a,c) — each triangle counted exactly once, no
    * symmetrized edge blow-up.
    *
    * Scale shape: two equi-joins on single node keys plus one count —
    * cost rides the wedge count of the ORDERED graph, which the id
    * ordering already truncates (each wedge is generated from its
    * middle vertex only with ordered endpoints). On a power-law graph
    * at 100 TB, replace the id order with a degree order (orient
    * low-degree → high-degree) so hub wedges collapse; the join
    * shape — and this operator — stay identical, only the
    * canonicalization key changes. Input here is the LSH candidate
    * graph, whose banding caps already bound per-node degree.
    */
  def triangleCount(pairs: DataFrame, id1: String, id2: String): DataFrame = {
    val e = pairs
      .select(least(col(id1), col(id2)).as("a"),
        greatest(col(id1), col(id2)).as("b"))
      .where(col("a") < col("b")).distinct()
      .localCheckpoint() // referenced three times below; one LSH run
    val nodes = e.select(col("a").as("v"))
      .union(e.select(col("b").as("v"))).distinct()
    val wedges = e.join(e.select(col("a").as("b"), col("b").as("c")), "b")
    val tri = wedges.join(e.select(col("a"), col("b").as("c")),
      Seq("a", "c"), "left_semi")
    nodes.agg(count(lit(1)).as("n_nodes")).crossJoin(
        e.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
  }

  /** Degree distribution of an undirected pair list — the first graph
    * sanity readout next to [[triangleCount]] (is the near-dup graph a
    * few giant hubs or many small cliques?). Two hash aggregates:
    * node degrees (node-set sized), then nodes-per-degree (tiny).
    */
  def degreeHistogram(pairs: DataFrame, id1: String, id2: String): DataFrame = {
    val e = pairs
      .select(least(col(id1), col(id2)).as("a"),
        greatest(col(id1), col(id2)).as("b"))
      .where(col("a") < col("b")).distinct()
    e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
  }

  /** Cluster assignment for a whole corpus: near-dup pairs at
    * `threshold` -> connected components -> (doc, cluster_id, keep)
    * where keep=1 marks the cluster representative (smallest id).
    * Documents in no pair are their own singleton cluster.
    */
  def dedupClusters(df: DataFrame, idCol: String, textCol: String,
                    threshold: Double): DataFrame = {
    val pairs = minHashNearDup(df, idCol, textCol, threshold)
    val cc = connectedComponents(pairs, "id1", "id2")
      .withColumnRenamed("id", idCol)
    df.select(idCol).join(cc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("lbl"), col(idCol)).as("cluster_id"))
      .withColumn("keep",
        (col("cluster_id") === col(idCol)).cast("long"))
  }

  /** MinHash-LSH near-dup end to end: candidates -> exact-Jaccard
    * verify -> pairs above threshold.
    */
  def minHashNearDup(df: DataFrame, idCol: String, textCol: String,
                     threshold: Double, shingleN: Int = 3,
                     numHashes: Int = 16, bands: Int = 8): DataFrame = {
    val cands = minHashCandidates(df, idCol, textCol, shingleN, numHashes, bands)
    jaccardOnPairs(cands, df, idCol, textCol, shingleN)
      .where(col("jaccard") >= threshold)
  }

  /** SimHash: nbits-bit signature from word-hash bit votes — documents
    * with small Hamming distance between signatures are near-dups.
    * Compiled kernel: per bit, sum +/-1 votes over the word hashes,
    * then assemble the sign bits into one long.
    */
  def simHashFn(s: String, nbits: Int): Long = {
    val wh = TextOps.wordHashesFn(s)
    var out = 0L
    var b = 0
    while (b < nbits) {
      // Bit b votes on the PARITY of an independent affine transform of
      // the word hash, not on bit b of the hash itself: the word hash is
      // only ~30 bits wide, so raw bits >= 30 are constant zero and every
      // document would collide in the high bands (measured: one 12-bit
      // band bucket holding the entire corpus -> 25M candidate pairs).
      val a = minHashA(b); val c = minHashB(b)
      var vote = 0L
      var i = 0
      while (i < wh.length) {
        vote += (if (((a * wh(i) + c) % HashMod & 1L) == 1L) 1L else -1L)
        i += 1
      }
      if (vote > 0) out += (1L << b)
      b += 1
    }
    out
  }

  /** Native codegen form (functions.SimHash64). */
  def simHash(textCol: Column, nbits: Int = 16): Column =
    graft.functions.SimHash64(textCol, nbits)

  /** Hamming distance between two simhash longs. */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs at scale: split the nbits signature into
    * `bands` equal bit chunks — any pair within hamming distance
    * < bands shares at least one exact chunk (pigeonhole), so a
    * banded self-equi-join finds every candidate without the
    * quadratic all-pairs scan; exact popcount verifies. Same banding
    * discipline as the MinHash path (never all pairs; candidate cost
    * proportional to true collisions).
    *
    * Scale note: bucket granularity is 2^(nbits/bands) values per
    * band — too-narrow chunks (e.g. 4 bits = 16 buckets) degenerate
    * into quadratic pair blowup on any real corpus. Default 48/4
    * gives 4096 buckets per band; size nbits/bands so corpus/2^width
    * stays small.
    */
  def simHashNearDup(df: DataFrame, idCol: String, textCol: String,
                     nbits: Int = 48, bands: Int = 4,
                     maxDist: Int = 3): DataFrame = {
    val sig = df.select(col(idCol), simHash(col(textCol), nbits).as("sig"))
    hashNearDup(sig, idCol, "sig", nbits, bands, maxDist)
  }

  /** Generic banded Hamming near-dup over ANY long bit-signature
    * column (simhash text signatures, perceptual image hashes, any
    * locality-preserving fingerprint): the banding/verify second half
    * of [[simHashNearDup]], factored out so every signature family
    * shares one audited join shape. Split the nbits signature into
    * `bands` equal chunks; any pair within hamming distance < bands
    * shares at least one exact chunk (pigeonhole), so a banded
    * self-equi-join finds every such pair without the quadratic
    * all-pairs scan; exact popcount verifies.
    *
    * Scale note: bucket granularity is 2^(nbits/bands) values per
    * band — size the chunk width so corpus/2^width stays small, or
    * the band join degenerates quadratically.
    */
  def hashNearDup(sig: DataFrame, idCol: String, sigCol: String,
                  nbits: Int, bands: Int, maxDist: Int): DataFrame = {
    require(nbits % bands == 0, "bands must divide nbits")
    require(maxDist < bands,
      "pigeonhole completeness needs maxDist < bands")
    val width = nbits / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    // The banded self-join runs over DISTINCT signatures, not ids: a
    // web-scale corpus is full of byte-identical media whose identical
    // signatures collide in EVERY band, so an id-level join pays
    // |group|² × bands shuffle rows per duplicate cluster (measured
    // 28× cost at the 10× duplication rehearsal). Signature-level
    // banding prices the join and the popcount verify on the
    // duplication-INDEPENDENT distinct-signature space; id pairs are
    // re-expanded afterwards — generator work proportional to the
    // OUTPUT, which is the floor any all-pairs emitter has.
    val members = sig.select(col(sigCol).as("sig"), col(idCol))
    val distinctSigs = members.select("sig").distinct()
    // identical signatures: every within-group pair, distance 0, via a
    // sig-co-partitioned equi-self-join (output-sized, no banding)
    val same = members.as("x").join(members.as("y"),
        col("x.sig") === col("y.sig") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id1"), col(s"y.$idCol").as("id2"),
        lit(0).cast("int").as("hamming"))
    val banded = distinctSigs.select(col("sig"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * width).bitwiseAND(lit(mask))
            .as("band_val"))): _*)).as("bv"))
      .select(col("sig"), col("bv.band"), col("bv.band_val"))
    // Identical subplans on both join sides (aliases applied ABOVE the
    // join, not below): the band-key exchange is planned once and
    // reused, so the signature pass is planned a single time.
    val sigPairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.sig") < col("b.sig"))
      .select(col("a.sig").as("sig1"), col("b.sig").as("sig2"))
      .distinct()
      .withColumn("hamming", hammingDist(col("sig1"), col("sig2")))
      .where(col("hamming") <= maxDist)
    val cross = sigPairs
      .join(members.select(col("sig").as("sig1"),
        col(idCol).as("_i1")), "sig1")
      .join(members.select(col("sig").as("sig2"),
        col(idCol).as("_i2")), "sig2")
      .select(least(col("_i1"), col("_i2")).as("id1"),
        greatest(col("_i1"), col("_i2")).as("id2"),
        col("hamming").cast("int").as("hamming"))
    same.unionByName(cross)
  }

  /** Newman modularity of a node partition over an undirected simple
    * edge list — the "is this grouping real structure or just degree
    * luck" score for the near-dup graph (labels from an attribute
    * like language, or from [[connectedComponents]]): with m edges,
    * e_c intra-community edges and d_c the summed degree of
    * community c,
    *   Q = Σ_c ( e_c/m − (d_c/(2m))² ),
    * ∈ [−1/2, 1): ≈0 means the partition explains nothing beyond the
    * degree sequence; Q > 0.3 is conventionally "real" community
    * structure. (A connected-components partition makes every edge
    * intra-community, so there Q = 1 − Σ(d_c/2m)² — still informative
    * about balance.)
    *
    * Exactness: e_c, d_c, m are exact BIGINTs off edge-list joins and
    * hash aggregates (cost rides |edges|); each community term is one
    * short double expression and Σ_c is a fixed-order fold over the
    * community-sorted list. Output: 1 row (m, dropped_edges,
    * n_comms, q) — dropped_edges counts input edges lost to
    * unlabeled endpoints (0 when labels cover every node).
    */
  def modularity(pairs: DataFrame, id1: String, id2: String,
                 labels: DataFrame, idCol: String,
                 commCol: String): DataFrame = {
    val la = labels.select(col(idCol).as("_a"),
      col(commCol).cast("string").as("_ca"))
    val lb = labels.select(col(idCol).as("_b"),
      col(commCol).cast("string").as("_cb"))
    val e = pairs.select(col(id1).as("_a"), col(id2).as("_b"))
    val j = e.join(la, "_a").join(lb, "_b")
    // edges touching an unlabeled endpoint drop out of the inner
    // joins above and shrink m — surface the loss as an explicit
    // dropped_edges count so a partial label table can't silently
    // skew Q (ADVICE r12)
    val tot = j.agg(count(lit(1)).as("m"))
      .crossJoin(e.agg(count(lit(1)).as("_n_in")))
      .select(col("m"), (col("_n_in") - col("m")).as("dropped_edges"))
    val eIn = j.where(col("_ca") === col("_cb"))
      .groupBy(col("_ca").as("_c")).agg(count(lit(1)).as("_e"))
    val deg = j.select(col("_ca").as("_c"))
      .unionAll(j.select(col("_cb").as("_c")))
      .groupBy("_c").agg(count(lit(1)).as("_d"))
    val comm = deg.join(eIn, Seq("_c"), "left")
      .select(col("_c"), col("_d"), coalesce(col("_e"), lit(0L)).as("_e"))
      .crossJoin(broadcast(tot))
    val mD = col("m").cast("double")
    val term = col("_e").cast("double") / mD -
      (col("_d").cast("double") / (lit(2.0) * mD)) *
        (col("_d").cast("double") / (lit(2.0) * mD))
    comm.select(col("_c"), term.as("_term"), col("m"),
        col("dropped_edges"))
      .agg(max(col("m")).as("m"),
        max(col("dropped_edges")).as("dropped_edges"),
        count(lit(1)).as("n_comms"),
        StatsOps.orderedFoldSum(Seq("_c"), "_term").as("q"))
  }

  /** k-core peeling of the near-dup candidate graph — "which nodes
    * survive repeatedly deleting everything with degree < k". Dense
    * cores are where transitive duplicate clusters (and LSH bucket
    * pathologies) live; peeling is the standard cheap prefilter
    * before any per-cluster work. Edges are first canonicalized
    * (undirected, self-loops and duplicate pairs dropped) so degree
    * means simple-graph degree.
    *
    * Determinism + scale: the peel is a FIXED number of rounds (the
    * contract — not peel-to-convergence, whose round count is
    * data-dependent; callers pick rounds ≥ the graph's peel depth,
    * and the spec shows convergence detection via the fixpoint
    * column). Each round is one degree aggregate + two semi-joins on
    * the candidate edge list — cost rides |edges| per round, nothing
    * fact-sized, no collect. Converged = did the LAST round change
    * nothing (node count fixpoint). Output: 1 row (k, rounds,
    * n_nodes, n_edges, converged).
    */
  /** Synchronous label propagation (Raghavan et al. 2007) — community
    * detection over the near-dup candidate graph, the density-driven
    * complement of [[connectedComponents]] (which finds CONNECTIVITY
    * classes; LPA splits a weakly-bridged component into its dense
    * cores). Deterministic variant: every node starts as its own
    * label; each round, a node adopts the most frequent label among
    * its NEIGHBORS (count desc, smallest label on ties — a total
    * order, so the classic random tie-break nondeterminism is
    * removed); isolated nodes keep their label. Fixed `rounds` is the
    * contract, like [[kCore]] — callers pick rounds ≥ the expected
    * community diameter.
    *
    * 100 TB story per round: one |E|-shuffle join tagging each edge
    * with its endpoint's current label, one (node, label) hash
    * aggregate, one top-1 window (partial WindowGroupLimit — ≤ 1 row
    * per node per map task crosses the exchange); state is one label
    * per node, lineage truncated per round like every iterative op
    * here.
    */
  def labelPropagation(pairs: DataFrame, id1: String, id2: String,
                       nodes: DataFrame, nodeCol: String, rounds: Int,
                       checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    val cp = truncator(pairs, checkpointDir)
    val p = cp(pairs.select(col(id1).cast("long").as("_i1"),
      col(id2).cast("long").as("_i2")))
    val e = cp(p.select(col("_i1").as("a"), col("_i2").as("b"))
      .unionByName(p.select(col("_i2").as("a"), col("_i1").as("b")))
      .distinct())
    var lab = nodes.select(col(nodeCol).cast("long").as("node"))
      .distinct().withColumn("label", col("node"))
    for (_ <- 1 to rounds) {
      val votes = e
        .join(lab.select(col("node").as("b"), col("label")), Seq("b"))
        .groupBy(col("a"), col("label"))
        .agg(count(lit(1)).as("_n"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("a")
        .orderBy(col("_n").desc, col("label"))
      val winners = votes
        .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
        .select(col("a").as("node"), col("label").as("_new"))
      lab = cp(lab.join(winners, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("_new"), col("label")).as("label")))
    }
    lab.select(col("node"), col("label").as("community"))
  }

  def kCore(pairs: DataFrame, id1: String, id2: String, k: Int,
            rounds: Int,
            checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k>=1, rounds>=1; got $k/$rounds")
    val cp = truncator(pairs, checkpointDir)
    // Each round reads its edge frame three times (two degree scans +
    // the semi-join probe), so a lazy chain would nest ~3^rounds
    // copies of the upstream candidate build into one logical plan —
    // minutes of analyzer time before a row moves. The standard Spark
    // idiom for iterative graph algorithms applies: an EAGER
    // checkpoint per round (localCheckpoint by default, durable
    // checkpoint when checkpointDir is given — see truncator) truncates
    // plan and lineage to the materialized edge list (LSH-bounded by
    // contract, no driver collect), so the candidate build runs exactly
    // once and each round is one small job over the previous round's
    // blocks. The eager work happens when the caller builds the
    // frame — the peel IS the operator, not a plan detail.
    val e0 = pairs
      .select(least(col(id1), col(id2)).as("_a"),
        greatest(col(id1), col(id2)).as("_b"))
      .where(col("_a") < col("_b"))
      .distinct()
    val e0cp = cp(e0)
    def peel(e: DataFrame): DataFrame = {
      val deg = e.select(col("_a").as("_n"))
        .unionAll(e.select(col("_b").as("_n")))
        .groupBy("_n").agg(count(lit(1)).as("_d"))
      val keep = deg.where(col("_d") >= k).select(col("_n"))
      cp(e.join(keep.withColumnRenamed("_n", "_a"), Seq("_a"), "left_semi")
        .join(keep.withColumnRenamed("_n", "_b"), Seq("_b"), "left_semi"))
    }
    val chain = (1 to rounds).scanLeft(e0cp)((e, _) => peel(e))
    val last = chain.last
    val prev = chain(rounds - 1)
    def nodes(e: DataFrame) = e.select(col("_a").as("_n"))
      .unionAll(e.select(col("_b").as("_n"))).distinct()
      .agg(count(lit(1)).as("c"))
    val nLast = nodes(last).select(col("c").as("n_nodes"))
    val nPrev = nodes(prev).select(col("c").as("_np"))
    val eLast = last.agg(count(lit(1)).as("n_edges"))
    nLast.crossJoin(broadcast(nPrev)).crossJoin(broadcast(eLast))
      .select(lit(k.toLong).as("k"), lit(rounds.toLong).as("rounds"),
        col("n_nodes"), col("n_edges"),
        (col("n_nodes") === col("_np")).as("converged"))
  }
}
