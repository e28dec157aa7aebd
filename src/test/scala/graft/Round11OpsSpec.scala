package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextOps, ValidateOps}

/** Round-11 additions: within-doc repetition diagnostics, CCNet
  * quality buckets, l-diversity, T5 span corruption.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionScore: duplicate lines and duplicate n-gram char mass") {
    val docs = Seq(
      (1L, "x\nx\ny"), // 3 lines, 'x' repeated
      (2L, "a b c d e a b c d e"), // the 5-gram "a b c d e" twice
      (3L, "unique words only here")) // nothing repeated
      .toDF("doc_id", "text")
    val out = TextOps.repetitionScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val (n1, dlf1, dlcf1, g51, _) = out(1L)
    assert(n1 === 3L && dlf1 === 2.0 / 3 && dlcf1 === 2.0 / 3)
    assert(g51 === 0.0, "single multiline token has no 5-grams")
    val (_, dlf2, _, g52, g102) = out(2L)
    assert(dlf2 === 0.0, "one line, not duplicated")
    // coverage: the duplicated 5-gram covers all 10 word positions
    // (1 char each) over the 19-char text
    assert(g52 === 10.0 / 19)
    assert(g102 === 0.0, "the single 10-gram occurs once")
    assert(out(3L)._4 === 0.0 && out(3L)._2 === 0.0)
  }

  test("ccnetBuckets: exact integer mass tertiles, tied groups stay whole") {
    val scored = (1 to 6).map(i => ("en", i.toDouble, i.toLong)) ++
      Seq(("fr", 1.0, 10L), ("fr", 1.0, 11L), ("fr", 1.0, 12L),
        ("fr", 2.0, 13L), ("fr", 2.0, 14L), ("fr", 2.0, 15L))
    val df = scored.toDF("lang", "score", "doc_id")
    val out = TextOps.ccnetBuckets(df, "lang", "score")
      .collect().map(r => r.getLong(2) -> r.getString(3)).toMap
    // en: 6 distinct scores -> clean thirds
    assert(out(1L) === "tail" && out(2L) === "tail")
    assert(out(3L) === "middle" && out(4L) === "middle")
    assert(out(5L) === "head" && out(6L) === "head")
    // fr: two half-mass tied groups — neither fits a third, both middle
    (10L to 15L).foreach(id => assert(out(id) === "middle", s"fr $id"))
  }

  test("lDiversity flags homogeneous groups k-anonymity would pass") {
    // group g1: 4 rows, all the same sensitive value (k-anonymous at
    // k=4, yet l-diversity 1); g2: 3 rows, 3 distinct values
    val df = Seq(("g1", "s"), ("g1", "s"), ("g1", "s"), ("g1", "s"),
      ("g2", "a"), ("g2", "b"), ("g2", "c")).toDF("q", "sens")
    val r = ValidateOps.lDiversity(df, Seq("q"), "sens", l = 2L)
      .collect().head
    assert(r.getAs[Long]("n_groups") === 2L)
    assert(r.getAs[Long]("min_l") === 1L)
    assert(r.getAs[Long]("groups_at_risk") === 1L)
    assert(r.getAs[Long]("rows_at_risk") === 4L)
  }

  test("contaminationRate: dedupes across train docs, zero for clean docs") {
    val docs = Seq(
      (1L, "train", "alpha beta gamma delta"),
      (2L, "train", "alpha beta gamma epsilon"), // shares a shingle with 1
      (10L, "test", "alpha beta gamma zeta"), // 1st shingle in train (twice)
      (11L, "test", "nothing shared here at all"))
      .toDF("doc_id", "split", "text")
    val out = graft.operators.DedupOps
      .contaminationRate(docs, "doc_id", "text", "split", "train", "test")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 10: shingles {alpha beta gamma, beta gamma zeta} -> first is
    // in train (in BOTH train docs — counted once), second is not
    assert(out(10L) === ((2L, 1L, 0.5)))
    val (n11, c11, r11) = out(11L)
    assert(c11 === 0L && r11 === 0.0, "clean doc scores zero")
    assert(n11 === 3L)
  }

  test("fairnessReport: exact per-group rates, null rates excluded from gaps") {
    // g1: 2 pos (1 caught), 2 neg (1 flagged) -> sel 1/2, tpr 1/2,
    // fpr 1/2; g2: all positive (fpr undefined), all selected
    val df = Seq(
      ("g1", 1, 1), ("g1", 1, 0), ("g1", 0, 1), ("g1", 0, 0),
      ("g2", 1, 1), ("g2", 1, 1)).toDF("g", "label", "pred")
    val out = graft.operators.ClassifierOps
      .fairnessReport(df, "g", "label", "pred")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g1").getAs[Double]("sel_rate") === 0.5)
    assert(out("g1").getAs[Double]("tpr") === 0.5)
    assert(out("g1").getAs[Double]("fpr") === 0.5)
    assert(out("g2").getAs[Double]("sel_rate") === 1.0)
    assert(out("g2").getAs[Double]("tpr") === 1.0)
    assert(out("g2").isNullAt(out("g2").fieldIndex("fpr")),
      "no negatives -> fpr undefined")
    // gaps: sel 1.0-0.5, tpr 1.0-0.5; fpr gap over the ONE defined
    // value = 0 (null excluded, not treated as 0)
    assert(out("g1").getAs[Double]("sel_rate_gap") === 0.5)
    assert(out("g1").getAs[Double]("tpr_gap") === 0.5)
    assert(out("g1").getAs[Double]("fpr_gap") === 0.0)
  }

  test("aucByGroup: perfect ranking 1.0, tied ranking 0.5, gap exact") {
    val df = Seq(
      ("a", 1, 0.9), ("a", 1, 0.8), ("a", 0, 0.1), // perfectly separated
      ("b", 1, 0.5), ("b", 0, 0.5)) // fully tied
      .toDF("g", "label", "score")
    val out = graft.operators.ClassifierOps
      .aucByGroup(df, "g", "label", "score")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("auc"), r.getAs[Double]("auc_gap")))).toMap
    assert(out("a") === ((1.0, 0.5)))
    assert(out("b") === ((0.5, 0.5)))
  }

  test("spanCorruption: de-corruption reconstructs the original, partition-invariant") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(40).select("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextOps.spanCorruption(df, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4), r.getString(5)))).toMap
    val out = run(docs)
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet === texts.keySet)
    var sawSpan = false
    for ((id, (nWords, nMasked, nSpans, input, target)) <- out) {
      val orig = texts(id)
      assert(nWords === orig.split(" ", -1).length.toLong, s"doc $id")
      assert(nMasked >= nSpans, s"doc $id")
      if (nSpans > 0) sawSpan = true
      // de-corrupt: substitute each sentinel in the input with its
      // span words from the target
      val sent = "<extra_id_(\\d+)>".r
      val spans: Map[Long, String] = if (target.isEmpty) Map.empty else {
        val parts = sent.findAllMatchIn(target).toSeq
        parts.zipWithIndex.map { case (m, i) =>
          val until =
            if (i + 1 < parts.length) parts(i + 1).start - 1
            else target.length
          m.group(1).toLong ->
            target.substring(m.end, until).stripPrefix(" ")
        }.toMap
      }
      val rebuilt = sent.replaceAllIn(input, m =>
        java.util.regex.Matcher.quoteReplacement(spans(m.group(1).toLong)))
      assert(rebuilt === orig, s"doc $id fails de-corruption")
    }
    assert(sawSpan, "fixture produced no spans — gate rate broken?")
    // deterministic under repartitioning
    val out7 = run(docs.repartition(7))
    assert(out7 === out)
  }
}
