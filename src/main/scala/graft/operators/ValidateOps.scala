package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the dbt-test /
  * Great-Expectations-style contract check every ingest of a 100 TB
  * pipeline runs before promoting a batch: N row-level rules evaluated
  * in ONE fact pass (a single hash aggregate carrying one long per
  * rule), melted to a (rule, n_rows, violations, pass) report.
  *
  * Reference scope note: the reference has no validation surface; this
  * is part of the beyond-parity curation layer (builder brief), built
  * on the same one-scan discipline as
  * [[graft.operators.StatsOps.profileTable]].
  */
object ValidateOps {

  /** Evaluate row-level rules in one pass. Each rule is
    * (name, predicate); a row VIOLATES the rule when the predicate is
    * false OR null (SQL three-valued logic would otherwise let nulls
    * slip through every check — the classic silent-contract failure).
    * Rule names must be identifier-like (embedded in a stack expr).
    *
    * Plan shape: one conditional-sum hash aggregate over the fact
    * (state = rules.size + 1 longs), then a rules.size-row stack —
    * nothing fact-sized downstream, no second scan per rule.
    */
  def expectations(df: DataFrame,
                   rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expectations needs at least one rule")
    require(rules.forall(_._1.matches("[A-Za-z0-9_]+")),
      "rule names must be identifier-like")
    val aggs = count(lit(1)).as("_n") +:
      rules.zipWithIndex.map { case ((_, p), i) =>
        sum(when(p, 0L).otherwise(1L)).as(s"_v$i")
      }
    val g = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex
      .map { case ((name, _), i) => s"'$name', _v$i" }.mkString(", ")
    g.select(col("_n").as("n_rows"),
        expr(s"stack(${rules.size}, $stackArgs) as (rule, violations)"))
      .select(col("rule"), col("n_rows"), col("violations"),
        (col("violations") === 0L).as("pass"))
  }

  /** The operational half of [[expectations]]: tag every row with the
    * comma-joined names of the rules it violates (empty string =
    * clean), so the caller can route `violated != ''` to a quarantine
    * sink instead of failing the batch. Pure projection riding the
    * scan — no shuffle, no second pass; `concat_ws` skips the nulls
    * the passing rules leave, and rule order fixes the tag format.
    */
  def quarantine(df: DataFrame,
                 rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "quarantine needs at least one rule")
    require(rules.forall(_._1.matches("[A-Za-z0-9_]+")),
      "rule names must be identifier-like")
    df.withColumn("violated", concat_ws(",",
      rules.map { case (name, p) =>
        when(p, lit(null)).otherwise(lit(name))
      }: _*))
  }

  /** k-anonymity audit — the re-identification-risk readout of the
    * governance family: group the table by its quasi-identifier
    * columns and report how exposed the smallest cohorts are. A row
    * whose QI combination is shared by fewer than k rows is
    * re-identifiable by anyone who knows those attributes; the
    * summary says whether the table may leave the trust boundary
    * as-is or needs suppression/generalization first.
    *
    * Plan shape: ONE hash aggregate over the fact to per-QI-group
    * counts (map-side combined), then a 1-row reduce of that bounded
    * groups table — nothing fact-sized downstream. All counts exact
    * BIGINTs; risk_share is the single final division (null on an
    * empty table via try_divide).
    */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String],
                 k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "kAnonymity needs at least one column")
    require(k >= 2, s"k-anonymity below 2 is vacuous, got $k")
    df.groupBy(quasiIds.map(col): _*).agg(count(lit(1)).as("_c"))
      .agg(count(lit(1)).as("n_groups"), sum(col("_c")).as("n_rows"),
        min(col("_c")).as("min_k"),
        sum(when(col("_c") < k, 1L).otherwise(0L)).as("groups_at_risk"),
        sum(when(col("_c") < k, col("_c")).otherwise(0L)).as("rows_at_risk"))
      .select(lit(k).as("k"), col("n_groups"), col("n_rows"), col("min_k"),
        col("groups_at_risk"), col("rows_at_risk"),
        try_divide(col("rows_at_risk").cast("double"),
          col("n_rows").cast("double")).as("risk_share"))
  }

  /** l-diversity audit — k-anonymity's companion release gate: a
    * quasi-identifier group can be large (k-anonymous) yet still leak
    * if every member shares the same SENSITIVE value (the homogeneity
    * attack k-anonymity misses). Per quasi-id group the metric is the
    * number of DISTINCT sensitive values; the report is the same
    * 1-row summary shape as [[kAnonymity]] so the two gates compose.
    *
    * Scale shape: one hash aggregate to the quasi-id domain with a
    * per-group exact countDistinct (group-bounded — the sensitive
    * domain per group is what's being measured, and a group with
    * data-scale distinct sensitive values is maximally private
    * anyway), then a 1-row fold. Exact integers throughout.
    */
  def lDiversity(df: DataFrame, quasiIds: Seq[String],
                 sensitiveCol: String, l: Long): DataFrame = {
    require(quasiIds.nonEmpty, "lDiversity needs at least one column")
    require(l >= 2, s"l-diversity below 2 is vacuous, got $l")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("_c"),
        countDistinct(col(sensitiveCol)).as("_div"))
      .agg(count(lit(1)).as("n_groups"), sum(col("_c")).as("n_rows"),
        min(col("_div")).as("min_l"),
        sum(when(col("_div") < l, 1L).otherwise(0L)).as("groups_at_risk"),
        sum(when(col("_div") < l, col("_c")).otherwise(0L))
          .as("rows_at_risk"))
      .select(lit(l).as("l"), col("n_groups"), col("n_rows"),
        col("min_l"), col("groups_at_risk"), col("rows_at_risk"),
        try_divide(col("rows_at_risk").cast("double"),
          col("n_rows").cast("double")).as("risk_share"))
  }

  /** Uniqueness expectation — not expressible as a row predicate, so
    * it is its own (exact) distinct aggregate: violations = n_rows −
    * distinct key combinations. Null key fields count as values (the
    * struct wrap), so duplicate null keys ARE flagged. Output schema
    * matches [[expectations]] for unionByName composition.
    */
  def expectUnique(df: DataFrame, cols: Seq[String],
                   name: String): DataFrame = {
    require(cols.nonEmpty, "expectUnique needs at least one column")
    df.agg(count(lit(1)).as("n_rows"),
        count_distinct(struct(cols.map(col): _*)).as("_d"))
      .select(lit(name).as("rule"), col("n_rows"),
        (col("n_rows") - col("_d")).as("violations"),
        (col("n_rows") === col("_d")).as("pass"))
  }

  /** Laplace-NOISED histogram release — the noisy-counts shape of
    * Dwork et al.'s Laplace mechanism (sensitivity 1 for a
    * disjoint-group count) that completes the privacy trio's release
    * side: k-anonymity/l-diversity/t-closeness AUDIT a release, this
    * PRODUCES one.
    *
    * **NOT differential privacy by default.** With the default
    * `secretSalt = 0` the Laplace draw is DETERMINISTIC and derived
    * from the PUBLIC group key (the library's multiplicative hash —
    * never `rand()`, per the engine-wide reproducibility rule), so
    * anyone can recompute and subtract the noise: this form is the
    * oracle-testable AUDIT VIEW of the mechanism, nothing more. A
    * production ε-DP release MUST pass a `secretSalt` drawn once
    * from a CSPRNG and kept secret (and should drop the raw `n`
    * column); only then does the draw become unpredictable to the
    * adversary and the ε accounting meaningful.
    *
    * Mechanics: u = (hash(key + salt) + ½)/M − 0.5 is a fixed uniform
    * in (−0.5, 0.5), and noise = −(1/ε)·sign(u)·ln(1 − 2|u|) is the
    * Laplace inverse CDF. Every step is one IEEE expression an oracle
    * replays exactly (for the salt it knows).
    *
    * Scale: one hash aggregate to the group domain; noise is
    * per-group post-work. Output: group key, n, noise, noised_n.
    */
  def laplaceNoisedCount(df: DataFrame, keyCol: String, epsilon: Double,
                         secretSalt: Long = 0L): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val m = graft.operators.TextOps.HashMod
    val h = pmod(col(keyCol).cast("long") + lit(secretSalt), lit(m)) *
      graft.operators.SketchOps.KmvMult % lit(m)
    // half-step shift keeps u strictly inside (-0.5, 0.5): h = 0 would
    // otherwise put ln(1 - 2|u|) at ln(0) = -inf
    val u = (h.cast("double") + lit(0.5)) / lit(m.toDouble) - lit(0.5)
    val noise = lit(-1.0 / epsilon) * signum(u) *
      log(lit(1.0) - lit(2.0) * abs(u))
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol), col("n"), noise.as("noise"),
        (col("n").cast("double") + noise).as("noised_n"))
  }

  /** t-closeness audit — the distribution-shape member of the release
    * trio ([[kAnonymity]] guards group SIZE, [[lDiversity]] guards
    * sensitive-value VARIETY; this guards sensitive-value
    * DISTRIBUTION: a group whose salary mix is "diverse" but heavily
    * skewed vs the table still leaks). Per quasi-identifier group the
    * metric is the Earth Mover's Distance between the group's and the
    * whole table's distribution over an ORDERED sensitive attribute:
    *   EMD_g = Σ_i |CumP_g(v_i) − CumQ(v_i)| / (m − 1)
    * over the m-value sensitive domain — the ordered-attribute EMD of
    * the original t-closeness paper (unit-spaced ground distance).
    *
    * Exactness: cumulative counts are exact BIGINTs; the absolute
    * difference clears denominators — |cum_g·N − cum_all·n_g| is an
    * exact BIGINT (in-range while N·n_g < 9·10¹⁸; carry the term in
    * double past ~3B rows) — so EMD_g is ONE division of an exact
    * integer sum by n_g·N·(m−1), and the at-risk comparison
    * (emd > t) branches on a double both engines derive identically.
    * A 1-value domain (m = 1) makes every group distribution equal to
    * the global: EMD defines to 0.
    *
    * Plan shape: one fact-sized hash aggregate to (quasi-ids ×
    * sensitive) counts; the sensitive domain and its global
    * cumulative window are m-bounded (whitelisted on that argument);
    * the groups×domain grid is |groups|·m-bounded with the per-group
    * cumulative window PARTITIONED by group; summary is the same
    * 1-row shape as the other two audits.
    */
  def tCloseness(df: DataFrame, quasiIds: Seq[String],
                 sensitiveCol: String, t: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quasiIds.nonEmpty, "tCloseness needs at least one column")
    require(t > 0 && t < 1, s"t must be in (0,1), got $t")
    val joint = df.where(col(sensitiveCol).isNotNull)
      .groupBy((quasiIds :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("_c"))
    val domain = joint.groupBy(col(sensitiveCol))
      .agg(sum(col("_c")).as("_tv"))
    val wAll = Window.orderBy(col(sensitiveCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val domainC = domain
      .withColumn("_cumall", sum(col("_tv")).over(wAll))
      .select(col(sensitiveCol), col("_cumall"))
    val groups = joint.groupBy(quasiIds.map(col): _*)
      .agg(sum(col("_c")).as("_ng"))
    val tot = domain.agg(sum(col("_tv")).as("_nn"),
      count(lit(1)).as("_m"))
    val wG = Window.partitionBy(quasiIds.map(col): _*)
      .orderBy(col(sensitiveCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grid = groups.crossJoin(broadcast(domainC))
      .join(joint, quasiIds :+ sensitiveCol, "left")
      .withColumn("_c0", coalesce(col("_c"), lit(0L)))
      .withColumn("_cumg", sum(col("_c0")).over(wG))
      .crossJoin(broadcast(tot))
    val perG = grid
      .groupBy((quasiIds.map(col) :+ col("_ng")): _*)
      .agg(max(col("_nn")).as("_nn"), max(col("_m")).as("_m"),
        sum(abs(col("_cumg") * col("_nn") - col("_cumall") * col("_ng")))
          .as("_sd"))
      .select(col("_ng"), col("_nn"), col("_m"),
        when(col("_m") > 1,
          col("_sd").cast("double") /
            (col("_ng").cast("double") * col("_nn").cast("double") *
              (col("_m") - 1).cast("double")))
          .otherwise(lit(0.0)).as("emd"))
    perG.agg(count(lit(1)).as("n_groups"), sum(col("_ng")).as("n_rows"),
        max(col("_m")).as("m"), max(col("emd")).as("max_emd"),
        sum(when(col("emd") > t, 1L).otherwise(0L)).as("groups_at_risk"),
        sum(when(col("emd") > t, col("_ng")).otherwise(0L))
          .as("rows_at_risk"))
      .select(lit(t).as("t"), col("n_groups"), col("n_rows"), col("m"),
        col("max_emd"), col("groups_at_risk"), col("rows_at_risk"),
        try_divide(col("rows_at_risk").cast("double"),
          col("n_rows").cast("double")).as("risk_share"))
  }

  /** Referential-integrity audit over declared FK relations — the
    * join-hygiene report a lakehouse runs before trusting a snapshot:
    * for each (relation, child, childKey, parent, parentKey), count
    * child rows, NULL keys, orphan rows (non-null key with no parent),
    * and DISTINCT orphan keys.
    *
    * Plan shape per relation: one anti join child→parent (callers
    * wrap dimension parents in broadcast() — a broadcast anti join
    * never shuffles the child; fact-sized parents like orders take
    * the shuffle anti-join, the correct plan at scale), then a single
    * hash aggregate for the row/distinct-key census. Nothing
    * fact-sized ever reaches the driver.
    */
  def fkOrphans(relations: Seq[(String, DataFrame, String, DataFrame,
                                String)]): DataFrame = {
    relations.map { case (name, child, ck, parent, pk) =>
      val base = child.select(col(ck).as("_k"))
      val counts = base.agg(count(lit(1)).as("child_rows"),
        sum(when(col("_k").isNull, 1L).otherwise(0L)).as("null_keys"))
      val orphanAgg = base.where(col("_k").isNotNull)
        .join(parent.select(col(pk).as("_k")), Seq("_k"), "left_anti")
        .agg(count(lit(1)).as("orphan_rows"),
          count_distinct(col("_k")).as("orphan_keys"))
      counts.crossJoin(orphanAgg)
        .select(lit(name).as("relation"), col("child_rows"),
          col("null_keys"), col("orphan_rows"), col("orphan_keys"))
    }.reduce(_ unionByName _)
  }
}
