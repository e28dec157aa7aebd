package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join / union / pruning operators (SURVEY.md §2.3, §2.7).
  */
object JoinOps {

  /** join_vis (cngi/vis/join_vis.py:22,135-149): merge two partitions on
    * their shared dimension keys. Non-overlapping cells concatenate;
    * overlapping cells coalesce (xarray `compat='no_conflicts'`).
    * = FULL OUTER JOIN on the keys + per-value COALESCE.
    *
    * Scale: an equi-join on the full dim key — Catalyst picks sort-merge
    * for two large fact tables; with both sides bucketed by the key it
    * is shuffle-free.
    */
  def joinVis(a: DataFrame, b: DataFrame, keys: Seq[String],
              values: Seq[String]): DataFrame = {
    // One explicit select: after a using-columns join both sides keep a
    // value column named v, so a withColumn(v, ...) would hit
    // AMBIGUOUS_REFERENCE. Qualified coalesce per value column instead.
    a.as("a").join(b.as("b"), keys, "full_outer")
      .select(keys.map(col) ++
        values.map(v => coalesce(col(s"a.$v"), col(s"b.$v")).as(v)): _*)
  }

  /** The `no_conflicts` assertion of join_vis (:145-149): count of cells
    * where both sides are non-null and disagree. Run it as a cheap
    * validation action when required.
    */
  def joinConflicts(a: DataFrame, b: DataFrame, keys: Seq[String],
                    values: Seq[String]): Long =
    joinConflictsDF(a, b, keys, values).head().getLong(0)

  /** joinConflicts as a 1-row DataFrame (`conflicts` BIGINT) — the lazy
    * form used by the driver contract and composable into plans.
    */
  def joinConflictsDF(a: DataFrame, b: DataFrame, keys: Seq[String],
                      values: Seq[String]): DataFrame = {
    val j = a.as("a").join(b.as("b"), keys, "inner")
    val anyConflict = values.map(v =>
      col(s"a.$v").isNotNull && col(s"b.$v").isNotNull &&
        col(s"a.$v") =!= col(s"b.$v")).reduce(_ || _)
    j.where(anyConflict).agg(count(lit(1)).as("conflicts"))
  }

  /** split_dataset subtable pruning (cngi/vis/split_dataset.py:23,
    * 108-154): keep only dimension rows referenced by the selected fact
    * partitions — a LEFT SEMI join of each dim table against the fact's
    * distinct keys. The fact side is reduced to distinct keys first
    * (map-side combine), so the shuffle carries keys, not rows.
    */
  def semiJoinPrune(dim: DataFrame, fact: DataFrame,
                    dimKey: String, factKey: String): DataFrame =
    dim.join(fact.select(col(factKey).as(dimKey)).distinct(),
      Seq(dimKey), "left_semi")

  /** join_dataset (cngi/vis/join_dataset.py:22,72-93 + cngi/_utils/
    * _join_split.py:268-343): union two stores whose surrogate keys
    * collide. Keys of the second store are renumbered after the first
    * store's max (dense_rank over the incoming keys), and every
    * referencing fact column is rewritten through the old→new map.
    *
    * The remap table is tiny (dimension cardinality), so the fact-side
    * rewrite is a broadcast join — no fact shuffle at any scale.
    *
    * @return (remapped dim union, old→new key map for store b)
    */
  def unionWithKeyRemap(dimA: DataFrame, dimB: DataFrame, key: String)
      : (DataFrame, DataFrame) = {
    val maxA = dimA.agg(max(col(key)).cast("long").as("max_a"))
    val w = Window.orderBy(col("old_key"))
    // dense_rank over b's distinct keys → collision-free new ids; the
    // window runs over dimension cardinality only (driver-scale data).
    val remap = dimB.select(col(key).cast("long").as("old_key")).distinct()
      .withColumn("rk", dense_rank().over(w))
      .crossJoin(broadcast(maxA))
      .select(col("old_key"), (col("max_a") + col("rk")).as("new_key"))
    val bRemapped = dimB
      .join(broadcast(remap), dimB(key).cast("long") === remap("old_key"))
      .drop(key).drop("old_key")
      .withColumnRenamed("new_key", key)
      .select(dimA.columns.map(col): _*)
    (dimA.unionByName(bRemapped), remap)
  }

  /** Rewrite a fact column through an old→new key map (the referencing-
    * column rewrite of _join_split.py:410-531) via broadcast join.
    */
  def remapFactKey(fact: DataFrame, keyCol: String, remap: DataFrame): DataFrame =
    fact.join(broadcast(remap), fact(keyCol).cast("long") === remap("old_key"), "left")
      .withColumn(keyCol,
        coalesce(col("new_key"), col(keyCol).cast("long")))
      .drop("old_key", "new_key")

  /** AS-OF join (backward, inclusive): attach to each left row the
    * single right row with the greatest `rightTime` <= the left row's
    * `leftTime`, per key — the time-series join Spark has no native
    * operator for.
    *
    * Spark-first formulation (composition, not a custom physical op):
    * tag and UNION the two sides, then one `last_value(_, ignoreNulls)`
    * window ordered by (time, side, tiebreak) delivers the most recent
    * right payload to every left row. ONE shuffle on the key, one sort
    * within partitions — the same cost shape as a co-partitioned merge
    * join; never a non-equi join (which would plan as a nested-loop).
    * At equal times the right row sorts FIRST (inclusive semantics);
    * among equal-time right rows the greatest `tieCol` wins —
    * deterministic for any input.
    *
    * 100 TB story: cost = shuffle(left+right) by key + in-partition
    * sort; state never exceeds a partition, no broadcast, no skew
    * beyond the heaviest key (salt-split a hot key upstream if needed).
    *
    * @param payload right-side columns to carry (renamed as given)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[(String, String)],
               tieCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    // common long-form: (keys, _t, _side, left payload..., right payload...)
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1)) // left sorts AFTER right at equal time
      .withColumn("_tie", lit(null).cast("long"))
    val r0 = right.select(
      (keys.map(col) :+ col(rightTime).as("_t") :+
        col(tieCol).cast("long").as("_tie")) ++
        payload.map { case (c, as) => col(c).as(s"_p_$as") }: _*)
      .withColumn("_side", lit(0))
    val lAll = leftCols.foldLeft(r0) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null)) }
    val rAll = payload.foldLeft(l) { case (d, (_, as)) =>
      d.withColumn(s"_p_$as", lit(null)) }
    val union = rAll.select((leftCols ++ Seq("_t", "_side", "_tie") ++
        payload.map(p => s"_p_${p._2}")).map(col): _*)
      .unionByName(lAll.select((leftCols ++ Seq("_t", "_side", "_tie") ++
        payload.map(p => s"_p_${p._2}")).map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(union) { case (d, (_, as)) =>
      d.withColumn(as, last(col(s"_p_$as"), ignoreNulls = true).over(w))
    }
    filled.where(col("_side") === 1)
      .select((leftCols ++ payload.map(_._2)).map(col): _*)
  }

  /** Salted equi-join for skewed keys: the fact side gets a salt in
    * [0, salts) from its per-partition row position (the salt VALUE
    * never affects the result, only which replica a row meets — so
    * even byte-identical duplicate rows of a hot key round-robin
    * across replicas, where a content hash would pin them to one),
    * the dimension side replicates once per salt, and the join key
    * becomes (keys, salt) — a hot key's rows now spread over `salts`
    * reducers instead of one straggler task. Output is row-identical
    * to the plain join (inner, dimension keys unique); cost trades
    * `salts`x dimension replication for even task sizes — the manual
    * form of AQE's skew-join split, usable when the skew is known up
    * front or AQE's thresholds don't trigger.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    require(salts > 0)
    val b = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val s = small.withColumn("_salt",
      explode(lit((0 until salts).toArray)))
    b.join(s, keys :+ "_salt").drop("_salt")
  }

  /** Range join via BINNING: join points to the intervals [lo, hi)
    * containing them without the nested-loop plan a raw non-equi join
    * produces. Intervals explode to every bin of width `binWidth` they
    * overlap; each point lives in exactly ONE bin, so the equi-join on
    * the bin meets every true (point, interval) pair exactly once —
    * no post-join dedup — and the residual [lo, hi) filter runs only
    * on bin-colliding pairs.
    *
    * 100 TB story: cost = |points| + sum(interval width / binWidth)
    * exploded rows + the true-match count, all hash-partitioned by
    * bin — never |points| x |intervals|. Size binWidth ~ the typical
    * interval width so each interval hits O(1) bins.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, loCol: String, hiCol: String,
                binWidth: Double): DataFrame = {
    val pBin = floor(col(pointCol) / binWidth).cast("long")
    val p = points.withColumn("_bin", pBin)
    val i = intervals
      .withColumn("_bin_lo", floor(col(loCol) / binWidth).cast("long"))
      .withColumn("_bin_hi", floor(col(hiCol) / binWidth).cast("long"))
      .withColumn("_bin",
        explode(sequence(col("_bin_lo"), col("_bin_hi"))))
      .drop("_bin_lo", "_bin_hi")
    p.join(i, Seq("_bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bin")
  }

  /** Snapshot reconciliation: diff two versions of a keyed table into
    * added / removed / changed rows — the audit readout behind every
    * lakehouse MERGE (this is [[graft.sources.IoOps.mergeUpsert]]'s
    * inverse: apply the emitted rows as a change set and the base
    * becomes the revision). Row equality is null-safe per non-key
    * column, so a column going null counts as a change.
    *
    * Scale shape: ONE full outer join hash-partitioned on the key —
    * both sides shuffle once, output is the diff only (unchanged rows
    * are filtered before leaving the join stage). No row hashing
    * trickery: the <=> conjunction is codegen'd column compares.
    */
  def tableDiff(base: DataFrame, revised: DataFrame,
                keys: Seq[String]): DataFrame = {
    val nonKeys = base.columns.filterNot(keys.contains).toSeq
    require(nonKeys.nonEmpty, "tableDiff needs at least one value column")
    val b = base.select(keys.map(col) ++
      Seq(lit(true).as("_in_b")) ++
      nonKeys.map(c => col(c).as(s"_b_$c")): _*)
    val r = revised.select(keys.map(col) ++
      Seq(lit(true).as("_in_r")) ++
      nonKeys.map(c => col(c).as(s"_r_$c")): _*)
    val same = nonKeys.map(c => col(s"_b_$c") <=> col(s"_r_$c"))
      .reduce(_ && _)
    b.join(r, keys, "full_outer")
      .withColumn("status",
        when(col("_in_b").isNull, "added")
          .when(col("_in_r").isNull, "removed")
          .when(!same, "changed"))
      .where(col("status").isNotNull)
      .select(keys.map(col) :+ col("status"): _*)
  }
}
