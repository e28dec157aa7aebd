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
}
