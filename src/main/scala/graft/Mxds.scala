package graft

import org.apache.spark.sql.DataFrame
import graft.operators.JoinOps

/** Column-role bindings so operators are column-name-agnostic — the
  * reference's data_groups (cngi/conversion/convert_ms.py:180-184,
  * resolved by _check_sel_parms in every ngcasa op).
  */
final case class DataGroup(data: String = "data", uvw: String = "uvw",
                           flag: String = "flag", weight: String = "data_weight")

/** The mxds: a catalog of visibility partitions (xds0..xdsN) plus the
  * "global" subtables (ANTENNA, FIELD, SPECTRAL_WINDOW, ...), with
  * data-group metadata — the Spark form of the reference's
  * dataset-of-datasets (cngi/_utils/_io.py:37-64, SURVEY.md §7.0
  * design decision 2). Every operation is pure: a new Mxds is
  * returned, inputs never mutate (mxds_copier semantics, _io.py:28-31).
  *
  * @param subtableKeys for each subtable: (its key column, the fact
  *   columns referencing it) — drives split/join orchestration.
  */
final case class Mxds(partitions: Map[String, DataFrame],
                      subtables: Map[String, DataFrame] = Map.empty,
                      dataGroups: Map[Int, DataGroup] = Map(0 -> DataGroup()),
                      subtableKeys: Map[String, (String, Seq[String])] = Map.empty,
                      attrs: Map[String, String] = Map.empty) {

  def partition(name: String): DataFrame = partitions(name)

  /** split_dataset, mxds-wide (cngi/vis/split_dataset.py:23,81-154):
    * keep only the selected partitions and prune EVERY subtable to the
    * rows referenced by them — a left-semi join per (subtable,
    * referencing fact column), unioned over the kept partitions and
    * all key variants (ANTENNA1/ANTENNA2, FEED1/FEED2, ...).
    */
  def split(keep: Seq[String]): Mxds = {
    val kept = partitions.view.filterKeys(keep.contains).toMap
    val prunedSubs = subtables.map { case (name, dim) =>
      subtableKeys.get(name) match {
        case Some((dimKey, factCols)) if kept.nonEmpty =>
          val refs = kept.values.flatMap { fact =>
            factCols.filter(fact.columns.contains)
              .map(c => fact.select(fact(c).as(dimKey)))
          }.reduceOption(_ unionByName _)
          refs match {
            case Some(r) =>
              name -> dim.join(r.distinct(), Seq(dimKey), "left_semi")
            case None => name -> dim
          }
        case _ => name -> dim
      }
    }
    copy(partitions = kept, subtables = prunedSubs)
  }

  /** join_dataset, mxds-wide (cngi/vis/join_dataset.py:22-96 +
    * _join_split.py:268-531): union another store into this one. For
    * every keyed subtable, the incoming keys are renumbered past this
    * store's max and EVERY referencing fact column in the incoming
    * partitions is rewritten through the old->new map; incoming
    * partitions are renamed with the given suffix to avoid collision.
    */
  def joinDataset(other: Mxds, renameSuffix: String = "_b"): Mxds = {
    var otherParts = other.partitions
    val mergedSubs = subtables.map { case (name, dimA) =>
      (other.subtables.get(name), subtableKeys.get(name)) match {
        case (Some(dimB), Some((dimKey, factCols))) =>
          val (union, remap) = JoinOps.unionWithKeyRemap(dimA, dimB, dimKey)
          otherParts = otherParts.map { case (pName, fact) =>
            pName -> factCols.filter(fact.columns.contains)
              .foldLeft(fact)((f, c) => JoinOps.remapFactKey(f, c, remap))
          }
          name -> union
        case (Some(dimB), None) => name -> dimA.unionByName(dimB)
        case _ => name -> dimA
      }
    }
    val renamed = otherParts.map { case (n, df) =>
      (if (partitions.contains(n)) n + renameSuffix else n) -> df
    }
    copy(partitions = partitions ++ renamed,
      subtables = mergedSubs ++ (other.subtables -- subtables.keys),
      attrs = attrs ++ (other.attrs -- attrs.keys)) // first-wins attr merge
  }

  /** describe_vis over the whole mxds: one summary row per partition. */
  def describe(timeCol: String, baselineCol: String, chanCol: String,
               polCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    partitions.map { case (name, df) =>
      df.agg(count(lit(1)).as("rows"),
        countDistinct(col(timeCol)).as("times"),
        countDistinct(col(baselineCol)).as("baselines"),
        countDistinct(col(chanCol)).as("chans"),
        countDistinct(col(polCol)).as("pols"))
        .withColumn("xds", lit(name))
    }.reduce(_ unionByName _).orderBy("xds")
  }
}
