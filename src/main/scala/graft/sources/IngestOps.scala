package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ingest-side derivations — the Spark re-expression of convert_ms /
  * convert_expanded_table / convert_simple_table
  * (cngi/conversion/convert_ms.py:21-246,
  * cngi/_utils/_table_conversion.py:208-341). The heavy lifting of the
  * reference's conversion (row->cube pivot with NaN padding) vanishes
  * in the long form (SURVEY.md §1.2); what remains are the derived
  * keys and columns below + a partitioned write (IoOps.writeVis).
  */
object IngestOps {

  /** Baseline-id assignment (convert_expanded_table,
    * _table_conversion.py:254-257: np.unique(pairs, return_inverse)):
    * dense_rank over the DISTINCT (antenna1, antenna2) pairs,
    * broadcast-joined back to the facts — the window runs over
    * dimension-scale data only, never over fact rows.
    */
  def assignBaselineIds(df: DataFrame, ant1: String, ant2: String,
                        out: String = "baseline"): DataFrame = {
    val pairs = df.select(col(ant1), col(ant2)).distinct()
      .withColumn(out,
        (dense_rank().over(Window.orderBy(col(ant1), col(ant2))) - 1).cast("int"))
    df.join(broadcast(pairs), Seq(ant1, ant2))
  }

  /** MSv3 weight derivation (convert_ms.py:156-174):
    * DATA_WEIGHT = 1 / SIGMA^2 (null where sigma is 0/null).
    */
  def deriveDataWeight(df: DataFrame, sigma: String,
                       out: String = "data_weight"): DataFrame =
    df.withColumn(out,
      when(col(sigma).isNotNull && col(sigma) =!= 0.0,
        lit(1.0) / (col(sigma) * col(sigma))))

  /** Synthetic row-id key for keyed subtables (convert_simple_table,
    * _table_conversion.py:184-191). Deterministic: ranks over the
    * given ordering columns (dimension-scale input).
    */
  def addRowId(df: DataFrame, orderBy: Seq[String],
               out: String = "row_id"): DataFrame =
    df.withColumn(out,
      (row_number().over(Window.orderBy(orderBy.map(col): _*)) - 1).cast("long"))

  /** Auto/cross-correlation split (convert_ms.py:101-112): the two
    * partitions the reference materializes per DDI. The reference's
    * predicate is FEED-aware (convert_ms.py:105-106): a row is an
    * autocorrelation only when BOTH the antennas and the feeds match
    * (`ANTENNA1 == ANTENNA2 && FEED1 == FEED2`); a same-antenna
    * cross-feed row belongs to the cross partition. Pass the feed
    * columns when the table has them; without feeds the split
    * degenerates to the antenna-only predicate.
    */
  def splitAutoCross(df: DataFrame, ant1: String, ant2: String,
                     feed1: Option[String] = None,
                     feed2: Option[String] = None)
      : (DataFrame, DataFrame) = {
    val sameFeed = (feed1, feed2) match {
      case (Some(f1), Some(f2)) => col(f1) === col(f2)
      case _                    => lit(true)
    }
    val auto = col(ant1) === col(ant2) && sameFeed
    (df.where(auto), df.where(!auto))
  }
}
