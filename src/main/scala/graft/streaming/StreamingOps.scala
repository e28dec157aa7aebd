package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming surface (SURVEY.md §2.10 — beyond-parity): the reference
  * is batch-only, but its `time_average` resample is exactly a
  * tumbling event-time window, so the same aggregation runs unchanged
  * under Structured Streaming with a watermark. These operators accept
  * BOTH batch and streaming DataFrames (`spark.read` / `readStream`).
  *
  * 100 TB/day story: event-time windows + watermark bound state; the
  * aggregation is the same partial+final hash agg as the batch path,
  * with state eviction at watermark expiry.
  */
object StreamingOps {

  /** Tumbling-window weighted average — streaming time_average
    * (cngi/vis/time_average.py:66 analog). Works on a streaming frame
    * after `.withWatermark(timeCol, delay)`.
    */
  def windowedAverage(df: DataFrame, timeCol: String, width: String,
                      keys: Seq[String], value: String, weight: String,
                      watermark: Option[String] = None): DataFrame = {
    val in = watermark.map(df.withWatermark(timeCol, _)).getOrElse(df)
    in.groupBy((window(col(timeCol), width).as("time_bin") +:
        keys.map(col)): _*)
      .agg((sum(col(value) * col(weight)) / sum(col(weight))).as(value),
        sum(col(weight)).as(weight),
        count(lit(1)).as("n_rows"))
  }

  /** Streaming flag-summary: running flagged/total counts per key
    * (ngcasa summary, incrementally maintained).
    */
  def runningFlagCounts(df: DataFrame, timeCol: String, width: String,
                        flag: Column, keys: Seq[String],
                        watermark: Option[String] = None): DataFrame = {
    val in = watermark.map(df.withWatermark(timeCol, _)).getOrElse(df)
    in.groupBy((window(col(timeCol), width).as("time_bin") +:
        keys.map(col)): _*)
      .agg(sum(when(flag, 1L).otherwise(0L)).as("flagged"),
        count(lit(1)).as("total"))
  }

  /** Incremental append analog of convert_ms(append=True)
    * (cngi/conversion/convert_ms.py:21,79): a streaming sink writing
    * partitioned parquet per micro-batch.
    */
  def appendToStore(df: DataFrame, path: String, checkpoint: String,
                    partitionBy: Seq[String]) =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy(partitionBy: _*)
      .outputMode("append")
}
