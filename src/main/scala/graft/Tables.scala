package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * These play the role of the reference's zarr partitions + subtables
  * (`cngi/dio/read_vis.py:21`): `lineitem`/`orders` stand in for the
  * visibility fact tables, the small tables (`region`, `nation`,
  * `supplier`, ...) for the mxds "global" subtables, `events` for the
  * streaming surface, and `documents`/`embeddings` for the
  * training-data-pipeline operators.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  /** Schema-adaptive events loader — the analog of the reference's
    * dtype tolerance at open time (`cngi/dio/read_vis.py:39-41`): the
    * driver has shipped `ts` as int64 nanoseconds, parquet
    * TIMESTAMP(NANOS), and timestamp[us] across regenerations, so the
    * raw column type is probed ONCE here and every downstream query
    * sees one canonical contract:
    *
    *   - `ts`    TimestampType (µs precision, UTC wall clock — every
    *             entrypoint pins spark.sql.session.timeZone=UTC, so
    *             the NTZ→LTZ cast is an identity on the epoch value)
    *   - `ts_ns` LongType epoch nanoseconds (µs-aligned when the file
    *             only carries µs)
    *
    * No session conf is mutated on the normal paths; only the
    * TIMESTAMP(NANOS) flavor has no non-legacy read path in Spark, so
    * that branch alone flips the documented escape hatch.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw =
      try load(s, d, "events")
      catch {
        case e: Exception if String.valueOf(e.getMessage).contains("NANOS") =>
          // parquet TIMESTAMP(NANOS): Spark's only read path is the
          // legacy long mapping (SPARK-40819); restoring the conf
          // before execution would break the deferred scan, so it
          // stays set for this flavor only.
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          load(s, d, "events")
      }
    raw.schema("ts").dataType match {
      case LongType => // raw int64 epoch-nanos (incl. legacy NANOS mapping)
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case TimestampType | TimestampNTZType => // timestamp[us] flavors
        val t = col("ts").cast(TimestampType)
        raw.withColumn("ts", t)
          .withColumn("ts_ns", unix_micros(t) * lit(1000L))
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported type $other — expected int64 nanos or timestamp")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
