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
  /** True iff the parquet footer declares `ts` as TIMESTAMP(NANOS) —
    * the one physical flavor Spark can only read through the legacy
    * long mapping (SPARK-40819). Reads the footer of the first data
    * file directly (parquet-hadoop) instead of sniffing Spark's
    * exception text, which is brittle across versions/locales.
    */
  private[graft] def tsIsParquetNanos(s: SparkSession, path: String): Boolean = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation.{TimeUnit, TimestampLogicalTypeAnnotation}
    try {
      val conf = s.sessionState.newHadoopConf()
      val root = new Path(path)
      val fs = root.getFileSystem(conf)
      // recursive: a hive-partitioned layout keeps its part files in
      // key= subdirectories, so a top-level-only listing would miss
      // them and silently skip the NANOS branch
      def firstParquet(p: Path, depth: Int): Option[Path] = {
        if (depth > 8) return None
        val entries = fs.listStatus(p).sortBy(_.getPath.getName)
        entries.collectFirst {
          case e if e.isFile && e.getPath.getName.endsWith(".parquet") =>
            e.getPath
        }.orElse(entries.filter(_.isDirectory).iterator
          .flatMap(e => firstParquet(e.getPath, depth + 1))
          .find(_ => true))
      }
      val st = fs.getFileStatus(root)
      val dataFile =
        if (st.isDirectory) firstParquet(root, 0).getOrElse(return false)
        else root
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(dataFile, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        if (!schema.containsField("ts")) return false
        schema.getFields.get(schema.getFieldIndex("ts")).getLogicalTypeAnnotation match {
          case t: TimestampLogicalTypeAnnotation => t.getUnit == TimeUnit.NANOS
          case _ => false
        }
      } finally reader.close()
    } catch { case _: Exception => false } // unreadable footer → let the normal load surface it
  }

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
    * NO session conf is ever mutated on the caller's session: the
    * TIMESTAMP(NANOS) flavor (footer-probed above) is read through a
    * cloned `newSession()` — same SparkContext, catalog and cache,
    * isolated runtime conf — so the `nanosAsLong` escape hatch lives
    * and dies with a session nothing else ever sees. The returned
    * DataFrame stays valid under the caller's session because the
    * parquet relation captures its own session at read time.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw =
      if (tsIsParquetNanos(s, s"$d/events.parquet")) {
        val iso = s.newSession()
        iso.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        // newSession inherits builder-time confs but not runtime ones;
        // timestamp semantics must match the caller's session.
        iso.conf.set("spark.sql.session.timeZone",
          s.conf.get("spark.sql.session.timeZone", "UTC"))
        load(iso, d, "events")
      } else load(s, d, "events")
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
