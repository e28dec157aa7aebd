package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real per-operator wiring lives in [[Queries]]; this object just
  * exposes it in the driver's shape.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's reason-to-exist pipeline (SURVEY.md §3.3):
    * imaging weights -> uv-grid -> FFT -> normalized dirty image.
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val p = operators.GridOps.GridParams((32, 32), (0.002, 0.002),
      imageSize = Some((16, 16)))
    val vis = Tables.lineitem(spark, dir).select(
      lit(0).as("img_chan"), lit(0).as("pol"),
      (col("l_extendedprice") % 60.0 - 30.0).as("u"),
      ((col("l_quantity") * 3.0 + col("l_linenumber")) % 60.0 - 30.0).as("v"),
      col("l_tax").as("re"), col("l_discount").as("im"),
      (col("l_discount") + 0.5).as("weight"), lit(1.5e9).as("freq"))
    val weighted = operators.GridOps
      .makeImagingWeight(vis, p, "briggs", robust = 0.5)
      .withColumn("weight", col("imaging_weight"))
      .select("img_chan", "pol", "u", "v", "re", "im", "weight", "freq")
    operators.GridOps.makeImage(spark, weighted, p)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.all.collect { case (k, q) if q.sql.nonEmpty => k -> q.sql }
}
