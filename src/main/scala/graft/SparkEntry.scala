package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real per-operator wiring lives in [[Queries]]; this object just
  * exposes it in the driver's shape.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's everyday chain (SURVEY.md §3.2): flag -> apply ->
    * weighted channel average.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val vis = Tables.lineitem(spark, dir)
      .withColumn("chan", (col("l_linenumber") - 1).cast("int"))
      .withColumn("flag", col("l_returnflag") === lit("R"))
    val flagged = operators.FlagOps.applyFlags(vis, col("flag"),
      Seq("l_extendedprice"))
    operators.AverageOps.chanAverage(flagged, "chan", width = 2,
      keys = Seq("l_returnflag"),
      weighted = Seq(operators.AverageOps.Weighted("l_extendedprice", "l_quantity")))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.all.collect { case (k, q) if q.sql.nonEmpty => k -> q.sql }
}
