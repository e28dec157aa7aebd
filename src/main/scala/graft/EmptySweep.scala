package graft
import org.apache.spark.sql.SparkSession
object EmptySweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.001"
    // optional arg = rows kept per table (default 0 = the empty sweep;
    // 1 exercises the single-row edge: windows, interpolation, folds)
    val keep = args.headOption.map(_.toInt).getOrElse(0)
    val dst = s"/tmp/graft_sf_rows$keep"
    for (t <- Tables.all)
      Tables.load(spark, src, t).limit(keep)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    var ok = 0; var bad = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try { fn(spark, dst).queryExecution.toRdd.count(); ok += 1 }
      catch { case e: Throwable =>
        bad += 1
        val root = Option(e.getCause).getOrElse(e)
        println(s"[empty-fail] $name: ${e.getClass.getSimpleName}: " +
          s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(160)}")
      }
    }
    println(s"[empty-sweep] ok=$ok failed=$bad")
    spark.stop()
  }
}
