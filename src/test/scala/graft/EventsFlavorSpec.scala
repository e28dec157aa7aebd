package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Tables.events must normalize every `ts` physical flavor the
  * generator has ever shipped to the same canonical (ts, ts_ns)
  * contract. The three committed fixtures under
  * src/test/resources/events_flavors encode the SAME 20 logical
  * instants as parquet timestamp[us], parquet TIMESTAMP(NANOS), and
  * raw int64 epoch-nanos — so all three reads must produce identical
  * rows. This is the branch coverage SchemaContractSpec can't give
  * (the live test data only ever has one flavor at a time).
  */
class EventsFlavorSpec extends SparkSpec {

  private val root = getClass.getResource("/events_flavors").getPath

  private def canonical(flavor: String): Seq[(Long, Long)] =
    Tables.events(spark, s"$root/$flavor")
      .selectExpr("event_id", "ts_ns").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  test("all three ts flavors normalize to identical canonical rows") {
    val us = canonical("us")
    val lg = canonical("long")
    val ns = canonical("ns")
    assert(us.nonEmpty && us.length == 20)
    assert(lg === us, "int64-nanos flavor diverged from timestamp[us]")
    assert(ns === us, "TIMESTAMP(NANOS) flavor diverged from timestamp[us]")
    for (flavor <- Seq("us", "ns", "long")) {
      val sch = Tables.events(spark, s"$root/$flavor").schema
      assert(sch("ts").dataType == TimestampType, s"$flavor ts type")
      assert(sch("ts_ns").dataType == LongType, s"$flavor ts_ns type")
    }
  }

  test("NANOS flavor never mutates the caller's session conf") {
    // The legacy nanosAsLong escape hatch must live only inside the
    // cloned session Tables.events reads through — a leak here would
    // silently retype every later NANOS parquet read in the same JVM.
    // getOption yields the registered default ("false") when unset, so
    // the leak check is value-based: it must not become "true".
    val before = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    assert(!before.contains("true"),
      "precondition: shared test session already carries the legacy flag")
    val rows = canonical("ns")
    assert(rows.length == 20)
    val after = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    assert(after === before,
      "Tables.events leaked spark.sql.legacy.parquet.nanosAsLong into the caller's session")
    // The isolated-session DataFrame must stay composable with
    // caller-session plans — that's exactly what every events query
    // would do if the driver regenerated nanos-flavor data.
    import spark.implicits._
    val dim = Seq((0L, "a"), (1L, "b")).toDF("k", "v")
    val joined = Tables.events(spark, s"$root/ns")
      .join(dim, col("event_id") % 2 === col("k"))
      .count()
    assert(joined == 20, "cross-session join over the NANOS flavor lost rows")
  }
}
