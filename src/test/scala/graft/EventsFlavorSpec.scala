package graft

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
    val prior = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    try {
      val us = canonical("us")
      val lg = canonical("long")
      val ns = canonical("ns") // flips the legacy conf (documented)
      assert(us.nonEmpty && us.length == 20)
      assert(lg === us, "int64-nanos flavor diverged from timestamp[us]")
      assert(ns === us, "TIMESTAMP(NANOS) flavor diverged from timestamp[us]")
      for (flavor <- Seq("us", "ns", "long")) {
        val sch = Tables.events(spark, s"$root/$flavor").schema
        assert(sch("ts").dataType == TimestampType, s"$flavor ts type")
        assert(sch("ts_ns").dataType == LongType, s"$flavor ts_ns type")
      }
    } finally {
      // the NANOS branch flips the session-wide legacy escape hatch;
      // put the shared test session back how we found it
      prior match {
        case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
    }
  }
}
