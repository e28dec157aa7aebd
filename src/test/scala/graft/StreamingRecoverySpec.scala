package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Durable checkpoint recovery — the streaming-robustness axis the
  * MemoryStream suites cannot exercise (MemoryStream offsets die with
  * the query): a file-source stream appending to a parquet store
  * through StreamingOps.appendToStore is STOPPED mid-stream and a NEW
  * query is started from the same checkpoint. The restarted query must
  * resume from the committed offset — every input row lands in the
  * store exactly once, none reprocessed, none lost — which is the
  * exactly-once contract a 100 TB ingest pipeline leans on across
  * executor loss and job redeploys.
  */
class StreamingRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("appendToStore resumes from its checkpoint exactly-once across query restarts") {
    val root = Files.createTempDirectory("graft_recovery").toString
    val (in, store, ckpt) = (s"$root/in", s"$root/store", s"$root/ckpt")
    Files.createDirectories(Paths.get(in))

    def writeBatch(tag: Int, ids: Range): Unit =
      ids.map(i => s"""{"event_id": $i, "user_id": ${i % 5}}""")
        .toDF("value").coalesce(1).write.mode("append").text(in)

    val schema = "event_id LONG, user_id LONG"
    def start() = StreamingOps.appendToStore(
      spark.readStream.schema(schema).json(in)
        .withColumn("even_user", col("user_id") % 2 === 0),
      store, ckpt, partitionBy = Seq("even_user")).start()

    writeBatch(1, 0 until 40)
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(store).count() === 40)

    // new files arrive while no query is running; a fresh query on the
    // SAME checkpoint must pick up exactly the delta
    writeBatch(2, 40 until 70)
    val q2 = start()
    q2.processAllAvailable()
    // and survive another in-flight batch before stopping
    writeBatch(3, 70 until 90)
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(store).select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(got === (0L until 90L), "exactly-once append across restarts")
    // the partition layout survived the restart too (partition-dir
    // values come back as inferred strings)
    val parts = spark.read.parquet(store)
      .groupBy(col("even_user").cast("string")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(parts("true") === (0 until 90).count(_ % 5 % 2 == 0))
    assert(parts("false") === (0 until 90).count(_ % 5 % 2 == 1))
  }
}
