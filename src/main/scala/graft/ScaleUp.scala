package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data amplifier: writes an sf×N copy of a driver
  * testdata dir by unioning N key-offset replicas of every fact table
  * (`sbt "runMain graft.ScaleUp <srcDir> <dstDir> [n]"`).
  *
  * Purpose (round-9 verdict item 8): the driver benches at sf0.1; this
  * produces a 10× volume locally so anything superlinear (pairing
  * self-joins, full-width compares) surfaces BEFORE real scale.
  * Replica i adds `i * KeyOffset` to every entity key — foreign keys
  * included, so each replica is a self-consistent universe and joins
  * keep their exact 1:N shape (the per-key fan-in/fan-out of the
  * original, N× the keys). Bounded dimensions (`region`, `nation`) and
  * nation FKs are left alone, exactly how a bigger TPC-H keeps its
  * fixed 25-nation world. Timestamps are NOT shifted: N× event density
  * over the same window, each user still owning its original history
  * (user ids are offset). Document text is replicated verbatim —
  * web-corpus-realistic exact/near duplication that stresses the LSH
  * bucket caps by design.
  */
object ScaleUp {

  /** Larger than any key the generator emits at sf ≤ 1. */
  val KeyOffset = 1000000000L

  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Nil, // bounded dimension — single copy
    "nation" -> Nil, // bounded dimension — single copy
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** Entity-name columns derived from the entity key in the TPC-H
    * generator (`Customer#%09d`). Replicas must RE-DERIVE them from
    * the offset key: keeping the source name verbatim would make every
    * replica an exact name-duplicate of the original, so any
    * name-keyed operator (record_linkage's composite block, name
    * joins) measures the amplifier's duplication artifact instead of
    * genuine scale — real data growth mints new names, never 10
    * byte-identical copies of each. Replica 0 keeps the source bytes.
    */
  private val nameCols: Map[String, Seq[(String, String, String)]] = Map(
    "customer" -> Seq(("c_name", "Customer#", "c_custkey")),
    "supplier" -> Seq(("s_name", "Supplier#", "s_suppkey")))

  def amplify(df: DataFrame, keys: Seq[String], n: Int,
              names: Seq[(String, String, String)] = Nil): DataFrame =
    if (keys.isEmpty) df
    else (0 until n).map { i =>
      val offset = keys.foldLeft(df) { (acc, k) =>
        acc.withColumn(k, col(k) + lit(i * KeyOffset))
      }
      if (i == 0) offset
      else names.foldLeft(offset) { case (acc, (nameCol, prefix, keyCol)) =>
        // 13-digit pad: wide enough for key + 50 replica offsets —
        // lpad TRUNCATES overlong input, and a truncated key collides
        // replica names, silently inflating every name-keyed join
        acc.withColumn(nameCol,
          concat(lit(prefix), lpad(col(keyCol).cast("string"), 13, "0")))
      }
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Tables.all) {
      // events: a plain load handles the int64-nanos and timestamp[us]
      // flavors VERBATIM (bit-preserving — ns tie-breaks in the
      // amplified copy equal the source's); only the parquet
      // TIMESTAMP(NANOS) footer flavor crashes a raw read
      // (SPARK-40819), so that one goes through the same isolated
      // nanosAsLong session Tables.events uses, which surfaces ts as
      // the raw int64 nanos — still lossless
      val base =
        if (t == "events" &&
            Tables.tsIsParquetNanos(spark, s"$src/events.parquet")) {
          val iso = spark.newSession()
          iso.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          Tables.load(iso, src, t)
        } else Tables.load(spark, src, t)
      val out = amplify(base, keyCols(t), n, nameCols.getOrElse(t, Nil))
      // a few files per table keeps read parallelism without tiny-file
      // overhead at this scale
      out.repartition(math.max(4, 4 * keyCols(t).size))
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t -> $dst/$t.parquet")
    }
    spark.stop()
  }
}
