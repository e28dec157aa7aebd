package graft

import org.apache.spark.sql.types._

/** Schema-drift tripwire (round-7 verdict item 3): the driver
  * regenerates `/root/testdata` between rounds, and round 7 lost five
  * formerly-green queries to a silent `ts` dtype change (int64 nanos →
  * timestamp[us]). This spec pins, per table, the column names and the
  * set of types each query family is written to tolerate, so the next
  * regeneration fails ONE focused test with a one-line diagnosis
  * instead of five queries at analysis time.
  *
  * A type listed here is a claim that some query depends on it; widen
  * the accepted set only together with the consuming queries.
  */
class SchemaContractSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** Accepted types per column. Timestamp-bearing columns accept both
    * parquet flavors the generator has shipped (LTZ and NTZ µs);
    * events.ts additionally accepts raw int64 nanos because
    * Tables.events normalizes that flavor itself.
    */
  private val anyTs: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private val contracts: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Set(IntegerType, LongType),
      "r_name" -> Set(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Set(IntegerType, LongType),
      "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType, LongType)),
    "customer" -> Seq(
      "c_custkey" -> Set(LongType),
      "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType, LongType),
      "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Set(LongType),
      "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType, LongType),
      "s_acctbal" -> Set(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Set(LongType),
      "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType),
      "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType, LongType),
      "p_retailprice" -> Set(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Set(LongType),
      "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType),
      "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> anyTs,
      "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Set(LongType),
      "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType),
      "l_linenumber" -> Set(IntegerType, LongType),
      "l_quantity" -> Set(DoubleType),
      "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType),
      "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType),
      "l_linestatus" -> Set(StringType),
      "l_shipdate" -> anyTs),
    "events" -> Seq(
      "event_id" -> Set(LongType),
      "ts" -> (anyTs + LongType),
      "user_id" -> Set(LongType),
      "event_type" -> Set(StringType),
      "value" -> Set(DoubleType),
      "props" -> Set(StringType)),
    "documents" -> Seq(
      "doc_id" -> Set(LongType),
      "text" -> Set(StringType),
      "lang" -> Set(StringType),
      "source" -> Set(StringType),
      "n_chars" -> Set(IntegerType, LongType)),
    "embeddings" -> Seq(
      "vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false)),
      "label" -> Set(IntegerType, LongType)))

  /** The contract check itself, factored out so a synthetic drifted
    * schema can prove the tripwire actually fires (not just that
    * today's data happens to pass). Returns one violation line per
    * missing/mistyped column; empty = contract satisfied.
    */
  private def violations(schema: StructType, table: String): Seq[String] =
    contracts(table).flatMap { case (name, accepted) =>
      if (!schema.fieldNames.contains(name))
        Some(s"$table.$name MISSING — generator drift; fields: " +
          schema.fieldNames.mkString(", "))
      else {
        val dt = schema(name).dataType
        if (accepted.contains(dt)) None
        else Some(s"$table.$name is $dt but queries assume one of " +
          s"${accepted.mkString("{", ", ", "}")} — schema drift; " +
          "adapt the loader (see Tables.events) or the consumers")
      }
    }

  for ((table, _) <- contracts.toSeq.sortBy(_._1))
    test(s"$table columns carry the types its queries assume") {
      val v = violations(Tables.load(spark, d, table).schema, table)
      assert(v.isEmpty, v.mkString("\n"))
    }

  test("contract is COMPLETE: it pins every physical column of every table") {
    // a regeneration that ADDS a column is harmless, but a column the
    // contract forgot to pin is a hole the next drift walks through —
    // as of round 10 the contract enumerates the full generator schema,
    // so any unpinned column means the generator grew and the contract
    // (plus any new consumer) must be extended deliberately
    for ((table, cols) <- contracts.toSeq.sortBy(_._1)) {
      val pinned = cols.map(_._1).toSet
      val physical = Tables.load(spark, d, table).schema.fieldNames.toSet
      assert(physical.subsetOf(pinned),
        s"$table grew unpinned columns: ${(physical -- pinned).toSeq.sorted
          .mkString(", ")} — pin them (with the types consumers assume)")
    }
  }

  test("a drifted fixture TRIPS the contract (the tripwire itself works)") {
    // round-10 verdict item 5: prove the check catches the historical
    // failure modes, not merely that current data passes
    val base = Tables.load(spark, d, "events").schema
    // (a) the round-7 incident inverted: ts regressing to DoubleType
    val retyped = StructType(base.map(f =>
      if (f.name == "ts") f.copy(dataType = DoubleType) else f))
    assert(violations(retyped, "events").exists(_.contains("events.ts")),
      "ts dtype drift must be reported")
    // (b) a dropped column
    val dropped = StructType(base.filterNot(_.name == "props"))
    assert(violations(dropped, "events").exists(_.contains("MISSING")),
      "a dropped column must be reported as MISSING")
    // (c) embeddings collapsing to double[] (would silently change
    // every ANN distance) — ArrayType(DoubleType) is NOT accepted
    val embBase = Tables.load(spark, d, "embeddings").schema
    val widened = StructType(embBase.map(f =>
      if (f.name == "embedding") f.copy(dataType = ArrayType(DoubleType))
      else f))
    assert(violations(widened, "embeddings").exists(_.contains("embedding")),
      "embedding element-type drift must be reported")
  }

  test("Tables.events REJECTS an unreadable ts flavor loudly (drifted parquet)") {
    // end-to-end through the loader: a string ts is not normalizable —
    // the loader must throw its one-line diagnosis, not hand queries a
    // column that fails 233 analysis steps later
    import spark.implicits._
    val path = s"/tmp/graft_drift_events_${java.util.UUID.randomUUID
      .toString.take(8)}"
    Seq((1L, "2024-01-01T00:00:00", 7L, "view", 1.5, """{"k":1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$path/events.parquet")
    val e = intercept[IllegalArgumentException] {
      Tables.events(spark, path)
    }
    assert(e.getMessage.contains("events.ts"),
      s"loader must name the drifted column, got: ${e.getMessage}")
  }

  test("events.props carries the JSON object contract props_parse reads") {
    // round-8 additions insurance: props_parse extracts $.k as BIGINT
    // with an explicit from_json schema. If a regeneration changed the
    // key name or value type, BOTH engines would parse all-null and the
    // oracle compare would stay silently green on a gutted query — so
    // the fixture must keep producing real values here.
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, d)
      .withColumn("k", from_json(col("props"), lit("k BIGINT")).getField("k"))
    val n = ev.count()
    val nonNull = ev.where(col("k").isNotNull).count()
    assert(n > 0 && nonNull > 0,
      s"events.props no longer yields $$.k BIGINT values " +
        s"($nonNull non-null of $n) — props_parse is parsing nothing")
  }

  test("embeddings.embedding keeps the 64-dim contract the ANN family assumes") {
    // dim=64 is baked into the index parameters (PQ: 8 subspaces x 8
    // dims; JL projection: 64 -> 16; LSH planes tabulated to dim) — a
    // silent dimensionality change would degrade every ANN query's
    // geometry without failing analysis.
    import org.apache.spark.sql.functions._
    val bad = Tables.embeddings(spark, d)
      .where(size(col("embedding")) =!= 64).count()
    assert(bad == 0L, s"$bad embedding rows are not 64-dimensional")
  }

  test("documents.text stays ASCII (char_entropy byte-fold == oracle char-fold)") {
    // char_entropy folds over UTF-8 BYTES in ascending byte order; the
    // DuckDB oracle folds over CHARACTERS in ascending char order. The
    // two orders coincide exactly when the text is single-byte ASCII —
    // if a regeneration introduces multi-byte characters this trips
    // here instead of surfacing as an entropy hash mismatch.
    import org.apache.spark.sql.functions._
    val bad = Tables.documents(spark, d)
      .where(col("text").rlike("[^\\x00-\\x7F]")).count()
    assert(bad == 0L, s"$bad documents contain non-ASCII characters")
  }

  test("Tables.events normalizes every flavor to ts timestamp + ts_ns long") {
    val ev = Tables.events(spark, d)
    assert(ev.schema("ts").dataType == TimestampType,
      s"canonical ts must be TimestampType, got ${ev.schema("ts").dataType}")
    assert(ev.schema("ts_ns").dataType == LongType,
      s"canonical ts_ns must be LongType, got ${ev.schema("ts_ns").dataType}")
    // the two representations must agree (µs-aligned nanos)
    import org.apache.spark.sql.functions._
    val bad = ev.where(unix_micros(col("ts")) * lit(1000L) =!= col("ts_ns"))
      .count()
    assert(bad == 0L, s"$bad rows where ts and ts_ns disagree")
  }

  test("driver contract: queries and oracleSql stay 1:1, names well-formed") {
    // the driver's gate iterates queries and looks up oracleSql by the
    // same key — a query without an oracle silently records a weaker
    // rows-only check, and this engine claims NONE of those
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(qs.nonEmpty)
    assert(qs.keySet === os.keySet,
      s"queries without oracle: ${(qs.keySet -- os.keySet).toSeq.sorted
        .mkString(", ")}; oracles without query: " +
        s"${(os.keySet -- qs.keySet).toSeq.sorted.mkString(", ")}")
    val badNames = qs.keySet.filterNot(_.matches("[a-z0-9_]+"))
    assert(badNames.isEmpty, s"non-kebab query names: $badNames")
    assert(os.values.forall(_.trim.nonEmpty))
  }
}
