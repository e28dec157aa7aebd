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

  for ((table, cols) <- contracts.toSeq.sortBy(_._1))
    test(s"$table columns carry the types its queries assume") {
      val schema = Tables.load(spark, d, table).schema
      for ((name, accepted) <- cols) {
        assert(schema.fieldNames.contains(name),
          s"$table.$name MISSING — generator drift; fields: " +
            schema.fieldNames.mkString(", "))
        val dt = schema(name).dataType
        assert(accepted.contains(dt),
          s"$table.$name is $dt but queries assume one of " +
            s"${accepted.mkString("{", ", ", "}")} — schema drift; " +
            "adapt the loader (see Tables.events) or the consumers")
      }
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
