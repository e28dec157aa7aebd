package graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, GraftFunctions}
import graft.operators.TextOps

/** The SQL registration surface: `polyhash` / `dot_product` reachable
  * from `spark.sql(...)` via both registration paths (live-session
  * register() and the spark.sql.extensions config class), agreeing
  * bit-for-bit with the Column-API forms, and failing analysis — not
  * execution — on type misuse.
  */
class GraftExtensionsSpec extends SparkSpec {

  private lazy val sql: SparkSession = {
    val s = spark.newSession()
    GraftFunctions.register(s)
    s
  }

  test("polyhash(s) from SQL equals TextOps.polyHashFn") {
    val got = sql.sql("SELECT polyhash('the quick brown fox') AS h")
      .head().getLong(0)
    assert(got == TextOps.polyHashFn("the quick brown fox",
      TextOps.HashBase, TextOps.HashMod))
  }

  test("polyhash(s, base, mod) constants route to the same kernel") {
    val got = sql.sql(
      s"SELECT polyhash('abc', ${TextOps.HashBase2}, ${TextOps.HashMod2}) AS h")
      .head().getLong(0)
    assert(got == TextOps.polyHashFn("abc",
      TextOps.HashBase2, TextOps.HashMod2))
  }

  test("dot_product from SQL: double[] x double[], and float widening") {
    val d = sql.sql(
      "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(d == 32.0)
    import sql.implicits._
    val f = Seq((Array(1.5f, 2.5f), Array(2.0, 4.0))).toDF("a", "b")
    f.createOrReplaceTempView("fv")
    assert(sql.sql("SELECT dot_product(a, b) AS d FROM fv")
      .head().getDouble(0) == 1.5 * 2.0 + 2.5 * 4.0)
  }

  test("SQL form equals the Column form on real data (row-for-row)") {
    import sql.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta epsilon"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("px_docs")
    val viaSql = sql.sql("SELECT doc_id, polyhash(text) AS h FROM px_docs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaCol = docs
      .select(col("doc_id"), graft.functions.PolyHash(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaSql == viaCol)
  }

  test("jaro_winkler from SQL equals the Column kernel on the reference vectors") {
    val got = sql.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS a, " +
        "jaro_winkler('ax', 'ay') AS b").head()
    assert(approx(got.getDouble(0), 0.9611111111, 1e-9))
    assert(approx(got.getDouble(1), 2.0 / 3.0, 1e-9)) // no winkler boost
  }

  test("type misuse fails at analysis, not execution") {
    intercept[AnalysisException] {
      sql.sql("SELECT polyhash(42)").collect()
    }
    intercept[AnalysisException] {
      sql.sql("SELECT dot_product(array('a'), array('b'))").collect()
    }
  }

  test("non-constant base/mod is rejected with a clear message") {
    val e = intercept[Exception] {
      sql.sql("SELECT polyhash('x', cast(rand()*10 as int) + 2, 7)").collect()
    }
    assert(e.getMessage.contains("constant"))
  }

  test("wrong arity is rejected") {
    intercept[Exception] { sql.sql("SELECT polyhash('a', 3)").collect() }
    intercept[Exception] { sql.sql("SELECT dot_product(array(1.0D))").collect() }
  }

  test("extensions class applies via the builder extension point") {
    // `spark.sql.extensions=graft.functions.GraftExtensions` is a STATIC
    // conf — it only takes effect when the SparkContext is created, so
    // a shared-context test JVM cannot exercise the config string
    // end-to-end. `withExtensions` is the same injection surface (the
    // builder applies the identical class either way); this proves
    // GraftExtensions functions as a SparkSessionExtensions consumer.
    val (act, dflt) =
      (SparkSession.getActiveSession, SparkSession.getDefaultSession)
    try {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val got = s.sql("SELECT polyhash('abc') AS h").head().getLong(0)
      assert(got == TextOps.polyHashFn("abc",
        TextOps.HashBase, TextOps.HashMod))
      assert(s.sql("SELECT dot_product(array(2.0D), array(3.0D)) AS d")
        .head().getDouble(0) == 6.0)
    } finally {
      act.foreach(SparkSession.setActiveSession)
      dflt.foreach(SparkSession.setDefaultSession)
    }
  }

  test("char_entropy / squared_distance from SQL match their kernels") {
    assert(sql.sql("SELECT char_entropy('aabb') AS e").head().getDouble(0)
      === graft.functions.CharEntropy.entropy(
        org.apache.spark.unsafe.types.UTF8String.fromString("aabb")))
    assert(sql.sql(
        "SELECT squared_distance(array(1.0D, 2.0D), array(3.0D, 0.0D)) AS d")
      .head().getDouble(0) === 8.0)
    intercept[Exception] { sql.sql("SELECT char_entropy(7)").collect() }
  }

  test("registered functions stay inside whole-stage codegen") {
    // range() keeps the projection out of ConvertToLocalRelation's
    // constant folding, so the executed plan shows the real span
    sql.range(4).createOrReplaceTempView("cg_probe")
    val plan = sql.sql(
      """SELECT id, polyhash(cast(id AS STRING)) AS h,
        |  dot_product(array(cast(id AS DOUBLE)), array(2.0D)) AS d
        |FROM cg_probe""".stripMargin)
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    assert(plan.exists(_.isInstanceOf[WholeStageCodegenExec]),
      s"expected a WholeStageCodegen span, got:\n$plan")
  }
}
