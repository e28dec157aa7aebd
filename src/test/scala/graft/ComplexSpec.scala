package graft

import org.apache.spark.sql.functions._
import graft.functions.complex._

/** Algebraic identities for the complex helper library (SURVEY.md §7.3
  * risk 1: property-test the struct-based complex ops).
  */
class ComplexSpec extends SparkSpec {
  import spark.implicits._

  private def zs = Seq((1.0, 2.0, 3.0, -4.0), (0.5, -0.25, -1.5, 2.0))
    .toDF("ar", "ai", "br", "bi")
    .select(c(col("ar"), col("ai")).as("a"), c(col("br"), col("bi")).as("b"))

  test("z * conj(z) = |z|^2 (real)") {
    val rows = zs.select(re(c_mul(col("a"), c_conj(col("a")))).as("r"),
      im(c_mul(col("a"), c_conj(col("a")))).as("i"),
      c_abs2(col("a")).as("m")).collect()
    rows.foreach { r =>
      assert(approx(r.getDouble(0), r.getDouble(2)))
      assert(approx(r.getDouble(1), 0.0))
    }
  }

  test("(a*b)/b = a") {
    val rows = zs.select(
      re(c_div(c_mul(col("a"), col("b")), col("b"))).as("rr"),
      im(c_div(c_mul(col("a"), col("b")), col("b"))).as("ri"),
      re(col("a")).as("ar"), im(col("a")).as("ai")).collect()
    rows.foreach { r =>
      assert(approx(r.getDouble(0), r.getDouble(2)))
      assert(approx(r.getDouble(1), r.getDouble(3)))
    }
  }

  test("|phasor(theta)| = 1 and arg(phasor(theta)) = theta") {
    val rows = Seq(0.3, -1.2, 2.9).toDF("t")
      .select(c_abs(c_phasor(col("t"))).as("m"),
        c_arg(c_phasor(col("t"))).as("a"), col("t")).collect()
    rows.foreach { r =>
      assert(approx(r.getDouble(0), 1.0))
      assert(approx(r.getDouble(1), r.getDouble(2)))
    }
  }

  test("addition/subtraction roundtrip") {
    val rows = zs.select(
      re(c_sub(c_add(col("a"), col("b")), col("b"))).as("r"),
      im(c_sub(c_add(col("a"), col("b")), col("b"))).as("i"),
      re(col("a")).as("ar"), im(col("a")).as("ai")).collect()
    rows.foreach { r =>
      assert(approx(r.getDouble(0), r.getDouble(2)))
      assert(approx(r.getDouble(1), r.getDouble(3)))
    }
  }
}
