package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Complex arithmetic over `struct(re: double, im: double)` columns.
  *
  * Spark has no native complex type (SURVEY.md §1.3); the reference keeps
  * `complex128` visibilities (`cngi/_utils/_table_conversion.py:299-303`).
  * We model them as two-field structs and provide the arithmetic the
  * reference gets from numpy broadcasting (e.g. phase rotation at
  * `ngcasa/imaging/direction_rotate.py:215-247`, gain application in
  * `ngcasa/calibration/self_cal.py`). All helpers are plain column
  * expressions — fully codegen'd by Catalyst, no UDFs.
  */
object complex {

  /** Build a complex struct from real/imag columns. */
  def c(re: Column, im: Column): Column = struct(re.as("re"), im.as("im"))

  def c_lit(re: Double, im: Double): Column = c(lit(re), lit(im))

  def re(a: Column): Column = a.getField("re")
  def im(a: Column): Column = a.getField("im")

  def c_add(a: Column, b: Column): Column = c(re(a) + re(b), im(a) + im(b))
  def c_sub(a: Column, b: Column): Column = c(re(a) - re(b), im(a) - im(b))

  def c_mul(a: Column, b: Column): Column =
    c(re(a) * re(b) - im(a) * im(b), re(a) * im(b) + im(a) * re(b))

  def c_conj(a: Column): Column = c(re(a), -im(a))

  /** Squared magnitude |a|^2. */
  def c_abs2(a: Column): Column = re(a) * re(a) + im(a) * im(a)

  /** Magnitude (cngi/vis/visplot.py:62: sqrt(re^2+im^2)). */
  def c_abs(a: Column): Column = sqrt(c_abs2(a))

  /** Phase angle in radians. */
  def c_arg(a: Column): Column = atan2(im(a), re(a))

  /** a / b = a * conj(b) / |b|^2. */
  def c_div(a: Column, b: Column): Column = {
    val d = c_abs2(b)
    c((re(a) * re(b) + im(a) * im(b)) / d, (im(a) * re(b) - re(a) * im(b)) / d)
  }

  /** exp(i*theta) — the phasor used in phase rotation
    * (direction_rotate.py:215-247). */
  def c_phasor(theta: Column): Column = c(cos(theta), sin(theta))

  def c_scale(a: Column, s: Column): Column = c(re(a) * s, im(a) * s)
}
