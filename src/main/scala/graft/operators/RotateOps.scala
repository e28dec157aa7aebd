package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.complex._

/** direction_rotate (ngcasa/imaging/direction_rotate.py:28-248):
  * per-field 3x3 uvw rotation + per-visibility phase rotation to a new
  * phase center.
  *
  * Spark-first shape: the per-field matrices are tiny driver-side math
  * (field table is dimension-scale) broadcast-joined to the facts; the
  * uvw rotation and complex phasor are pure row-wise column
  * expressions — whole-stage codegen, no shuffle at all.
  */
object RotateOps {

  type Mat3 = Array[Array[Double]]

  private def matMul(a: Mat3, b: Mat3): Mat3 =
    Array.tabulate(3, 3)((i, j) =>
      a(i)(0) * b(0)(j) + a(i)(1) * b(1)(j) + a(i)(2) * b(2)(j))

  private def transpose(a: Mat3): Mat3 = Array.tabulate(3, 3)((i, j) => a(j)(i))

  private def rotX(t: Double): Mat3 = Array(
    Array(1.0, 0.0, 0.0),
    Array(0.0, math.cos(t), -math.sin(t)),
    Array(0.0, math.sin(t), math.cos(t)))

  private def rotZ(t: Double): Mat3 = Array(
    Array(math.cos(t), -math.sin(t), 0.0),
    Array(math.sin(t), math.cos(t), 0.0),
    Array(0.0, 0.0, 1.0))

  /** directional cosine of (ra, dec) — direction_rotate.py:177-189. */
  def directionalCosine(ra: Double, dec: Double): Array[Double] =
    Array(math.cos(ra) * math.cos(dec), math.sin(ra) * math.cos(dec), math.sin(dec))

  /** Per-field rotation matrix and phase vector
    * (calc_rotation_mats, direction_rotate.py:127-172):
    * intrinsic 'XZ' euler for the new center, 'ZX' for the field.
    */
  def rotationForField(newCenter: (Double, Double),
                       fieldCenter: (Double, Double),
                       commonTangent: Boolean): (Mat3, Array[Double]) = {
    val (raN, decN) = newCenter
    val (raF, decF) = fieldCenter
    // scipy R.from_euler('XZ',[a,b]) = Rx(a) @ Rz(b) (intrinsic)
    val rotNew = matMul(rotX(math.Pi / 2 - decN), rotZ(-raN + math.Pi / 2))
    val rotField = matMul(rotZ(-math.Pi / 2 + raF), rotX(decF - math.Pi / 2))
    val uvwRot = transpose(matMul(rotNew, rotField))
    if (commonTangent) { uvwRot(2)(0) = 0.0; uvwRot(2)(1) = 0.0 }
    val dc = directionalCosine(raN, decN)
      .zip(directionalCosine(raF, decF)).map { case (n, f) => n - f }
    val phase = Array.tabulate(3)(i =>
      rotNew(i)(0) * dc(0) + rotNew(i)(1) * dc(1) + rotNew(i)(2) * dc(2))
    (uvwRot, phase)
  }

  val SpeedOfLight = 299792458.0

  /** Rotate uvw and phase-shift the visibility struct. The field
    * matrices arrive as a small (fieldId -> (matrix, phase)) map
    * baked into literal columns via a broadcast-joined dim frame.
    *
    * Appends u_rot / v_rot / w_rot and `visRotCol` =
    * vis * exp(2 pi i * phase_direction * freq / c)
    * where phase_direction = uvw_rot[0:e] . phase[0:e] — the ROTATED uvw
    * (direction_rotate.py:102 feeds apply_rotation_matrix's output into
    * apply_phasor at :111; e = 2 under common-tangent reprojection,
    * direction_rotate.py:220-247).
    */
  def directionRotate(df: DataFrame, fields: Map[Int, ((Double, Double))],
                      newCenter: (Double, Double),
                      fieldIdCol: String, uCol: String, vCol: String,
                      wCol: String, visCol: String, freqCol: String,
                      visRotCol: String = "vis_rot",
                      commonTangent: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = fields.toSeq.map { case (fid, center) =>
      val (m, p) = rotationForField(newCenter, center, commonTangent)
      (fid, m(0)(0), m(0)(1), m(0)(2), m(1)(0), m(1)(1), m(1)(2),
        m(2)(0), m(2)(1), m(2)(2), p(0), p(1), p(2))
    }
    val dim = rows.toDF(fieldIdCol, "m00", "m01", "m02", "m10", "m11", "m12",
      "m20", "m21", "m22", "p0", "p1", "p2")
    val j = df.join(broadcast(dim), Seq(fieldIdCol))
    val (u, v, w) = (col(uCol), col(vCol), col(wCol))
    // row-vector times matrix: uvw_rot[k] = sum_i uvw[i] * M[i][k]
    val uR = u * col("m00") + v * col("m10") + w * col("m20")
    val vR = u * col("m01") + v * col("m11") + w * col("m21")
    val wR = u * col("m02") + v * col("m12") + w * col("m22")
    val phaseDir =
      if (commonTangent) uR * col("p0") + vR * col("p1")
      else uR * col("p0") + vR * col("p1") + wR * col("p2")
    val theta = lit(2.0 * math.Pi) * phaseDir * col(freqCol) / lit(SpeedOfLight)
    j.withColumn("u_rot", uR).withColumn("v_rot", vR).withColumn("w_rot", wR)
      .withColumn(visRotCol, c_mul(col(visCol), c_phasor(theta)))
      .drop("m00", "m01", "m02", "m10", "m11", "m12", "m20", "m21", "m22",
        "p0", "p1", "p2")
  }
}
