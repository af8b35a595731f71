package graft.functions

/** Diffusion-direction (bvec) geometry — SURVEY §2.8 math rows
  * (Exam_info.py:1148-1220 semantics): voxel-normalize the affine's
  * direction columns, complete the basis with a cross product, rotate
  * the gradient table.
  *
  * Pure per-record 3×3 math — no linear-algebra dependency, no Spark
  * types. In the pipeline it runs inside a typed Dataset map over the
  * per-series record (one tiny matrix per series, never a shuffle).
  */
object BvecMath {

  type Vec3 = (Double, Double, Double)

  def norm(v: Vec3): Double =
    math.sqrt(v._1 * v._1 + v._2 * v._2 + v._3 * v._3)

  def normalize(v: Vec3): Vec3 = {
    val n = norm(v)
    require(n > 0, "zero direction vector")
    (v._1 / n, v._2 / n, v._3 / n)
  }

  def cross(a: Vec3, b: Vec3): Vec3 = (
    a._2 * b._3 - a._3 * b._2,
    a._3 * b._1 - a._1 * b._3,
    a._1 * b._2 - a._2 * b._1)

  /** Rotation matrix from the two in-plane direction cosines: columns
    * are (row, col, row×col), each voxel-normalized. */
  def rotationFromOrientation(rowDir: Vec3, colDir: Vec3)
      : (Vec3, Vec3, Vec3) = {
    val r = normalize(rowDir)
    val c = normalize(colDir)
    (r, c, cross(r, c))
  }

  /** Apply the rotation to one gradient vector (matrix·vector with the
    * rotation's columns as the basis). */
  def rotate(rot: (Vec3, Vec3, Vec3), g: Vec3): Vec3 = {
    val (r, c, s) = rot
    (r._1 * g._1 + c._1 * g._2 + s._1 * g._3,
      r._2 * g._1 + c._2 * g._2 + s._2 * g._3,
      r._3 * g._1 + c._3 * g._2 + s._3 * g._3)
  }

  def dot(a: Vec3, b: Vec3): Double =
    a._1 * b._1 + a._2 * b._2 + a._3 * b._3

  /** The reference's `bv · rot` (row-vector times matrix,
    * Exam_info.py:1207-1210): express `g` in the rotation's column
    * basis — component j = g · column_j (= rotᵀ·g, which differs from
    * [[rotate]]'s rot·g unless the matrix is symmetric). */
  def projectOnto(rot: (Vec3, Vec3, Vec3), g: Vec3): Vec3 =
    (dot(g, rot._1), dot(g, rot._2), dot(g, rot._3))

  /** Manufacturer sign convention (the reference flips per axis). */
  def flipSigns(g: Vec3, flipX: Boolean, flipY: Boolean,
      flipZ: Boolean): Vec3 = (
    if (flipX) -g._1 else g._1,
    if (flipY) -g._2 else g._2,
    if (flipZ) -g._3 else g._3)
}
