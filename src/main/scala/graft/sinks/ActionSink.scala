package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Propose-don't-act sinks — SURVEY §2.2 K8/K9.
  *
  * The reference never executes destructive fixes directly: it emits
  * reviewable shell/SQL scripts (Cenir_DB.py:174-187,461-469;
  * do_dicom_compare_recup_to.py:142-145) and appendable QC CSVs
  * (qcview.py:236-243). Same stance here: maintenance queries produce a
  * findings DataFrame; these sinks render it to script lines / CSV.
  * Executing anything stays out-of-band.
  */
object ActionSink {

  /** K8 — render (action, target) findings into shell-script lines.
    * Unknown actions fail the render, and embedded single quotes are
    * shell-escaped ('\'' form) — a hostile path must not become an
    * injected command in the reviewed script. */
  def shellScript(findings: DataFrame): DataFrame = {
    def sq(c: Column): Column =
      concat(lit("'"), regexp_replace(c, "'", "'\\\\''"), lit("'"))
    val rendered = findings.select(
      when(col("action") === "delete", concat(lit("rm -rf "), sq(col("target"))))
        .when(col("action") === "move",
          concat(lit("mv "), sq(col("target")), lit(" "), sq(col("dest"))))
        .when(col("action") === "mkdir",
          concat(lit("mkdir -p "), sq(col("target"))))
        .as("line"))
    rendered.filter(col("line").isNull).limit(1).collect().foreach { _ =>
      throw new IllegalArgumentException("unknown action in findings")
    }
    rendered
  }

  /** K8 (SQL variant) — delete statements per key. String keys are
    * quoted with '' doubling (SQL escape); numeric keys render bare. */
  def sqlScript(findings: DataFrame, table: String, keyCol: String)
      : DataFrame = {
    val isString = findings.schema(keyCol).dataType ==
      org.apache.spark.sql.types.StringType
    val rendered =
      if (isString)
        concat(lit("'"), regexp_replace(col(keyCol), "'", "''"), lit("'"))
      else col(keyCol).cast("string")
    findings.select(concat(lit(s"DELETE FROM $table WHERE $keyCol = "),
      rendered, lit(";")).as("line"))
  }

  /** Write script lines to a single reviewable file (small by
    * construction: one line per proposed action). */
  def writeScript(lines: DataFrame, path: String): Unit =
    lines.coalesce(1).write.mode("overwrite").text(path)

  /** K9 — QC CSV append sink. */
  def appendCsv(df: DataFrame, path: String): Unit =
    df.write.mode("append").option("header", "true").csv(path)

  /** K9 resume read-back (pairs with FileScans S14 semantics). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** K7 — diffusion-direction text sink (write_diff_to_file,
    * Exam_info.py:1148-1220): renders one series' gradient table as the
    * reference's four text files in `dir`:
    *  - `diffusion_dir.bvecs`  — rotated bvecs, transposed (3 rows ×
    *    N cols, `%1.5f`, space-separated — np.savetxt(bvecnew.T));
    *  - `diffusion_dir.dicom_vec` — bvecs in the DICOM patient frame
    *    (rotation from ImageOrientationPatient row/col cosines, third
    *    column = cross product), transposed, `%1.5f`;
    *  - `diffusion_dir.bvals`  — b-values, one `%d` row;
    *  - `diffusion_dir.txt`    — N rows of `bval bx by bz`, `%1.5f`.
    * Vendor semantics (Exam_info.py:1183-1209): GE writes the raw
    * bvecs (already in the bounding-box frame, no sign flip); everyone
    * else rotates by the voxel-normalized affine basis with the
    * diag(-1,-1,1) sign fix. No-clobber: an existing `.bvecs` file
    * skips the whole write (returns "exists"; Exam_info.py:1214-1216).
    *
    * Per-series file emission — in the pipeline this runs inside
    * foreachPartition on the series-grouped Dataset (tiny matrices,
    * no shuffle, no driver collect), same as the tar/binary sinks. */
  def writeDiffusionFiles(dir: java.nio.file.Path, manufacturer: String,
      affineRow: graft.functions.BvecMath.Vec3,
      affineCol: graft.functions.BvecMath.Vec3,
      affineSlice: graft.functions.BvecMath.Vec3,
      orientRow: graft.functions.BvecMath.Vec3,
      orientCol: graft.functions.BvecMath.Vec3,
      bvals: Seq[Long],
      bvecs: Seq[graft.functions.BvecMath.Vec3]): String = {
    import graft.functions.BvecMath._
    import java.nio.file.Files
    require(bvals.length == bvecs.length, "bvals/bvecs length mismatch")
    val out = dir.resolve("diffusion_dir.bvecs")
    if (Files.exists(out)) return "exists"
    // absent Manufacturer tag = not GE (the reference's `in` probe on
    // a missing key), never an NPE
    val isGe = Option(manufacturer).getOrElse("")
      .toUpperCase.contains("GE MEDICAL SYSTEMS")
    // rotnii: voxel-normalized affine columns; diag(-1,-1,1) unless GE
    val rotNii = {
      val base = (normalize(affineRow), normalize(affineCol),
        normalize(affineSlice))
      if (isGe) base
      else (flipSigns(base._1, true, true, false),
        flipSigns(base._2, true, true, false),
        flipSigns(base._3, true, true, false))
    }
    val bvecNew = if (isGe) bvecs else bvecs.map(projectOnto(rotNii, _))
    val rotDic = rotationFromOrientation(orientRow, orientCol)
    val bvecDic = bvecs.map(projectOnto(rotDic, _))
    // Locale.ROOT: an executor JVM defaulting to fr_FR/de_DE would
    // otherwise render "0,70711" and corrupt the text format
    def f5(v: Double) =
      String.format(java.util.Locale.ROOT, "%1.5f",
        java.lang.Double.valueOf(v))
    def writeT(name: String, vs: Seq[Vec3]): Unit = {
      val rows = Seq(vs.map(v => f5(v._1)), vs.map(v => f5(v._2)),
        vs.map(v => f5(v._3))).map(_.mkString(" "))
      Files.write(dir.resolve(name),
        (rows.mkString("\n") + "\n").getBytes)
    }
    writeT("diffusion_dir.bvecs", bvecNew)
    writeT("diffusion_dir.dicom_vec", bvecDic)
    Files.write(dir.resolve("diffusion_dir.bvals"),
      (bvals.mkString(" ") + "\n").getBytes)
    val txt = bvals.zip(bvecs).map { case (b, v) =>
      s"${f5(b.toDouble)} ${f5(v._1)} ${f5(v._2)} ${f5(v._3)}"
    }.mkString("\n") + "\n"
    Files.write(dir.resolve("diffusion_dir.txt"), txt.getBytes)
    "written"
  }

  /** K6 — no-clobber binary sink with collision compare
    * (convert_series, Exam_info.py:1000-1025): if the target exists and
    * the content hash matches, skip; if it exists and differs, write
    * under a `duplicate_but_different` name; else write. Returns what
    * happened. Runs per record on the executor via foreachPartition in
    * a real pipeline; exposed here as the single-file primitive.
    */
  def writeBinaryNoClobber(dir: java.nio.file.Path, name: String,
      content: Array[Byte]): String = {
    import java.nio.file.Files
    val target = dir.resolve(name)
    if (!Files.exists(target)) {
      Files.write(target, content); "written"
    } else if (java.util.Arrays.equals(Files.readAllBytes(target), content)) {
      "skipped_identical"
    } else {
      Files.write(dir.resolve(s"duplicate_but_different_$name"), content)
      "duplicate_but_different"
    }
  }
}
