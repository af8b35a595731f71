package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.DicomCodec
import graft.util.SerializableHadoopConf

/** K6 full-fidelity variant — the NIfTI-1 voxel sink.
  *
  * The reference converts each DICOM series stack to a `.nii.gz`
  * volume (convert_series, Exam_info.py:962-1057: dicom_series read →
  * nibabel save) under the K6 no-clobber/collision protocol
  * (Exam_info.py:1000-1025). This is the engine-side equivalent,
  * dependency-free: the NIfTI-1 header is built by hand from the
  * parsed DICOM geometry (layout per the public nifti1.h spec), the
  * voxel block is the instance-ordered slice payloads, and the gzip
  * member comes from `java.util.zip` (zero MTIME/OS fields, so equal
  * stacks produce byte-identical files and the collision compare is
  * meaningful).
  *
  * Scale shape: pixel payloads never cross a shuffle as a whole file —
  * each input file reduces executor-side to (series, echo, instance,
  * geometry meta, voxel bytes), the stack regroup shuffles exactly one
  * stack's slices to one task, and the volume is assembled and written
  * there. Per-task memory is one stack (the same bound the reference
  * pays holding a nibabel volume); the group iterator is drained
  * incrementally. All filesystem access goes through the Hadoop
  * FileSystem resolved from the path, so `hdfs://`/`s3a://` targets
  * behave exactly like `file:` (the probeAndExtend lesson).
  */
object NiftiSink {

  /** One decoded slice, ready for stacking. */
  final case class NSlice(seriesUid: String, echo: Int, instance: Int,
      meta: Map[String, String], pixels: Array[Byte])

  /** Stack write outcome — one manifest row per (series, echo). */
  final case class StackResult(series_uid: String, echo: Int,
      n_slices: Int, file: String, status: String)

  // ---- NIfTI-1 header construction (public nifti1.h layout) ----

  private def dsFirst(meta: Map[String, String], key: String): Option[Double] =
    meta.get(key).flatMap(_.split('\\').headOption)
      .flatMap(_.trim.toDoubleOption)

  private def dsVec(meta: Map[String, String], key: String): Array[Double] =
    meta.get(key).map(_.split('\\').flatMap(_.trim.toDoubleOption))
      .getOrElse(Array.empty)

  private def iv(meta: Map[String, String], key: String): Option[Int] =
    meta.get(key).flatMap(_.split('\\').headOption)
      .flatMap(_.trim.toIntOption)

  /** (datatype, bitpix) per the DICOM sample representation —
    * unsupported depths fail loud rather than writing garbage. */
  private def dtype(bits: Int, signed: Boolean): (Short, Short) =
    (bits, signed) match {
      case (8, _)      => (2, 8)    // DT_UINT8
      case (16, true)  => (4, 16)   // DT_INT16
      case (16, false) => (512, 16) // DT_UINT16
      case (32, true)  => (8, 32)   // DT_INT32
      case other => throw new IllegalArgumentException(
        s"unsupported pixel depth $other")
    }

  private def cross(a: Array[Double], b: Array[Double]): Array[Double] =
    Array(a(1) * b(2) - a(2) * b(1), a(2) * b(0) - a(0) * b(2),
      a(0) * b(1) - a(1) * b(0))

  /** Build the complete `.nii` byte image (348-byte header + 4-byte
    * extension pad + voxels) for one stack. `slices` must already be
    * instance-ordered; every slice must share the first slice's
    * geometry (checked — a mixed-geometry stack is corrupt input).
    *
    * Geometry: DICOM raster order is row-major with the column index
    * varying fastest, which is exactly NIfTI's x-fastest order, so
    * nx = Columns, ny = Rows, nz = #slices and the voxel block is the
    * concatenation of the per-slice payloads (trimmed of the
    * even-length pad byte). The sform affine comes from
    * ImageOrientationPatient / ImagePositionPatient / PixelSpacing,
    * with the slice axis taken from the position delta between the
    * first and last slice (falls back to rowDir × colDir ×
    * SliceThickness for single-slice stacks), converted from DICOM's
    * LPS frame to NIfTI's RAS by negating the x and y rows. */
  def buildNifti(slices: Seq[(Map[String, String], Array[Byte])])
      : Array[Byte] = {
    require(slices.nonEmpty, "empty stack")
    val meta = slices.head._1
    val rows = iv(meta, "Rows").getOrElse(
      throw new IllegalArgumentException("stack missing Rows"))
    val cols = iv(meta, "Columns").getOrElse(
      throw new IllegalArgumentException("stack missing Columns"))
    val bits = iv(meta, "BitsAllocated").getOrElse(8)
    val signed = iv(meta, "PixelRepresentation").contains(1)
    val (dt, bitpix) = dtype(bits, signed)
    // Long math BEFORE any Int use: 65535×65535×2 already wraps an
    // Int, which would both defeat this guard and let an undersized
    // payload slip past the per-slice length require below
    val sliceBytesL = rows.toLong * cols.toLong * (bitpix / 8)
    val nz = slices.length
    // one JVM array holds the volume: past 2 GiB the allocation would
    // wrap — fail with the actual numbers instead of a cryptic NASE
    val totalBytes = 352L + sliceBytesL * nz
    require(totalBytes <= Int.MaxValue,
      s"stack too large for a single .nii: $nz slices x $sliceBytesL B " +
        s"= $totalBytes B (limit ${Int.MaxValue}); split by echo/volume")
    val sliceBytes = sliceBytesL.toInt

    // PixelSpacing is [between-rows, between-cols] = (dy, dx)
    val spacing = dsVec(meta, "PixelSpacing")
    val dy = if (spacing.length >= 1) spacing(0) else 1.0
    val dx = if (spacing.length >= 2) spacing(1) else 1.0
    val orient = dsVec(meta, "ImageOrientationPatient")
    val (rowDir, colDir) =
      if (orient.length >= 6) (orient.slice(0, 3), orient.slice(3, 6))
      else (Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
    val pos0 = {
      val p = dsVec(meta, "ImagePositionPatient")
      if (p.length >= 3) p else Array(0.0, 0.0, 0.0)
    }
    // slice axis: real inter-slice step when the stack has depth,
    // else normal × thickness
    val (sliceDir, dz) = {
      val pn = dsVec(slices.last._1, "ImagePositionPatient")
      if (nz > 1 && pn.length >= 3) {
        val d = Array(pn(0) - pos0(0), pn(1) - pos0(1), pn(2) - pos0(2))
          .map(_ / (nz - 1))
        val n = math.sqrt(d.map(x => x * x).sum)
        if (n > 0) (d.map(_ / n), n)
        else (cross(rowDir, colDir),
          dsFirst(meta, "SliceThickness").getOrElse(1.0))
      } else (cross(rowDir, colDir),
        dsFirst(meta, "SliceThickness").getOrElse(1.0))
    }
    // LPS → RAS: negate the x/y world rows of every affine column
    def ras(v: Array[Double]): Array[Double] = Array(-v(0), -v(1), v(2))
    val (cx, cy, cz, ct) = (ras(rowDir.map(_ * dx)), ras(colDir.map(_ * dy)),
      ras(sliceDir.map(_ * dz)), ras(pos0))

    val buf = java.nio.ByteBuffer
      .allocate(352 + sliceBytes * nz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0, 348)                       // sizeof_hdr
    buf.putShort(40, 3.toShort)              // dim[0] = 3
    buf.putShort(42, cols.toShort)           // nx
    buf.putShort(44, rows.toShort)           // ny
    buf.putShort(46, nz.toShort)             // nz
    var i = 48
    while (i <= 54) { buf.putShort(i, 1.toShort); i += 2 } // dim[4..7]
    buf.putShort(70, dt)                     // datatype
    buf.putShort(72, bitpix)                 // bitpix
    buf.putFloat(76, 1.0f)                   // pixdim[0] (qfac)
    buf.putFloat(80, dx.toFloat)
    buf.putFloat(84, dy.toFloat)
    buf.putFloat(88, dz.toFloat)
    buf.putFloat(108, 352.0f)                // vox_offset
    buf.putFloat(112, 1.0f)                  // scl_slope
    buf.put(123, 2.toByte)                   // xyzt_units = mm
    buf.putShort(252, 0.toShort)             // qform_code
    buf.putShort(254, 1.toShort)             // sform_code = SCANNER_ANAT
    def putRow(off: Int, a: Array[Double], t: Double): Unit = {
      buf.putFloat(off, a(0).toFloat); buf.putFloat(off + 4, a(1).toFloat)
      buf.putFloat(off + 8, a(2).toFloat); buf.putFloat(off + 12, t.toFloat)
    }
    putRow(280, Array(cx(0), cy(0), cz(0)), ct(0)) // srow_x
    putRow(296, Array(cx(1), cy(1), cz(1)), ct(1)) // srow_y
    putRow(312, Array(cx(2), cy(2), cz(2)), ct(2)) // srow_z
    buf.put(344, 'n'.toByte); buf.put(345, '+'.toByte)
    buf.put(346, '1'.toByte)                 // magic "n+1\0"

    var off = 352
    slices.foreach { case (m, px) =>
      val r = iv(m, "Rows").getOrElse(-1); val c = iv(m, "Columns").getOrElse(-1)
      require(r == rows && c == cols,
        s"mixed geometry in stack: ${r}x$c vs ${rows}x$cols")
      // depth is geometry too: an 8-bit head slice + a 16-bit member
      // would otherwise copy half the member's bytes as voxels
      val b = iv(m, "BitsAllocated").getOrElse(8)
      val sg = iv(m, "PixelRepresentation").contains(1)
      require(b == bits && sg == signed,
        s"mixed pixel depth in stack: ${b}bit(signed=$sg) vs " +
          s"${bits}bit(signed=$signed)")
      require(px.length >= sliceBytes,
        s"slice payload ${px.length} < geometry $sliceBytes")
      // trim the even-length pad byte; position the slab explicitly
      System.arraycopy(px, 0, buf.array(), off, sliceBytes)
      off += sliceBytes
    }
    buf.array()
  }

  /** Deterministic gzip member (no name, MTIME = 0 — Java's default):
    * equal input bytes ⇒ equal compressed bytes, which the no-clobber
    * collision compare relies on. */
  def gzipBytes(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(out, 8192)
    gz.write(raw); gz.close()
    out.toByteArray
  }

  def gunzipBytes(gz: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(gz))
    val out = new java.io.ByteArrayOutputStream(gz.length * 2 + 64)
    val chunk = new Array[Byte](8192)
    var n = in.read(chunk)
    while (n > 0) { out.write(chunk, 0, n); n = in.read(chunk) }
    out.toByteArray
  }

  /** The K6 protocol against any Hadoop filesystem: absent → write;
    * identical → skip; different → write under the
    * `duplicate_but_different_` name (Exam_info.py:1000-1025). */
  def writeNoClobberFs(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, name: String,
      content: Array[Byte]): (String, String) = {
    val target = new org.apache.hadoop.fs.Path(dir, name)
    if (!fs.exists(target)) {
      val o = fs.create(target, false)
      try o.write(content) finally o.close()
      (target.toString, "written")
    } else {
      val existing = {
        val in = fs.open(target)
        try {
          val out = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](65536)
          var n = in.read(chunk)
          while (n > 0) { out.write(chunk, 0, n); n = in.read(chunk) }
          out.toByteArray
        } finally in.close()
      }
      if (java.util.Arrays.equals(existing, content))
        (target.toString, "skipped_identical")
      else {
        val dup = new org.apache.hadoop.fs.Path(dir,
          s"duplicate_but_different_$name")
        val o = fs.create(dup, true)
        try o.write(content) finally o.close()
        (dup.toString, "duplicate_but_different")
      }
    }
  }

  private def fsSafe(s: String): String =
    s.replaceAll("[^A-Za-z0-9._-]", "_")

  /** The side JSON the reference writes next to each volume
    * (`dic_param_*.json`, Exam_info.py:1042-1054): the stack's header
    * parameters, keys sorted for byte determinism, values JSON-escaped.
    * Slice-count and instance range are appended so the sidecar alone
    * answers "is this stack complete". */
  def sidecarJson(meta: Map[String, String], nSlices: Int,
      instMin: Int, instMax: Int): Array[Byte] = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val fields = meta.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" } ++
      Seq(s""""_n_slices": "$nSlices"""",
        s""""_instance_min": "$instMin"""",
        s""""_instance_max": "$instMax"""")
    fields.mkString("{", ", ", "}").getBytes(
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Distributed stack conversion: raw (path, content) DICOM bytes →
    * one `.nii.gz` per (series, echo) under `outDir`, returning the
    * manifest. Non-DICOM / pixel-less / truncated files drop here
    * (the reader's skip-malformed stance); mixed-geometry stacks
    * surface as `error:` manifest rows, never a task failure. */
  def writeStacks(binary: DataFrame, outDir: String): Dataset[StackResult] = {
    val spark = binary.sparkSession
    import spark.implicits._
    val conf = new SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    val slices = binary.select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        val r = DicomCodec.parseWithPixels(bytes)
        if (r.pixels == null || !r.complete) Iterator.empty
        else for {
          uid <- r.meta.get("SeriesInstanceUID").iterator
          inst <- r.meta.get("InstanceNumber").flatMap(_.trim.toIntOption)
        } yield NSlice(uid,
          r.meta.get("EchoNumbers").flatMap(_.trim.toIntOption).getOrElse(1),
          inst, r.meta, r.pixels)
      }
    slices.groupByKey(s => (s.seriesUid, s.echo))
      .flatMapGroups { (key: (String, Int), it: Iterator[NSlice]) =>
        val (uid, echo) = key
        // tiebreak duplicate InstanceNumbers by pixel content: a
        // stable sort over shuffle-ARRIVAL order would make the
        // volume bytes run-dependent and flap the no-clobber compare
        // between skipped_identical and duplicate_but_different
        val sorted = it.toArray.sortBy(s =>
          (s.instance, java.util.Arrays.hashCode(s.pixels)))
        val name = s"${fsSafe(uid)}_e$echo.nii.gz"
        try {
          val img = buildNifti(sorted.map(s => (s.meta, s.pixels)).toSeq)
          val dir = new org.apache.hadoop.fs.Path(outDir)
          val fs = dir.getFileSystem(conf.value)
          fs.mkdirs(dir)
          val (file, status) = writeNoClobberFs(fs, dir, name, gzipBytes(img))
          // reference K6 writes the parameter JSON next to the volume
          // (Exam_info.py:1042-1054); same no-clobber discipline
          writeNoClobberFs(fs, dir, s"dic_param_${fsSafe(uid)}_e$echo.json",
            sidecarJson(sorted.head.meta, sorted.length,
              sorted.head.instance, sorted.last.instance))
          Iterator.single(StackResult(uid, echo, sorted.length, file, status))
        } catch {
          case e: IllegalArgumentException =>
            Iterator.single(StackResult(uid, echo, sorted.length, "",
              s"error:${e.getMessage}"))
        }
      }
  }
}
