package graft

import graft.DicomFixture._
import graft.sinks.NiftiSink
import org.scalatest.funsuite.AnyFunSuite

/** NIfTI-1 voxel sink (convert_series, Exam_info.py:962-1057): the
  * header is decoded back by an independent in-test reader against the
  * public nifti1.h layout — dims, datatype, pixdim, sform affine
  * (LPS→RAS), magic — and the voxel block must be the instance-ordered
  * slice payloads. The distributed writer is exercised end-to-end with
  * the K6 no-clobber protocol. */
class NiftiSinkSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def us(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  /** One geometry-complete slice dataset: 3×4 8-bit, spacing
    * (dy=2.5, dx=1.5), rows along +y, columns along -z, slice step
    * +2 mm along x per instance. */
  private def sliceDs(series: String, instance: Int, echo: Int = 1)
      : Array[Byte] =
    elS(0x0008, 0x0060, "CS", "MR") ++
      elS(0x0018, 0x0050, "DS", "7") ++
      elS(0x0018, 0x0086, "IS", echo.toString) ++
      elS(0x0020, 0x000E, "UI", series) ++
      elS(0x0020, 0x0013, "IS", instance.toString) ++
      elS(0x0020, 0x0032, "DS", s"${10 + 2 * (instance - 1)}\\20\\30") ++
      elS(0x0020, 0x0037, "DS", "0\\1\\0\\0\\0\\-1") ++
      el(0x0028, 0x0010, "US", us(3)) ++
      el(0x0028, 0x0011, "US", us(4)) ++
      elS(0x0028, 0x0030, "DS", "2.5\\1.5") ++
      el(0x0028, 0x0100, "US", us(8)) ++
      el(0x0028, 0x0103, "US", us(0))

  private def vox(instance: Int): Array[Byte] =
    (0 until 12).map(i => (instance * 31 + i).toByte).toArray

  private def meta(instance: Int): Map[String, String] =
    ingest.DicomCodec.parse(file(sliceDs("S1", instance))).meta

  // independent header reader (nifti1.h offsets)
  private class Hdr(img: Array[Byte]) {
    private val b = java.nio.ByteBuffer.wrap(img)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def int(o: Int): Int = b.getInt(o)
    def short(o: Int): Int = b.getShort(o).toInt
    def float(o: Int): Float = b.getFloat(o)
    def magic: String = new String(img.slice(344, 347), "US-ASCII")
    def row(o: Int): Seq[Float] = (0 until 4).map(i => float(o + 4 * i))
  }

  test("header fields and affine decode back per nifti1.h") {
    val img = NiftiSink.buildNifti(
      (1 to 3).map(i => (meta(i), vox(i))))
    val h = new Hdr(img)
    assert(h.int(0) == 348 && h.magic == "n+1")
    assert(h.short(40) == 3) // ndim
    assert((h.short(42), h.short(44), h.short(46)) == ((4, 3, 3))) // nx,ny,nz
    assert(h.short(70) == 2 && h.short(72) == 8) // DT_UINT8
    assert(h.float(108) == 352.0f) // vox_offset
    assert((h.float(80), h.float(84), h.float(88)) == ((1.5f, 2.5f, 2.0f)))
    // LPS→RAS affine: rowDir=(0,1,0)*1.5, colDir=(0,0,-1)*2.5,
    // sliceDir=(1,0,0)*2, origin (10,20,30) → negate x/y world rows
    assert(h.row(280) == Seq(0f, 0f, -2f, -10f))   // srow_x
    assert(h.row(296) == Seq(-1.5f, 0f, 0f, -20f)) // srow_y
    assert(h.row(312) == Seq(0f, -2.5f, 0f, 30f))  // srow_z
    // voxel block = instance-ordered slices
    assert(img.drop(352).toSeq == (1 to 3).flatMap(i => vox(i).toSeq))
  }

  test("single-slice stack falls back to normal x SliceThickness") {
    val img = NiftiSink.buildNifti(Seq((meta(1), vox(1))))
    val h = new Hdr(img)
    assert(h.short(46) == 1)
    assert(h.float(88) == 7.0f) // dz = SliceThickness
    // sliceDir = rowDir x colDir = (0,1,0)x(0,0,-1) = (-1,0,0); *7, RAS
    // negates x → srow_x z-col = +7
    assert(h.row(280)(2) == 7.0f)
  }

  test("16-bit signed maps to DT_INT16; mixed geometry fails loud") {
    val m16 = meta(1) ++ Map("BitsAllocated" -> "16",
      "PixelRepresentation" -> "1")
    val img = NiftiSink.buildNifti(
      Seq((m16, Array.fill[Byte](24)(1))))
    val h = new Hdr(img)
    assert(h.short(70) == 4 && h.short(72) == 16)
    val bad = meta(2) + ("Rows" -> "5")
    val e = intercept[IllegalArgumentException] {
      NiftiSink.buildNifti(Seq((meta(1), vox(1)), (bad, vox(2))))
    }
    assert(e.getMessage.contains("mixed geometry"))
    // depth is geometry too: an 8-bit head + 16-bit member must fail,
    // not write half the member's bytes as voxels
    val deep = meta(2) + ("BitsAllocated" -> "16")
    val e2 = intercept[IllegalArgumentException] {
      NiftiSink.buildNifti(
        Seq((meta(1), vox(1)), (deep, Array.fill[Byte](24)(1))))
    }
    assert(e2.getMessage.contains("mixed pixel depth"))
  }

  test("oversized geometry fails the Long guard, not Int overflow") {
    val huge = meta(1) ++ Map("Rows" -> "65535", "Columns" -> "65535",
      "BitsAllocated" -> "16")
    val e = intercept[IllegalArgumentException] {
      NiftiSink.buildNifti(Seq((huge, Array.fill[Byte](16)(0))))
    }
    assert(e.getMessage.contains("stack too large"))
  }

  test("fuzz: random geometries round-trip through the header layout") {
    val rnd = new scala.util.Random(1234)
    (1 to 50).foreach { _ =>
      val (r, c) = (1 + rnd.nextInt(32), 1 + rnd.nextInt(32))
      val nz = 1 + rnd.nextInt(5)
      val bits16 = rnd.nextBoolean()
      val bpp = if (bits16) 2 else 1
      val (dy, dx, step) = (0.5 + rnd.nextInt(40) / 10.0,
        0.5 + rnd.nextInt(40) / 10.0, 0.5 + rnd.nextInt(60) / 10.0)
      val slices = (1 to nz).map { i =>
        val m = Map("Rows" -> r.toString, "Columns" -> c.toString,
          "BitsAllocated" -> (bpp * 8).toString,
          "PixelRepresentation" -> (if (bits16) "1" else "0"),
          "PixelSpacing" -> s"$dy\\$dx",
          "ImageOrientationPatient" -> "1\\0\\0\\0\\1\\0",
          "ImagePositionPatient" -> s"0\\0\\${step * (i - 1)}",
          "SliceThickness" -> step.toString)
        val px = new Array[Byte](r * c * bpp)
        rnd.nextBytes(px)
        (m, px)
      }
      val img = NiftiSink.buildNifti(slices)
      val h = new Hdr(img)
      assert((h.short(42), h.short(44), h.short(46)) == ((c, r, nz)))
      assert(h.short(72) == bpp * 8)
      assert(h.float(80) == dx.toFloat && h.float(84) == dy.toFloat)
      // z step recovers from positions when nz > 1, thickness when 1
      assert(math.abs(h.float(88) - step.toFloat) < 1e-4f)
      assert(img.length == 352 + r * c * bpp * nz)
      assert(img.drop(352).toSeq == slices.flatMap(_._2.toSeq))
    }
  }

  test("duplicate InstanceNumbers stack deterministically (content tiebreak)") {
    import spark.implicits._
    // the DUP corruption shape: two distinct slices both claim
    // instance 2 — whichever arrival order the shuffle produces, the
    // written volume must be byte-identical (else a re-conversion of
    // unchanged data lands as duplicate_but_different)
    val dupA = (s"SD.a", file(sliceDs("SD", 2), pixel = vox(7)))
    val dupB = (s"SD.b", file(sliceDs("SD", 2), pixel = vox(9)))
    val first = (s"SD.1", file(sliceDs("SD", 1), pixel = vox(1)))
    val o1 = java.nio.file.Files.createTempDirectory("nifti_dup1")
    val o2 = java.nio.file.Files.createTempDirectory("nifti_dup2")
    NiftiSink.writeStacks(
      Seq(first, dupA, dupB).toDF("path", "content"), o1.toString)
      .collect()
    NiftiSink.writeStacks(
      Seq(dupB, first, dupA).toDF("path", "content"), o2.toString)
      .collect()
    val (b1, b2) = (
      java.nio.file.Files.readAllBytes(o1.resolve("SD_e1.nii.gz")),
      java.nio.file.Files.readAllBytes(o2.resolve("SD_e1.nii.gz")))
    assert(java.util.Arrays.equals(b1, b2))
  }

  test("gzip member is deterministic and round-trips") {
    val img = NiftiSink.buildNifti(Seq((meta(1), vox(1))))
    val (a, b) = (NiftiSink.gzipBytes(img), NiftiSink.gzipBytes(img))
    assert(a.toSeq == b.toSeq)
    assert(NiftiSink.gunzipBytes(a).toSeq == img.toSeq)
  }

  test("writeStacks converts per (series, echo) under no-clobber") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("nifti_sink")
    def files(series: String, n: Int, echo: Int = 1, flip: Boolean = false) =
      (1 to n).map { i =>
        val px = vox(i)
        if (flip) px(0) = (px(0) ^ 1).toByte
        (s"$series.$i", file(sliceDs(series, i, echo), pixel = px))
      }
    val df = (files("SA", 3) ++ files("SB", 2, echo = 2))
      .toDF("path", "content")
    val m1 = NiftiSink.writeStacks(df, out.toString).collect()
      .sortBy(r => (r.series_uid, r.echo))
    assert(m1.map(r => (r.series_uid, r.echo, r.n_slices, r.status)).toSeq ==
      Seq(("SA", 1, 3, "written"), ("SB", 2, 2, "written")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(out.toString, "SA_e1.nii.gz")))
    // sidecar JSON (dic_param_*.json) parses and carries the stack meta
    val sj = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out.toString, "dic_param_SA_e1.json")),
      "UTF-8")
    assert(sj.contains("\"SeriesInstanceUID\": \"SA\"") &&
      sj.contains("\"_n_slices\": \"3\"") &&
      sj.contains("\"_instance_max\": \"3\""))
    // decoded volume matches a driver-side build of the same stack
    val viaFile = NiftiSink.gunzipBytes(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out.toString, "SA_e1.nii.gz")))
    val direct = NiftiSink.buildNifti(
      (1 to 3).map(i => (meta(i), vox(i))))
    assert(viaFile.toSeq == direct.toSeq)
    // rerun: identical content skips
    val m2 = NiftiSink.writeStacks(df, out.toString).collect()
    assert(m2.map(_.status).toSet == Set("skipped_identical"))
    // a voxel flip on re-conversion lands as duplicate_but_different
    val m3 = NiftiSink.writeStacks(
      files("SA", 3, flip = true).toDF("path", "content"),
      out.toString).collect()
    assert(m3.head.status == "duplicate_but_different")
    assert(m3.head.file.contains("duplicate_but_different_SA_e1.nii.gz"))
  }
}
