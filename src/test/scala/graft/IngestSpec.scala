package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import graft.ingest.DicomLike
import graft.sources.FileScans

/** End-to-end binary ingest over REAL explicit-VR DICOM files (written
  * by DicomFixture, parsed by DicomCodec): binaryFile source → sniff →
  * header parse → stacks → exams, with the corrupt-flag branches
  * exercised (bad count, instance gap, non-DICOM junk filtered by the
  * sniff). */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** series_uid: exam uid = first 6 chars (the fixture's exam key). */
  private def writeDicom(dir: Path, name: String, seriesUid: String,
      instance: Int, echo: Int, expected: Int): Unit =
    Files.write(dir.resolve(name),
      DicomFixture.simpleFile(seriesUid, instance, echo, expected))

  test("sniff → parse → stacks → exams over fixture files") {
    val dir = Files.createTempDirectory("graft_ingest")
    // exam EXAM01: series A complete (3 files), series B bad count
    writeDicom(dir, "a1.dcm", "EXAM01SERA", 1, 1, 3)
    writeDicom(dir, "a2.dcm", "EXAM01SERA", 2, 1, 3)
    writeDicom(dir, "a3.dcm", "EXAM01SERA", 3, 1, 3)
    writeDicom(dir, "b1.dcm", "EXAM01SERB", 1, 1, 3)
    writeDicom(dir, "b2.dcm", "EXAM01SERB", 2, 1, 3)
    // exam EXAM02: instance gap (1,3) with expected 2 → GAP only
    writeDicom(dir, "c1.dcm", "EXAM02SERC", 1, 2, 2)
    writeDicom(dir, "c3.dcm", "EXAM02SERC", 3, 2, 2)
    // junk without magic → dropped by sniff
    Files.write(dir.resolve("junk.dcm"), "not a dicom at all".getBytes)

    val bin = FileScans.binaryContent(spark, dir.toString, "*.dcm")
    val headers = DicomLike.parseHeaders(bin)
    assert(headers.count() == 7) // junk sniffed out

    val stacks = DicomLike.stacks(headers).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getString(10).trim))
      .sortBy(_._1)
    assert(stacks.toSeq == Seq(
      ("EXAM01SERA", 3L, ""),
      ("EXAM01SERB", 2L, "BAD_COUNT"),
      ("EXAM02SERC", 2L, "GAP")))

    val exams = DicomLike.exams(DicomLike.stacks(headers))
      .orderBy("exam_uid").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(5)))
    assert(exams.toSeq == Seq(("EXAM01", 2L, true), ("EXAM02", 1L, true)))
  }

  test("pixel bytes beyond the header never affect results") {
    val dir = Files.createTempDirectory("graft_ingest2")
    writeDicom(dir, "x1.dcm", "EXAM09SERX", 1, 1, 1)
    val n = DicomLike.stacks(DicomLike.parseHeaders(
      FileScans.binaryContent(spark, dir.toString, "*.dcm"))).count()
    assert(n == 1)
  }

  test("seriesInfo extracts the reference's dicinfo fields end-to-end " +
      "from real bytes") {
    val dir = Files.createTempDirectory("graft_ingest_info")
    val csaImage = DicomFixture.csaBlob(Seq(
      "PixelSpacing" -> Seq("1.25", "1.25"),
      "SliceThickness" -> Seq("3.0"),
      "PhaseEncodingDirection" -> Seq("COL"),
      "PhaseEncodingDirectionPositive" -> Seq("1"),
      "ImaCoilString" -> Seq("HEA;HEP")))
    val csaSeries = DicomFixture.csaBlob(Seq(
      "MrPhoenixProtocol" -> Seq(DicomFixture.ascconv(Seq(
        "tSequenceFileName" -> "\"%SiemensSeq%\\gre_2D\"",
        "sSliceArray.asSlice[0].sPosition.dTra" -> "-10.0",
        "sSliceArray.asSlice[0].sPosition.dSag" -> "0.0",
        "sSliceArray.asSlice[0].sPosition.dCor" -> "0.0",
        "sSliceArray.asSlice[1].sPosition.dTra" -> "-6.0",
        "sSliceArray.asSlice[1].sPosition.dSag" -> "0.0",
        "sSliceArray.asSlice[1].sPosition.dCor" -> "0.0",
        "lTotalScanTimeSec" -> "302")))))
    val body =
      DicomFixture.elS(0x0020, 0x000E, "UI", "EXAM11SERQ") ++
        DicomFixture.elS(0x0008, 0x0022, "DA", "20240115") ++
        DicomFixture.elS(0x0008, 0x0032, "TM", "101530.25") ++
        DicomFixture.elS(0x0008, 0x0020, "DA", "20240115") ++
        DicomFixture.elS(0x0008, 0x0030, "TM", "100000") ++
        DicomFixture.elS(0x0008, 0x0070, "LO", "SIEMENS") ++
        DicomFixture.elS(0x0008, 0x1090, "LO", "Prisma_fit") ++
        DicomFixture.elS(0x0008, 0x1030, "LO", "PROTO_MYSTUDY") ++
        DicomFixture.elS(0x0018, 0x0024, "SH", "ep_b1000#4") ++
        DicomFixture.elS(0x0018, 0x0080, "DS", "2500") ++
        DicomFixture.elS(0x0018, 0x0081, "DS", "30.5") ++
        DicomFixture.elS(0x0018, 0x0082, "DS", "900") ++
        DicomFixture.el(0x0029, 0x1010, "OB", csaImage) ++
        DicomFixture.el(0x0029, 0x1020, "OB", csaSeries)
    Files.write(dir.resolve("s.dcm"),
      DicomFixture.file(body, pixel = Array.fill[Byte](1024)(3)))

    val info = DicomLike.seriesInfo(DicomLike.parseMeta(
      FileScans.binaryContent(spark, dir.toString, "*.dcm"))).head()
    assert(info.getAs[String]("series_uid") == "EXAM11SERQ")
    assert(info.getAs[java.sql.Timestamp]("acq_time").toString
      .startsWith("2024-01-15 10:15:30"))
    assert(info.getAs[String]("seq_name") == "ep_b1000#4")
    assert(info.getAs[String]("seq_type") == "DWI")
    assert(info.getAs[Double]("tr") == 2500.0)
    assert(info.getAs[Double]("te") == 30.5)
    assert(info.getAs[Int]("ti") == 900)
    assert(info.getAs[Double]("size_x") == 1.25)
    assert(info.getAs[Double]("size_z") == 3.0)
    // ‖(-6)-(-10)‖ − 3.0 = 1.0 gap
    assert(math.abs(info.getAs[Double]("slice_gap") - 1.0) < 1e-9)
    assert(info.getAs[String]("phase_dir") == "COL+")
    assert(info.getAs[String]("coil_name") == "HEA;HEP")
    assert(info.getAs[String]("machine_name") == "Prisma_fit")
    assert(info.getAs[String]("exam_name") == "PROTO_MYSTUDY")
    assert(info.getAs[Int]("duration_sec") == 302)
  }

  test("parseMeta surfaces the full keyword map incl. CSA dotted keys") {
    val dir = Files.createTempDirectory("graft_ingest3")
    val csaImage = DicomFixture.csaBlob(Seq(
      "PixelSpacing" -> Seq("1.25", "1.25"),
      "SliceThickness" -> Seq("3.0"),
      "PhaseEncodingDirection" -> Seq("COL")))
    val body =
      DicomFixture.elS(0x0020, 0x000E, "UI", "EXAM05SERZ") ++
        DicomFixture.elS(0x0020, 0x0013, "IS", "1") ++
        DicomFixture.elS(0x0008, 0x0070, "LO", "SIEMENS") ++
        DicomFixture.el(0x0029, 0x1010, "OB", csaImage)
    Files.write(dir.resolve("m.dcm"),
      DicomFixture.file(body, pixel = Array.fill[Byte](512)(1)))
    val meta = DicomLike.parseMeta(
        FileScans.binaryContent(spark, dir.toString, "*.dcm"))
      .selectExpr("meta['Manufacturer']", "meta['CsaImage.PixelSpacing']",
        "meta['CsaImage.SliceThickness']")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(meta.toSeq == Seq(("SIEMENS", "1.25\\1.25", "3.0")))
  }
}
