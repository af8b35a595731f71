package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import graft.ingest.DicomLike
import graft.sources.FileScans

/** End-to-end binary ingest: synthetic DICOM-shaped fixtures on disk →
  * binaryFile source → sniff → header parse → stacks → exams, with the
  * corrupt-flag branches exercised (bad count, instance gap, non-DICOM
  * junk filtered by the sniff). */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** series_uid must be 10 ASCII bytes, exam uid = first 6. */
  private def writeDicom(dir: Path, name: String, seriesUid: String,
      instance: Int, echo: String, expected: Int): Unit = {
    val header = new Array[Byte](128) ++ "DICM".getBytes ++
      seriesUid.getBytes ++ f"$instance%04d".getBytes ++
      echo.padTo(4, ' ').getBytes ++ f"$expected%04d".getBytes ++
      "PIXELDATA-NOT-TO-BE-READ".getBytes
    Files.write(dir.resolve(name), header)
  }

  test("sniff → parse → stacks → exams over fixture files") {
    val dir = Files.createTempDirectory("graft_ingest")
    // exam EXAM01: series A complete (3 files), series B bad count
    writeDicom(dir, "a1.dcm", "EXAM01SERA", 1, "E1 ", 3)
    writeDicom(dir, "a2.dcm", "EXAM01SERA", 2, "E1 ", 3)
    writeDicom(dir, "a3.dcm", "EXAM01SERA", 3, "E1 ", 3)
    writeDicom(dir, "b1.dcm", "EXAM01SERB", 1, "E1 ", 3)
    writeDicom(dir, "b2.dcm", "EXAM01SERB", 2, "E1 ", 3)
    // exam EXAM02: instance gap (1,3) with expected 2 → GAP only
    writeDicom(dir, "c1.dcm", "EXAM02SERC", 1, "E2 ", 2)
    writeDicom(dir, "c3.dcm", "EXAM02SERC", 3, "E2 ", 2)
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
    writeDicom(dir, "x1.dcm", "EXAM09SERX", 1, "E1 ", 1)
    val n = DicomLike.stacks(DicomLike.parseHeaders(
      FileScans.binaryContent(spark, dir.toString, "*.dcm"))).count()
    assert(n == 1)
  }
}
