package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.DicomLike
import graft.sources.FileScans
import java.nio.file.Files

/** P4 derived-series skip branches + S13 results-file source. */
class DerivedFilterSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("P4: derived markers dropped, mp2rage kept, GE never shortened") {
    val rows = Seq(
      ("ORIGINAL_PRIMARY_M", "Siemens", true),           // plain original
      ("DERIVED_OTHER_ADC", "Siemens", false),           // derived map
      ("DERIVED_SECONDARY_TENSOR", "Siemens", false),    // tensor
      ("DERIVED_PRIMARY_UNI", "Siemens", true),          // mp2rage exception
      ("DERIVED_OTHER_ADC", "GE MEDICAL SYSTEMS", true), // GE exempt
      ("ORIGINAL_TRACEW", "Siemens", false),             // tracew
      ("ORIGINAL_MOCO", "Siemens", false))               // moco
    val df = rows.map(r => (r._1, r._2)).toDF("image_type", "manufacturer")
    val kept = DicomLike.skipDerivedSeries(df)
      .select("image_type", "manufacturer").as[(String, String)]
      .collect().toSet
    val want = rows.filter(_._3).map(r => (r._1, r._2)).toSet
    assert(kept == want)
  }

  test("S13: seg8 result files parse first tab-separated line") {
    val root = Files.createTempDirectory("graft_seg8")
    val sub = root.resolve("PROTO/subj/ser/vbm8")
    Files.createDirectories(sub)
    Files.write(sub.resolve("r_seg8.txt"),
      "0.61\t0.42\t0.23\nsecond line ignored\n".getBytes)
    Files.write(sub.resolve("notes.txt"), "not a result\n".getBytes)
    val got = FileScans.readSeg8(spark, root.toString).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0).endsWith("r_seg8.txt"))
    assert((r.getDouble(1), r.getDouble(2), r.getDouble(3)) == (0.61, 0.42, 0.23))
  }
}
