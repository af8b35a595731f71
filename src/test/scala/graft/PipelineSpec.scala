package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import graft.catalog.Lake
import graft.ingest.DicomLike
import graft.sinks.ActionSink

/** The reference's whole workflow, end to end, on one fixture tree:
  * scan (DSv2, header-only) → stacks/exams → lake MERGE → duplicate
  * maintenance → propose-don't-act script → idempotent re-ingest.
  * This is the "a user of the reference could switch" proof: every
  * stage is the graft module the SURVEY maps to.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def writeDicom(dir: Path, name: String, seriesUid: String,
      instance: Int, expected: Int): Unit =
    Files.write(dir.resolve(name), DicomFixture.simpleFile(
      seriesUid, instance, echo = 1, expected = expected,
      pixelBytes = 256))

  test("ingest → lake merge → maintenance → script → idempotent rerun") {
    val dir = Files.createTempDirectory("graft_pipe")
    // EXAM01: two complete series; EXAM02: one series short of expected
    writeDicom(dir, "a1.dcm", "EXAM01SERA", 1, 2)
    writeDicom(dir, "a2.dcm", "EXAM01SERA", 2, 2)
    writeDicom(dir, "b1.dcm", "EXAM01SERB", 1, 1)
    writeDicom(dir, "c1.dcm", "EXAM02SERC", 1, 2)
    val lake = Files.createTempDirectory("graft_pipe_lake")
      .resolve("serie").toString

    // 1. scan + header-only parse (S5/S6 via the DSv2 source)
    def ingest() = {
      val headers = spark.read.format("dicomlike").load(dir.toString)
        .select("path", "length", "series_uid", "instance_number",
          "echo", "expected_count")
      DicomLike.stacks(headers) // A10/A11
        .select(col("series_uid"), col("echo"), col("n_files"),
          col("expected_count"), col("fsize"), col("corrupt"))
    }

    // 2. first MERGE into the lake (K3)
    val c1 = Lake.mergeWrite(spark, lake, ingest(), "series_uid")
    assert(c1 == Map("inserted" -> 3L))

    // 3. maintenance over the lake table: corrupt findings → K8 script
    val findings = spark.read.parquet(lake)
      .filter(length(col("corrupt")) > 0)
      .select(col("series_uid"), lit("delete").as("action"),
        concat(lit("/lake/"), col("series_uid")).as("target"),
        lit("").as("dest"))
    assert(findings.count() == 1) // EXAM02SERC is short
    val script = ActionSink.shellScript(findings)
      .collect().map(_.getString(0)).toSeq
    assert(script == Seq("rm -rf '/lake/EXAM02SERC'"))

    // 4. re-ingest the same tree: the MERGE is a no-op (the property
    //    the reference approximated with --twice)
    val c2 = Lake.mergeWrite(spark, lake, ingest(), "series_uid")
    assert(c2 == Map("kept" -> 3L))

    // 5. a changed series (file added) surfaces as exactly one update
    writeDicom(dir, "c2.dcm", "EXAM02SERC", 2, 2)
    val c3 = Lake.mergeWrite(spark, lake, ingest(), "series_uid")
    assert(c3 == Map("kept" -> 2L, "updated" -> 1L))
    val healed = spark.read.parquet(lake)
      .filter(col("series_uid") === "EXAM02SERC").head
    assert(healed.getAs[String]("corrupt") == "")
  }
}
