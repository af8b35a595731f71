package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.catalog.Lake
import graft.ingest.TypedPipeline
import graft.ingest.TypedPipeline.{Exam, Serie}
import graft.operators.MultimodalOps

/** Typed nested pipeline, partitioned-lake pruning, batch decode. */
class TypedPipelineSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private val exams = Seq(
    Exam("E1", "Verio", ts("2024-01-01 09:00:00"), Seq(
      Serie("S1b", 2, "tfl3d1", 176, 300),
      Serie("S1a", 1, "ep_b1000", 60, 600))),
    Exam("E2", "Prisma_fit", ts("2024-01-02 10:00:00"), Seq(
      Serie("S2a", 1, "epfid2d", 300, 59))))

  test("nested -> flat -> nested round-trips with ordered series") {
    import spark.implicits._
    val ds = exams.toDS()
    val flat = TypedPipeline.toSerieTable(ds)
    assert(flat.count() == 3)
    val meta = ds.map(e => (e.euid, e.machine, e.acquired))
    val back = TypedPipeline.toNested(flat, meta)
      .collect().sortBy(_.euid)
    assert(back.length == 2)
    // series come back sorted by snumber regardless of input order
    assert(back.head.series.map(_.suid) == Seq("S1a", "S1b"))
  }

  test("typed duration: sum + ceil minutes") {
    import spark.implicits._
    val durs = TypedPipeline.withDurations(exams.toDS())
      .collect().toMap
    assert(durs == Map("E1" -> 15L, "E2" -> 1L)) // (900+59)/60, (59+59)/60
  }

  test("partitioned lake write prunes partitions on date filter") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_part").resolve("ev").toString
    val df = Tables.load(spark, "/root/testdata/sf0.001", "events")
    Lake.writePartitionedByDay(df, "ts", path)
    val pruned = spark.read.parquet(path)
      .filter(col("part_date") === "2024-01-03")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(part_date"),
      s"no partition filter in:\n${plan.take(1500)}")
    val full = spark.read.parquet(path).count()
    assert(pruned.count() > 0 && pruned.count() < full)
  }

  test("batch decode: per-partition decoder over binary payloads") {
    import spark.implicits._
    val payloads = Seq(
      (1L, Array[Byte](10, 20, 99, 99)),
      (2L, Array[Byte](63, 0)),
      (3L, Array.empty[Byte])).toDS()
    val got = MultimodalOps.decodeBatch(payloads)
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 11, 21, 4L), (2L, 64, 1, 2L), (3L, 0, 0, 0L)))
  }
}
