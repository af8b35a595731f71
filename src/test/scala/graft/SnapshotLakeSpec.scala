package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.SnapshotLake

/** Snapshot-lake MVCC contract: commit/read/time-travel, merge history,
  * rollback, vacuum retention, and crash-orphan invisibility. */
class SnapshotLakeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("snaplake").toFile
    d.delete(); d.getAbsolutePath
  }

  private def frame(rows: (Long, String)*) =
    rows.toSeq.toDF("id", "val")

  test("commit assigns increasing versions; read returns the latest; " +
      "time travel returns each version exactly as committed") {
    val root = tmp()
    assert(SnapshotLake.latestVersion(spark, root).isEmpty)
    val v1 = SnapshotLake.commit(spark, root, frame(1L -> "a"))
    val v2 = SnapshotLake.commit(spark, root, frame(1L -> "a", 2L -> "b"))
    assert((v1, v2) == ((1L, 2L)))
    assert(SnapshotLake.read(spark, root).count() == 2)
    assert(SnapshotLake.readVersion(spark, root, 1).count() == 1)
    assert(SnapshotLake.versions(spark, root) == Seq(1L, 2L))
  }

  test("commitMerge keeps history: the pre-merge snapshot still reads " +
      "the old value after an update lands") {
    val root = tmp()
    val (va, ca) = SnapshotLake.commitMerge(spark, root,
      frame(1L -> "old", 2L -> "keep"), "id")
    val (vb, cb) = SnapshotLake.commitMerge(spark, root,
      frame(1L -> "new"), "id")
    assert(ca == Map("inserted" -> 2L))
    assert(cb("updated") == 1L && cb("kept") == 1L)
    val before = SnapshotLake.readVersion(spark, root, va)
      .filter($"id" === 1L).select("val").as[String].head()
    val after = SnapshotLake.readVersion(spark, root, vb)
      .filter($"id" === 1L).select("val").as[String].head()
    assert(before == "old" && after == "new")
  }

  test("commitMerge is idempotent across versions (re-merge = kept)") {
    val root = tmp()
    SnapshotLake.commitMerge(spark, root, frame(1L -> "x"), "id")
    val (_, counts) =
      SnapshotLake.commitMerge(spark, root, frame(1L -> "x"), "id")
    assert(counts == Map("kept" -> 1L))
  }

  test("rollback hides later versions; the next commit supersedes them") {
    val root = tmp()
    SnapshotLake.commit(spark, root, frame(1L -> "v1"))
    SnapshotLake.commit(spark, root, frame(1L -> "v2"))
    SnapshotLake.commit(spark, root, frame(1L -> "v3"))
    SnapshotLake.rollback(spark, root, 1)
    assert(SnapshotLake.latestVersion(spark, root).contains(1L))
    assert(SnapshotLake.read(spark, root)
      .select("val").as[String].head() == "v1")
    intercept[IllegalArgumentException] {
      SnapshotLake.readVersion(spark, root, 3)
    }
    // new commit reuses version 2 and overwrites the rolled-back dir
    val v = SnapshotLake.commit(spark, root, frame(1L -> "v2b"))
    assert(v == 2L)
    assert(SnapshotLake.read(spark, root)
      .select("val").as[String].head() == "v2b")
  }

  test("vacuum enforces retention: old versions unreadable loudly, " +
      "recent ones intact, orphan dirs below latest removed") {
    val root = tmp()
    (1 to 4).foreach(i =>
      SnapshotLake.commit(spark, root, frame(1L -> s"v$i")))
    // crash orphan below latest: a data dir with no commit marker
    frame(9L -> "orphan").write.parquet(s"$root/v=0")
    SnapshotLake.vacuum(spark, root, retain = 2)
    assert(SnapshotLake.versions(spark, root) == Seq(3L, 4L))
    intercept[IllegalArgumentException] {
      SnapshotLake.readVersion(spark, root, 2)
    }
    assert(SnapshotLake.readVersion(spark, root, 3)
      .select("val").as[String].head() == "v3")
    assert(!new java.io.File(s"$root/v=0").exists(),
      "orphan dir survived vacuum")
    assert(!new java.io.File(s"$root/v=1").exists())
  }

  test("streaming capstone: foreachBatch commitMerge gives per-batch " +
      "MVCC history, survives checkpoint resume, and matches batch mode") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tmp()
    val lake = s"$root/lake"
    val in = new java.io.File(s"$root/in"); in.mkdirs()
    val ckpt = s"$root/ckpt"

    def write(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("id", "val").write.parquet(s"$in/$name")
    def runOnce(): Unit = {
      val q = spark.readStream.schema("id bigint, val string")
        .parquet(s"$in/*")
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          SnapshotLake.commitMerge(spark, lake, b, "id"); ()
        }.start()
      q.awaitTermination()
    }

    write("b1", Seq(1L -> "a", 2L -> "b")); runOnce()
    write("b2", Seq(2L -> "b2", 3L -> "c")); runOnce() // resume path

    assert(SnapshotLake.versions(spark, lake) == Seq(1L, 2L),
      "each micro-batch must land as exactly one committed version")
    val v1 = SnapshotLake.readVersion(spark, lake, 1)
      .orderBy("id").as[(Long, String)].collect().toSeq
    val v2 = SnapshotLake.readVersion(spark, lake, 2)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(v1 == Seq(1L -> "a", 2L -> "b"), "time travel to batch 1")
    assert(v2 == Seq(1L -> "a", 2L -> "b2", 3L -> "c"))

    // batch-mode mirror: same two merges, same final state
    val lake2 = s"$root/lake2"
    SnapshotLake.commitMerge(spark, lake2,
      Seq(1L -> "a", 2L -> "b").toDF("id", "val"), "id")
    SnapshotLake.commitMerge(spark, lake2,
      Seq(2L -> "b2", 3L -> "c").toDF("id", "val"), "id")
    val mirror = SnapshotLake.read(spark, lake2)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(mirror == v2, "stream and batch lake states diverged")
  }

  test("a crashed writer's uncommitted dir is invisible to readers and " +
      "overwritten by the next commit") {
    val root = tmp()
    SnapshotLake.commit(spark, root, frame(1L -> "good"))
    // simulate: writer wrote v=2 data but died before the marker
    frame(1L -> "torn").write.parquet(s"$root/v=2")
    assert(SnapshotLake.latestVersion(spark, root).contains(1L))
    assert(SnapshotLake.read(spark, root)
      .select("val").as[String].head() == "good")
    val v = SnapshotLake.commit(spark, root, frame(1L -> "next"))
    assert(v == 2L)
    assert(SnapshotLake.readVersion(spark, root, 2)
      .select("val").as[String].head() == "next")
  }
}
