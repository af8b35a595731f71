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
