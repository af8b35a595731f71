package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import graft.sources.dicomlike.{BytesReadCounter, DicomLikeSource}

/** DataSource V2 with header-only projection pushdown: reading metadata
  * columns must not read payload bytes (files are real explicit-VR
  * DICOM; the reader parses them with DicomCodec). */
class DicomSourceSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def writeDicom(dir: Path, name: String, seriesUid: String,
      instance: Int, payloadKb: Int): Unit =
    Files.write(dir.resolve(name), DicomFixture.simpleFile(
      seriesUid, instance, echo = 1, expected = 3,
      pixelBytes = payloadKb * 1024))

  private def mkFixture(): Path = {
    val dir = Files.createTempDirectory("graft_dsv2")
    writeDicom(dir, "a1.dcm", "EXAM01SERA", 1, 64)
    writeDicom(dir, "a2.dcm", "EXAM01SERA", 2, 64)
    writeDicom(dir, "b1.dcm", "EXAM01SERB", 1, 64)
    Files.write(dir.resolve("junk.txt"), "not dicom".getBytes)
    dir
  }

  test("metadata-only projection reads headers, not payloads") {
    val dir = mkFixture()
    val df = spark.read.format("dicomlike")
      .load(dir.toString)

    BytesReadCounter.reset()
    val metas = df.select("series_uid", "instance_number", "length")
      .collect()
    val headerOnlyBytes = BytesReadCounter.bytes.get()
    assert(metas.length == 3)
    // 3 files × one initial 4 KB window (+ the 9-byte junk probe),
    // far below the 64 KB payloads
    assert(headerOnlyBytes <= 3L * DicomLikeSource.InitialHeaderRead + 64,
      s"pruned read still pulled $headerOnlyBytes bytes")

    BytesReadCounter.reset()
    val full = df.select("series_uid", "content").collect()
    val fullBytes = BytesReadCounter.bytes.get()
    assert(full.length == 3)
    assert(full.forall(_.getAs[Array[Byte]]("content").length > 64 * 1024))
    assert(fullBytes > 3L * 64 * 1024, s"full read only $fullBytes bytes")
  }

  test("scan schema is pruned to the required columns") {
    val dir = mkFixture()
    val pruned = spark.read.format("dicomlike")
      .load(dir.toString).select("series_uid")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("series_uid") && !plan.contains("content"),
      s"scan not pruned:\n${plan.take(1200)}")
  }

  test("1k tiny files pack into few size-targeted partitions") {
    val dir = Files.createTempDirectory("graft_dsv2_pack")
    val sub = dir.resolve("nested")
    Files.createDirectory(sub)
    (1 to 1000).foreach { i =>
      val d = if (i % 2 == 0) dir else sub
      writeDicom(d, f"f$i%04d.dcm", f"EXAM01S$i%03d", i % 100, 0)
    }
    val df = spark.read.format("dicomlike").load(dir.toString)
      .select("series_uid", "instance_number")
    // 1000 files × 4 MiB open cost / 128 MiB target = ~32 partitions,
    // never one task per file
    val nParts = df.rdd.getNumPartitions
    assert(nParts <= 32, s"expected packed partitions, got $nParts")
    BytesReadCounter.reset()
    assert(df.count() == 1000)
    // header-only even through the multi-file reader
    assert(BytesReadCounter.bytes.get() <=
      1000L * DicomLikeSource.InitialHeaderRead)
  }

  test("malformed header digits skip the file, not the scan") {
    val dir = Files.createTempDirectory("graft_dsv2_bad")
    writeDicom(dir, "good.dcm", "EXAM01SERA", 1, 1)
    // passes the DICM sniff but has junk where the IS digits belong
    val bad = DicomFixture.file(
      DicomFixture.elS(0x0020, 0x000E, "UI", "EXAM01SERB") ++
        DicomFixture.elS(0x0020, 0x0013, "IS", "XXXX") ++
        DicomFixture.elS(0x0020, 0x1002, "IS", "YYYY"))
    Files.write(dir.resolve("bad.dcm"), bad)
    val rows = spark.read.format("dicomlike").load(dir.toString)
      .select("series_uid", "instance_number").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("EXAM01SERA"))
  }

  test("header straddling the initial window triggers a grown re-read") {
    val dir = Files.createTempDirectory("graft_dsv2_fat")
    // a CSA blob larger than the 4 KB initial window pushes the
    // stack-grouping tags past it: the reader must retry with a
    // bigger prefix and still parse, reading far less than the payload
    val fat = DicomFixture.csaBlob(
      (1 to 200).map(i => s"Tag$i" -> Seq("x" * 60)))
    assert(fat.length > DicomLikeSource.InitialHeaderRead)
    val body =
      DicomFixture.el(0x0029, 0x1020, "OB", fat) ++
        DicomFixture.elS(0x0020, 0x000E, "UI", "EXAM07SERF") ++
        DicomFixture.elS(0x0020, 0x0013, "IS", "1") ++
        DicomFixture.elS(0x0020, 0x1002, "IS", "1")
    Files.write(dir.resolve("fat.dcm"), DicomFixture.file(body,
      pixel = Array.fill[Byte](1024 * 1024)(9)))
    BytesReadCounter.reset()
    val rows = spark.read.format("dicomlike").load(dir.toString)
      .select("series_uid", "instance_number").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("EXAM07SERF"))
    val read = BytesReadCounter.bytes.get()
    assert(read > DicomLikeSource.InitialHeaderRead &&
      read < 256 * 1024, s"grown header read pulled $read bytes")
  }

  test("mtime pushdown prunes the listing: old files are never opened") {
    val dir = Files.createTempDirectory("graft_dsv2_mtime")
    (1 to 8).foreach(i =>
      writeDicom(dir, f"old$i.dcm", f"EXAM02OLD$i", i, 16))
    (1 to 2).foreach(i =>
      writeDicom(dir, f"new$i.dcm", f"EXAM02NEW$i", i, 16))
    val cut = 1700000000000L // 2023-11-14; arbitrary fixed epoch
    (1 to 8).foreach(i => assert(
      dir.resolve(s"old$i.dcm").toFile.setLastModified(cut - 86400000L)))
    (1 to 2).foreach(i => assert(
      dir.resolve(s"new$i.dcm").toFile.setLastModified(cut + 86400000L)))
    val df = spark.read.format("dicomlike").load(dir.toString)
      .filter(org.apache.spark.sql.functions.col("mtime") >=
        new java.sql.Timestamp(cut))
      .select("series_uid", "mtime")
    // the --days mode: only the 2 young files may be opened at all —
    // row-level filtering alone would still read all 10 headers
    BytesReadCounter.reset()
    val rows = df.collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("EXAM02NEW1", "EXAM02NEW2"))
    assert(BytesReadCounter.bytes.get() <=
      2L * DicomLikeSource.InitialHeaderRead,
      s"pruned scan still read ${BytesReadCounter.bytes.get()} bytes " +
        "— mtime filter did not reach the listing")
    // and the plan advertises the pushdown for audits
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("mtime"),
      s"pushdown not visible in plan:\n${plan.take(1200)}")
  }

  test("path-prefix pushdown skips whole subtrees at listing time") {
    val dir = Files.createTempDirectory("graft_dsv2_prefix")
    val subA = dir.resolve("examA"); Files.createDirectory(subA)
    val subB = dir.resolve("examB"); Files.createDirectory(subB)
    (1 to 5).foreach(i => writeDicom(subA, s"a$i.dcm", s"EXAM03A$i", i, 16))
    (1 to 5).foreach(i => writeDicom(subB, s"b$i.dcm", s"EXAM03B$i", i, 16))
    val prefix = s"file:$subA"
    val df = spark.read.format("dicomlike").load(dir.toString)
      .filter(org.apache.spark.sql.functions.col("path").startsWith(prefix))
      .select("series_uid", "path")
    BytesReadCounter.reset()
    val rows = df.collect()
    assert(rows.length == 5 &&
      rows.forall(_.getString(1).startsWith(prefix)))
    assert(BytesReadCounter.bytes.get() <=
      5L * DicomLikeSource.InitialHeaderRead,
      "examB files were opened despite the path-prefix pushdown")
  }

  test("planning-time filter evaluation matches predicate semantics") {
    import org.apache.spark.sql.sources._
    import DicomLikeSource.{keeps, prunable}
    val ts = new java.sql.Timestamp(5000L)
    assert(prunable(GreaterThanOrEqual("mtime", ts)))
    assert(prunable(And(StringStartsWith("path", "/a"),
      LessThan("length", 10L))))
    // header-derived columns can never prune the listing
    assert(!prunable(EqualTo("series_uid", "X")))
    assert(keeps(GreaterThanOrEqual("mtime", ts), "/p", 1L, 5000L))
    assert(!keeps(GreaterThanOrEqual("mtime", ts), "/p", 1L, 4999L))
    assert(keeps(GreaterThanOrEqual("mtime",
      java.time.Instant.ofEpochMilli(5000L)), "/p", 1L, 5000L))
    // Lt stays conservative under the milli-floor of the literal: a
    // file AT the floored millisecond may still satisfy mtime < v when
    // v carries sub-millisecond digits the floor dropped
    assert(keeps(LessThan("mtime", ts), "/p", 1L, 5000L))
    assert(!keeps(LessThan("mtime", ts), "/p", 1L, 5001L))
    assert(keeps(StringStartsWith("path", "/a/b"), "/a/b/c.dcm", 1L, 0L))
    assert(!keeps(StringStartsWith("path", "/a/b"), "/a/c/c.dcm", 1L, 0L))
    // subtree skip: ancestor dirs of the prefix AND dirs under it match
    assert(DicomLikeSource.dirMayMatch("/a", "/a/b/c"))
    assert(DicomLikeSource.dirMayMatch("/a/b/c/d", "/a/b/c"))
    assert(!DicomLikeSource.dirMayMatch("/x", "/a/b/c"))
  }

  test("source feeds the ingest aggregates end-to-end") {
    val dir = mkFixture()
    val headers = spark.read.format("dicomlike")
      .load(dir.toString)
      .select("path", "length", "series_uid", "instance_number",
        "echo", "expected_count")
    val stacks = graft.ingest.DicomLike.stacks(headers)
      .collect().map(r => (r.getString(0), r.getLong(2))).sortBy(_._1)
    assert(stacks.toSeq == Seq(("EXAM01SERA", 2L), ("EXAM01SERB", 1L)))
  }
}
