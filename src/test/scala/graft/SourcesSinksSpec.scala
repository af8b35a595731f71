package graft

import graft.sources.ExcelSource

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import graft.sources.FileScans
import graft.sinks.ActionSink

/** File-manifest sources (S1-S4, S9) and propose-don't-act sinks
  * (K8, K9) against real temp directories. */
class SourcesSinksSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def mkTree(): Path = {
    val root = Files.createTempDirectory("graft_scan")
    Files.createDirectories(root.resolve("PROTO_A/subj01"))
    Files.createDirectories(root.resolve("PROTO_B/subj02"))
    Files.createDirectories(root.resolve("other/subj03"))
    Files.write(root.resolve("PROTO_A/subj01/S01.dat"), "x".getBytes)
    Files.write(root.resolve("PROTO_A/subj01/S02.dat"), "xy".getBytes)
    Files.write(root.resolve("PROTO_B/subj02/S01.dat"), "z".getBytes)
    Files.write(root.resolve("other/subj03/S01.dat"), "q".getBytes)
    root
  }

  test("S3 recursive manifest lists files with metadata") {
    val root = mkTree()
    val files = FileScans.listFiles(spark, root.toString)
      .filter(!col("isDir"))
    assert(files.count() == 4)
    assert(files.filter(col("size") === 2).count() == 1)
  }

  test("S1/S2 per-level regex descent") {
    val root = mkTree()
    val hits = FileScans.regexScan(spark, root.toString,
      Seq("^PROTO_", "^subj", "^S\\d+\\.dat$"))
    assert(hits.count() == 3) // 'other/...' excluded at level 1
    val protoA = FileScans.regexScan(spark, root.toString,
      Seq("^PROTO_A$", "^subj", "^S01"))
    assert(protoA.count() == 1)
  }

  test("S1 regex scan tolerates files shallower than the regex depth") {
    val root = mkTree()
    Files.write(root.resolve("README.txt"), "top-level file".getBytes)
    val hits = FileScans.regexScan(spark, root.toString,
      Seq("^PROTO_", "^subj", "^S\\d+\\.dat$"))
    assert(hits.count() == 3) // shallow file filtered, not a crash
  }

  test("K8 shell script escapes hostile quotes in targets") {
    val lines = ActionSink.shellScript(
      Seq(("delete", "/data/x'; rm -rf $HOME; '", ""))
        .toDF("action", "target", "dest")).as[String].collect()
    assert(lines.head == """rm -rf '/data/x'\''; rm -rf $HOME; '\'''""")
  }

  test("S10 template with quotes and backslashes survives verbatim") {
    val dir = Files.createTempDirectory("graft_qtpl")
    Files.write(dir.resolve("subs.txt"), "s1\n".getBytes)
    val got = FileScans.qcListFinder(spark,
      dir.resolve("subs.txt").toString, """/d/O'Brien\x/#V0#.nii""")
      .as[String].head()
    assert(got == """/d/O'Brien\x/s1.nii""")
  }

  test("S13 truncated seg8 file yields nulls, not a crashed scan") {
    val root = Files.createTempDirectory("graft_seg8b")
    Files.write(root.resolve("short_seg8.txt"), "0.5\n".getBytes)
    val r = FileScans.readSeg8(spark, root.toString).collect().head
    assert(r.getDouble(1) == 0.5 && r.isNullAt(2) && r.isNullAt(3))
  }

  test("S4 mtime filter keeps only fresh entries") {
    val root = mkTree()
    val files = FileScans.listFiles(spark, root.toString)
      .filter(!col("isDir"))
    assert(FileScans.newerThan(files, 0L).count() == 4)
    assert(FileScans.newerThan(files,
      System.currentTimeMillis() + 3600000L).count() == 0)
  }

  test("S9 list source fails fast on duplicate ids") {
    val dir = Files.createTempDirectory("graft_list")
    Files.write(dir.resolve("ok.csv"), "a,/p/1\nb,/p/2\n".getBytes)
    Files.write(dir.resolve("dup.csv"), "a,/p/1\na,/p/2\n".getBytes)
    assert(FileScans.readList(spark,
      dir.resolve("ok.csv").toString).count() == 2)
    intercept[IllegalArgumentException] {
      FileScans.readList(spark, dir.resolve("dup.csv").toString)
    }
  }

  test("K8 shell script renders actions and rejects unknown ones") {
    val findings = Seq(
      ("delete", "/data/dup1", ""),
      ("move", "/data/a", "/data/b")).toDF("action", "target", "dest")
    val lines = ActionSink.shellScript(findings).as[String].collect().toSet
    assert(lines == Set("rm -rf '/data/dup1'", "mv '/data/a' '/data/b'"))
    intercept[IllegalArgumentException] {
      ActionSink.shellScript(
        Seq(("shred", "/x", "")).toDF("action", "target", "dest"))
    }
  }

  test("K8 writeScript lands one reviewable text file") {
    val out = Files.createTempDirectory("graft_k8w").resolve("fix.sh")
    ActionSink.writeScript(
      ActionSink.shellScript(Seq(("mkdir", "/data/new", ""))
        .toDF("action", "target", "dest")), out.toString)
    val lines = spark.read.text(out.toString).as[String].collect()
    assert(lines.toSeq == Seq("mkdir -p '/data/new'"))
  }

  test("K8 sql script emits one DELETE per key") {
    val lines = ActionSink.sqlScript(
      Seq((7L, "dup"), (9L, "dup")).toDF("eid", "why"), "exam", "eid")
      .as[String].collect().toSet
    assert(lines == Set("DELETE FROM exam WHERE eid = 7;",
      "DELETE FROM exam WHERE eid = 9;"))
  }

  test("S10 qc finders: file list, template expansion, glob") {
    val dir = Files.createTempDirectory("graft_qcf")
    Files.write(dir.resolve("paths.txt"),
      "/data/a.nii\n/data/b.nii\n\n".getBytes)
    Files.write(dir.resolve("subs.txt"), "subj01\nsubj02\n".getBytes)
    val byFile = FileScans.qcFileFinder(spark,
      dir.resolve("paths.txt").toString).as[String].collect().toSet
    assert(byFile == Set("/data/a.nii", "/data/b.nii"))
    val byList = FileScans.qcListFinder(spark,
      dir.resolve("subs.txt").toString, "/proto/#V0#/anat.nii")
      .as[String].collect().toSet
    assert(byList == Set("/proto/subj01/anat.nii", "/proto/subj02/anat.nii"))
    val tree = mkTree()
    val byGlob = FileScans.qcPathFinder(spark, tree.toString, "S01\\.dat$")
    assert(byGlob.count() == 3)
  }

  test("X3 reconcile flags missing and count-mismatched series") {
    val scanner = Seq(("sA", 3L), ("sB", 2L), ("sC", 1L))
      .toDF("series_key", "n_expected")
    val disk = Seq("sA", "sA", "sA", "sB").toDF("series_key")
    val got = FileScans.reconcile(scanner, disk)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getString(3)))
      .toSet
    assert(got == Set(("sB", 1L, "count_mismatch"),
      ("sC", 0L, "missing_on_disk")))
  }

  test("K6 no-clobber binary write: skip identical, flag different") {
    val dir = Files.createTempDirectory("graft_k6")
    val a = "payloadA".getBytes
    assert(ActionSink.writeBinaryNoClobber(dir, "x.nii", a) == "written")
    assert(ActionSink.writeBinaryNoClobber(dir, "x.nii", a) ==
      "skipped_identical")
    assert(ActionSink.writeBinaryNoClobber(dir, "x.nii",
      "payloadB".getBytes) == "duplicate_but_different")
    assert(Files.exists(dir.resolve("duplicate_but_different_x.nii")))
    assert(new String(Files.readAllBytes(dir.resolve("x.nii"))) == "payloadA")
  }

  test("K9 csv append + resume read-back round-trips") {
    val out = Files.createTempDirectory("graft_qc").resolve("qc").toString
    ActionSink.appendCsv(Seq((1, "ok"), (2, "bad")).toDF("id", "label"), out)
    ActionSink.appendCsv(Seq((3, "ok")).toDF("id", "label"), out)
    val back = ActionSink.readCsv(spark, out)
    assert(back.count() == 3)
    assert(back.filter(col("label") === "ok").count() == 2)
  }

  test("K4 REST sink: posts, rid==0 skip, retry on 500, ERROR counting") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val bodies = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val n = hits.incrementAndGet()
      if (n == 1) { // first call fails → exercises the retry path
        ex.sendResponseHeaders(500, -1); ex.close()
      } else {
        bodies.add(body)
        val resp =
          if (body.contains("name%3Dbroken")) "line ok\nERROR bad exam"
          else "line ok"
        val b = resp.getBytes("UTF-8")
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b); ex.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/api"
      val df = Seq(
        (1L, 19, "name=ok"),     // posted (= is urlencoded in the body)
        (2L, 0, "name=skipme"),  // rid==0 → never sent
        (3L, 29, "name=broken")  // posted, response carries an ERROR line
      ).toDF("exam_id", "rid", "name")
      val res = graft.sinks.RestSink.postExams(df, url, "tok123")
      assert(res == graft.sinks.RestSink.Result(2, 1, 0, 1))
      val sent = bodies.toArray.map(_.toString)
      assert(sent.length == 2)
      assert(sent.forall(b => b.contains("token=tok123") &&
        b.contains("range=100")))
      assert(!sent.exists(_.contains("skipme")))
    } finally server.stop(0)
  }

  test("K4 REST sink: a row that exhausts retries is counted, not fatal") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api", (ex: HttpExchange) => {
      ex.sendResponseHeaders(503, -1); ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/api"
      val df = Seq((1L, 19, "x")).toDF("exam_id", "rid", "name")
      val res = graft.sinks.RestSink.postExams(df, url, "t",
        maxRetries = 1)
      assert(res == graft.sinks.RestSink.Result(0, 0, 1, 0))
    } finally server.stop(0)
  }

  test("K12 tar sink: stock tar reads the archives; payloads round-trip") {
    import scala.sys.process._
    val dir = Files.createTempDirectory("tar_sink").toString
    val rows = (1 to 7).map(i =>
      (f"series_$i%03d/img_$i%03d.bin", Array.fill(100 * i)(i.toByte)))
    val df = rows.toDF("path", "payload").repartition(2)
    val n = graft.sinks.TarSink.writeTar(df, "path", "payload", dir,
      mtimeSec = 1700000000L)
    assert(n == 2)
    val tars = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
    assert(tars.length == 2)
    // the system binary must accept our USTAR bytes and see every entry
    val listed = tars.flatMap(t =>
      Seq("tar", "-tf", t.getPath).!!.linesIterator).toSet
    assert(listed == rows.map(_._1).toSet)
    // extract and byte-compare one payload
    val ex = Files.createTempDirectory("tar_x").toString
    tars.foreach(t => assert(Seq("tar", "-xf", t.getPath, "-C", ex).! == 0))
    rows.foreach { case (p, bytes) =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(java.nio.file.Paths.get(ex, p)), bytes),
        s"payload mismatch for $p")
    }
  }

  test("tar source: sink round-trip, long names, and system-tar shards") {
    import scala.sys.process._
    val dir = Files.createTempDirectory("tar_src").toString
    val long = "deeply/nested/" + "d/" * 50 + "member.bin"
    val rows = Seq(
      ("series_001/img.bin", Array.fill(700)(5.toByte)),
      (long, Array.fill(13)(9.toByte)),
      ("empty.bin", Array.emptyByteArray))
    graft.sinks.TarSink.writeTar(
      rows.toDF("path", "payload").repartition(1),
      "path", "payload", dir, 42L)
    val got = graft.sources.TarSource.read(spark, dir)
      .select("name", "payload").as[(String, Array[Byte])]
      .collect().map { case (n, p) => n -> p.toSeq }.toMap
    assert(got.keySet == rows.map(_._1).toSet)
    rows.foreach { case (n, p) => assert(got(n) == p.toSeq, n) }
    // a shard written by the SYSTEM tar binary reads the same way
    val sys = Files.createTempDirectory("tar_sys")
    Files.write(sys.resolve("hello.txt"), "payload!".getBytes)
    val shardDir = Files.createTempDirectory("tar_sys_shard").toString
    assert(Seq("tar", "--format=ustar", "-cf", s"$shardDir/s.tar",
      "-C", sys.toString, "hello.txt").! == 0)
    val fromSys = graft.sources.TarSource.read(spark, shardDir)
      .select("name", "payload").as[(String, Array[Byte])].collect()
    assert(fromSys.map(_._1).toSeq == Seq("hello.txt"))
    assert(new String(fromSys.head._2) == "payload!")
    // a corrupt size field fails the shard loudly, not a mis-frame
    val bad = Files.readAllBytes(
      new java.io.File(dir, "part-00000.tar").toPath)
    bad(124) = 'z'.toByte
    val e = intercept[Exception](graft.sources.TarSource.members(bad))
    assert(e.isInstanceOf[NumberFormatException] ||
      e.isInstanceOf[IllegalArgumentException])
  }

  test("tar source applies GNU-L and PAX long-name extension entries") {
    import scala.sys.process._
    // default `tar -cf` (GNU format) stores a >100-byte path in an 'L'
    // extension entry and truncates the following header's name field;
    // returning the truncated name would be silently wrong data
    val longName = ("verydeep/" * 14) + "member_with_a_quite_long_name.bin"
    assert(longName.length > 100)
    val src = Files.createTempDirectory("tar_long")
    val member = src.resolve(longName)
    Files.createDirectories(member.getParent)
    Files.write(member, "long-name payload".getBytes)
    for (fmt <- Seq("gnu", "pax")) {
      val shard = Files.createTempDirectory(s"tar_long_$fmt").toString
      assert(Seq("tar", s"--format=$fmt", "-cf", s"$shard/s.tar",
        "-C", src.toString, longName).! == 0)
      val got = graft.sources.TarSource.read(spark, shard)
        .select("name", "payload").as[(String, Array[Byte])].collect()
      assert(got.map(_._1).toSeq == Seq(longName), s"format=$fmt")
      assert(new String(got.head._2) == "long-name payload")
    }
  }

  test("K12 tar sink: re-run writes byte-identical archives (retry-safe)") {
    val d1 = Files.createTempDirectory("tar_a").toString
    val d2 = Files.createTempDirectory("tar_b").toString
    val df = Seq(("a.bin", Array.fill(700)(7.toByte)),
      ("b.bin", Array.fill(13)(9.toByte))).toDF("path", "payload")
      .repartition(1)
    graft.sinks.TarSink.writeTar(df, "path", "payload", d1, 42L)
    graft.sinks.TarSink.writeTar(df, "path", "payload", d2, 42L)
    val f1 = Files.readAllBytes(
      java.nio.file.Paths.get(d1, "part-00000.tar"))
    val f2 = Files.readAllBytes(
      java.nio.file.Paths.get(d2, "part-00000.tar"))
    assert(java.util.Arrays.equals(f1, f2))
  }

  test("K12 tar sink: long names use the ustar prefix; stock tar rejoins") {
    import scala.sys.process._
    val dir = Files.createTempDirectory("tar_prefix").toString
    val long = ("d" * 60) + "/" + ("e" * 60) + "/" + ("f" * 40) + ".bin"
    assert(long.length > 100)
    val df = Seq((long, Array.fill(10)(3.toByte))).toDF("path", "payload")
      .repartition(1)
    graft.sinks.TarSink.writeTar(df, "path", "payload", dir)
    val tarF = s"$dir/part-00000.tar"
    assert(Seq("tar", "-tf", tarF).!!.trim == long)
    val ex = Files.createTempDirectory("tar_px").toString
    assert(Seq("tar", "-xf", tarF, "-C", ex).! == 0)
    assert(Files.readAllBytes(java.nio.file.Paths.get(ex, long))
      .forall(_ == 3.toByte))
  }

  test("K12 tar sink: unsplittable over-long names fail fast, not truncate") {
    val dir = Files.createTempDirectory("tar_long").toString
    val df = Seq(("x" * 101, Array[Byte](1))).toDF("path", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      graft.sinks.TarSink.writeTar(df, "path", "payload", dir)
    }
    assert(e.getMessage != null)
  }

  /** Builds a minimal multi-sheet .xlsx (zip + XML) with shared,
    * inline, and numeric cells. */
  private def writeXlsx(path: java.nio.file.Path): Unit = {
    val zos = new java.util.zip.ZipOutputStream(
      Files.newOutputStream(path))
    def entry(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?>
        |<sst><si><t>PROTO_A</t></si><si><t>suj01</t></si>
        |<si><r><t>re</t></r><r><t>viewed</t></r></si>
        |<si><t>suj02</t></si><si><t>PROTO_B</t></si>
        |<si><t>suj03</t></si><si><t>ok</t></si></sst>""".stripMargin)
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?>
        |<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>proto</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>0</v></c><c r="B2"><v>45321</v></c>
        |  <c r="C2" t="s"><v>1</v></c><c r="D2" t="s"><v>2</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>0</v></c><c r="B3"><v>45322</v></c>
        |  <c r="C3" t="s"><v>3</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    entry("xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?>
        |<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>proto</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>4</v></c><c r="B2"><v>45400</v></c>
        |  <c r="C2" t="s"><v>5</v></c>
        |  <c r="D2" t="inlineStr"><is><t>inline note</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
  }

  test("S11 xlsx cells without r attributes map to sequential columns") {
    val dir = Files.createTempDirectory("graft_xlsx_nor")
    val f = dir.resolve("nor.xlsx")
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(f))
    zos.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
    // row 2: no r anywhere (pure sequential); row 3: B3 anchored, the
    // next unreferenced cell must land in C, not -1
    zos.write(
      """<?xml version="1.0"?>
        |<worksheet><sheetData>
        |<row><c t="inlineStr"><is><t>h</t></is></c></row>
        |<row><c t="inlineStr"><is><t>p1</t></is></c>
        |  <c><v>45000</v></c>
        |  <c t="inlineStr"><is><t>s1</t></is></c>
        |  <c t="inlineStr"><is><t>ok</t></is></c></row>
        |<row><c r="B3"><v>45001</v></c>
        |  <c t="inlineStr"><is><t>s2</t></is></c>
        |  <c t="inlineStr"><is><t>fine</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    val rows = ExcelSource.readXlsxRows(f.toString).head
    assert(rows(1) == Map(0 -> "p1", 1 -> "45000", 2 -> "s1", 3 -> "ok"))
    assert(rows(2) == Map(1 -> "45001", 2 -> "s2", 3 -> "fine"))
    // and the review-sheet reader keeps both data rows (col 4 non-empty)
    val df = ExcelSource.readReviewSheet(spark, f.toString)
    assert(df.count() == 2)
  }

  test("S11 xlsx review sheet: header skipped, col-4 filter, all sheets") {
    val f = Files.createTempDirectory("graft_xlsx").resolve("review.xlsx")
    writeXlsx(f)
    val df = ExcelSource.readReviewSheet(spark, f.toString)
    val rows = df.orderBy("proto").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSeq
    // suj02 (sheet1 row 3) has no comment → "defined but not reviewed",
    // dropped; rich-text shared string re-assembled; sheet2 included
    assert(rows == Seq(
      ("PROTO_A", "45321", "suj01", "reviewed"),
      ("PROTO_B", "45400", "suj03", "inline note")))
    // the source feeds the J8 review semi-join shape
    val exams = Seq(("suj01", 1), ("suj02", 2), ("sujXX", 3))
      .toDF("suj", "exam_id")
    val reviewed = exams.join(df.select(col("sujname").as("suj")),
      Seq("suj"), "left_semi")
    assert(reviewed.collect().map(_.getInt(1)).toSeq == Seq(1))
  }

  test("K10 mail sink: full SMTP dialogue with AUTH, dot-stuffing, " +
      "and loud failure") {
    import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
    val server = new java.net.ServerSocket(0)
    val recorded = new java.util.concurrent.atomic
      .AtomicReference[(String, String, String)]()
    val t = new Thread(() => {
      val s = server.accept()
      val in = new BufferedReader(new InputStreamReader(s.getInputStream))
      val out = new OutputStreamWriter(s.getOutputStream)
      def send(l: String): Unit = { out.write(l + "\r\n"); out.flush() }
      send("220 stub ESMTP")
      var from = ""; var rcpt = ""; var data = ""
      var line = in.readLine()
      while (line != null) {
        if (line.startsWith("EHLO")) { send("250-stub"); send("250 AUTH LOGIN") }
        else if (line == "AUTH LOGIN") send("334 VXNlcm5hbWU6")
        else if (line == "dXNlcg==") send("334 UGFzc3dvcmQ6") // "user"
        else if (line == "cHdk") send("235 ok") // "pwd"
        else if (line.startsWith("MAIL FROM:")) { from = line; send("250 ok") }
        else if (line.startsWith("RCPT TO:")) { rcpt = line; send("250 ok") }
        else if (line == "DATA") {
          send("354 go")
          val sb = new StringBuilder
          var dl = in.readLine()
          while (dl != ".") { sb.append(dl).append("\n"); dl = in.readLine() }
          data = sb.toString; send("250 queued")
        } else if (line == "QUIT") {
          send("221 bye"); recorded.set((from, rcpt, data))
          s.close(); server.close()
        }
        line = if (s.isClosed) null else in.readLine()
      }
    })
    t.setDaemon(true); t.start()
    graft.sinks.MailSink.sendMail("127.0.0.1", server.getLocalPort,
      "graft@example.org", "admin@example.org", "MISSING DICOMS",
      "3 series short\n.hidden dot line\ndone",
      auth = Some(("user", "pwd")))
    t.join(10000)
    val (from, rcpt, data) = recorded.get()
    assert(from == "MAIL FROM:<graft@example.org>")
    assert(rcpt == "RCPT TO:<admin@example.org>")
    assert(data.contains("Subject: MISSING DICOMS"))
    assert(data.contains("..hidden dot line")) // dot-stuffed, not lost
    assert(data.contains("done"))

    // the file fallback (send_mail_file) lands a timestamped txt
    val dir = Files.createTempDirectory("graft_mailfile")
    val p = graft.sinks.MailSink.sendMailFile("digest body",
      dir.toString + "/alert_", ts = 1700000000000L)
    assert(p.getFileName.toString == "alert_1700000000000.txt")
    assert(new String(Files.readAllBytes(p)) == "digest body\n")
  }

  test("K7 diffusion sink: golden four-file render, vendor branches, " +
      "no-clobber") {
    val dir = Files.createTempDirectory("graft_bvec")
    // identity affine/orientation: the Siemens branch still applies the
    // diag(-1,-1,1) sign fix, so x/y components flip in .bvecs while
    // .dicom_vec (patient frame) keeps the raw directions
    val id = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
    val r = ActionSink.writeDiffusionFiles(dir, "SIEMENS",
      id._1, id._2, id._3, id._1, id._2,
      bvals = Seq(0L, 1000L),
      bvecs = Seq((0.0, 0.0, 0.0), (0.70711, -0.70711, 0.0)))
    assert(r == "written")
    def read(n: String) =
      new String(Files.readAllBytes(dir.resolve(n)))
    assert(read("diffusion_dir.bvecs") ==
      "0.00000 -0.70711\n0.00000 0.70711\n0.00000 0.00000\n")
    assert(read("diffusion_dir.dicom_vec") ==
      "0.00000 0.70711\n0.00000 -0.70711\n0.00000 0.00000\n")
    assert(read("diffusion_dir.bvals") == "0 1000\n")
    assert(read("diffusion_dir.txt") ==
      "0.00000 0.00000 0.00000 0.00000\n" +
        "1000.00000 0.70711 -0.70711 0.00000\n")
    // no-clobber (Exam_info.py:1214-1216)
    assert(ActionSink.writeDiffusionFiles(dir, "SIEMENS",
      id._1, id._2, id._3, id._1, id._2, Seq(0L),
      Seq((1.0, 0.0, 0.0))) == "exists")
    // GE: raw bvecs pass through unrotated, no sign flip
    val geDir = Files.createTempDirectory("graft_bvec_ge")
    assert(ActionSink.writeDiffusionFiles(geDir, "GE MEDICAL SYSTEMS",
      id._1, id._2, id._3, id._1, id._2,
      Seq(1000L), Seq((0.5, 0.5, 0.70711))) == "written")
    assert(new String(Files.readAllBytes(
      geDir.resolve("diffusion_dir.bvecs"))) ==
      "0.50000\n0.50000\n0.70711\n")
  }
}
