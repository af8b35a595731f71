package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.DicomCodec
import graft.sources.{CFindScu, FileScans}

/** S12 — the C-FIND SCU against a stub SCP speaking the same public
  * PDU format (PS3.7/PS3.8), the local-stub pattern the REST sink
  * uses for HTTP: associate → SERIES C-FIND → pending identifiers →
  * release, then the manifest feeds the X3 reconcile. The stub also
  * fragments one identifier across two PDVs to pin reassembly. */
class CFindSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** Fixture series the stub "scanner" reports: (uid, instances). */
  private val fixture = Seq(("1.2.840.1.SER1", 10),
    ("1.2.840.1.SER2", 5), ("1.2.840.1.SER3", 7))

  /** Single-association stub SCP; records the query it served. */
  private def startStubScp(): (Int, Thread,
      java.util.concurrent.atomic.AtomicReference[Map[String, String]]) = {
    val server = new ServerSocket(0)
    val seenQuery = new java.util.concurrent.atomic
      .AtomicReference[Map[String, String]](Map.empty)
    val t = new Thread(() => {
      val s = server.accept()
      val in = new DataInputStream(s.getInputStream)
      val out = new DataOutputStream(s.getOutputStream)
      def readPdu(): (Int, Array[Byte]) = {
        val tp = in.readUnsignedByte(); in.readUnsignedByte()
        val payload = new Array[Byte](in.readInt())
        in.readFully(payload); (tp, payload)
      }
      def send(b: Array[Byte]): Unit = { out.write(b); out.flush() }
      // 1. association
      val (rqType, _) = readPdu()
      assert(rqType == 0x01)
      send(CFindScu.associateAc("GRAFT", "STUBSCP"))
      // 2. C-FIND-RQ: collect command + identifier PDVs
      var cmd: Map[String, String] = null
      var query: Map[String, String] = null
      val buf = new java.io.ByteArrayOutputStream()
      while (query == null) {
        val (tp, payload) = readPdu()
        assert(tp == 0x04)
        var off = 0
        while (off < payload.length) {
          val len = ((payload(off) & 0xFF) << 24) |
            ((payload(off + 1) & 0xFF) << 16) |
            ((payload(off + 2) & 0xFF) << 8) | (payload(off + 3) & 0xFF)
          val mch = payload(off + 5) & 0xFF
          val data = java.util.Arrays.copyOfRange(payload,
            off + 6, off + 4 + len)
          off += 4 + len
          buf.write(data)
          if ((mch & 0x02) != 0) {
            val ds = DicomCodec.parseDataset(buf.toByteArray)
            buf.reset()
            if ((mch & 0x01) != 0) cmd = ds else query = ds
          }
        }
      }
      assert(cmd("CommandField").toInt == 0x0020)
      seenQuery.set(query)
      // 3. one pending response per fixture series
      fixture.zipWithIndex.foreach { case ((uid, n), i) =>
        val rsp = CFindScu.commandSet(
          CFindScu.elS(0x0000, 0x0002, CFindScu.StudyRootFindUid) ++
            CFindScu.elUS(0x0000, 0x0100, 0x8020) ++ // C-FIND-RSP
            CFindScu.elUS(0x0000, 0x0120, 1) ++
            CFindScu.elUS(0x0000, 0x0800, 0) ++ // dataset follows
            CFindScu.elUS(0x0000, 0x0900, 0xFF00)) // pending
        send(CFindScu.pData(1, 0x03, rsp))
        val ident = CFindScu.elS(0x0008, 0x0052, "SERIES") ++
          CFindScu.elS(0x0008, 0x0060, "MR") ++
          CFindScu.elS(0x0020, 0x000E, uid) ++
          CFindScu.elS(0x0020, 0x1209, n.toString)
        if (i == 1) { // fragment the second identifier across two PDVs
          val half = ident.length / 2
          send(CFindScu.pData(1, 0x00, ident.take(half))) // not last
          send(CFindScu.pData(1, 0x02, ident.drop(half))) // last
        } else send(CFindScu.pData(1, 0x02, ident))
      }
      // 4. final success (no dataset)
      val fin = CFindScu.commandSet(
        CFindScu.elS(0x0000, 0x0002, CFindScu.StudyRootFindUid) ++
          CFindScu.elUS(0x0000, 0x0100, 0x8020) ++
          CFindScu.elUS(0x0000, 0x0120, 1) ++
          CFindScu.elUS(0x0000, 0x0800, 0x0101) ++ // no dataset
          CFindScu.elUS(0x0000, 0x0900, 0x0000)) // success
      send(CFindScu.pData(1, 0x03, fin))
      // 5. release
      val (relType, _) = readPdu()
      assert(relType == 0x05)
      send(CFindScu.releaseRp)
      s.close(); server.close()
    })
    t.setDaemon(true); t.start()
    (server.getLocalPort, t, seenQuery)
  }

  test("SCU associates, queries, reassembles fragments, releases") {
    val (port, thread, seenQuery) = startStubScp()
    val a = CFindScu.associate("127.0.0.1", port, "GRAFT", "STUBSCP")
    val rows = a.find(CFindScu.seriesQuery("1.2.840.1.STUDY9"))
    a.release()
    thread.join(10000)
    // the SCP saw the reference's SERIES-level scoped query
    assert(seenQuery.get()("QueryRetrieveLevel") == "SERIES")
    assert(seenQuery.get()("StudyInstanceUID") == "1.2.840.1.STUDY9")
    // all three pending identifiers decoded, incl. the fragmented one
    assert(rows.map(r => (r("SeriesInstanceUID"),
      r("NumberOfSeriesRelatedInstances"))) ==
      fixture.map { case (u, n) => (u, n.toString) })
  }

  test("seriesManifest feeds the X3 reconcile end-to-end") {
    import spark.implicits._
    val (port, _, _) = startStubScp()
    val manifest = CFindScu.seriesManifest(spark, "127.0.0.1", port,
      "GRAFT", "STUBSCP", "1.2.840.1.STUDY9")
    // disk: SER1 complete (10), SER2 short (4), SER3 absent
    val disk = (Seq.fill(10)("1.2.840.1.SER1") ++
      Seq.fill(4)("1.2.840.1.SER2")).toDF("series_key")
    val findings = FileScans.reconcile(manifest, disk)
      .orderBy("series_key").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getString(3)))
    assert(findings.toSeq == Seq(
      ("1.2.840.1.SER2", 5, 4L, "count_mismatch"),
      ("1.2.840.1.SER3", 7, 0L, "missing_on_disk")))
  }
}
