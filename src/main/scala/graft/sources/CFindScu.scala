package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.DicomCodec

/** S12 — DICOM C-FIND manifest source (do_results_DB.py:263-347): the
  * reference associates to the scanner's query/retrieve SCP, runs
  * SERIES-level C-FIND queries, and reconciles each series'
  * NumberOfSeriesRelatedInstances against the files on disk. This is a
  * dependency-free SCU speaking the public upper-layer protocol
  * (PS3.8 PDUs, PS3.7 DIMSE command sets) — the same hand-rolled
  * stance as the USTAR tar sink and the xlsx reader, with
  * [[graft.ingest.DicomCodec]] decoding the response datasets. Tested
  * against a stub SCP speaking the same public PDU format (CFindSpec),
  * exactly as the REST sink is tested against a local HTTP stub.
  *
  * Scale shape: ONE association on the driver returns the manifest —
  * the identifier stream is metadata-small (one row per series, the
  * same volume as the reference's findscu text dump); the reconcile
  * against the (huge) disk listing is the distributed side
  * ([[FileScans.reconcile]], X3 / `x3_reconcile_counts`).
  */
object CFindScu {

  // Public-standard UIDs (PS3.6 registry)
  val ApplicationContextUid = "1.2.840.10008.3.1.1.1"
  val StudyRootFindUid = "1.2.840.10008.5.1.4.1.2.2.1"
  val ImplicitVrLeUid = "1.2.840.10008.1.2"

  private val PendingStatuses = Set(0xFF00, 0xFF01)
  private val NoDataSet = 0x0101

  // ------------------------------------------------------------------
  // Implicit-VR LE dataset encoding (PS3.5) — the write side of what
  // DicomCodec.parseDataset reads.
  // ------------------------------------------------------------------

  private def le16(v: Int) =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Long) = Array((v & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 24) & 0xFF).toByte)

  /** One implicit-VR element; string value padded to even length. */
  def el(group: Int, elem: Int, value: Array[Byte]): Array[Byte] = {
    val padded = if (value.length % 2 == 0) value else value :+ 0.toByte
    le16(group) ++ le16(elem) ++ le32(padded.length.toLong) ++ padded
  }

  def elS(group: Int, elem: Int, s: String): Array[Byte] =
    el(group, elem, s.getBytes(US_ASCII))

  def elUS(group: Int, elem: Int, v: Int): Array[Byte] =
    el(group, elem, le16(v))

  /** A command set MUST lead with its group length (PS3.7 §6.3.1). */
  def commandSet(body: Array[Byte]): Array[Byte] =
    el(0x0000, 0x0000, le32(body.length.toLong)) ++ body

  // ------------------------------------------------------------------
  // Upper-layer PDUs (PS3.8) — note lengths here are BIG endian,
  // unlike the little-endian datasets they carry.
  // ------------------------------------------------------------------

  private def be16(v: Int) =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be32(v: Int) = Array(((v >> 24) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    (v & 0xFF).toByte)

  def item(itemType: Int, payload: Array[Byte]): Array[Byte] =
    Array(itemType.toByte, 0.toByte) ++ be16(payload.length) ++ payload

  def pdu(pduType: Int, payload: Array[Byte]): Array[Byte] =
    Array(pduType.toByte, 0.toByte) ++ be32(payload.length) ++ payload

  private def aeTitle(s: String): Array[Byte] =
    s.padTo(16, ' ').take(16).getBytes(US_ASCII)

  /** A-ASSOCIATE-RQ with one presentation context (Study Root FIND
    * over implicit VR LE, context id 1). */
  def associateRq(callingAe: String, calledAe: String,
      maxPduLen: Int = 16384): Array[Byte] = {
    val appCtx = item(0x10, ApplicationContextUid.getBytes(US_ASCII))
    val presCtx = item(0x20,
      Array(1.toByte, 0.toByte, 0.toByte, 0.toByte) ++
        item(0x30, StudyRootFindUid.getBytes(US_ASCII)) ++
        item(0x40, ImplicitVrLeUid.getBytes(US_ASCII)))
    val userInfo = item(0x50, item(0x51, be32(maxPduLen)))
    pdu(0x01, be16(1) ++ Array[Byte](0, 0) ++ aeTitle(calledAe) ++
      aeTitle(callingAe) ++ new Array[Byte](32) ++
      appCtx ++ presCtx ++ userInfo)
  }

  /** A-ASSOCIATE-AC mirroring the RQ (the stub SCP's accept). */
  def associateAc(callingAe: String, calledAe: String): Array[Byte] = {
    val appCtx = item(0x10, ApplicationContextUid.getBytes(US_ASCII))
    // AC presentation context: id, reserved, result=0 (accept),
    // reserved, then the chosen transfer syntax
    val presCtx = item(0x21,
      Array(1.toByte, 0.toByte, 0.toByte, 0.toByte) ++
        item(0x40, ImplicitVrLeUid.getBytes(US_ASCII)))
    val userInfo = item(0x50, item(0x51, be32(16384)))
    pdu(0x02, be16(1) ++ Array[Byte](0, 0) ++ aeTitle(calledAe) ++
      aeTitle(callingAe) ++ new Array[Byte](32) ++
      appCtx ++ presCtx ++ userInfo)
  }

  /** One P-DATA-TF PDU carrying one PDV. `mch` = message control
    * header: bit 0 command/data, bit 1 last-fragment. */
  def pData(ctxId: Int, mch: Int, data: Array[Byte]): Array[Byte] =
    pdu(0x04, be32(data.length + 2) ++
      Array(ctxId.toByte, mch.toByte) ++ data)

  val releaseRq: Array[Byte] = pdu(0x05, new Array[Byte](4))
  val releaseRp: Array[Byte] = pdu(0x06, new Array[Byte](4))

  // ------------------------------------------------------------------
  // SCU
  // ------------------------------------------------------------------

  final class Association private[CFindScu] (socket: Socket,
      in: DataInputStream, out: DataOutputStream) {

    private[CFindScu] def send(bytes: Array[Byte]): Unit = {
      out.write(bytes); out.flush()
    }

    /** Read one whole PDU: (type, payload). */
    private[CFindScu] def readPdu(): (Int, Array[Byte]) = {
      val t = in.readUnsignedByte(); in.readUnsignedByte()
      val len = in.readInt()
      // a corrupt peer must not drive an allocation-of-len OOM; 64 MiB
      // dwarfs any identifier stream
      require(len >= 0 && len <= 64 * 1024 * 1024,
        s"implausible PDU length $len")
      val payload = new Array[Byte](len)
      in.readFully(payload)
      (t, payload)
    }

    /** Run one C-FIND: send the command + identifier, then collect
      * every pending response's identifier dataset until the final
      * (success) status. Identifier fragments are reassembled across
      * PDVs per the last-fragment bit. */
    def find(query: Array[Byte], messageId: Int = 1)
        : Seq[Map[String, String]] = {
      val cmd = commandSet(
        elS(0x0000, 0x0002, StudyRootFindUid) ++
          elUS(0x0000, 0x0100, 0x0020) ++ // C-FIND-RQ
          elUS(0x0000, 0x0110, messageId) ++
          elUS(0x0000, 0x0700, 0) ++ // priority MEDIUM
          elUS(0x0000, 0x0800, 0)) // dataset follows (≠ 0101)
      send(pData(1, 0x03, cmd)) // command, last
      send(pData(1, 0x02, query)) // data, last
      val results = Seq.newBuilder[Map[String, String]]
      val cmdBuf = new java.io.ByteArrayOutputStream()
      val datBuf = new java.io.ByteArrayOutputStream()
      var pendingWithData = false
      var done = false
      while (!done) {
        val (t, payload) = readPdu()
        require(t == 0x04, s"expected P-DATA-TF, got PDU type $t")
        // walk every PDV in the PDU — bounds-checked so a corrupt
        // length fails loudly instead of zero-padding the dataset
        // (Arrays.copyOfRange pads silently) or crashing with AIOOBE
        var off = 0
        while (off < payload.length) {
          if (off + 6 > payload.length) throw new java.io.IOException(
            s"truncated PDV header at offset $off")
          val len = ((payload(off) & 0xFF) << 24) |
            ((payload(off + 1) & 0xFF) << 16) |
            ((payload(off + 2) & 0xFF) << 8) | (payload(off + 3) & 0xFF)
          if (len < 2 || off + 4 + len > payload.length)
            throw new java.io.IOException(
              s"PDV length $len overruns the PDU (offset $off)")
          val mch = payload(off + 5) & 0xFF
          val data = java.util.Arrays.copyOfRange(payload,
            off + 6, off + 4 + len)
          off += 4 + len
          val isCommand = (mch & 0x01) != 0
          val isLast = (mch & 0x02) != 0
          (if (isCommand) cmdBuf else datBuf).write(data)
          if (isCommand && isLast) {
            val c = DicomCodec.parseDataset(cmdBuf.toByteArray)
            cmdBuf.reset()
            val status = c.get("Status").flatMap(_.toIntOption)
              .getOrElse(-1)
            val hasData = c.get("CommandDataSetType")
              .flatMap(_.toIntOption).exists(_ != NoDataSet)
            if (PendingStatuses(status)) pendingWithData = hasData
            else if (status == 0x0000) done = true
            else throw new java.io.IOException(
              f"C-FIND failed with status 0x$status%04x")
          } else if (!isCommand && isLast) {
            if (pendingWithData) {
              results += DicomCodec.parseDataset(datBuf.toByteArray)
              pendingWithData = false
            }
            datBuf.reset()
          }
        }
      }
      results.result()
    }

    def release(): Unit = {
      send(releaseRq)
      val (t, _) = readPdu()
      require(t == 0x06, s"expected A-RELEASE-RP, got PDU type $t")
      socket.close()
    }
  }

  /** Open an association (one presentation context: Study Root FIND,
    * implicit VR LE). Fails loudly on a reject. */
  def associate(host: String, port: Int, callingAe: String,
      calledAe: String, connectTimeoutMs: Int = 15000,
      readTimeoutMs: Int = 60000): Association = {
    val socket = new Socket()
    // a blackholed scanner must time out, not hang the driver job
    socket.connect(new java.net.InetSocketAddress(host, port),
      connectTimeoutMs)
    socket.setSoTimeout(readTimeoutMs)
    val in = new DataInputStream(socket.getInputStream)
    val out = new DataOutputStream(socket.getOutputStream)
    val a = new Association(socket, in, out)
    a.send(associateRq(callingAe, calledAe))
    val (t, payload) = a.readPdu()
    if (t != 0x02) {
      socket.close()
      throw new java.io.IOException(
        s"association rejected: PDU type $t")
    }
    // check the presentation-context result byte (0 = acceptance)
    var off = 68 // version(2)+reserved(2)+called(16)+calling(16)+res(32)
    while (off + 4 <= payload.length) {
      val itemType = payload(off) & 0xFF
      val len = ((payload(off + 2) & 0xFF) << 8) | (payload(off + 3) & 0xFF)
      if (itemType == 0x21) {
        // the result byte sits at item offset 6 — a truncated or
        // short-declared AC item must fail like every other malformed
        // PDU (descriptive IOException), not an array bounds throw
        if (len < 3 || off + 7 > payload.length) {
          socket.close()
          throw new java.io.IOException(
            "truncated presentation-context item in A-ASSOCIATE-AC")
        }
        val result = payload(off + 6) & 0xFF
        if (result != 0) {
          socket.close()
          throw new java.io.IOException(
            s"presentation context rejected: result $result")
        }
      }
      off += 4 + len
    }
    a
  }

  /** The reference's SERIES-level query identifier
    * (do_results_DB.py:297-315): return-key wildcards are empty
    * values; the study scopes the query. */
  def seriesQuery(studyUid: String): Array[Byte] =
    elS(0x0008, 0x0052, "SERIES") ++
      elS(0x0008, 0x0060, "") ++
      elS(0x0008, 0x103E, "") ++
      elS(0x0020, 0x000D, studyUid) ++
      elS(0x0020, 0x000E, "") ++
      elS(0x0020, 0x1209, "")

  /** S12 — the manifest as a DataFrame ready for
    * [[FileScans.reconcile]]: one row per series,
    * (series_key, n_expected). The association runs on the driver —
    * the manifest is metadata-small; the reconcile against the disk
    * listing is the distributed side. */
  def seriesManifest(spark: SparkSession, host: String, port: Int,
      callingAe: String, calledAe: String, studyUid: String)
      : DataFrame = {
    val a = associate(host, port, callingAe, calledAe)
    val rows =
      try a.find(seriesQuery(studyUid))
      finally a.release()
    import spark.implicits._
    rows.map(m => (m.getOrElse("SeriesInstanceUID", ""),
        m.get("NumberOfSeriesRelatedInstances")
          .flatMap(_.toIntOption).getOrElse(0)))
      .toDF("series_key", "n_expected")
      .filter(col("series_key") =!= "")
  }
}
