package graft.ingest

import scala.collection.mutable

import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.unsafe.types.UTF8String

/** Dependency-free DICOM header codec — the real S6/S7 implementation
  * (the container ships no DICOM library, so this parses the public
  * file format directly, the same way TarSink hand-rolls USTAR and
  * ExcelSource hand-rolls xlsx).
  *
  * What it reads (all public-format structures):
  *  - 128-byte preamble + 'DICM' magic (the is_dicom check,
  *    Exam_info.py:1673-1679);
  *  - the File Meta group (0002,xxxx — always explicit VR little
  *    endian) including TransferSyntaxUID, then the dataset in either
  *    explicit (1.2.840.10008.1.2.1) or implicit (1.2.840.10008.1.2)
  *    VR little endian;
  *  - scalar elements decode to strings in a flat map keyed by DICOM
  *    keyword (for the dictionary below — the tags the reference reads,
  *    Exam_info.py:356-760) or `gggg,eeee` hex for everything else
  *    (the reference's own `p1[0x19,0x109c]` probe shape);
  *  - sequences (SQ) are structurally skipped, defined or undefined
  *    length, including nested items — header walks never misparse a
  *    sequence body as top-level tags;
  *  - parsing STOPS at PixelData (7FE0,0010) — the stop_before_pixels
  *    discipline (Exam_info.py:130): pixel bytes are never touched, so
  *    a header read of a 500 MB multiframe costs a few KB;
  *  - Siemens CSA private blocks (0029,1010 image / 0029,1020 series,
  *    SV10 layout — public, documented by the nibabel project's
  *    csareader) flatten to `CsaImage.<name>` / `CsaSeries.<name>`
  *    dotted keys, and the MrPhoenixProtocol ASCCONV text block
  *    flattens to `CsaSeries.MrPhoenixProtocol.<key>` including indexed
  *    keys like `sSliceArray.asSlice[0].sPosition.dTra`
  *    (Exam_info.py:458-461,556-565) — the MetaExtractor surface.
  *
  * Truncation contract: parsing a PREFIX of a file (the DSv2 source
  * reads headers incrementally — 4 KB first, growing only if the
  * header straddles the boundary) returns `complete = false` instead
  * of throwing, so the caller can fetch more bytes and retry. A file
  * that ends before PixelData (header-only files) is complete.
  */
object DicomCodec {

  final case class Result(meta: Map[String, String], complete: Boolean)

  /** Full-fidelity read result: [[pixels]] is the raw PixelData
    * payload for uncompressed little-endian syntaxes, null when the
    * file has no pixel element, the payload is encapsulated
    * (compressed — undefined length), or the bytes were truncated. */
  final case class PixelResult(meta: Map[String, String],
      pixels: Array[Byte], complete: Boolean)

  private final val Undefined = 0xFFFFFFFFL

  /** Control-flow signal for "ran out of bytes mid-structure" — no
    * stack trace (thrown per truncated prefix attempt, caught once). */
  private object Truncated
    extends RuntimeException(null, null, false, false)

  /** Explicit-VR long form: 2 reserved bytes + 4-byte length. */
  private val longFormVRs = Set(
    "OB", "OW", "OF", "OD", "OL", "OV", "SQ", "UC", "UR", "UT", "UN",
    "SV", "UV")

  /** Text VRs decoded to (multi-)string values verbatim. */
  private val stringVRs = Set(
    "AE", "AS", "CS", "DA", "DS", "DT", "IS", "LO", "LT", "PN", "SH",
    "ST", "TM", "UC", "UI", "UR", "UT")

  /** Keyword + VR dictionary for the tags the reference consumes
    * (keyword naming matches the public standard, so `meta['EchoTime']`
    * reads the same as the reference's `p1.EchoTime`). Everything else
    * keys as `gggg,eeee`. */
  private val dict: Map[Int, (String, String)] = Map(
    // command group (PS3.7 — DIMSE messages; the C-FIND SCU decodes
    // response command sets with the same element reader)
    0x00000000 -> ("CommandGroupLength", "UL"),
    0x00000002 -> ("AffectedSOPClassUID", "UI"),
    0x00000100 -> ("CommandField", "US"),
    0x00000110 -> ("MessageID", "US"),
    0x00000120 -> ("MessageIDBeingRespondedTo", "US"),
    0x00000700 -> ("Priority", "US"),
    0x00000800 -> ("CommandDataSetType", "US"),
    0x00000900 -> ("Status", "US"),
    0x00020010 -> ("TransferSyntaxUID", "UI"),
    0x00080052 -> ("QueryRetrieveLevel", "CS"),
    0x00201209 -> ("NumberOfSeriesRelatedInstances", "IS"),
    0x00080008 -> ("ImageType", "CS"),
    0x00080018 -> ("SOPInstanceUID", "UI"),
    0x00080020 -> ("StudyDate", "DA"),
    0x00080021 -> ("SeriesDate", "DA"),
    0x00080022 -> ("AcquisitionDate", "DA"),
    0x00080023 -> ("ContentDate", "DA"),
    0x00080030 -> ("StudyTime", "TM"),
    0x00080031 -> ("SeriesTime", "TM"),
    0x00080032 -> ("AcquisitionTime", "TM"),
    0x00080033 -> ("ContentTime", "TM"),
    0x00080050 -> ("AccessionNumber", "SH"),
    0x00080060 -> ("Modality", "CS"),
    0x00080070 -> ("Manufacturer", "LO"),
    0x00080080 -> ("InstitutionName", "LO"),
    0x00081010 -> ("StationName", "SH"),
    0x00081030 -> ("StudyDescription", "LO"),
    0x0008103E -> ("SeriesDescription", "LO"),
    0x00081090 -> ("ManufacturerModelName", "LO"),
    0x00100010 -> ("PatientName", "PN"),
    0x00100020 -> ("PatientID", "LO"),
    0x00100030 -> ("PatientBirthDate", "DA"),
    0x00100040 -> ("PatientSex", "CS"),
    0x00101010 -> ("PatientAge", "AS"),
    0x00101030 -> ("PatientWeight", "DS"),
    0x00180015 -> ("BodyPartExamined", "CS"),
    0x00180020 -> ("ScanningSequence", "CS"),
    0x00180021 -> ("SequenceVariant", "CS"),
    0x00180022 -> ("ScanOptions", "CS"),
    0x00180023 -> ("MRAcquisitionType", "CS"),
    0x00180024 -> ("SequenceName", "SH"),
    0x00180050 -> ("SliceThickness", "DS"),
    0x00180080 -> ("RepetitionTime", "DS"),
    0x00180081 -> ("EchoTime", "DS"),
    0x00180082 -> ("InversionTime", "DS"),
    0x00180083 -> ("NumberOfAverages", "DS"),
    0x00180086 -> ("EchoNumbers", "IS"),
    0x00180088 -> ("SpacingBetweenSlices", "DS"),
    0x00180089 -> ("NumberOfPhaseEncodingSteps", "IS"),
    0x00180091 -> ("EchoTrainLength", "IS"),
    0x00180095 -> ("PixelBandwidth", "DS"),
    0x00181000 -> ("DeviceSerialNumber", "LO"),
    0x00181020 -> ("SoftwareVersions", "LO"),
    0x00181030 -> ("ProtocolName", "LO"),
    0x00181251 -> ("TransmitCoilName", "SH"),
    0x00181314 -> ("FlipAngle", "DS"),
    0x0020000D -> ("StudyInstanceUID", "UI"),
    0x0020000E -> ("SeriesInstanceUID", "UI"),
    0x00200010 -> ("StudyID", "SH"),
    0x00200011 -> ("SeriesNumber", "IS"),
    0x00200012 -> ("AcquisitionNumber", "IS"),
    0x00200013 -> ("InstanceNumber", "IS"),
    0x00200032 -> ("ImagePositionPatient", "DS"),
    0x00200037 -> ("ImageOrientationPatient", "DS"),
    0x00201002 -> ("ImagesInAcquisition", "IS"),
    0x00201041 -> ("SliceLocation", "DS"),
    0x00204000 -> ("ImageComments", "LT"),
    0x00280002 -> ("SamplesPerPixel", "US"),
    0x00280004 -> ("PhotometricInterpretation", "CS"),
    0x00280008 -> ("NumberOfFrames", "IS"),
    0x00280010 -> ("Rows", "US"),
    0x00280011 -> ("Columns", "US"),
    0x00280030 -> ("PixelSpacing", "DS"),
    0x00280100 -> ("BitsAllocated", "US"),
    0x00280101 -> ("BitsStored", "US"),
    0x00280102 -> ("HighBit", "US"),
    0x00280103 -> ("PixelRepresentation", "US"),
    0x00281050 -> ("WindowCenter", "DS"),
    0x00281051 -> ("WindowWidth", "DS"))

  /** Little-endian cursor with truncation-signalling bounds checks. */
  private final class Buf(val a: Array[Byte], val limit: Int) {
    var pos = 0
    def remaining: Int = limit - pos
    def need(n: Int): Unit = if (remaining < n) throw Truncated
    def u16(): Int = {
      need(2)
      val v = (a(pos) & 0xFF) | ((a(pos + 1) & 0xFF) << 8)
      pos += 2; v
    }
    def u32(): Long = {
      need(4)
      val v = (a(pos) & 0xFFL) | ((a(pos + 1) & 0xFFL) << 8) |
        ((a(pos + 2) & 0xFFL) << 16) | ((a(pos + 3) & 0xFFL) << 24)
      pos += 4; v
    }
    def i32(): Int = u32().toInt
    def skip(n: Int): Unit = { need(n); pos += n }
    def bytes(n: Int): Array[Byte] = {
      need(n)
      val out = java.util.Arrays.copyOfRange(a, pos, pos + n)
      pos += n; out
    }
    /** Two-char VR code; anything non-alphabetic means we've lost tag
      * alignment (corrupt bytes) — treated as truncation. */
    def vr2(): String = {
      need(2)
      val c1 = a(pos).toChar; val c2 = a(pos + 1).toChar
      pos += 2
      if (c1 < 'A' || c1 > 'Z' || c2 < 'A' || c2 > 'Z') throw Truncated
      new String(Array(c1, c2))
    }
  }

  /** Exam_info.py:1673-1679 — magic at offset 128. */
  def isDicom(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 132 &&
      bytes(128) == 'D' && bytes(129) == 'I' &&
      bytes(130) == 'C' && bytes(131) == 'M'

  /** Parse header tags from (a prefix of) a DICOM file. Non-DICOM
    * bytes → empty complete result (callers gate on [[isDicom]]). */
  def parse(bytes: Array[Byte]): Result = {
    val r = parseInternal(bytes, wantPixels = false)
    Result(r.meta, r.complete)
  }

  /** Opt-in `stop_before_pixels=false` read (the full-fidelity K6/J6
    * variant, Exam_info.py:962-1057 / do_dicom_compare_recup_to.py:
    * 234-243): same header walk, PLUS the PixelData payload for
    * uncompressed little-endian syntaxes (explicit, implicit,
    * deflated). Encapsulated (undefined-length, i.e. compressed)
    * pixel data returns pixels = null — callers fall back to the
    * header-level compare. Requires whole-file bytes: a truncated
    * prefix yields pixels = null, complete = false. */
  def parseWithPixels(bytes: Array[Byte]): PixelResult =
    parseInternal(bytes, wantPixels = true)

  private def parseInternal(bytes: Array[Byte], wantPixels: Boolean)
      : PixelResult = {
    if (!isDicom(bytes))
      return PixelResult(Map.empty, null, complete = true)
    val b = new Buf(bytes, bytes.length)
    b.pos = 132
    val meta = mutable.LinkedHashMap.empty[String, String]
    var complete = true
    var pixels: Array[Byte] = null
    try {
      // File Meta group: always explicit VR LE, self-terminating on the
      // first non-0002 group (group length element optional).
      while (b.remaining >= 8 &&
          ((b.a(b.pos) & 0xFF) | ((b.a(b.pos + 1) & 0xFF) << 8)) == 0x0002)
        readElement(b, explicitVr = true, meta, emit = true)
      val ts = meta.getOrElse("TransferSyntaxUID", "1.2.840.10008.1.2.1")
      val explicitVr = ts != "1.2.840.10008.1.2"
      // Deflated explicit VR LE (1.2.840.10008.1.2.1.99): everything
      // after the file-meta group is one raw zlib stream — inflate and
      // continue on the decompressed dataset. A truncated prefix read
      // inflates what it has; Inflater just stops at the cut.
      val body: Buf =
        if (ts == "1.2.840.10008.1.2.1.99") {
          val inf = new java.util.zip.Inflater(true) // raw deflate
          inf.setInput(b.a, b.pos, b.remaining)
          // size HINT only (long math — remaining*4 overflows Int past
          // ~512 MB); growth past it is fine, but a zip-bomb must not
          // inflate without bound: header tags sit in the first MBs,
          // so cap the inflated window and mark incomplete beyond it
          val maxInflated = 1 << 30
          val hint = math.min(b.remaining.toLong * 4L, 1L << 26).toInt
          val out = new java.io.ByteArrayOutputStream(math.max(hint, 64))
          val chunk = new Array[Byte](8192)
          var n = 1
          while (n > 0 && !inf.finished() && out.size() < maxInflated) {
            n = try inf.inflate(chunk)
            catch { case _: java.util.zip.DataFormatException => 0 }
            out.write(chunk, 0, n)
          }
          val truncated = !inf.finished()
          inf.end()
          if (truncated) complete = false
          val arr = out.toByteArray
          new Buf(arr, arr.length)
        } else b
      var stop = false
      while (!stop && body.remaining >= 8)
        stop = readElement(body, explicitVr, meta, emit = true)
      if (stop && wantPixels) {
        // cursor parked at the PixelData tag — read its value header
        // and copy the payload; Undefined length = encapsulated
        // (compressed) frames, which stay null by contract
        body.skip(4)
        val len: Long =
          if (explicitVr) {
            val vr = body.vr2()
            if (longFormVRs(vr)) { body.skip(2); body.u32() }
            else body.u16().toLong
          } else body.u32()
        if (len != Undefined) {
          if (len < 0 || len > body.remaining) throw Truncated
          pixels = body.bytes(len.toInt)
        }
      }
    } catch { case Truncated => complete = false; pixels = null }
    PixelResult(meta.toMap, pixels, complete)
  }

  /** Parse a BARE dataset (no preamble, no file-meta group) — the
    * shape DICOM network messages carry (PS3.7 command sets and query
    * identifiers): implicit VR little endian by default. Returns the
    * same keyword/hex-keyed map as [[parse]]. */
  def parseDataset(bytes: Array[Byte], explicitVr: Boolean = false)
      : Map[String, String] = {
    val b = new Buf(bytes, bytes.length)
    val meta = mutable.LinkedHashMap.empty[String, String]
    try {
      var stop = false
      while (!stop && b.remaining >= 8)
        stop = readElement(b, explicitVr, meta, emit = true)
    } catch { case Truncated => () }
    meta.toMap
  }

  /** Codegen entry for the `dicom_parse` expression: null for
    * non-DICOM bytes, else the flat key→value map (truncated input
    * yields the tags present in the prefix — over full file contents
    * truncation cannot occur). */
  def parseToMapData(bytes: Array[Byte]): MapData = {
    if (!isDicom(bytes)) return null
    val m = parse(bytes).meta
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    var i = 0
    m.foreach { case (k, v) =>
      keys(i) = UTF8String.fromString(k)
      vals(i) = UTF8String.fromString(v)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys),
      new GenericArrayData(vals))
  }

  /** Deterministic voxel content hash — the engine-side equivalent of
    * the reference's voxel-array equality (nibabel `get_data()`
    * compare, do_dicom_compare_recup_to.py:234-243): md5 over the
    * geometry that DEFINES the voxel grid (rows × cols × bits ×
    * samples × frames) plus the pixel payload trimmed to the
    * geometry's byte count (strips the standard's even-length pad
    * byte). No other header field participates, so a re-headered copy
    * (different PatientName / SeriesInstanceUID / dates) hashes EQUAL
    * and any single voxel flip hashes DIFFERENT. */
  def voxelHash(meta: Map[String, String], pixels: Array[Byte])
      : String = {
    if (pixels == null) return null
    def iv(k: String): Option[Long] = meta.get(k)
      .flatMap(_.split('\\').headOption)
      .flatMap(v => v.trim.toLongOption)
    val rows = iv("Rows"); val cols = iv("Columns")
    val bits = iv("BitsAllocated")
    val samples = iv("SamplesPerPixel").getOrElse(1L)
    val frames = iv("NumberOfFrames").getOrElse(1L)
    val expected = for (r <- rows; c <- cols; bt <- bits)
      yield r * c * math.max(bt / 8, 1) * samples * frames
    val n = expected.filter(e => e > 0 && e <= pixels.length)
      .map(_.toInt).getOrElse(pixels.length)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update((s"${rows.getOrElse(-1L)}x${cols.getOrElse(-1L)}x" +
      s"${bits.getOrElse(-1L)}x${samples}x$frames:")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    md.update(pixels, 0, n)
    md.digest().map("%02x".format(_)).mkString
  }

  /** Codegen entry for the `dicom_voxel_hash` expression: null for
    * non-DICOM bytes, truncated input, or absent/encapsulated pixel
    * data; else the [[voxelHash]] hex string. */
  def voxelHashOrNull(bytes: Array[Byte]): UTF8String = {
    if (!isDicom(bytes)) return null
    val r = parseWithPixels(bytes)
    if (r.pixels == null || !r.complete) return null
    UTF8String.fromString(voxelHash(r.meta, r.pixels))
  }

  /** One dataset element. Returns true iff the element is TOP-LEVEL
    * PixelData (cursor left at its tag — nothing of the value is
    * read). Inside a sequence item (`stopAtPixelData = false`) a
    * nested (7FE0,0010) — icon image sequences, hostile files — is an
    * ordinary element to skip: rewinding there would respin the item
    * walk forever. */
  private def readElement(b: Buf, explicitVr: Boolean,
      meta: mutable.LinkedHashMap[String, String], emit: Boolean,
      stopAtPixelData: Boolean = true): Boolean = {
    b.need(8)
    val group = b.u16()
    val elem = b.u16()
    if (group == 0x7FE0 && elem == 0x0010 && stopAtPixelData) {
      b.pos -= 4; return true
    }
    if (group == 0xFFFE) { // stray delimiter at this level: skip
      b.u32(); return false
    }
    val tagKey = (group << 16) | elem
    var vr: String = null
    var len: Long = 0L
    if (explicitVr) {
      vr = b.vr2()
      len = if (longFormVRs(vr)) { b.skip(2); b.u32() } else b.u16().toLong
    } else {
      vr = dict.get(tagKey).map(_._2).getOrElse("UN")
      len = b.u32()
    }
    // SQ (either length form) and undefined-length OB/OW (encapsulated
    // frames) are structural: walk past them, never stringify
    if (vr == "SQ" || len == Undefined) {
      skipSequence(b, explicitVr, len)
      return false
    }
    if (len < 0 || len > b.remaining) throw Truncated
    val n = len.toInt
    if (!emit) { b.skip(n); return false }
    // Siemens CSA private blocks — magic-gated, so a non-Siemens
    // (0029,10xx) simply falls through to the hex-keyed default
    if (group == 0x0029 && (elem == 0x1010 || elem == 0x1020)) {
      val blob = b.bytes(n)
      val prefix = if (elem == 0x1010) "CsaImage" else "CsaSeries"
      if (!parseCsa(blob, prefix, meta))
        () // non-SV10 payload: binary, left un-stringified
      return false
    }
    val key = dict.get(tagKey).map(_._1).getOrElse(f"$group%04x,$elem%04x")
    // a corrupt value length that is not a multiple of the VR width
    // must still consume ALL n bytes, or every later tag parses
    // misaligned — decode whole units, then skip the remainder
    def slack(w: Int): Unit = b.skip(n % w)
    val value: String =
      if (stringVRs(vr)) trimPad(DicomLike.decodeUtf8OrLatin1(b.bytes(n)))
      else vr match {
        case "US" => val v = decodeInts(b, n, 2, signed = false); slack(2); v
        case "SS" => val v = decodeInts(b, n, 2, signed = true); slack(2); v
        case "UL" => val v = decodeInts(b, n, 4, signed = false); slack(4); v
        case "SL" => val v = decodeInts(b, n, 4, signed = true); slack(4); v
        case "FL" =>
          val v = (0 until n / 4).map(_ => java.lang.Float
            .intBitsToFloat(b.i32()).toString).mkString("\\")
          slack(4); v
        case "FD" =>
          val v = (0 until n / 8).map { _ =>
            val lo = b.u32(); val hi = b.u32()
            java.lang.Double.longBitsToDouble((hi << 32) | lo).toString
          }.mkString("\\")
          slack(8); v
        case "AT" =>
          val v = (0 until n / 4).map(_ => f"${b.u16()}%04x${b.u16()}%04x")
            .mkString("\\")
          slack(4); v
        case _ => b.skip(n); null // OB/OW/UN payloads stay binary
      }
    if (value != null) meta(key) = value
    false
  }

  private def decodeInts(b: Buf, n: Int, w: Int, signed: Boolean)
      : String =
    (0 until n / w).map { _ =>
      val raw = if (w == 2) b.u16().toLong else b.u32()
      val v =
        if (!signed) raw
        else if (w == 2) raw.toShort.toLong
        else raw.toInt.toLong
      v.toString
    }.mkString("\\")

  /** Trailing NUL/space padding strip (DICOM pads values to even
    * length); leading whitespace also dropped for sanity. */
  private def trimPad(s: String): String = {
    var end = s.length
    while (end > 0 && (s(end - 1) == '\u0000' || s(end - 1) == ' '))
      end -= 1
    var start = 0
    while (start < end && s(start) == ' ') start += 1
    s.substring(start, end)
  }

  /** Structurally skip a sequence (or encapsulated pixel items):
    * defined length skips in one hop; undefined length walks item
    * tags — nested undefined-length items recurse through the element
    * reader with emit off — until the (FFFE,E0DD) delimiter. */
  private def skipSequence(b: Buf, explicitVr: Boolean, len: Long)
      : Unit = {
    if (len != Undefined) {
      if (len < 0 || len > b.remaining) throw Truncated
      b.skip(len.toInt)
      return
    }
    var done = false
    while (!done) {
      b.need(8)
      val group = b.u16(); val elem = b.u16()
      val itemLen = b.u32()
      if (group == 0xFFFE && elem == 0xE0DD) done = true
      else if (group == 0xFFFE && elem == 0xE000) {
        if (itemLen == Undefined) {
          // item dataset: read (skip) elements until its delimiter
          var itemDone = false
          while (!itemDone) {
            b.need(8)
            val g2 = (b.a(b.pos) & 0xFF) | ((b.a(b.pos + 1) & 0xFF) << 8)
            val e2 = (b.a(b.pos + 2) & 0xFF) |
              ((b.a(b.pos + 3) & 0xFF) << 8)
            if (g2 == 0xFFFE && e2 == 0xE00D) {
              b.skip(8); itemDone = true
            } else readElement(b, explicitVr, null, emit = false,
              stopAtPixelData = false)
          }
        } else {
          if (itemLen > b.remaining) throw Truncated
          b.skip(itemLen.toInt)
        }
      } else throw Truncated // lost alignment inside the sequence
    }
  }

  // ------------------------------------------------------------------
  // Siemens CSA block (SV10 "CSA2" layout — public format, documented
  // by nibabel's csareader): magic 'SV10' + 4 unused bytes, uint32
  // n_tags, uint32 check (77), then per tag: name char[64] (NUL
  // terminated), int32 vm, char[4] vr, int32 syngodt, int32 n_items,
  // int32 check; per item: 4×int32 header whose SECOND field is the
  // item byte length, then the value padded to a 4-byte boundary.
  // ------------------------------------------------------------------

  /** @return true iff the blob carried the SV10 magic (parsed). */
  private def parseCsa(blob: Array[Byte], prefix: String,
      meta: mutable.LinkedHashMap[String, String]): Boolean = {
    if (blob.length < 16 || blob(0) != 'S' || blob(1) != 'V' ||
      blob(2) != '1' || blob(3) != '0') return false
    val b = new Buf(blob, blob.length)
    b.pos = 8
    try {
      val nTags = b.i32()
      b.skip(4) // check word (77)
      if (nTags <= 0 || nTags > 4096) return true
      var t = 0
      while (t < nTags) {
        val name = asciiz(b.bytes(64))
        b.skip(4) // vm
        b.skip(4) // vr chars
        b.skip(4) // syngodt
        val nItems = b.i32()
        b.skip(4) // check
        val vals = mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < nItems) {
          b.skip(4)
          val itemLen = b.i32()
          b.skip(8)
          if (itemLen < 0 || itemLen > b.remaining) throw Truncated
          val v = trimPad(DicomLike.decodeUtf8OrLatin1(b.bytes(itemLen)))
          if (v.nonEmpty) vals += v
          b.skip((4 - itemLen % 4) % 4)
          i += 1
        }
        if (name == "MrPhoenixProtocol" && vals.nonEmpty)
          parseAscconv(vals.head, prefix + ".MrPhoenixProtocol.", meta)
        else if (vals.nonEmpty && name.nonEmpty)
          meta(prefix + "." + name) = vals.mkString("\\")
        t += 1
      }
    } catch { case Truncated => () } // keep what parsed; blob was CSA
    true
  }

  private def asciiz(bytes: Array[Byte]): String = {
    var end = 0
    while (end < bytes.length && bytes(end) != 0) end += 1
    new String(bytes, 0, end,
      java.nio.charset.StandardCharsets.US_ASCII).trim
  }

  /** MrPhoenixProtocol ASCCONV text block → dotted keys (the
    * `sSliceArray.asSlice[0].sPosition.dTra` shapes the reference's
    * fallback chains read, Exam_info.py:556-565). Values strip
    * surrounding quotes; lines outside BEGIN/END are ignored. */
  private def parseAscconv(text: String, prefix: String,
      meta: mutable.LinkedHashMap[String, String]): Unit = {
    val begin = text.indexOf("### ASCCONV BEGIN")
    val end = text.indexOf("### ASCCONV END")
    if (begin < 0 || end < 0 || end <= begin) return
    // a malformed single-line BEGIN…END (no newline between) must not
    // throw out of the parser — there is no body to read
    val nl = text.indexOf('\n', begin)
    if (nl < 0 || nl >= end) return
    val body = text.substring(nl + 1, end)
    body.split('\n').foreach { line =>
      val eq = line.indexOf('=')
      if (eq > 0) {
        val key = line.substring(0, eq).trim
        var v = line.substring(eq + 1).trim
        if (v.length >= 2 && v.head == '"' && v.last == '"')
          v = v.substring(1, v.length - 1)
        if (key.nonEmpty) meta(prefix + key) = v
      }
    }
  }
}
