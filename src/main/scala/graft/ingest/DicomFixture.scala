package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** Test-side DICOM writer: builds REAL explicit-VR little-endian files
  * (and CSA SV10 blobs) so the codec parses actual tag streams, not
  * pre-split fixture columns. Byte layouts follow the public standard —
  * the same structures DicomCodec reads. */
object DicomFixture {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private val longFormVRs =
    Set("OB", "OW", "OF", "OD", "OL", "OV", "SQ", "UC", "UR", "UT",
      "UN", "SV", "UV")

  /** One explicit-VR element; value padded to even length (NUL for UI,
    * space otherwise, per the standard's padding rules). */
  def el(group: Int, elem: Int, vr: String, value: Array[Byte])
      : Array[Byte] = {
    val padded =
      if (value.length % 2 == 0) value
      else value :+ (if (vr == "UI" || vr == "OB") 0.toByte
                     else ' '.toByte)
    val header =
      if (longFormVRs(vr))
        le16(group) ++ le16(elem) ++ vr.getBytes(US_ASCII) ++
          Array[Byte](0, 0) ++ le32(padded.length.toLong)
      else
        le16(group) ++ le16(elem) ++ vr.getBytes(US_ASCII) ++
          le16(padded.length)
    header ++ padded
  }

  def elS(group: Int, elem: Int, vr: String, value: String): Array[Byte] =
    el(group, elem, vr, value.getBytes(US_ASCII))

  /** Implicit-VR element (tag + 4-byte length, no VR bytes). */
  def elI(group: Int, elem: Int, value: String): Array[Byte] = {
    val vb = value.getBytes(US_ASCII)
    val padded = if (vb.length % 2 == 0) vb else vb :+ ' '.toByte
    le16(group) ++ le16(elem) ++ le32(padded.length.toLong) ++ padded
  }

  /** Defined-length SQ with one item holding the given elements. */
  def sq(group: Int, elem: Int, itemBody: Array[Byte]): Array[Byte] = {
    val item = le16(0xFFFE) ++ le16(0xE000) ++
      le32(itemBody.length.toLong) ++ itemBody
    le16(group) ++ le16(elem) ++ "SQ".getBytes(US_ASCII) ++
      Array[Byte](0, 0) ++ le32(item.length.toLong) ++ item
  }

  /** Undefined-length SQ: item + item-delimiter datasets, closed by the
    * sequence delimitation item. */
  def sqUndefined(group: Int, elem: Int, itemBody: Array[Byte])
      : Array[Byte] =
    le16(group) ++ le16(elem) ++ "SQ".getBytes(US_ASCII) ++
      Array[Byte](0, 0) ++ le32(0xFFFFFFFFL) ++
      le16(0xFFFE) ++ le16(0xE000) ++ le32(0xFFFFFFFFL) ++ itemBody ++
      le16(0xFFFE) ++ le16(0xE00D) ++ le32(0) ++
      le16(0xFFFE) ++ le16(0xE0DD) ++ le32(0)

  /** CSA SV10 blob: per tag a name and its item values (the CSA2
    * layout nibabel's csareader documents). */
  def csaBlob(tags: Seq[(String, Seq[String])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("SV10".getBytes(US_ASCII))
    out.write(Array[Byte](4, 3, 2, 1))
    out.write(le32(tags.length.toLong))
    out.write(le32(77L))
    tags.foreach { case (name, values) =>
      val nameBytes = java.util.Arrays.copyOf(
        name.getBytes(US_ASCII), 64)
      out.write(nameBytes)
      out.write(le32(values.length.toLong)) // vm
      out.write(java.util.Arrays.copyOf("CS".getBytes(US_ASCII), 4))
      out.write(le32(3L)) // syngodt
      out.write(le32(values.length.toLong)) // n_items
      out.write(le32(77L)) // check
      values.foreach { v =>
        val vb = v.getBytes(US_ASCII)
        out.write(le32(vb.length.toLong))
        out.write(le32(vb.length.toLong)) // item length = 2nd field
        out.write(le32(vb.length.toLong))
        out.write(le32(0L))
        out.write(vb)
        out.write(new Array[Byte]((4 - vb.length % 4) % 4))
      }
    }
    out.toByteArray
  }

  /** An MrPhoenixProtocol-style text with an ASCCONV block. */
  def ascconv(entries: Seq[(String, String)]): String =
    "<XProtocol> binary-ish preamble\n### ASCCONV BEGIN object=MrProt\n" +
      entries.map { case (k, v) => s"$k\t = $v" }.mkString("\n") +
      "\n### ASCCONV END ###\ntrailing bytes"

  /** Whole file: preamble + DICM + file meta (explicit VR transfer
    * syntax) + dataset elements + optional OB PixelData. */
  def file(dataset: Array[Byte], pixel: Array[Byte] = Array.emptyByteArray,
      transferSyntax: String = "1.2.840.10008.1.2.1"): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(new Array[Byte](128))
    out.write("DICM".getBytes(US_ASCII))
    out.write(elS(0x0002, 0x0010, "UI", transferSyntax))
    out.write(dataset)
    if (pixel.nonEmpty) out.write(el(0x7FE0, 0x0010, "OB", pixel))
    out.toByteArray
  }

  /** Deflated explicit VR LE (1.2.840.10008.1.2.1.99): the dataset
    * (and pixel element) after the file-meta group is one raw zlib
    * stream. */
  def fileDeflated(dataset: Array[Byte],
      pixel: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val plain = dataset ++ (if (pixel.nonEmpty)
      el(0x7FE0, 0x0010, "OB", pixel) else Array.emptyByteArray)
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(plain); d.finish()
    val out = new ByteArrayOutputStream()
    val chunk = new Array[Byte](8192)
    while (!d.finished()) out.write(chunk, 0, d.deflate(chunk))
    d.end()
    val meta = new ByteArrayOutputStream()
    meta.write(new Array[Byte](128))
    meta.write("DICM".getBytes(US_ASCII))
    meta.write(elS(0x0002, 0x0010, "UI", "1.2.840.10008.1.2.1.99"))
    meta.write(out.toByteArray)
    meta.toByteArray
  }

  /** The IngestSpec shape: one series/instance/echo/expected header
    * with junk pixel bytes that a correct parser never reads. */
  def simpleFile(seriesUid: String, instance: Int, echo: Int,
      expected: Int, pixelBytes: Int = 2048): Array[Byte] =
    file(
      elS(0x0008, 0x0060, "CS", "MR") ++
        elS(0x0020, 0x000E, "UI", seriesUid) ++
        elS(0x0020, 0x0013, "IS", instance.toString) ++
        elS(0x0018, 0x0086, "IS", echo.toString) ++
        elS(0x0020, 0x1002, "IS", expected.toString),
      pixel = Array.fill[Byte](pixelBytes)(0x55))
}
