package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{DicomCodec, DicomLike}
import graft.DicomFixture._

/** Golden tests for the dependency-free DICOM codec (S6) and CSA /
  * MrPhoenixProtocol flattening (S7): explicit+implicit VR tag streams,
  * sequence skipping, stop-before-pixels, truncation/regrow contract,
  * and the dotted-key surface the reference's fallback chains read
  * (Exam_info.py:458-461,556-565,617-624). */
class DicomCodecSpec extends AnyFunSuite {

  test("explicit-VR tags decode to keyword-keyed strings") {
    val f = file(
      elS(0x0008, 0x0060, "CS", "MR") ++
        elS(0x0008, 0x0070, "LO", "SIEMENS") ++
        elS(0x0008, 0x103E, "LO", "t1_mpr_sag") ++
        elS(0x0020, 0x000E, "UI", "1.2.840.999.1") ++
        elS(0x0020, 0x0013, "IS", "7") ++
        elS(0x0018, 0x0081, "DS", "2.98") ++
        el(0x0028, 0x0010, "US", Array[Byte](0, 1)) ++ // 256 LE
        elS(0x0028, 0x0030, "DS", "1.25\\1.25"))
    val r = DicomCodec.parse(f)
    assert(r.complete)
    assert(r.meta("Modality") == "MR")
    assert(r.meta("Manufacturer") == "SIEMENS")
    assert(r.meta("SeriesDescription") == "t1_mpr_sag")
    assert(r.meta("SeriesInstanceUID") == "1.2.840.999.1")
    assert(r.meta("InstanceNumber") == "7")
    assert(r.meta("EchoTime") == "2.98")
    assert(r.meta("Rows") == "256")
    assert(r.meta("PixelSpacing") == "1.25\\1.25")
  }

  test("widened dictionary rows decode (dates, geometry, pixel desc)") {
    val f = file(
      elS(0x0008, 0x0021, "DA", "20240102") ++
        elS(0x0020, 0x1041, "DS", "-42.5") ++
        el(0x0028, 0x0100, "US", Array[Byte](16, 0)) ++
        elS(0x0028, 0x0004, "CS", "MONOCHROME2") ++
        elS(0x0028, 0x1050, "DS", "40\\400"))
    val m = DicomCodec.parse(f).meta
    assert(m("SeriesDate") == "20240102")
    assert(m("SliceLocation") == "-42.5")
    assert(m("BitsAllocated") == "16")
    assert(m("PhotometricInterpretation") == "MONOCHROME2")
    assert(m("WindowCenter") == "40\\400")
  }

  test("unknown tags key as gggg,eeee hex (the [0x19,0x109c] GE probe)") {
    val f = file(elS(0x0019, 0x109C, "LO", "epi_pepolar") ++
      elS(0x0020, 0x000E, "UI", "1.2.3"))
    val m = DicomCodec.parse(f).meta
    assert(m("0019,109c") == "epi_pepolar")
    assert(m("SeriesInstanceUID") == "1.2.3")
  }

  test("implicit-VR transfer syntax parses via the dictionary") {
    val f = file(
      elI(0x0008, 0x0060, "MR") ++
        elI(0x0020, 0x000E, "1.2.840.999.2") ++
        elI(0x0020, 0x0013, "42"),
      transferSyntax = "1.2.840.10008.1.2")
    val m = DicomCodec.parse(f).meta
    assert(m("Modality") == "MR")
    assert(m("SeriesInstanceUID") == "1.2.840.999.2")
    assert(m("InstanceNumber") == "42")
  }

  test("sequences skip structurally, defined and undefined length") {
    val inner = elS(0x0008, 0x0060, "CS", "XX") // would clobber if read
    val f = file(
      elS(0x0008, 0x0060, "CS", "MR") ++
        sq(0x0008, 0x1140, inner) ++
        sqUndefined(0x0008, 0x1115, inner) ++
        elS(0x0020, 0x000E, "UI", "1.9.9"))
    val m = DicomCodec.parse(f).meta
    assert(m("Modality") == "MR") // not overwritten by sequence bodies
    assert(m("SeriesInstanceUID") == "1.9.9") // tags after the SQs parse
  }

  test("a nested PixelData tag inside a sequence item is skipped, " +
      "not an infinite loop") {
    // icon image sequences legitimately nest (7FE0,0010); only the
    // TOP-LEVEL pixel element stops the walk
    val iconItem = elS(0x0008, 0x0060, "CS", "XX") ++
      el(0x7FE0, 0x0010, "OB", Array.fill[Byte](32)(5))
    val f = file(
      elS(0x0008, 0x0060, "CS", "MR") ++
        sqUndefined(0x0088, 0x0200, iconItem) ++
        elS(0x0020, 0x000E, "UI", "1.10.10"),
      pixel = Array.fill[Byte](64)(9))
    val r = DicomCodec.parse(f)
    assert(r.complete)
    assert(r.meta("Modality") == "MR")
    assert(r.meta("SeriesInstanceUID") == "1.10.10")
  }

  test("odd-length numeric values consume their slack byte (no tag " +
      "stream desync)") {
    // hand-rolled US element with corrupt length 3: decode 1 short,
    // skip 1 slack byte, and the NEXT tag must still parse aligned
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    val badUs = le16(0x0028) ++ le16(0x0010) ++
      "US".getBytes ++ le16(3) ++ Array[Byte](0, 1, 99)
    val f = file(badUs ++ elS(0x0020, 0x000E, "UI", "1.12.12"))
    val m = DicomCodec.parse(f).meta
    assert(m("Rows") == "256")
    assert(m("SeriesInstanceUID") == "1.12.12")
  }

  test("parse stops before PixelData — garbage pixels never misparse") {
    // pixel payload full of bytes that would decode as nonsense tags
    val junk = Array.fill[Byte](4096)(0xFE.toByte)
    val f = file(elS(0x0020, 0x000E, "UI", "1.5.5"), pixel = junk)
    val r = DicomCodec.parse(f)
    assert(r.complete)
    assert(r.meta("SeriesInstanceUID") == "1.5.5")
    assert(!r.meta.contains("7fe0,0010"))
  }

  test("a prefix cut mid-header reports incomplete; full bytes complete") {
    val f = file(
      elS(0x0020, 0x000E, "UI", "1.7.7") ++
        elS(0x0008, 0x103E, "LO", "x" * 300),
      pixel = Array.fill[Byte](64)(1))
    val cut = java.util.Arrays.copyOf(f, 200) // inside the LO value
    val partial = DicomCodec.parse(cut)
    assert(!partial.complete)
    assert(partial.meta("SeriesInstanceUID") == "1.7.7")
    assert(DicomCodec.parse(f).complete)
  }

  test("deflated transfer syntax inflates and parses (incl. " +
      "stop-before-pixels inside the inflated stream)") {
    val f = fileDeflated(
      elS(0x0008, 0x0060, "CS", "MR") ++
        elS(0x0020, 0x000E, "UI", "1.11.11") ++
        elS(0x0020, 0x0013, "IS", "3"),
      pixel = Array.fill[Byte](2048)(0x7C))
    val r = DicomCodec.parse(f)
    assert(r.complete)
    assert(r.meta("Modality") == "MR")
    assert(r.meta("SeriesInstanceUID") == "1.11.11")
    assert(r.meta("InstanceNumber") == "3")
    // a cut through the deflate stream reports incomplete, parses what
    // inflated cleanly — the DSv2 regrow contract holds for deflated
    // files too
    val cut = java.util.Arrays.copyOf(f, f.length - 10)
    assert(!DicomCodec.parse(cut).complete)
  }

  test("CSA image + series blocks flatten to dotted keys") {
    val img = csaBlob(Seq(
      "PixelSpacing" -> Seq("1.25", "1.25"),
      "SliceThickness" -> Seq("3.0"),
      "PhaseEncodingDirection" -> Seq("COL"),
      "EmptyTag" -> Seq()))
    val ser = csaBlob(Seq(
      "MrPhoenixProtocol" -> Seq(ascconv(Seq(
        "sSliceArray.asSlice[0].sPosition.dTra" -> "-10.5",
        "sSliceArray.asSlice[0].sPosition.dSag" -> "0.25",
        "sSliceArray.asSlice[1].sPosition.dTra" -> "-7.5",
        "tSequenceFileName" -> "\"%SiemensSeq%\\ep2d_diff\"",
        "sKSpace.lBaseResolution" -> "128"))),
      "NumberOfPrescans" -> Seq("2")))
    val f = file(
      elS(0x0020, 0x000E, "UI", "1.3.3") ++
        el(0x0029, 0x1010, "OB", img) ++
        el(0x0029, 0x1020, "OB", ser))
    val m = DicomCodec.parse(f).meta
    assert(m("CsaImage.PixelSpacing") == "1.25\\1.25")
    assert(m("CsaImage.SliceThickness") == "3.0")
    assert(m("CsaImage.PhaseEncodingDirection") == "COL")
    assert(!m.contains("CsaImage.EmptyTag"))
    assert(m("CsaSeries.NumberOfPrescans") == "2")
    assert(m("CsaSeries.MrPhoenixProtocol.sSliceArray.asSlice[0].sPosition.dTra")
      == "-10.5")
    assert(m("CsaSeries.MrPhoenixProtocol.sSliceArray.asSlice[1].sPosition.dTra")
      == "-7.5")
    // quoted strings unquote (the tSequenceFileName shape)
    assert(m("CsaSeries.MrPhoenixProtocol.tSequenceFileName")
      == "%SiemensSeq%\\ep2d_diff")
    assert(m("CsaSeries.MrPhoenixProtocol.sKSpace.lBaseResolution") == "128")
  }

  test("deterministic fuzz: DICM magic + garbage never throws") {
    // hostile archives contain truncated/corrupt files; the scan must
    // skip them (possibly with partial meta), never crash. LCG keeps
    // the fuzz reproducible.
    var seed = 0x2545F4914F6CDD1DL
    def next(): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 33).toInt
    }
    (0 until 200).foreach { i =>
      val len = 132 + math.abs(next()) % 4000
      val bytes = new Array[Byte](len)
      var j = 0
      while (j < len) { bytes(j) = next().toByte; j += 1 }
      bytes(128) = 'D'; bytes(129) = 'I'; bytes(130) = 'C'; bytes(131) = 'M'
      val r = DicomCodec.parse(bytes) // must not throw
      assert(r != null, s"fuzz case $i")
    }
    // a malformed single-line ASCCONV block must not throw either
    val f = file(el(0x0029, 0x1020, "OB", csaBlob(Seq(
      "MrPhoenixProtocol" -> Seq(
        "### ASCCONV BEGIN x=1 ### ASCCONV END ###")))))
    assert(DicomCodec.parse(f).complete)
  }

  test("non-SV10 private 0029 payloads stay binary (no garbage keys)") {
    val f = file(
      elS(0x0020, 0x000E, "UI", "1.4.4") ++
        el(0x0029, 0x1010, "OB", Array[Byte](1, 2, 3, 4, 5, 6)))
    val m = DicomCodec.parse(f).meta
    assert(m.keys.forall(k => !k.startsWith("CsaImage")))
  }

  test("metaFallback + indexed probe read parser-produced keys") {
    val spark = SharedSpark.spark
    val ser = csaBlob(Seq(
      "MrPhoenixProtocol" -> Seq(ascconv(Seq(
        "sSliceArray.asSlice[0].sPosition.dTra" -> "-10.5",
        "sDiffusion.alBValue[0]" -> "0",
        "sDiffusion.alBValue[1]" -> "1000",
        "sCoilSelectMeas.asList[0].sCoilElementID.tCoilID" -> "\"HeadMatrix\""
      )))))
    val bytes = file(elS(0x0020, 0x000E, "UI", "1.6.6") ++
      el(0x0029, 0x1020, "OB", ser))
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    graft.GraftFunctions.register(spark)
    val df = Seq(bytes).toDF("content")
      .select(expr("dicom_parse(content)").as("meta"))
    // the CoilName fallback chain (Exam_info.py:617-624) over real keys
    val coil = df.select(DicomLike.metaFallback(col("meta"), Seq(
      "CsaSeries.MrPhoenixProtocol.sCoilSelectMeas.asList[0].sCoilElementID.tCoilID",
      "TransmitCoilName"), "unknown")).head().getString(0)
    assert(coil == "HeadMatrix")
    // the alBValue[%d] while-probe loop (Exam_info.py:694-728),
    // vectorized over the parser's indexed ASCCONV keys
    val bvals = df.select(DicomLike.metaIndexedProbe(col("meta"),
      "CsaSeries.MrPhoenixProtocol.sDiffusion.alBValue", 4))
      .head().getSeq[String](0)
    assert(bvals == Seq("0", "1000"))
  }

  test("series duration reads lTotalScanTimeSec from the parsed " +
      "ASCCONV keys (no subprocess grep)") {
    val spark = SharedSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    graft.GraftFunctions.register(spark)
    val withTag = file(elS(0x0020, 0x000E, "UI", "1.2.1") ++
      el(0x0029, 0x1020, "OB", csaBlob(Seq(
        "MrPhoenixProtocol" -> Seq(ascconv(Seq(
          "lTotalScanTimeSec" -> "182")))))))
    val withoutTag = file(elS(0x0020, 0x000E, "UI", "1.2.2"))
    val got = Seq(withTag, withoutTag).toDF("content")
      .select(expr("dicom_parse(content)").as("meta"))
      .select(DicomLike.seriesDurationSec(col("meta")).as("d"))
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(got == Seq(0, 182)) // absent tag → the reference's 0 fallback
  }

  test("dicom_parse is NULL on non-DICOM bytes (sniff fused into parse)") {
    val spark = SharedSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    graft.GraftFunctions.register(spark)
    val rows = Seq("junk".getBytes,
        file(elS(0x0020, 0x000E, "UI", "1.8.8")))
      .toDF("content")
      .select(expr("dicom_parse(content)").as("meta"))
      .selectExpr("meta IS NULL").as[Boolean].collect().sorted
    assert(rows.toSeq == Seq(false, true))
  }
}
