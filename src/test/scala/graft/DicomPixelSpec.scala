package graft

import graft.DicomFixture._
import graft.ingest.{DicomCodec, DicomLike}
import org.scalatest.funsuite.AnyFunSuite

/** Full-fidelity pixel path (the K6/J6 voxel compare,
  * do_dicom_compare_recup_to.py:234-243 / Exam_info.py:1009-1021):
  * the opt-in PixelData reader + the deterministic voxel hash. Golden
  * contract: same voxels under different headers hash EQUAL; one
  * flipped byte hashes DIFFERENT; encapsulated payloads are null. */
class DicomPixelSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def us(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  /** rows×cols 8-bit mono geometry + identity headers. */
  private def ds(series: String, patient: String, rows: Int, cols: Int)
      : Array[Byte] =
    elS(0x0008, 0x0060, "CS", "MR") ++
      elS(0x0010, 0x0010, "PN", patient) ++
      elS(0x0020, 0x000E, "UI", series) ++
      elS(0x0020, 0x0013, "IS", "1") ++
      el(0x0028, 0x0010, "US", us(rows)) ++
      el(0x0028, 0x0011, "US", us(cols)) ++
      el(0x0028, 0x0100, "US", us(8))

  private val voxels: Array[Byte] =
    (0 until 12).map(i => (i * 7 + 3).toByte).toArray // 3×4 grid

  test("pixel payload round-trips through the opt-in reader") {
    val f = file(ds("S1", "DOE", 3, 4), pixel = voxels)
    val r = DicomCodec.parseWithPixels(f)
    assert(r.complete)
    assert(r.meta("Rows") == "3" && r.meta("Columns") == "4")
    assert(r.pixels.toSeq == voxels.toSeq)
    // the header-only walk still never touches pixels
    assert(DicomCodec.parse(f).meta == r.meta)
  }

  test("same voxels, different headers -> equal hash; flipped byte -> differs") {
    val a = DicomCodec.parseWithPixels(
      file(ds("S1", "DOE", 3, 4), pixel = voxels))
    val b = DicomCodec.parseWithPixels(
      file(ds("S2.REANONYMIZED", "ANON", 3, 4), pixel = voxels))
    val flipped = voxels.clone(); flipped(5) = (flipped(5) ^ 0x01).toByte
    val c = DicomCodec.parseWithPixels(
      file(ds("S1", "DOE", 3, 4), pixel = flipped))
    val (ha, hb, hc) = (DicomCodec.voxelHash(a.meta, a.pixels),
      DicomCodec.voxelHash(b.meta, b.pixels),
      DicomCodec.voxelHash(c.meta, c.pixels))
    assert(ha == hb)
    assert(ha != hc)
    // geometry is part of the identity: same bytes read as 4×3 differ
    val d = DicomCodec.parseWithPixels(
      file(ds("S1", "DOE", 4, 3), pixel = voxels))
    assert(DicomCodec.voxelHash(d.meta, d.pixels) != ha)
  }

  test("even-length padding does not leak into the hash") {
    // 1×5 grid: 5 voxel bytes, the writer pads the element to 6 —
    // the geometry-trimmed hash must equal an unpadded-identical grid
    val five = Array[Byte](10, 20, 30, 40, 50)
    val r = DicomCodec.parseWithPixels(
      file(ds("S1", "DOE", 1, 5), pixel = five))
    assert(r.pixels.length == 6) // stored padded
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update("1x5x8x1x1:".getBytes("US-ASCII"))
    md.update(five)
    val want = md.digest().map("%02x".format(_)).mkString
    assert(DicomCodec.voxelHash(r.meta, r.pixels) == want)
  }

  test("deflated and plain encodings of the same file hash equal") {
    val plain = file(ds("S1", "DOE", 3, 4), pixel = voxels)
    val defl = fileDeflated(ds("S1", "DOE", 3, 4), pixel = voxels)
    val (a, b) =
      (DicomCodec.parseWithPixels(plain), DicomCodec.parseWithPixels(defl))
    assert(b.pixels != null)
    assert(DicomCodec.voxelHash(a.meta, a.pixels) ==
      DicomCodec.voxelHash(b.meta, b.pixels))
  }

  test("encapsulated (undefined-length) pixel data stays null") {
    def le32(v: Long): Array[Byte] = Array((v & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 24) & 0xFF).toByte)
    def le16b(v: Int): Array[Byte] = us(v)
    val frag = Array[Byte](1, 2, 3, 4)
    val encapsulated =
      le16b(0x7FE0) ++ le16b(0x0010) ++ "OB".getBytes ++
        Array[Byte](0, 0) ++ le32(0xFFFFFFFFL) ++
        le16b(0xFFFE) ++ le16b(0xE000) ++ le32(frag.length.toLong) ++ frag ++
        le16b(0xFFFE) ++ le16b(0xE0DD) ++ le32(0)
    val out = new java.io.ByteArrayOutputStream()
    out.write(new Array[Byte](128)); out.write("DICM".getBytes)
    out.write(elS(0x0002, 0x0010, "UI", "1.2.840.10008.1.2.1"))
    out.write(ds("S1", "DOE", 3, 4)); out.write(encapsulated)
    val r = DicomCodec.parseWithPixels(out.toByteArray)
    assert(r.complete && r.pixels == null)
    assert(DicomCodec.voxelHashOrNull(out.toByteArray) == null)
  }

  test("truncated bytes yield null pixels, incomplete") {
    val f = file(ds("S1", "DOE", 3, 4), pixel = voxels)
    val r = DicomCodec.parseWithPixels(
      java.util.Arrays.copyOf(f, f.length - 4))
    assert(!r.complete && r.pixels == null)
  }

  test("fuzz: parseWithPixels never throws on cuts or DICM-magic garbage") {
    val rnd = new scala.util.Random(42)
    val base = file(ds("S1", "DOE", 3, 4), pixel = voxels)
    (1 to 300).foreach { _ =>
      val cut = rnd.nextInt(base.length + 1)
      DicomCodec.parseWithPixels(java.util.Arrays.copyOf(base, cut)): Unit
    }
    (1 to 150).foreach { _ =>
      val junk = new Array[Byte](140 + rnd.nextInt(500))
      rnd.nextBytes(junk)
      junk(128) = 'D'; junk(129) = 'I'; junk(130) = 'C'; junk(131) = 'M'
      DicomCodec.parseWithPixels(junk): Unit
    }
  }

  test("stack voxel hash: re-headered stack equal, one bad file differs") {
    import org.apache.spark.sql.functions.col
    def write(dir: java.io.File, series: String, patient: String,
        corruptInstance: Int = -1): Unit = {
      dir.mkdirs()
      (1 to 3).foreach { i =>
        val px = (0 until 12)
          .map(j => (j * 11 + i * 31).toByte).toArray[Byte]
        if (i == corruptInstance) px(0) = (px(0) ^ 0x40).toByte
        val body = elS(0x0008, 0x0060, "CS", "MR") ++
          elS(0x0010, 0x0010, "PN", patient) ++
          elS(0x0020, 0x000E, "UI", series) ++
          elS(0x0020, 0x0013, "IS", i.toString) ++
          el(0x0028, 0x0010, "US", us(3)) ++
          el(0x0028, 0x0011, "US", us(4)) ++
          el(0x0028, 0x0100, "US", us(8))
        java.nio.file.Files.write(
          new java.io.File(dir, s"i$i.dcm").toPath, file(body, pixel = px))
      }
    }
    val root = java.nio.file.Files
      .createTempDirectory("graft_voxel").toFile
    write(new java.io.File(root, "orig"), "SER.A", "DOE")
    write(new java.io.File(root, "recovered"), "SER.B", "ANON")
    write(new java.io.File(root, "damaged"), "SER.C", "DOE",
      corruptInstance = 2)
    def hashOf(sub: String): String =
      DicomLike.stackVoxelHash(
        spark.read.format("binaryFile")
          .load(new java.io.File(root, sub).getAbsolutePath))
        .select(col("stack_voxel_hash")).collect().head.getString(0)
    assert(hashOf("orig") == hashOf("recovered"))
    assert(hashOf("orig") != hashOf("damaged"))
  }
}
