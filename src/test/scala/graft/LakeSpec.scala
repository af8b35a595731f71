package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.catalog.Lake
import graft.functions.BvecMath
import graft.ingest.DicomLike

/** Lake MERGE sink (K3 persisted), bvec geometry, and map fallback. */
class LakeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("lake mergeWrite: create, update, keep, insert, idempotence") {
    val path = Files.createTempDirectory("graft_lake")
      .resolve("exam").toString

    val c0 = Lake.mergeWrite(spark, path,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "price"),
      "id")
    assert(c0 == Map("inserted" -> 2L))

    val batch = Seq((2L, "b", 99.0), (3L, "c", 30.0))
      .toDF("id", "name", "price")
    val c1 = Lake.mergeWrite(spark, path, batch, "id")
    assert(c1 == Map("kept" -> 1L, "updated" -> 1L, "inserted" -> 1L))

    val state = spark.read.parquet(path).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(state == Seq((1L, "a", 10.0), (2L, "b", 99.0), (3L, "c", 30.0)))

    // re-merging the same batch is a no-op on disk (the --twice story)
    val c2 = Lake.mergeWrite(spark, path, batch, "id")
    assert(c2 == Map("kept" -> 3L))
    val state2 = spark.read.parquet(path).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(state2 == state)
  }

  test("lake recovers a table lost mid-swap from .bak") {
    val path = Files.createTempDirectory("graft_lake_crash")
      .resolve("t").toString
    Lake.mergeWrite(spark, path,
      Seq((1L, "a", 1.0)).toDF("id", "name", "price"), "id")
    // simulate a writer that died between the two renames:
    // current table renamed away, .bak is the only copy
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(s"file://$path"),
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + ".bak")))
    // next merge must restore the backup, not treat the batch as the
    // whole table
    val counts = Lake.mergeWrite(spark, path,
      Seq((2L, "b", 2.0)).toDF("id", "name", "price"), "id")
    assert(counts == Map("kept" -> 1L, "inserted" -> 1L))
    assert(spark.read.parquet(path).count() == 2)
  }

  test("bvec rotation: identity and axis swap goldens") {
    val id = BvecMath.rotationFromOrientation((1, 0, 0), (0, 1, 0))
    assert(BvecMath.rotate(id, (0.5, -0.5, 0.7)) == ((0.5, -0.5, 0.7)))
    // row along +y, col along +z → third dir = y×z = +x
    val rot = BvecMath.rotationFromOrientation((0, 2, 0), (0, 0, 4))
    assert(rot._3 == ((1.0, 0.0, 0.0)))
    assert(BvecMath.rotate(rot, (1, 0, 0)) == ((0.0, 1.0, 0.0)))
    assert(BvecMath.flipSigns((1, 2, 3), flipX = true, flipY = false,
      flipZ = true) == ((-1.0, 2.0, -3.0)))
  }

  test("metaIndexedProbe collects present indexed keys in order") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      Map("asList[0]" -> "a", "asList[2]" -> "c"),
      Map[String, String]())
      .toDF("meta")
    val got = df.select(DicomLike.metaIndexedProbe(col("meta"), "asList", 4))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a", "c"), Seq()))
  }

  test("decodeUtf8OrLatin1 falls back on invalid utf8") {
    assert(DicomLike.decodeUtf8OrLatin1("héllo".getBytes("UTF-8")) == "héllo")
    val latin1 = "Pâtient".getBytes("ISO-8859-1") // invalid as UTF-8
    assert(DicomLike.decodeUtf8OrLatin1(latin1) == "Pâtient")
  }

  test("metaFallback resolves dotted keys in order with default") {
    val df = Seq(
      Map("CsaImage.CoilName" -> "HeadNeck"),
      Map("CoilString" -> "Spine"),
      Map("unrelated" -> "x"))
      .toDF("meta")
    val got = df.select(DicomLike.metaFallback(col("meta"),
      Seq("CsaImage.CoilName", "CoilString"), "NULL")).as[String]
      .collect().toSeq
    assert(got == Seq("HeadNeck", "Spine", "NULL"))
  }
}
