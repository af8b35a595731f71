package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Derivations

/** Goldens for the derivation when-chains (reference semantics cited in
  * Derivations' Scaladoc). */
class DerivationsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("rid machine→room chain (prefix-matched like the reference)") {
    val got = Seq("Verio", "TrioTim", "Prisma_fit", "SIGNA PET/MR",
      "Bruker Biospec", "MAGNETOM Cima.X", "MAGNETOM Terra.X", "unknown",
      "not_Verio_prefix")
      .toDF("m").select(Derivations.rid(col("m"))).as[Int].collect().toSeq
    // startswith semantics: a machine merely CONTAINING "Verio" is rid 0
    assert(got == Seq(19, 1, 1, 29, 39, 80, 82, 0, 0))
  }

  test("eid prefix strip + facturable") {
    val df = Seq("PROTO_ABC", "VERIO_XY", "PRISMA_Q1", "CIMAX1_Z",
      "TERRAX_W", "freeform").toDF("s")
    val eids = df.select(Derivations.eid(col("s"))).as[String].collect().toSeq
    val fact = df.select(Derivations.facturable(col("s"))).as[Int]
      .collect().toSeq
    assert(eids == Seq("ABC", "XY", "Q1", "Z", "W", "freeform"))
    assert(fact == Seq(1, 1, 1, 1, 1, 0))
  }

  test("seqType classifier incl. mp2rage sub-classes") {
    // (seqName, seqName2, SName) → class; mp2rage keys on seqName2,
    // sub-class on SName with the reference's T1_Images/UNI_Images keys
    // and SHOULD_NOT_HAPPEN fallthrough (Exam_info.py:293-344)
    val cases = Seq(
      ("ep_b1000", "ep_b1000", "x") -> "DWI",
      ("epfid2d", "epfid2d", "x") -> "EPI",
      ("spc3d_1", "spc3d_1", "x") -> "SPACE3D",
      ("tfl3d1", "t1_mp2rage", "s_INV1") -> "MP2RAGE_INV1",
      ("tfl3d1", "t1_mp2rage", "s_INV2") -> "MP2RAGE_INV2",
      ("tfl3d1", "t1_mp2rage", "s_T1_Images") -> "MP2RAGE_T1MAP",
      ("tfl3d1", "t1_mp2rage", "s_UNI_Images") -> "MP2RAGE_UNI",
      ("tfl3d1", "t1_mp2rage", "odd") -> "MP2RAGE_SHOULD_NOT_HAPPEN",
      ("tfl3d1", "t1_mprage", "x") -> "MPRAGE",
      ("fm2d2r", "fm2d2r", "x") -> "GreFieldMap",
      ("other", "GR%SiemensSeq%gre_2D", "x") -> "GRE_2D",
      ("other", "GR%SiemensSeq%gre_3D", "x") -> "GRE_3D",
      ("eja_svs_press", "eja_svs_press", "x") -> "spectroSVS",
      ("mystery", "mystery", "x") -> "to_be_defined")
    cases.foreach { case ((sq, sq2, sn), want) =>
      val got = Seq((sq, sq2, sn)).toDF("sq", "sq2", "sn")
        .select(Derivations.seqType(col("sq"), col("sq2"), col("sn")))
        .as[String].head()
      assert(got == want, s"seqType($sq, $sq2, $sn)")
    }
  }

  test("machineName repair") {
    val got = Seq(
      (Some("Ox Offline Recon"), "GE"),
      (Some("Verio"), "Siemens"),
      (None: Option[String], "Siemens"))
      .toDF("model", "manu")
      .select(Derivations.machineName(col("model"), col("manu")))
      .as[String].collect().toSeq
    assert(got == Seq("SIGNA PET/MR", "Verio", "Siemens"))
  }

  test("dicomTimestamp with acquisition→study fallback") {
    val got = Seq(
      ("20240102", "134501.25", "20240101", "120000"),
      (null, null, "20240101", "120000"))
      .toDF("ad", "at", "sd", "st")
      .select(Derivations.dicomTimestamp(col("ad"), col("at"), col("sd"),
        col("st")).cast("string")).as[String].collect().toSeq
    assert(got == Seq("2024-01-02 13:45:01", "2024-01-01 12:00:00"))
  }

  test("Siemens TA parse") {
    // dot branch: (mm+1)*mult with NO ×60 — the reference's own unit
    // quirk (Exam_info.py:1470-1481), ported as-is
    val cases = Seq("TA 03:50*3" -> 690, "TA 01:02" -> 62,
      "TA 03.x" -> 4, "TA 03.x*5" -> 20)
    cases.foreach { case (in, want) =>
      val got = Seq(in).toDF("ta").select(Derivations.taSeconds(col("ta")))
        .as[Int].head()
      assert(got == want, s"taSeconds($in)")
    }
    // unparseable values yield null, not an ANSI cast crash
    val bad = Seq("n/a", "").toDF("ta")
      .select(Derivations.taSeconds(col("ta"))).collect()
    assert(bad.forall(_.isNullAt(0)))
    assert(Seq("unknown").toDF("a")
      .select(Derivations.ageYears(col("a"))).head.isNullAt(0))
  }

  test("age parse strips unit") {
    val got = Seq("042Y", "7", "103Y").toDF("a")
      .select(Derivations.ageYears(col("a"))).as[Int].collect().toSeq
    assert(got == Seq(42, 7, 103))
  }

  test("phaseDir appends sign") {
    val got = Seq(("COL", 1), ("ROW", 0)).toDF("d", "p")
      .select(Derivations.phaseDir(col("d"), col("p"))).as[String]
      .collect().toSeq
    assert(got == Seq("COL+", "ROW-"))
  }

  test("examName GE branch falls through protocol → study → placeholder") {
    val got = Seq(
      ("GE MEDICAL", Some("protoX"), Some("studyY")),
      ("GE MEDICAL", None: Option[String], Some("studyY")),
      ("GE MEDICAL", None: Option[String], None: Option[String]),
      ("SIEMENS", Some("protoX"), Some("studyY")))
      .toDF("m", "p", "s")
      .select(Derivations.examName(col("m"), col("p"), col("s")))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some("protoX"), Some("studyY"), Some("Atrier"),
      Some("studyY")))
  }

  test("(null) filename repair") {
    val got = Seq(("spectro(null).dcm", 5, 2, 17), ("fine.dcm", 1, 1, 1))
      .toDF("n", "sn", "an", "in")
      .select(Derivations.repairNullFilename(col("n"), col("sn"),
        col("an"), col("in"))).as[String].collect().toSeq
    assert(got == Seq("repaired_S5_A2_I17.dcm", "fine.dcm"))
  }

  test("isInteger / listToStr / teVecString") {
    val ints = Seq("42", "x", "", "007").toDF("s")
      .select(Derivations.isInteger(col("s"))).as[Boolean].collect().toSeq
    assert(ints == Seq(true, false, false, true))
    val joined = Seq(Seq("a", "", "b")).toDF("arr")
      .select(Derivations.listToStr(col("arr"), "_")).as[String].head()
    assert(joined == "a_b")
    val te = Seq(Seq("2.5", "5.1")).toDF("tes")
      .select(Derivations.teVecString(col("tes"))).as[String].head()
    assert(te == "[ 2.5 5.1 ]")
  }

  test("expectedFileCount: diffusion, repetition, mosaic branches") {
    val got = Seq(
      (false, 40, Some(30), Some(2), None: Option[Int]), // diff: 60*40
      (true, 40, Some(30), Some(2), None: Option[Int]),  // mosaic: 60
      (false, 40, None: Option[Int], None: Option[Int], Some(4)), // reps: 5*40
      (false, 40, None: Option[Int], None: Option[Int], None: Option[Int]))
      .toDF("mosaic", "slices", "dirs", "weights", "reps")
      .select(Derivations.expectedFileCount(col("mosaic"), col("slices"),
        col("dirs"), col("weights"), col("reps"))).as[Int].collect().toSeq
    assert(got == Seq(2400, 60, 200, 40))
  }

  test("repairAcqTime: repair + TENSOR-gated anomaly flag") {
    val df = Seq(
      ("2024-01-01 09:00:00", "2024-01-01 10:00:00", "DWI"),    // repaired+flag
      ("2024-01-01 09:00:00", "2024-01-01 10:00:00", "TENSOR"), // repaired, no flag
      ("2024-01-01 11:00:00", "2024-01-01 10:00:00", "DWI"))    // untouched
      .toDF("a", "s", "t")
      .select(col("a").cast("timestamp").as("a"),
        col("s").cast("timestamp").as("s"), col("t"))
    val (fixed, warn) = Derivations.repairAcqTime(col("a"), col("s"), col("t"))
    val got = df.select(fixed.cast("string"), warn)
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSeq
    assert(got == Seq(
      ("2024-01-01 10:00:00", true),
      ("2024-01-01 10:00:00", false),
      ("2024-01-01 11:00:00", false)))
  }

  test("sliceGap clamps sub-1e-5 drift to zero") {
    val got = Seq(
      (Seq(0.0, 0.0, 0.0), Seq(0.0, 0.0, 3.0), 2.5),
      (Seq(0.0, 0.0, 0.0), Seq(0.0, 0.0, 3.0), 3.0000000001))
      .toDF("p1", "p2", "z")
      .select(Derivations.sliceGap(col("p1"), col("p2"), col("z")))
      .as[Double].collect().toSeq
    assert(got.head == 0.5)
    assert(got(1) == 0.0)
  }
}
