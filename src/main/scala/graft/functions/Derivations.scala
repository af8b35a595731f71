package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's derivation when-chains (SURVEY §2.8 "conditionals"),
  * re-expressed as pure Column expressions.
  *
  * Faithful to the documented semantics at:
  *  - rid machine→room (Exam_info.py:262-278; exam variant
  *    do_dicom.py:533-544)
  *  - eid/facturable prefix strip (Exam_info.py:280-289;
  *    do_dicom.py:547-564)
  *  - SeqType sequence classifier (Exam_info.py:293-344)
  *  - MachineName repair (Exam_info.py:145-152)
  *  - DICOM date+time parse with fallback chain (Exam_info.py:171-188)
  *  - Siemens TA duration parse (Exam_info.py:1470-1487)
  *  - birthdate/age parse (Exam_info.py:235-243; do_dicom.py:498-503)
  */
object Derivations {

  /** Machine name → room id (Exam_info.py:262-278 + exam-level additions
    * do_dicom.py:533-544). */
  def rid(machine: Column): Column =
    when(machine.contains("Verio"), 19)
      .when(machine.contains("TrioTim"), 1)
      .when(machine.contains("Prisma_fit"), 1)
      .when(machine.contains("SIGNA"), 29)
      .when(machine.contains("Bruker"), 39)
      .when(machine.contains("MAGNETOM Cima"), 80)
      .when(machine.contains("Terra.X"), 82)
      .otherwise(0)

  /** Billable-protocol id: strip a 6-char (PROTO_/VERIO_) or 7-char
    * (PRISMA_/CIMAX1_/TERRAX_) prefix → facturable; else the raw
    * description, not facturable (Exam_info.py:280-289). */
  def eid(studyDesc: Column): Column =
    when(studyDesc.startsWith("PROTO_") || studyDesc.startsWith("VERIO_"),
      substring(studyDesc, 7, 1000))
      .when(studyDesc.startsWith("PRISMA_") || studyDesc.startsWith("CIMAX1_") ||
        studyDesc.startsWith("TERRAX_"), substring(studyDesc, 8, 1000))
      .otherwise(studyDesc)

  def facturable(studyDesc: Column): Column =
    when(studyDesc.startsWith("PROTO_") || studyDesc.startsWith("VERIO_") ||
      studyDesc.startsWith("PRISMA_") || studyDesc.startsWith("CIMAX1_") ||
      studyDesc.startsWith("TERRAX_"), 1).otherwise(0)

  /** Sequence-type classifier (Exam_info.py:293-344): ordered contains
    * chain over the sequence name, with the mp2rage sub-classification
    * taken from the series name. */
  def seqType(seqName: Column, sName: Column): Column =
    when(seqName.contains("ep_b"), lit("DWI"))
      .when(seqName.contains("epfid"), lit("EPI"))
      .when(seqName.contains("spc3d"), lit("SPACE3D"))
      .when(seqName.contains("tfl3d") && sName.contains("mp2rage"),
        concat(lit("MP2RAGE_"),
          when(sName.contains("INV1"), "INV1")
            .when(sName.contains("INV2"), "INV2")
            .when(sName.contains("T1MAP"), "T1MAP")
            .otherwise("UNI")))
      .when(seqName.contains("tfl3d"), lit("MPRAGE"))
      .when(seqName.contains("fm2d2r"), lit("GreFieldMap"))
      .when(seqName.contains("gre_2D"), lit("GRE_2D"))
      .when(seqName.contains("gre_3D"), lit("GRE_3D"))
      .when(seqName.contains("eja_svs"), lit("spectroSVS"))
      .otherwise(lit("to_be_defined"))

  /** MachineName repair (Exam_info.py:145-152): model-name fallback to
    * manufacturer; the GE offline-recon alias normalized. */
  def machineName(model: Column, manufacturer: Column): Column =
    when(coalesce(model, lit("")) === "Ox Offline Recon", "SIGNA PET/MR")
      .otherwise(coalesce(model, manufacturer))

  /** DICOM date+time parse (Exam_info.py:171-188): YYYYMMDD + HHMMSS(.f)
    * with acquisition→study fallback per field. */
  def dicomTimestamp(acqDate: Column, acqTime: Column,
      studyDate: Column, studyTime: Column): Column = {
    def parse(d: Column, t: Column): Column =
      to_timestamp(concat(d, substring(t, 1, 6)), "yyyyMMddHHmmss")
    coalesce(parse(acqDate, acqTime), parse(studyDate, studyTime))
  }

  /** Siemens TA duration parse (Exam_info.py:1470-1487):
    * "TA 03:50*3" → (3*60+50)*3 seconds; "TA 03.x" → (3+1)*60. */
  def taSeconds(ta: Column): Column = {
    val mm = regexp_extract(ta, "TA (\\d+):(\\d+)", 1).cast("int")
    val ss = regexp_extract(ta, "TA (\\d+):(\\d+)", 2).cast("int")
    val mult = regexp_extract(ta, "\\*(\\d+)", 1)
    val multN = when(mult === "", 1).otherwise(mult.cast("int"))
    val dotMm = regexp_extract(ta, "TA (\\d+)\\.", 1).cast("int")
    when(regexp_extract(ta, "TA (\\d+):(\\d+)", 0) =!= "",
      (mm * 60 + ss) * multN)
      .when(dotMm.isNotNull, (dotMm + 1) * 60)
  }

  /** PatientsAge "042Y" → 42 (do_dicom.py:498-503). */
  def ageYears(age: Column): Column =
    regexp_extract(age, "^(\\d{1,3})", 1).cast("int")
}
