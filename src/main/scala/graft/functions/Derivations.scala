package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

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

  /** Machine name → room id, prefix-matched as the reference does
    * (startswith, Exam_info.py:262-278; exam-level additions with the
    * MAGNETOM rooms and the rid=0 default, do_dicom.py:533-544). */
  def rid(machine: Column): Column =
    when(machine.startsWith("Verio"), 19)
      .when(machine.startsWith("TrioTim"), 1)
      .when(machine.startsWith("Prisma_fit"), 1)
      .when(machine.startsWith("SIGNA"), 29)
      .when(machine.startsWith("Bruker"), 39)
      .when(machine.startsWith("MAGNETOM Cima"), 80)
      .when(machine.startsWith("MAGNETOM Terra.X"), 82)
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
    * chain. mp2rage detection keys on the SECOND sequence-name field
    * (seqName2, which the reference defaults to seqName when absent),
    * the sub-class on the series name with the reference's exact
    * T1_Images/UNI_Images keys and SHOULD_NOT_HAPPEN fallthrough; the
    * GRE branches match the full GR%SiemensSeq% token in seqName2. */
  def seqType(seqName: Column, seqName2: Column, sName: Column): Column =
    when(seqName.contains("ep_b"), lit("DWI"))
      .when(seqName.contains("epfid"), lit("EPI"))
      .when(seqName.contains("spc3d"), lit("SPACE3D"))
      .when(seqName.contains("tfl3d"),
        when(seqName2.contains("mp2rage"),
          concat(lit("MP2RAGE_"),
            when(sName.contains("INV1"), "INV1")
              .when(sName.contains("INV2"), "INV2")
              .when(sName.contains("T1_Images"), "T1MAP")
              .when(sName.contains("UNI_Images"), "UNI")
              .otherwise("SHOULD_NOT_HAPPEN")))
          .otherwise(lit("MPRAGE")))
      .when(seqName.contains("fm2d2r"), lit("GreFieldMap"))
      .when(seqName2.contains("GR%SiemensSeq%gre_2D"), lit("GRE_2D"))
      .when(seqName2.contains("GR%SiemensSeq%gre_3D"), lit("GRE_3D"))
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
    * "TA 03:50*3" → (3*60+50)*3; "TA 03.x*N" → (3+1)*N. The *N
    * multiplier applies to BOTH branches, and the dot branch is NOT
    * scaled by 60 — both are the reference's own behavior (the dot
    * branch's unit quirk included), ported as-is. */
  def taSeconds(ta: Column): Column = {
    // try_cast everywhere: regexp_extract yields "" on no-match, and an
    // ANSI cast of "" throws instead of returning null
    def intOf(c: Column): Column = c.try_cast(IntegerType)
    val mm = intOf(regexp_extract(ta, "TA (\\d+):(\\d+)", 1))
    val ss = intOf(regexp_extract(ta, "TA (\\d+):(\\d+)", 2))
    val multN = coalesce(intOf(regexp_extract(ta, "\\*(\\d+)", 1)), lit(1))
    val dotMm = intOf(regexp_extract(ta, "TA (\\d+)\\.", 1))
    when(mm.isNotNull && ss.isNotNull, (mm * 60 + ss) * multN)
      .when(dotMm.isNotNull, (dotMm + 1) * multN)
  }

  /** PatientsAge "042Y" → 42, null when unparseable — the reference is
    * a tolerant parse (do_dicom.py:498-503) and an ANSI cast of the
    * empty no-match extract would throw. */
  def ageYears(age: Column): Column =
    regexp_extract(age, "^(\\d{1,3})", 1).try_cast(IntegerType)

  /** PhaseDir sign suffix from PhaseEncodingDirectionPositive
    * (Exam_info.py:635-640). */
  def phaseDir(dir: Column, positive: Column): Column =
    concat(dir, when(positive > 0, "+").otherwise("-"))

  /** ExamName with the GE branch (Exam_info.py:154-167): GE prefers
    * ProtocolName, falls back to StudyDescription, then a placeholder;
    * everyone else uses StudyDescription. */
  def examName(manufacturer: Column, protocolName: Column,
      studyDesc: Column): Column =
    when(upper(manufacturer).contains("GE"),
      coalesce(protocolName, studyDesc, lit("Atrier")))
      .otherwise(studyDesc)

  /** `(null)`-in-filename repair (Exam_info.py:1593-1605): spectro files
    * embedding "(null)" are renamed from their numeric identity. */
  def repairNullFilename(name: Column, seriesNum: Column,
      acqNum: Column, instNum: Column): Column =
    when(name.contains("(null)"),
      format_string("repaired_S%d_A%d_I%d.dcm", seriesNum, acqNum, instNum))
      .otherwise(name)

  /** isinteger (common.py:115-121): parseable as int? (regex form —
    * ANSI mode makes a tolerant cast throw on malformed input). */
  def isInteger(s: Column): Column = s.rlike("^[+-]?\\d+$")

  /** my_list_to_str (Exam_info.py:1681-1690): join, skipping empties. */
  def listToStr(arr: Column, sep: String): Column =
    array_join(filter(arr, x => length(x) > 0), sep)

  /** TEvec bracketed string (Exam_info.py:842-847): "[ te1 te2 ... ]". */
  def teVecString(tes: Column): Column =
    concat(lit("[ "), array_join(tes, " "), lit(" ]"))

  /** Expected file count model (Exam_info.py:676-733, simplified to the
    * closed form): volumes × slices, except MOSAIC packs a volume per
    * file. nb_vol = diffusion directions × weightings when diffusion,
    * else repetitions+1. */
  def expectedFileCount(isMosaic: Column, nbSlice: Column,
      diffDirs: Column, diffWeights: Column, repetitions: Column): Column = {
    val nbVol = when(diffDirs.isNotNull && diffWeights.isNotNull,
      diffDirs * diffWeights).otherwise(coalesce(repetitions, lit(0)) + 1)
    when(isMosaic, nbVol).otherwise(nbVol * nbSlice)
  }

  /** TENSOR time repair (Exam_info.py:190-193,377-383): an acquisition
    * time earlier than the study time is implausible and repaired to the
    * study time; the anomaly flag is suppressed for TENSOR series (the
    * one sequence where it is expected). */
  def repairAcqTime(acq: Column, study: Column, seqType: Column)
      : (Column, Column) = (
    when(acq < study, study).otherwise(acq),
    acq < study && !seqType.contains("TENSOR"))

  /** Slice gap (Exam_info.py:556-569): ‖pos2−pos1‖ − sizeZ, clamped to
    * zero below 1e-5. */
  def sliceGap(p1: Column, p2: Column, sizeZ: Column): Column = {
    val d = sqrt(
      pow(element_at(p2, 1) - element_at(p1, 1), 2) +
      pow(element_at(p2, 2) - element_at(p1, 2), 2) +
      pow(element_at(p2, 3) - element_at(p1, 3), 2)) - sizeZ
    when(abs(d) < 1e-5, 0.0).otherwise(d)
  }
}
