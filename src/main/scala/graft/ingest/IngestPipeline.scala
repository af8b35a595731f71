package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's §3.1 ingest lifecycle (Exam_info.py:41-118) as ONE
  * oracle-checked query: synthesize a deterministic DICOM corpus on
  * local disk, parse it with the real codec (`dicom_parse`), STAGE the
  * parse boundary as an exploded (path, length, key, value) parquet,
  * then run the genuine relational chain — parseHeaders → stacks →
  * exams + per-series duration — in Spark. The DuckDB oracle
  * re-derives the same exam report INDEPENDENTLY from the staged kv
  * table (pivot by key → stack aggregate → exam rollup), so the chain
  * downstream of the codec sits under the same hash gate as every
  * other operator; the codec itself stays golden-tested byte-level in
  * DicomCodecSpec (DuckDB cannot parse DICOM).
  *
  * Corpus shape (every §2.5 A10/A11 corrupt flag fires at least once):
  * clean series with ASCCONV scan duration, GAP+BAD_COUNT series,
  * DUP-instance series, a two-echo series (two stacks, one series),
  * an implicit-VR series, a deflated-transfer-syntax series, and one
  * non-DICOM junk file the sniff must drop. */
object IngestPipeline {

  private val StageRoot = "/tmp/graft_stage"

  /** Deterministic corpus — same bytes every call (overwrite-stable
    * under Bench's warmup+3 timed runs). */
  private def writeCorpus(dir: java.io.File): Unit = {
    import graft.DicomFixture._
    dir.mkdirs()
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(
        new java.io.File(dir, name).toPath, bytes)
    def durationBlob(sec: Int): Array[Byte] =
      el(0x0029, 0x1020, "OB", csaBlob(Seq(
        "MrPhoenixProtocol" -> Seq(ascconv(Seq(
          "lTotalScanTimeSec" -> sec.toString))))))
    def explicitDs(series: String, inst: Int, echo: Int, expected: Int,
        extra: Array[Byte] = Array.emptyByteArray): Array[Byte] =
      elS(0x0008, 0x0060, "CS", "MR") ++
        elS(0x0020, 0x000E, "UI", series) ++
        elS(0x0020, 0x0013, "IS", inst.toString) ++
        elS(0x0018, 0x0086, "IS", echo.toString) ++
        elS(0x0020, 0x1002, "IS", expected.toString) ++ extra

    // EXAM01.1 — clean, 10 instances, scan duration 300 s
    (1 to 10).foreach { i =>
      put(s"EXAM01.1_e1_i$i.dcm", file(
        explicitDs("EXAM01.1", i, 1, 10, durationBlob(300)),
        pixel = Array.fill[Byte](1024)(0x55)))
    }
    // EXAM01.2 — instance 5 missing, expected 8: BAD_COUNT + GAP
    Seq(1, 2, 3, 4, 6, 7, 8).foreach { i =>
      put(s"EXAM01.2_e1_i$i.dcm", file(
        explicitDs("EXAM01.2", i, 1, 8),
        pixel = Array.fill[Byte](512)(0x22)))
    }
    // EXAM02.1 — two echoes, 6 instances each: two clean stacks of one
    // series; duration 120 s
    for (e <- 1 to 2; i <- 1 to 6)
      put(s"EXAM02.1_e${e}_i$i.dcm", file(
        explicitDs("EXAM02.1", i, e, 6, durationBlob(120)),
        pixel = Array.fill[Byte](256)(0x11)))
    // EXAM02.2 — duplicate instance 2 (files 1,2,2b,3), expected 4:
    // DUP but neither BAD_COUNT nor GAP — the n_distinct-vs-range
    // distinction A11 encodes
    Seq("i1" -> 1, "i2" -> 2, "i2b" -> 2, "i3" -> 3).foreach {
      case (tag, i) =>
        put(s"EXAM02.2_e1_$tag.dcm", file(
          explicitDs("EXAM02.2", i, 1, 4),
          pixel = Array.fill[Byte](128)(0x33)))
    }
    // EXAM03.1 — implicit VR little endian, 5 clean instances
    (1 to 5).foreach { i =>
      val ds = elI(0x0008, 0x0060, "MR") ++
        elI(0x0020, 0x000E, "EXAM03.1") ++
        elI(0x0020, 0x0013, i.toString) ++
        elI(0x0018, 0x0086, "1") ++
        elI(0x0020, 0x1002, "5")
      put(s"EXAM03.1_e1_i$i.dcm",
        file(ds, transferSyntax = "1.2.840.10008.1.2"))
    }
    // EXAM03.2 — deflated transfer syntax, 3 clean instances,
    // duration 450 s
    (1 to 3).foreach { i =>
      put(s"EXAM03.2_e1_i$i.dcm", fileDeflated(
        explicitDs("EXAM03.2", i, 1, 3, durationBlob(450)),
        pixel = Array.fill[Byte](64)(0x44)))
    }
    // non-DICOM junk: the magic sniff (NULL contract) must drop it
    put("junk.bin", Array.fill[Byte](600)(0x7A))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "i1_ingest_pipeline" -> ((s, _) => {
      val src = new java.io.File(StageRoot, "i1_src")
      writeCorpus(src)
      val binary = s.read.format("binaryFile").load(src.getAbsolutePath)
      val meta = DicomLike.parseMeta(binary)
      // stage the parse boundary for the oracle: one row per
      // (file, header key) — scalar columns DuckDB pivots back
      meta.select(col("path"), col("length"),
          explode(col("meta")).as(Seq("key", "value")))
        .write.mode("overwrite").parquet(s"$StageRoot/i1_kv")
      val headers = DicomLike.parseHeaders(binary)
      val exams = DicomLike.exams(DicomLike.stacks(headers))
      val durPerExam = meta.select(
          element_at(col("meta"), "SeriesInstanceUID").as("series_uid"),
          DicomLike.seriesDurationSec(col("meta")).as("dur"))
        .filter(col("series_uid").isNotNull)
        .groupBy(col("series_uid")).agg(max(col("dur")).as("dur"))
        .withColumn("exam_uid", substring(col("series_uid"), 1, 6))
        .groupBy(col("exam_uid"))
        .agg(sum(col("dur")).cast("long").as("total_duration_sec"))
      exams.join(durPerExam, "exam_uid")
        .select(col("exam_uid"), col("n_series"), col("n_files"),
          col("fsize"),
          expr("array_join(transform(series_order, x -> x.series_uid), ',')")
            .as("series_csv"),
          col("any_corrupt"), col("total_duration_sec"))
        .orderBy(col("exam_uid"))
    }))

  /** Independent DuckDB re-derivation from the staged kv parquet.
    * parseHeaders' try_cast/null-filter stance maps to TRY_CAST +
    * WHERE; the stack corrupt flags and the exam rollup mirror
    * DicomLike.stacks/exams column for column. */
  def oracle: Map[String, String] = Map(
    "i1_ingest_pipeline" ->
      s"""WITH kv AS (
         |  SELECT * FROM read_parquet('$StageRoot/i1_kv/*.parquet')),
         |hdr AS (
         |  SELECT path, MAX(length) AS length,
         |    MAX(CASE WHEN key='SeriesInstanceUID' THEN value END) AS series_uid,
         |    TRY_CAST(MAX(CASE WHEN key='InstanceNumber' THEN value END) AS INT) AS instance_number,
         |    COALESCE(MAX(CASE WHEN key='EchoNumbers' THEN value END), '1') AS echo,
         |    TRY_CAST(MAX(CASE WHEN key='ImagesInAcquisition' THEN value END) AS INT) AS expected_count,
         |    COALESCE(TRY_CAST(MAX(CASE WHEN key='CsaSeries.MrPhoenixProtocol.lTotalScanTimeSec' THEN value END) AS INT), 0) AS duration_sec
         |  FROM kv GROUP BY path),
         |h AS (
         |  SELECT * FROM hdr WHERE series_uid IS NOT NULL
         |    AND instance_number IS NOT NULL AND expected_count IS NOT NULL),
         |st AS (
         |  SELECT series_uid, echo, COUNT(*) AS n_files,
         |    COUNT(DISTINCT instance_number) AS n_distinct,
         |    MIN(instance_number) AS first_instance,
         |    MAX(instance_number) AS last_instance,
         |    MAX(expected_count) AS expected_count,
         |    CAST(SUM(length) AS BIGINT) AS fsize
         |  FROM h GROUP BY series_uid, echo),
         |stc AS (
         |  SELECT *,
         |    CONCAT(
         |      CASE WHEN n_files <> expected_count THEN 'BAD_COUNT ' ELSE '' END,
         |      CASE WHEN n_distinct <> n_files THEN 'DUP ' ELSE '' END,
         |      CASE WHEN last_instance - first_instance + 1 <> n_distinct THEN 'GAP' ELSE '' END
         |    ) AS corrupt
         |  FROM st),
         |ex AS (
         |  SELECT substr(series_uid, 1, 6) AS exam_uid,
         |    COUNT(*) AS n_series,
         |    CAST(SUM(n_files) AS BIGINT) AS n_files,
         |    CAST(SUM(fsize) AS BIGINT) AS fsize,
         |    string_agg(series_uid, ',' ORDER BY first_instance, series_uid) AS series_csv,
         |    bool_or(length(corrupt) > 0) AS any_corrupt
         |  FROM stc GROUP BY 1),
         |dur AS (
         |  SELECT substr(series_uid, 1, 6) AS exam_uid,
         |    CAST(SUM(duration_sec) AS BIGINT) AS total_duration_sec
         |  FROM (SELECT series_uid, MAX(duration_sec) AS duration_sec
         |        FROM h GROUP BY series_uid)
         |  GROUP BY 1)
         |SELECT ex.exam_uid, n_series, n_files, fsize, series_csv,
         |  any_corrupt, total_duration_sec
         |FROM ex JOIN dur USING (exam_uid)
         |ORDER BY exam_uid""".stripMargin)
}
