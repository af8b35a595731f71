package graft.ingest

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed ingest record — SURVEY §1.5: the reference's nested
  * exam→series dict (one exam dict holding a list of per-series dicts,
  * Exam_info.py:95-96) becomes `Dataset[Exam]` with a series array;
  * flattening to the relational `serie` table is one `explode`, and
  * re-nesting is one groupBy+collect_list. Encoders give compile-time
  * schemas both ways.
  */
object TypedPipeline {

  case class Serie(suid: String, snumber: Int, seq_name: String,
    n_files: Long, duration_sec: Long)

  case class Exam(euid: String, machine: String, acquired: Timestamp,
    series: Seq[Serie])

  /** Flatten nested exams to the relational serie table (sink shape,
    * Cenir_DB.py:124-132). */
  def toSerieTable(exams: Dataset[Exam]): Dataset[(String, Serie)] = {
    val spark = exams.sparkSession
    import spark.implicits._
    exams.flatMap(e => e.series.map(s => (e.euid, s)))
  }

  /** Re-nest the relational form back to Dataset[Exam] (series ordered
    * by snumber — the reference's sort-by-SNumber, Exam_info.py:197). */
  def toNested(flat: Dataset[(String, Serie)],
      examMeta: Dataset[(String, String, Timestamp)]): Dataset[Exam] = {
    val spark = flat.sparkSession
    import spark.implicits._
    val grouped = flat.groupByKey(_._1)
      .mapGroups((euid, rows) =>
        (euid, rows.map(_._2).toSeq.sortBy(_.snumber)))
    grouped.joinWith(examMeta, grouped("_1") === examMeta("_1"))
      .map { case ((euid, series), (_, machine, acquired)) =>
        Exam(euid, machine, acquired, series)
      }
  }

  /** Exam duration from the typed record: total series seconds, ceil
    * to minutes (the summed form — series start times are not part of
    * this record, so the reference's first-to-last variant
    * (Exam_info.py:196-232) lives in the relational a6/a7 queries). */
  def withDurations(exams: Dataset[Exam]): Dataset[(String, Long)] = {
    val spark = exams.sparkSession
    import spark.implicits._
    exams.map { e =>
      val dur = if (e.series.isEmpty) 0L
      else (e.series.map(_.duration_sec).sum + 59) / 60
      (e.euid, dur)
    }
  }
}
