package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load
import graft.functions.Fns.decSumD

/** Incremental/streaming layer — SURVEY.md §2.9.
  *
  * The reference's incremental modes are batch-with-watermark (`--days`
  * mtime pruning, common.py:267-306; logfile watermark,
  * do_dicom_series_DB.py:35-45) plus idempotent upsert for late/dup data.
  * Structured Streaming replaces both: a checkpointed source, watermarked
  * event-time dedup (the reference's SUID skip), and tumbling windows
  * (the reference's substr(ts,1,N) time buckets, Cenir_DB.py:453).
  *
  * The same transform is exposed in batch ([[hourlyCountsBatch]], the
  * oracle-checked `s1_tumbling_window` query) and streaming
  * ([[hourlyCountsStream]]) form; StreamingSpec asserts they agree on
  * identical input.
  */
object EventStream {

  /** Core transform: tumbling 1-hour windows per event type. */
  private def hourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), decSumD(col("value")).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  def hourlyCountsBatch(events: DataFrame): DataFrame =
    hourly(events).orderBy(col("hour_start"), col("event_type"))

  /** Streaming form: watermarked event-time dedup on event_id (late
    * duplicates within 2 h are dropped — the reference's identity-probe
    * skip, Cenir_DB.py:88-104) then the same tumbling aggregate.
    * Append-capable: the watermark bounds state. */
  def hourlyCountsStream(events: DataFrame): DataFrame =
    hourly(
      events
        .withWatermark("ts", "2 hours")
        .dropDuplicates("event_id"))

  /** Batch high-watermark selection (`--days N` analog): only rows newer
    * than the cutoff flow; pushed to the scan as a range filter. */
  def incrementalSince(events: DataFrame, cutoff: String): DataFrame =
    events.filter(col("ts") >= lit(cutoff).cast("timestamp"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_tumbling_window" -> ((s, dir) =>
      hourlyCountsBatch(load(s, dir, "events")))
  )

  val oracle: Map[String, String] = Map(
    "s1_tumbling_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
        |       event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
        |         AS total_value
        |FROM events GROUP BY 1,2 ORDER BY hour_start, event_type""".stripMargin
  )
}
