package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load
import graft.functions.Fns.{decSum, decSumD}

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
    * duplicates within the watermark are dropped — the reference's
    * identity-probe skip, Cenir_DB.py:88-104) then the same tumbling
    * aggregate. dropDuplicatesWithinWatermark is the state-bounded
    * form — plain dropDuplicates("event_id") would keep every id ever
    * seen (the event-time column isn't in the key set, so the watermark
    * never evicts dedup state). */
  def hourlyCountsStream(events: DataFrame): DataFrame =
    hourly(
      events
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("event_id"))

  /** Sliding 2-hour windows advancing hourly, per event type — every
    * event lands in exactly two windows. Spark's `window()` generates
    * the window set inline (a generator, not a join), so the only
    * shuffle is the group-by on (window, type); at 100 TB the 2×
    * row fan-out is absorbed by map-side partial aggregation. */
  private def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), decSumD(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  def slidingCountsBatch(events: DataFrame): DataFrame =
    sliding(events).orderBy(col("win_start"), col("event_type"))

  /** Streaming twin of [[slidingCountsBatch]]; the watermark closes a
    * sliding window once event time passes win_end + 2 h, bounding
    * state to (watermark / slide) open windows per type. */
  def slidingCountsStream(events: DataFrame): DataFrame =
    sliding(events.withWatermark("ts", "2 hours"))

  /** Click→purchase attribution: every (purchase, click) pair of the
    * same user with the click inside the hour before the purchase.
    * The join is an equi-join on user_id with a time-range residual —
    * one shuffle on the key, per-user fan-out bounded by the window
    * (never a cartesian). The streaming twin is a watermarked
    * stream-stream interval join: the range condition plus both
    * watermarks lets Spark evict click state older than one hour past
    * the watermark, so state is bounded at any input rate. */
  private def attributionJoin(purchases: DataFrame, clicks: DataFrame)
      : DataFrame =
    purchases.join(clicks,
      purchases("user_id") === clicks("user_id") &&
        clicks("c_ts") <= purchases("p_ts") &&
        clicks("c_ts") > purchases("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("click_id"))

  def attributionBatch(events: DataFrame): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    attributionJoin(p, c).orderBy(col("purchase_id"), col("click_id"))
  }

  /** Streaming form: both sides watermarked so join state is evicted
    * once event time passes the range bound. */
  def attributionStream(purchases: DataFrame, clicks: DataFrame)
      : DataFrame = {
    val p = purchases.select(col("user_id"), col("ts").as("p_ts"),
      col("event_id").as("purchase_id")).withWatermark("p_ts", "2 hours")
    val c = clicks.select(col("user_id"), col("ts").as("c_ts"),
      col("event_id").as("click_id")).withWatermark("c_ts", "2 hours")
    attributionJoin(p, c)
  }

  /** Batch high-watermark selection (`--days N` analog): only rows newer
    * than the cutoff flow; pushed to the scan as a range filter. */
  def incrementalSince(events: DataFrame, cutoff: String): DataFrame =
    events.filter(col("ts") >= lit(cutoff).cast("timestamp"))

  /** Batch sessionization: gap > `gapSec` starts a new session; one
    * window pass (lag → flag → running sum) then a hash aggregate.
    * The streaming twin is [[graft.streaming.Sessionize]]
    * (flatMapGroupsWithState); SessionizeSpec asserts parity. */
  def sessionizeBatch(events: DataFrame, gapSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sec = unix_timestamp(col("ts"))
    val newSess = when(
      sec - lag(sec, 1).over(byUser) > gapSec || lag(sec, 1).over(byUser).isNull,
      1L).otherwise(0L)
    events
      .withColumn("sess", sum(newSess).over(byUser))
      .groupBy(col("user_id"), col("sess"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("sess"))
  }

  /** Incremental aggregate maintenance — the materialized-view delta
    * algebra a 100 TB refresh actually runs: the standing hourly
    * aggregate is kept as MERGEABLE partials (count + exact DECIMAL
    * sum), a new batch aggregates alone, and the refreshed view is a
    * re-aggregation of the two partial sets — only the delta is ever
    * rescanned. The oracle recomputes the whole aggregate from
    * scratch, pinning the maintenance algebra (partial ∪ partial →
    * merge ≡ full recompute) under the hash gate. Decimal partials
    * keep the merge exact and associative; a double partial would make
    * the result depend on which rows landed in which batch. */
  def incrementalHourly(events: DataFrame, cutoff: String): DataFrame = {
    val cut = lit(cutoff).cast("timestamp")
    finalizeHourly(mergePartials(
      partialHourly(events.filter(col("ts") < cut)),
      partialHourly(events.filter(col("ts") >= cut))))
  }

  /** One batch's mergeable partials (the foreachBatch body's first
    * half): count + exact DECIMAL sum per (hour, type). */
  def partialHourly(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("pn"), decSum(col("value")).as("pv"))

  /** Fold two partial sets — associative and exact, so batches can
    * arrive in any order and any grouping. */
  def mergePartials(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("window"), col("event_type"))
      .agg(sum(col("pn")).as("pn"), sum(col("pv")).as("pv"))

  /** Partials → the servable view (same schema as
    * [[hourlyCountsBatch]]). */
  def finalizeHourly(partials: DataFrame): DataFrame =
    partials.select(col("window.start").as("hour_start"),
        col("event_type"), col("pn").as("n"),
        col("pv").cast("double").as("total_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** Per-hour trending top-k: rank event types inside each tumbling
    * window by count (tie-break on the type name) and keep the top
    * `k`. Batch form of the dashboard "trending now" panel; the
    * streaming twin re-ranks the maintained hourly counts inside
    * foreachBatch (ranking is not incrementally expressible in append
    * mode — the COUNTS are the incremental state, the rank is a cheap
    * per-refresh derivation over type-cardinality-bounded rows;
    * StreamingSpec proves two micro-batches land on the batch answer).
    * Scale shape: one (hour, type) hash aggregate with map-side
    * partials; the rank window runs over aggregated rows only —
    * type-cardinality × hours, never event-cardinality. */
  def windowedTopK(events: DataFrame, k: Int): DataFrame =
    topKFromHourly(events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n")), k)

  /** The rank-derivation half of [[windowedTopK]], split out so the
    * streaming twin can re-rank the MAINTAINED hourly counts (the s5
    * partial store) inside foreachBatch instead of re-scanning
    * events. */
  def topKFromHourly(hourly: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byHour = Window.partitionBy(col("hour_start"))
      .orderBy(col("n").desc, col("event_type"))
    hourly.withColumn("rk", row_number().over(byHour))
      .filter(col("rk") <= k)
      .select(col("hour_start"), col("rk"), col("event_type"), col("n"))
      .orderBy(col("hour_start"), col("rk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_tumbling_window" -> ((s, dir) =>
      hourlyCountsBatch(load(s, dir, "events"))),
    "s7_windowed_topk" -> ((s, dir) =>
      windowedTopK(load(s, dir, "events"), 3)),
    "s5_incremental_agg" -> ((s, dir) =>
      incrementalHourly(load(s, dir, "events"), "2024-01-20 00:00:00")),
    // The NATIVE gap-session operator (session_window) next to s2's
    // manual lag→flag→running-sum build: same 2-hour gap, and the
    // oracle re-derives the merge rule exactly (a new session starts
    // iff the gap is >= 2 h — Spark merges on strict overlap, so an
    // exact-gap event opens a new window; session end = last ts +
    // gap). In streaming this operator is state-store-backed with
    // watermark eviction — the batch form here shares the plan shape:
    // one shuffle on user_id, sessions assembled inside the aggregate.
    "s6_session_window" -> ((s, dir) =>
      load(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "2 hours"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))),
    "s2_sessionize" -> ((s, dir) =>
      sessionizeBatch(load(s, dir, "events"), 7200L)),
    "s3_sliding_window" -> ((s, dir) =>
      slidingCountsBatch(load(s, dir, "events"))),
    "s4_click_attribution" -> ((s, dir) =>
      attributionBatch(load(s, dir, "events")))
  )

  val oracle: Map[String, String] = Map(
    "s1_tumbling_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
        |       event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
        |         AS total_value
        |FROM events GROUP BY 1,2 ORDER BY hour_start, event_type""".stripMargin,

    // from-scratch recompute: equality proves the partial-merge algebra
    "s5_incremental_agg" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
        |       event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
        |         AS total_value
        |FROM events GROUP BY 1,2 ORDER BY hour_start, event_type""".stripMargin,

    "s7_windowed_topk" ->
      """WITH hourly AS (
        |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
        |         event_type, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |ranked AS (
        |  SELECT hour_start, event_type, n,
        |         ROW_NUMBER() OVER (PARTITION BY hour_start
        |                            ORDER BY n DESC, event_type) AS rk
        |  FROM hourly)
        |SELECT hour_start, CAST(rk AS INT) AS rk, event_type, n
        |FROM ranked WHERE rk <= 3
        |ORDER BY hour_start, rk""".stripMargin,

    "s2_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
        |           - lag(CAST(floor(epoch(ts)) AS BIGINT))
        |             OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           > 7200
        |         OR lag(ts) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |sessed AS (
        |  SELECT user_id, ts,
        |    SUM(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM marked)
        |SELECT user_id, CAST(sess AS BIGINT) AS sess,
        |  MIN(CAST(ts AS TIMESTAMP)) AS session_start,
        |  MAX(CAST(ts AS TIMESTAMP)) AS session_end,
        |  COUNT(*) AS n_events
        |FROM sessed GROUP BY 1,2 ORDER BY user_id, sess""".stripMargin,

    "s6_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id,
        |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
        |         OR CAST(ts AS TIMESTAMP) >=
        |            lag(CAST(ts AS TIMESTAMP)) OVER w + INTERVAL 2 HOUR
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessed AS (
        |  SELECT user_id, t,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM marked)
        |SELECT user_id, MIN(t) AS session_start,
        |  MAX(t) + INTERVAL 2 HOUR AS session_end,
        |  COUNT(*) AS n_events
        |FROM sessed GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin,

    // Each event belongs to the two hourly-advancing 2-hour windows
    // starting at trunc(ts)-1h and trunc(ts); the unnest replays
    // Spark's window generator exactly.
    "s3_sliding_window" ->
      """WITH fan AS (
        |  SELECT unnest([date_trunc('hour', ts),
        |                 date_trunc('hour', ts) - INTERVAL 1 HOUR])
        |           AS win_start,
        |         event_type, value
        |  FROM events)
        |SELECT CAST(win_start AS TIMESTAMP) AS win_start, event_type,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
        |         AS total_value
        |FROM fan GROUP BY 1,2 ORDER BY win_start, event_type""".stripMargin,

    // µs CASTs: the raw parquet is ns; Spark compares at the µs the
    // load truncates to.
    "s4_click_attribution" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        | AND CAST(c.ts AS TIMESTAMP) >
        |     CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |ORDER BY purchase_id, click_id""".stripMargin
  )
}
