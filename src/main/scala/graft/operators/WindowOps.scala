package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.load
import graft.functions.Fns._

/** Window family — SURVEY.md §2.6 (W1–W7).
  *
  * Reference shapes: keep-latest-by-mtime dedup (Cenir_DB.py:300-301,
  * 502-503), alphabetical first/last file (Exam_info.py:1222-1240),
  * paired-rows iteration made explicit with lead() (do_dicom.py:66-84),
  * and the early-exit max-instance scan replaced by max_by
  * (Exam_info.py:1269-1282).
  *
  * Scale notes: each window partitions by a real key (user_id,
  * event_type) so the sort is per-partition after one hash shuffle —
  * no global sort, no driver collect.
  */
object WindowOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W1 — keep latest row per key (Cenir_DB.py:300-301): row_number
    // descending over (ts, event_id), keeper = rn 1.
    "w1_keep_latest" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      load(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("ts"))
        .orderBy(col("user_id"))
    }),

    // W4 — alphabetical first/last member per group (Exam_info.py:1222).
    "w4_minmax_alpha" -> ((s, dir) => {
      load(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(min(col("props")).as("first_prop"),
          max(col("props")).as("last_prop"))
        .orderBy(col("event_type"))
    }),

    // W6 — paired rows via lead() (do_dicom.py:66-84): successor gap per
    // user; the reference's fragile rows[k],rows[k+1] loop made explicit.
    "w6_lead_pairs" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      load(s, dir, "events")
        .withColumn("next_id", lead(col("event_id"), 1).over(w))
        .withColumn("next_sec", lead(epochSec(col("ts")), 1).over(w))
        .filter(col("next_id").isNotNull)
        .select(col("event_id"), col("user_id"), col("next_id"),
          (col("next_sec") - epochSec(col("ts"))).as("gap_sec"))
        .orderBy(col("event_id"))
    }),

    // W8 — rank-distribution functions (ntile/percent_rank/cume_dist)
    // over per-language size order: the quartile/percentile labeling a
    // curriculum or quality-binning pass puts on each document. All
    // three functions ride ONE window (same partition+order → one
    // shuffle, one per-partition sort); doc_id tie-break keeps ranks
    // deterministic. percent_rank/cume_dist are exact rationals
    // computed identically by both engines, rounded to 6 places only
    // to guard against future engine-side formatting drift.
    "w8_rank_distribution" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n_chars"), col("doc_id"))
      load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pct_rank", round(percent_rank().over(w), 6))
        .withColumn("cume", round(cume_dist().over(w), 6))
        .orderBy(col("doc_id"))
    }),

    // W7 — max-instance scan via max_by (Exam_info.py:1269-1282); the
    // unique packed key makes the argmax deterministic under value ties.
    "w7_max_by_scan" -> ((s, dir) => {
      load(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(max_by(col("event_id"),
          uniqKey(col("value"), col("event_id"))).as("max_value_event"))
        .orderBy(col("event_type"))
    }),

    // W2/W3 — the in-group ORDERED MEMBER LIST (the reference sorts a
    // series' files by InstanceNumber and walks them in order,
    // Exam_info.py:197,1312): sort_array(collect_list(struct)) gives
    // the per-group order without a window state machine, and the
    // first/last members fall out of the same sorted array. The list
    // leaves the query as a CSV so both engines compare it as one
    // deterministic string (struct sort = (ts, event_id) lexicographic
    // == the oracle's ORDER BY ts, event_id).
    "w2_ordered_members" -> ((s, dir) => {
      load(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          expr("""array_join(transform(
            |  array_sort(collect_list(struct(ts, event_id))),
            |  x -> cast(x.event_id as string)), ',')""".stripMargin)
            .as("ordered_ids"),
          expr("""element_at(array_sort(collect_list(struct(ts, event_id))),
            |  1).event_id""".stripMargin).as("first_id"),
          expr("""element_at(array_sort(collect_list(struct(ts, event_id))),
            |  -1).event_id""".stripMargin).as("last_id"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    }),

    // W9 (beyond ref) — event-time RANGE frame: per user, the rolling
    // 2-hour trailing count and exact-DECIMAL value sum at every
    // event (the rate-limit / rolling-KPI window a monitoring
    // pipeline computes). rangeBetween needs a numeric ordering key:
    // epoch seconds, with the frame [-7200, 0]. Ties on the same
    // second are both inside each other's frame in BOTH engines, so
    // results stay deterministic without a unique key. Scale shape:
    // one hash shuffle on user_id, per-partition sort, single
    // sliding-frame pass — no self-join (the naive form is a range
    // self-join; the frame does it in one sweep).
    "w9_rolling_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("sec"))
        .rangeBetween(-7200L, 0L)
      load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("value"), epochSec(col("ts")).as("sec"))
        .withColumn("n_2h", count(lit(1)).over(w))
        .withColumn("sum_2h",
          sum(col("value").cast("decimal(30,6)")).over(w)
            .cast("double"))
        .select(col("user_id"), col("event_id"), col("n_2h"),
          col("sum_2h"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // W10 (beyond ref) — gaps-and-islands: per user, maximal runs of
    // CONSECUTIVE active days, reported as island count + longest
    // streak. The classic trick: over the distinct per-user day
    // sequence, day − row_number() is constant within a consecutive
    // run, so one groupBy on that difference materializes the islands
    // — no self-join, no iterative pass. Scale shape: the only
    // fact-sized shuffle is the (user_id, day) distinct (with map-side
    // partial dedup); everything after operates on the collapsed
    // ≤ days-per-user frame, so the window sort and island groupBys
    // move tiny data. Days are exact ints (datediff from the corpus
    // epoch).
    "w10_activity_islands" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("dd"))
      val days = load(s, dir, "events")
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("2024-01-01")).as("dd"))
        .distinct()
      val islands = days
        .withColumn("grp", col("dd") - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"), min(col("dd")).as("start_dd"))
        .withColumn("mx",
          max(col("len")).over(Window.partitionBy(col("user_id"))))
      islands.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"),
          max(col("len")).as("max_streak"),
          // deterministic anchor: the EARLIEST day that begins some
          // longest streak (unique because island starts are distinct)
          min(when(col("len") === col("mx"), col("start_dd")))
            .as("best_start_dd"))
        .orderBy(col("user_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "w10_activity_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |           AS dd
        |  FROM events),
        |isl AS (
        |  SELECT user_id, dd,
        |         dd - row_number() OVER (PARTITION BY user_id
        |                                 ORDER BY dd) AS grp
        |  FROM days),
        |g AS (
        |  SELECT user_id, grp, COUNT(*) AS len, MIN(dd) AS start_dd
        |  FROM isl GROUP BY 1, 2),
        |m AS (SELECT *, MAX(len) OVER (PARTITION BY user_id) AS mx
        |      FROM g)
        |SELECT user_id, COUNT(*) AS n_islands, MAX(len) AS max_streak,
        |       MIN(CASE WHEN len = mx THEN start_dd END)
        |         AS best_start_dd
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,

    "w9_rolling_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events)
        |SELECT user_id, event_id,
        |  COUNT(*) OVER w AS n_2h,
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE)
        |    AS sum_2h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |             RANGE BETWEEN 7200 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "w2_ordered_members" ->
      """WITH o AS (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS nn
        |  FROM events)
        |SELECT user_id,
        |  string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY rn)
        |    AS ordered_ids,
        |  MAX(CASE WHEN rn = 1 THEN event_id END) AS first_id,
        |  MAX(CASE WHEN rn = nn THEN event_id END) AS last_id,
        |  COUNT(*) AS n
        |FROM o GROUP BY user_id ORDER BY user_id""".stripMargin,

    "w1_keep_latest" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "w4_minmax_alpha" ->
      """SELECT event_type, MIN(props) AS first_prop, MAX(props) AS last_prop
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    "w6_lead_pairs" ->
      """SELECT event_id, user_id, next_id, next_sec - sec AS gap_sec FROM (
        |  SELECT event_id, user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_id,
        |    lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_sec
        |  FROM events) t
        |WHERE next_id IS NOT NULL ORDER BY event_id""".stripMargin,

    "w8_rank_distribution" ->
      """SELECT doc_id, lang, n_chars,
        |  NTILE(4) OVER w AS quartile,
        |  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
        |  ROUND(CUME_DIST() OVER w, 6) AS cume
        |FROM documents
        |WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)
        |ORDER BY doc_id""".stripMargin,

    "w7_max_by_scan" ->
      """SELECT event_type,
        |  arg_max(event_id, CAST(round(value*100) AS BIGINT)*10000000000 + event_id)
        |    AS max_value_event
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin
  )
}
