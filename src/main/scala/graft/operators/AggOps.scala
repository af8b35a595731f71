package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.load
import graft.functions.Fns._

/** Aggregation family — SURVEY.md §2.5 (A1–A13), re-expressed over the
  * driver's synthetic tables.
  *
  * Reference shapes (cited per query): duplicate-group maintenance
  * (Cenir_DB.py:453,271,215), per-group stats (Cenir_DB.py:506-534),
  * duration scalar-subquery min/max (Cenir_DB.py:839-868) incl. the
  * midnight wrap (Exam_info.py:224-225), year histogram
  * (Exam_info.py:104-114), exam splitting by date (Exam_info.py:1380-1459),
  * first/last instance (Exam_info.py:1316-1378), stack grouping
  * (Exam_info.py:881-922), file-size sum (Exam_info.py:895,914), and the
  * first-row-per-group `seqname` view (cenir_view.sql:20).
  *
  * Scale notes: every query is a single partial+final hash aggregate (one
  * shuffle on the group key); HAVING>1 filters ride on the aggregate, so
  * nothing is collected to the driver. The window in a13 shuffles once on
  * the partition key. All group keys are low-cardinality relative to rows,
  * so map-side combine does the heavy lifting at 100 TB.
  */
object AggOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A14 — ROLLUP over (returnflag, linestatus): subtotal rows per
    // flag and a grand total in ONE aggregate pass (Spark expands the
    // grouping sets before the shuffle; map-side partials cover all
    // three levels). Null group keys from the rollup are materialized
    // as 'ALL' + an explicit level so the output carries no nulls.
    "a14_rollup" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(decSumD(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping_id().as("lvl"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_qty"), col("n"), col("lvl"))
        .orderBy(col("lvl"), col("l_returnflag"), col("l_linestatus"))
    }),

    // A16 — CUBE over (lang, source): all four grouping levels in one
    // pass. Like ROLLUP, Spark plans a single Expand + partial+final
    // hash aggregate — the input is scanned once and each row fans to
    // its 4 grouping sets map-side, so the shuffle carries partials,
    // not the corpus.
    "a16_cube" -> ((s, dir) => {
      load(s, dir, "documents")
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("chars"),
          grouping_id().as("lvl"))
        .select(
          coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"),
          col("n_docs"), col("chars"), col("lvl"))
        .orderBy(col("lvl"), col("lang"), col("source"))
    }),

    // A17 — PIVOT: per-language counts spread across a FIXED source
    // list (explicit values, so no extra distinct-collection job on
    // the driver — the form that scales; an open-ended pivot would
    // first scan for distinct keys). One partial+final aggregate;
    // absent combinations filled with 0 to match the FILTER-count
    // oracle.
    "a17_pivot" -> ((s, dir) => {
      load(s, dir, "documents")
        .groupBy(col("lang"))
        .pivot("source", Seq("src0", "src1", "src2", "src3"))
        .agg(count(lit(1)))
        .na.fill(0)
        .orderBy(col("lang"))
    }),

    // A15 — exact interpolated quantiles per group (doc-length
    // distribution per language). Exact `percentile` sorts each group's
    // values once for all three cut points; inputs are integers, so the
    // rank interpolation (g·hi + (1−g)·lo with g ∈ {0,¼,½,¾}) is exact
    // in double and both engines agree bitwise. At corpus scale the
    // same call sites switch to [[SketchOps.quantileEstimate]]
    // (percentile_approx: one mergeable sketch per group crosses the
    // shuffle instead of every value).
    "a15_quantiles" -> ((s, dir) => {
      load(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          expr("percentile(n_chars, 0.25)").as("p25"),
          expr("percentile(n_chars, 0.5)").as("p50"),
          expr("percentile(n_chars, 0.75)").as("p75"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    }),

    // A1 — duplicate groups by truncated timestamp (Cenir_DB.py:453).
    // Hour-truncation (substr 1,13) plays the reference's substr(ts,1,19):
    // same string-prefix bucketing, density tuned to the synthetic data.
    "a1_dup_exam_groups" -> ((s, dir) => {
      load(s, dir, "events")
        .groupBy(
          hourBucket(col("ts")).as("ttime"),
          col("event_type"))
        .agg(count(lit(1)).as("doublon"))
        .filter(col("doublon") > 1)
        .orderBy(col("ttime"), col("event_type"))
    }),

    // A2 — duplicate groups on a composite key (Cenir_DB.py:271).
    "a2_dup_composite_groups" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("doublon"))
        .filter(col("doublon") > 1)
        .orderBy(col("l_partkey"), col("l_suppkey"))
    }),

    // A3 — dup groups + per-group case analysis (Cenir_DB.py:215,223-252):
    // are all members "the same" (distinct partkeys == members)?
    "a3_dup_case_analysis" -> ((s, dir) => {
      // repartition on the group key BEFORE the distinct aggregate
      // (r17): (l_orderkey, l_partkey) pairs are ~99% unique HERE, so
      // the map-side partial-distinct absorbed nothing while running
      // single-threaded on the one-row-group scan. The explicit
      // exchange REPLACES the aggregate's own (groupBy reuses the
      // hash layout — same exchange count). The trade (r17 advice):
      // this forfeits map-side partial-distinct absorption, so it is
      // justified by the measured ~99%-unique pair profile, not by a
      // byte-equality claim — a corpus whose hot groups carry heavy
      // duplicate pairs would want the partial aggregate back.
      load(s, dir, "lineitem")
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(
          count(lit(1)).as("nb"),
          countDistinct(col("l_partkey")).as("nb_distinct"))
        .filter(col("nb") > 1)
        .withColumn("all_distinct", col("nb_distinct") === col("nb"))
        .orderBy(col("l_orderkey"))
    }),

    // A4 — per-exam series stats: count + sum (Cenir_DB.py:506-534), one
    // pass over all groups instead of the reference's per-key re-query.
    "a4_group_stats" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          count(lit(1)).as("nbs"),
          decSumD(col("l_quantity")).as("nbd"))
        .orderBy(col("l_orderkey"))
    }),

    // A5 — DISTINCT (Cenir_DB.py:550-562).
    "a5_distinct_types" -> ((s, dir) => {
      load(s, dir, "events").select(col("event_type")).distinct()
        .orderBy(col("event_type"))
    }),

    // A6 — duration from first/last member (Cenir_DB.py:839-868): the
    // reference runs min/max scalar subqueries per exam; one grouped
    // aggregate computes every exam at once.
    "a6_duration_minmax" -> ((s, dir) => {
      load(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
        .withColumn("duration_min",
          ceilMinutes(epochSec(col("last_ts")) - epochSec(col("first_ts"))))
        .orderBy(col("user_id"))
    }),

    // A7 — duration with midnight wrap (Exam_info.py:224-225): start/end
    // are seconds-of-day of the min-/max-key member; if end < start the
    // span crossed midnight → +86400.
    "a7_duration_midnight_wrap" -> ((s, dir) => {
      val k = uniqKey(col("value"), col("event_id"))
      load(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).cast("string").as("day"))
        .agg(
          secOfDay(min_by(col("ts"), k)).as("s1"),
          secOfDay(max_by(col("ts"), k)).as("s2"))
        .withColumn("dur_sec",
          col("s2") - col("s1") + when(col("s2") < col("s1"), 86400L).otherwise(0L))
        .orderBy(col("user_id"), col("day"))
    }),

    // A8 — year histogram (Exam_info.py:104-114): count + hours sum.
    "a8_year_histogram" -> ((s, dir) => {
      load(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(
          count(lit(1)).as("n_orders"),
          decSumD(col("o_totalprice")).as("total_price"))
        .orderBy(col("yr"))
    }),

    // A9 — split by acquisition date + intra-day bounds
    // (Exam_info.py:1441-1456): one group per (day, type) with first/last.
    "a9_split_by_date" -> ((s, dir) => {
      load(s, dir, "events")
        .groupBy(to_date(col("ts")).cast("string").as("day"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"))
        .orderBy(col("day"), col("event_type"))
    }),

    // A10 — first/last instance per stack + corrupt flag
    // (Exam_info.py:1316-1378): min_by/max_by instead of a linear scan;
    // flag when max instance number ≠ member count (gap detected).
    // Ordering key is (linenumber, partkey, suppkey) packed into one
    // bigint — linenumber alone is not unique in the synthetic data, and
    // min_by ties are engine-nondeterministic.
    "a10_first_last_instance" -> ((s, dir) => {
      val k = col("l_linenumber").cast("long") * 1000000000000L +
        col("l_partkey") * 1000000L + col("l_suppkey")
      load(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          min_by(col("l_partkey"), k).as("first_part"),
          max_by(col("l_partkey"), k).as("last_part"),
          max(col("l_linenumber")).as("max_inum"),
          count(lit(1)).as("n_files"))
        .withColumn("corrupt",
          when(col("max_inum") =!= col("n_files"), lit("GAP")).otherwise(lit("")))
        .orderBy(col("l_orderkey"))
    }),

    // A11 — stack grouping by composite key → group count as dim4
    // (Exam_info.py:881-922, dim4 :754-755).
    "a11_stack_grouping" -> ((s, dir) => {
      load(s, dir, "events")
        .groupBy(col("event_type"), year(col("ts")).as("yr"))
        .agg(
          countDistinct(col("user_id")).as("dim4"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("yr"))
    }),

    // A12 — file-size sum per container (Exam_info.py:895,914).
    "a12_size_sum" -> ((s, dir) => {
      load(s, dir, "documents")
        .groupBy(col("source"))
        .agg(
          sum(col("n_chars")).as("total_chars"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("source"))
    }),

    // A13 — first-row-per-group `seqname` view (cenir_view.sql:20):
    // MySQL's implicit first row, made explicit with row_number.
    "a13_first_row_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      load(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("lang"))
    }),

    // A18 — ordered event funnel (view → click → purchase). The classic
    // sequential-conversion shape: stage k counts users whose earliest
    // qualifying step-k event strictly follows their step-(k-1) anchor.
    // Three conditional-min aggregations over events, each joined back
    // on user_id — every join is key-co-partitioned with the groupBy
    // that precedes it, so AQE plans one shuffle per stage and no
    // broadcast of the fact side. Strict `>` on microsecond timestamps
    // keeps the anchors deterministic without a tiebreak column.
    "a18_funnel" -> ((s, dir) => {
      val ev = load(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      v.agg(count(lit(1)).as("n_users")).select(lit(1).as("stage"),
          lit("view").as("step"), col("n_users"))
        .unionAll(c.agg(count(lit(1)).as("n_users"))
          .select(lit(2).as("stage"), lit("click").as("step"),
            col("n_users")))
        .unionAll(p.agg(count(lit(1)).as("n_users"))
          .select(lit(3).as("stage"), lit("purchase").as("step"),
            col("n_users")))
        .orderBy(col("stage"))
    }),

    // A19 — weekly cohort retention. Cohort = the user's first active
    // week (integer weeks since the corpus epoch); one cell per
    // (cohort_week, weeks-since-cohort offset) counts distinct users
    // still active. Two aggregations over the same per-user-week
    // distinct frame — the cohort min reuses the frame instead of
    // re-scanning events, and the join is on user_id only (cohort is
    // one row per user, fact-side stays distributed).
    "a19_cohort_retention" -> ((s, dir) => {
      val uw = load(s, dir, "events")
        .select(col("user_id"),
          (datediff(to_date(col("ts")), lit("2024-01-01")) / 7)
            .cast("long").as("wk"))
        .distinct()
      val cohort = uw.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_wk"))
      uw.join(cohort, "user_id")
        .groupBy(col("cohort_wk"),
          (col("wk") - col("cohort_wk")).as("offset_wk"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_wk"), col("offset_wk"))
    })
  )

  val oracle: Map[String, String] = Map(
    // quantile_cont == Spark percentile: both interpolate at rank
    // p·(n−1); integer inputs keep the arithmetic exact.
    "a15_quantiles" ->
      """SELECT lang,
        |  quantile_cont(n_chars, 0.25) AS p25,
        |  quantile_cont(n_chars, 0.5)  AS p50,
        |  quantile_cont(n_chars, 0.75) AS p75,
        |  COUNT(*) AS n_docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // GROUPING(a)*2 + GROUPING(b) reproduces Spark's grouping_id bitmask
    // (first rollup column = most significant bit).
    "a14_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
        |    AS sum_qty,
        |  COUNT(*) AS n,
        |  GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS lvl
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY lvl, l_returnflag, l_linestatus""".stripMargin,
    "a17_pivot" ->
      """SELECT lang,
        |  COUNT(*) FILTER (source = 'src0') AS src0,
        |  COUNT(*) FILTER (source = 'src1') AS src1,
        |  COUNT(*) FILTER (source = 'src2') AS src2,
        |  COUNT(*) FILTER (source = 'src3') AS src3
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,

    "a16_cube" ->
      """SELECT COALESCE(lang, 'ALL') AS lang,
        |       COALESCE(source, 'ALL') AS source,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars,
        |  GROUPING(lang)*2 + GROUPING(source) AS lvl
        |FROM documents
        |GROUP BY CUBE(lang, source)
        |ORDER BY lvl, lang, source""".stripMargin,

    "a1_dup_exam_groups" ->
      """SELECT substr(CAST(ts AS VARCHAR),1,13) AS ttime, event_type,
        |       COUNT(*) AS doublon
        |FROM events GROUP BY 1,2 HAVING COUNT(*) > 1
        |ORDER BY ttime, event_type""".stripMargin,

    "a2_dup_composite_groups" ->
      """SELECT l_partkey, l_suppkey, COUNT(*) AS doublon
        |FROM lineitem GROUP BY 1,2 HAVING COUNT(*) > 1
        |ORDER BY l_partkey, l_suppkey""".stripMargin,

    "a3_dup_case_analysis" ->
      """SELECT l_orderkey, COUNT(*) AS nb,
        |       COUNT(DISTINCT l_partkey) AS nb_distinct,
        |       COUNT(DISTINCT l_partkey) = COUNT(*) AS all_distinct
        |FROM lineitem GROUP BY 1 HAVING COUNT(*) > 1
        |ORDER BY l_orderkey""".stripMargin,

    "a4_group_stats" ->
      """SELECT l_orderkey, COUNT(*) AS nbs,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS nbd
        |FROM lineitem GROUP BY 1 ORDER BY l_orderkey""".stripMargin,

    "a5_distinct_types" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",

    "a6_duration_minmax" ->
      """SELECT user_id,
        |  MIN(CAST(ts AS TIMESTAMP)) AS first_ts,
        |  MAX(CAST(ts AS TIMESTAMP)) AS last_ts,
        |  (CAST(floor(epoch(MAX(ts))) AS BIGINT)
        |   - CAST(floor(epoch(MIN(ts))) AS BIGINT) + 59) // 60 AS duration_min
        |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin,

    "a7_duration_midnight_wrap" ->
      """WITH g AS (
        |  SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |    CAST(floor(epoch(arg_min(ts, CAST(round(value*100) AS BIGINT)*10000000000 + event_id))) AS BIGINT) % 86400 AS s1,
        |    CAST(floor(epoch(arg_max(ts, CAST(round(value*100) AS BIGINT)*10000000000 + event_id))) AS BIGINT) % 86400 AS s2
        |  FROM events GROUP BY 1,2)
        |SELECT user_id, day, s1, s2,
        |       s2 - s1 + CASE WHEN s2 < s1 THEN 86400 ELSE 0 END AS dur_sec
        |FROM g ORDER BY user_id, day""".stripMargin,

    "a8_year_histogram" ->
      """SELECT CAST(date_part('year', o_orderdate) AS INT) AS yr,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,

    "a9_split_by_date" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
        |       COUNT(*) AS n,
        |       MIN(CAST(ts AS TIMESTAMP)) AS first_ts,
        |       MAX(CAST(ts AS TIMESTAMP)) AS last_ts
        |FROM events GROUP BY 1,2 ORDER BY day, event_type""".stripMargin,

    "a10_first_last_instance" ->
      """SELECT l_orderkey,
        |       arg_min(l_partkey, CAST(l_linenumber AS BIGINT)*1000000000000 + CAST(l_partkey AS BIGINT)*1000000 + l_suppkey) AS first_part,
        |       arg_max(l_partkey, CAST(l_linenumber AS BIGINT)*1000000000000 + CAST(l_partkey AS BIGINT)*1000000 + l_suppkey) AS last_part,
        |       MAX(l_linenumber) AS max_inum, COUNT(*) AS n_files,
        |       CASE WHEN MAX(l_linenumber) <> COUNT(*) THEN 'GAP' ELSE '' END AS corrupt
        |FROM lineitem GROUP BY 1 ORDER BY l_orderkey""".stripMargin,

    "a11_stack_grouping" ->
      """SELECT event_type, CAST(date_part('year', ts) AS INT) AS yr,
        |       COUNT(DISTINCT user_id) AS dim4, COUNT(*) AS n
        |FROM events GROUP BY 1,2 ORDER BY event_type, yr""".stripMargin,

    "a12_size_sum" ->
      """SELECT source, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |       COUNT(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY source""".stripMargin,

    "a13_first_row_per_group" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY lang""".stripMargin,

    "a18_funnel" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t2
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t3
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |      GROUP BY e.user_id)
        |SELECT 1 AS stage, 'view' AS step, COUNT(*) AS n_users FROM v
        |UNION ALL
        |SELECT 2, 'click', COUNT(*) FROM c
        |UNION ALL
        |SELECT 3, 'purchase', COUNT(*) FROM p
        |ORDER BY stage""".stripMargin,

    "a19_cohort_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    CAST(FLOOR(date_diff('day', DATE '2024-01-01',
        |                         CAST(ts AS DATE)) / 7.0) AS BIGINT) AS wk
        |  FROM events),
        |cohort AS (SELECT user_id, MIN(wk) AS cohort_wk FROM uw
        |           GROUP BY user_id)
        |SELECT c.cohort_wk, uw.wk - c.cohort_wk AS offset_wk,
        |       COUNT(*) AS n_users
        |FROM uw JOIN cohort c ON uw.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY cohort_wk, offset_wk""".stripMargin
  )
}
