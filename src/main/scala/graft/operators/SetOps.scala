package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Set-operation family (SURVEY.md §2.7 X1–X5) and projection/filter
  * family (§2.3 P1–P9).
  *
  * Reference shapes: union of scan roots (Exam_info.py:50,97), DB-vs-disk
  * anti-join reconciliation (Cenir_DB.py:171-206), QC intersect-guard
  * (qcview.py:209-231), the WHERE-predicate surface (Cenir_DB.py:224,284;
  * do_results_DB.py:91), and the year filter (do_dicom.py:61,
  * Cenir_DB.py:421).
  */
object SetOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // X1 — union of scan roots (Exam_info.py:50,97): two filtered scans
    // unioned then aggregated; Catalyst collapses to one scan per branch.
    "x1_union_roots" -> ((s, dir) => {
      val ev = load(s, dir, "events")
      val a = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("event_type"))
      val b = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("event_type"))
      a.union(b)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // X2 — DB-vs-disk anti-join (Cenir_DB.py:171-187): catalog rows whose
    // counterpart is absent from the "disk" manifest.
    "x2_db_disk_anti" -> ((s, dir) => {
      val p = load(s, dir, "part")
      val disk = load(s, dir, "lineitem").filter(col("l_quantity") > 49)
      p.join(disk, col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))
    }),

    // X5 — intersect guard (qcview.py:209-231): ids present in BOTH sets.
    "x5_intersect_guard" -> ((s, dir) => {
      val ev = load(s, dir, "events")
      val a = ev.filter(col("event_type") === "signup" && col("value") > 95)
        .select(col("user_id")).distinct()
      val b = ev.filter(col("event_type") === "error" && col("value") > 95)
        .select(col("user_id")).distinct()
      a.intersect(b).orderBy(col("user_id"))
    }),

    // X6 — multiset difference (EXCEPT ALL): per-occurrence diff, the
    // multiplicity-aware variant of X2 — "how many MORE finished orders
    // than early orders does each customer have". Spark's exceptAll
    // plans as a single shuffle on the value with a count-difference
    // generator (no pairwise join); the aggregate on top reuses the
    // same hash partitioning.
    "x6_except_all" -> ((s, dir) => {
      val o = load(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val b = o.filter(col("o_orderdate") <
          lit("1997-01-01").cast("timestamp")).select(col("o_custkey"))
      a.exceptAll(b)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("surplus"))
        .orderBy(col("o_custkey"))
    }),

    // X7 — multiset intersection (INTERSECT ALL): occurrences present
    // in both streams, min-multiplicity semantics.
    "x7_intersect_all" -> ((s, dir) => {
      val o = load(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val b = o.filter(col("o_orderdate") <
          lit("1997-01-01").cast("timestamp")).select(col("o_custkey"))
      a.intersectAll(b)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_common"))
        .orderBy(col("o_custkey"))
    }),

    // x8 — bucketed checksum diff: compare two table copies WITHOUT
    // moving rows. Each side reduces to 64 (bucket → count, Σ row-hash)
    // partials — map-side combined, 64 rows cross the shuffle per side
    // — and only the tiny summaries join. At 100 TB this is how you
    // verify a replica (the reference's DB-vs-disk reconcile,
    // Cenir_DB.py:171-206, at fact-table scale): mismatched buckets
    // localize the diff to 1/64th of the keyspace before any row-level
    // anti-join runs. The "remote" side is derived in-query with
    // deterministic drift (dropped keys ≡ 0 mod 1009, price drift ≡ 0
    // mod 997) so the oracle can re-derive it. Row hashes avoid raw
    // doubles: cents = floor(price·100 + 0.5) is exact on both engines,
    // md5 of the joined string → 10 hex chars (40 bits) → bigint,
    // summed: the Σ stays under 2^63 to ~8M rows per bucket, and the
    // bucket count — not the hash width — is what scales with the
    // table (a 100 TB replica check uses 2^20 buckets, same plan).
    "x8_table_checksum" -> ((s, dir) => {
      val o = load(s, dir, "orders").select(col("o_orderkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("bigint").as("cents"),
        col("o_orderstatus"))
      def summarize(df: DataFrame, cnt: String, hs: String): DataFrame =
        df.withColumn("bucket",
            graft.functions.Fns.md5Bucket(col("o_orderkey").cast("string"), 64))
          .withColumn("rh", conv(substring(md5(concat_ws("|",
            col("o_orderkey"), col("cents"), col("o_orderstatus"))),
            1, 10), 16, 10).cast("bigint"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as(cnt), sum(col("rh")).as(hs))
      val remote = o.filter(col("o_orderkey") % 1009 =!= 0)
        .withColumn("cents", when(col("o_orderkey") % 997 === 0,
          col("cents") + 1).otherwise(col("cents")))
      summarize(o, "cnt_src", "h_src")
        .join(summarize(remote, "cnt_dst", "h_dst"), Seq("bucket"), "full_outer")
        .select(col("bucket"),
          coalesce(col("cnt_src"), lit(0L)).as("cnt_src"),
          coalesce(col("cnt_dst"), lit(0L)).as("cnt_dst"),
          (coalesce(col("cnt_src"), lit(0L)) ===
             coalesce(col("cnt_dst"), lit(0L)) &&
           coalesce(col("h_src"), lit(0L)) ===
             coalesce(col("h_dst"), lit(0L))).as("is_match"))
        .orderBy(col("bucket"))
    }),

    // P3/P1 — predicate + projection surface (Cenir_DB.py:224,284): LIKE,
    // BETWEEN, regexp extraction from a semi-structured text column.
    "p3_predicate_filters" -> ((s, dir) => {
      load(s, dir, "events")
        .filter(col("event_type").like("c%") &&
          col("value").between(10, 90) &&
          regexp_extract(col("props"), "(\\d+)", 1).cast("int") > 50)
        .select(col("event_id"), col("event_type"), col("value"),
          regexp_extract(col("props"), "(\\d+)", 1).cast("int").as("k"))
        .orderBy(col("event_id"))
    }),

    // P8 — year filter (do_dicom.py:61): substr-year predicate.
    "p8_year_filter" -> ((s, dir) => {
      load(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1995)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // P11 — null-safe equality (`<=>` / IS NOT DISTINCT FROM): the
    // comparison MERGE change-detection needs (null == null must be
    // "unchanged", not "unknown"). Two derived columns go null at
    // different thresholds, so all three cases occur: equal non-null,
    // null-vs-value, null-vs-null.
    "p11_null_safe_eq" -> ((s, dir) => {
      load(s, dir, "events")
        .withColumn("a", when(col("value") <= 90, col("event_type")))
        .withColumn("b", when(col("value") <= 95, col("event_type")))
        .groupBy(col("a").eqNullSafe(col("b")).as("same"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("same"))
    }),

    // P4 — derived-series skip (Exam_info.py:1402-1418,417-455): the
    // production filter is DicomLike.skipDerivedSeries; here a series
    // table is synthesized from `part` so EVERY branch occurs — each
    // derived marker, the mp2rage DERIVED+PRIMARY+UNI exception, the
    // GE-never-shorten vendor branch, and the null-image_type keep.
    // The oracle replicates the when-chain + boolean logic in SQL, so
    // the filter's exact semantics (null handling included) are
    // hash-checked, not just row-counted.
    "p4_derived_skip" -> ((s, dir) => {
      val series = load(s, dir, "part").select(
        col("p_partkey").as("series_id"),
        when(col("p_partkey") % 11 === 0, lit("DERIVED\\PRIMARY\\UNI"))
          .when(col("p_partkey") % 11 === 1, lit("ORIGINAL\\PRIMARY\\FA\\ND"))
          .when(col("p_partkey") % 11 === 2, lit("DERIVED\\SECONDARY\\ADC"))
          .when(col("p_partkey") % 11 === 3, lit("ORIGINAL\\PRIMARY\\TENSOR_B0"))
          .when(col("p_partkey") % 11 === 4, lit("ORIGINAL\\PRIMARY\\MOCO\\ND"))
          .when(col("p_partkey") % 11 === 5, lit("DERIVED\\OTHER"))
          .when(col("p_partkey") % 11 === 6, lit("ORIGINAL\\PRIMARY\\M\\ND"))
          .when(col("p_partkey") % 11 === 7, lit("ORIGINAL\\PRIMARY\\TRACEW"))
          .when(col("p_partkey") % 11 === 8, lit(null).cast("string"))
          .otherwise(lit("ORIGINAL\\PRIMARY\\OTHER")).as("image_type"),
        when(col("p_partkey") % 13 === 0, lit("GE MEDICAL SYSTEMS"))
          .otherwise(lit("SIEMENS")).as("manufacturer"))
      graft.ingest.DicomLike.skipDerivedSeries(series)
        .groupBy(coalesce(col("image_type"), lit("(none)"))
            .as("image_type"),
          col("manufacturer"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("image_type"), col("manufacturer"))
    }),

    // X3 — scanner-vs-disk reconcile (do_results_DB.py:319-342) via
    // FileScans.reconcile: a scanner manifest with planted count
    // deviations (every 7th key expects one file too many) against a
    // disk listing that drops low-quantity files entirely — both
    // finding branches (missing_on_disk, count_mismatch) occur and
    // 'ok' rows are filtered, exactly the reference's report shape.
    "x3_reconcile_counts" -> ((s, dir) => {
      val li = load(s, dir, "lineitem")
      val disk = li.filter(col("l_quantity") > 10)
        .select(col("l_partkey").as("series_key"))
      val scanner = li.groupBy(col("l_partkey").as("series_key"))
        .agg(count(when(col("l_quantity") > 10, 1)).as("base"))
        .select(col("series_key"),
          (col("base") + when(col("series_key") % 7 === 0, 1)
            .otherwise(0)).as("n_expected"))
      graft.sources.FileScans.reconcile(scanner, disk)
        .orderBy(col("series_key"))
    }),

    // P10 — the reference's opaque string-prefix day bucket as a
    // filter (substr(ts,1,10) = literal, Cenir_DB.py:453).
    // TimeBucketPruneRule derives the equivalent timestamp range so
    // the parquet scan prunes row groups on o_orderdate min/max stats
    // — PlanSpec asserts the PushedFilters; the oracle checks the
    // rewrite changed nothing semantically.
    "p10_day_bucket_prune" -> ((s, dir) => {
      graft.GraftFunctions.register(s)
      load(s, dir, "orders")
        .filter(graft.functions.Fns.dayBucket(col("o_orderdate"))
          === "1996-03-15")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          graft.functions.Fns.decSumD(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderpriority"))
    })
  )

  val oracle: Map[String, String] = Map(
    "x8_table_checksum" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |    o_orderstatus FROM orders),
        |src AS (SELECT
        |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),1,15))::BIGINT
        |      % 64 AS bucket,
        |    COUNT(*) AS cnt_src,
        |    CAST(SUM(('0x' || substr(md5(concat_ws('|',
        |      CAST(o_orderkey AS VARCHAR), CAST(cents AS VARCHAR),
        |      o_orderstatus)),1,10))::BIGINT) AS BIGINT) AS h_src
        |  FROM o GROUP BY 1),
        |rem AS (SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 997 = 0 THEN cents + 1 ELSE cents END
        |      AS cents, o_orderstatus
        |  FROM o WHERE o_orderkey % 1009 <> 0),
        |dst AS (SELECT
        |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),1,15))::BIGINT
        |      % 64 AS bucket,
        |    COUNT(*) AS cnt_dst,
        |    CAST(SUM(('0x' || substr(md5(concat_ws('|',
        |      CAST(o_orderkey AS VARCHAR), CAST(cents AS VARCHAR),
        |      o_orderstatus)),1,10))::BIGINT) AS BIGINT) AS h_dst
        |  FROM rem GROUP BY 1)
        |SELECT bucket,
        |  COALESCE(cnt_src, 0) AS cnt_src,
        |  COALESCE(cnt_dst, 0) AS cnt_dst,
        |  (COALESCE(cnt_src, 0) = COALESCE(cnt_dst, 0)
        |   AND COALESCE(h_src, 0) = COALESCE(h_dst, 0)) AS is_match
        |FROM src FULL OUTER JOIN dst USING (bucket)
        |ORDER BY bucket""".stripMargin,

    "x1_union_roots" ->
      """SELECT event_type, COUNT(*) AS n FROM (
        |  SELECT event_id, event_type FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT event_id, event_type FROM events WHERE event_type = 'error') t
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    "x2_db_disk_anti" ->
      """SELECT p_partkey, p_name FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 49)
        |ORDER BY p_partkey""".stripMargin,

    "x5_intersect_guard" ->
      """SELECT DISTINCT user_id FROM events
        |WHERE event_type = 'signup' AND value > 95
        |INTERSECT
        |SELECT DISTINCT user_id FROM events
        |WHERE event_type = 'error' AND value > 95
        |ORDER BY user_id""".stripMargin,

    "x6_except_all" ->
      """SELECT o_custkey, COUNT(*) AS surplus FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1997-01-01') t
        |GROUP BY 1 ORDER BY o_custkey""".stripMargin,

    "x7_intersect_all" ->
      """SELECT o_custkey, COUNT(*) AS n_common FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1997-01-01') t
        |GROUP BY 1 ORDER BY o_custkey""".stripMargin,

    "p3_predicate_filters" ->
      """SELECT event_id, event_type, value,
        |       CAST(regexp_extract(props, '(\d+)', 1) AS INT) AS k
        |FROM events
        |WHERE event_type LIKE 'c%' AND value BETWEEN 10 AND 90
        |  AND CAST(regexp_extract(props, '(\d+)', 1) AS INT) > 50
        |ORDER BY event_id""".stripMargin,

    "p8_year_filter" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
        |WHERE date_part('year', o_orderdate) = 1995
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "p11_null_safe_eq" ->
      """SELECT a IS NOT DISTINCT FROM b AS same, COUNT(*) AS n FROM (
        |  SELECT CASE WHEN value <= 90 THEN event_type END AS a,
        |         CASE WHEN value <= 95 THEN event_type END AS b
        |  FROM events) t
        |GROUP BY 1 ORDER BY same""".stripMargin,

    "p4_derived_skip" ->
      """WITH s AS (
        |  SELECT p_partkey AS series_id,
        |    CASE p_partkey % 11
        |      WHEN 0 THEN 'DERIVED\PRIMARY\UNI'
        |      WHEN 1 THEN 'ORIGINAL\PRIMARY\FA\ND'
        |      WHEN 2 THEN 'DERIVED\SECONDARY\ADC'
        |      WHEN 3 THEN 'ORIGINAL\PRIMARY\TENSOR_B0'
        |      WHEN 4 THEN 'ORIGINAL\PRIMARY\MOCO\ND'
        |      WHEN 5 THEN 'DERIVED\OTHER'
        |      WHEN 6 THEN 'ORIGINAL\PRIMARY\M\ND'
        |      WHEN 7 THEN 'ORIGINAL\PRIMARY\TRACEW'
        |      WHEN 8 THEN NULL
        |      ELSE 'ORIGINAL\PRIMARY\OTHER' END AS image_type,
        |    CASE WHEN p_partkey % 13 = 0 THEN 'GE MEDICAL SYSTEMS'
        |         ELSE 'SIEMENS' END AS manufacturer
        |  FROM part),
        |kept AS (
        |  SELECT * FROM s
        |  WHERE COALESCE(contains(upper(manufacturer),
        |          'GE MEDICAL SYSTEMS'), FALSE)
        |     OR COALESCE(contains(image_type, 'DERIVED')
        |          AND contains(image_type, 'PRIMARY')
        |          AND contains(image_type, 'UNI'), FALSE)
        |     OR NOT COALESCE(
        |          regexp_matches(image_type,
        |            '\bFA\b|ADC|TENSOR|TRACEW|FSM|MOCO|DUMMY IMAGE|TTEST')
        |          OR (contains(image_type, 'DERIVED')
        |              AND contains(image_type, 'OTHER')), FALSE))
        |SELECT COALESCE(image_type, '(none)') AS image_type, manufacturer,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM kept GROUP BY 1, 2 ORDER BY image_type, manufacturer""".stripMargin,

    "x3_reconcile_counts" ->
      """WITH disk AS (SELECT l_partkey AS series_key FROM lineitem
        |              WHERE l_quantity > 10),
        |scanner AS (
        |  SELECT l_partkey AS series_key,
        |    CAST(COUNT(CASE WHEN l_quantity > 10 THEN 1 END)
        |      + CASE WHEN l_partkey % 7 = 0 THEN 1 ELSE 0 END
        |      AS BIGINT) AS n_expected
        |  FROM lineitem GROUP BY 1),
        |actual AS (SELECT series_key, CAST(COUNT(*) AS BIGINT) AS n_actual
        |           FROM disk GROUP BY 1),
        |r AS (
        |  SELECT s.series_key, s.n_expected,
        |    CAST(COALESCE(a.n_actual, 0) AS BIGINT) AS n_actual,
        |    CASE WHEN a.n_actual IS NULL THEN 'missing_on_disk'
        |         WHEN a.n_actual <> s.n_expected THEN 'count_mismatch'
        |         ELSE 'ok' END AS finding
        |  FROM scanner s LEFT JOIN actual a USING (series_key))
        |SELECT series_key, n_expected, n_actual, finding FROM r
        |WHERE finding <> 'ok' ORDER BY series_key""".stripMargin,

    "p10_day_bucket_prune" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
        |    AS total
        |FROM orders
        |WHERE substr(CAST(o_orderdate AS VARCHAR), 1, 10) = '1996-03-15'
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin
  )
}
