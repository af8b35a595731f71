package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load
import graft.functions.Fns._

/** Join family — SURVEY.md §2.4 (J1–J10).
  *
  * Reference shapes: the ExamSeries view join (cenir_view.sql:8), orphan
  * anti-join (Cenir_DB.py:596-601), the ±300 s same-day near-duplicate
  * range self-join (do_dicom.py:61), upsert semi-probes
  * (Cenir_DB.py:742-788), double-exam self-join (Exam_info.py:1515-1542),
  * recup-vs-primary full-outer diff (do_dicom_compare_recup_to.py:149-260),
  * QC resume anti-join (qcview.py:209-231), xls-review semi-join
  * (do_dicom.py:652-676), one-pass window rewrite of the reference's N+1
  * duplicate-group re-query (Cenir_DB.py:224,284,473), and the positional
  * zip join (common.py:496-505).
  *
  * Scale notes: dimension sides (orders vs lineitem, customer manifests)
  * are broadcast when small; the band self-join (j3) equi-prefilters on
  * (day, type) so the range residual only runs within buckets — never a
  * cartesian. Anti/semi joins stay hash joins on their keys; nothing is
  * collected to the driver.
  */
object JoinOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1 — ExamSeries inner equi-join (cenir_view.sql:8). Join strategy
    // is left to Catalyst/AQE: at test scale the parent side broadcasts
    // automatically; at lake scale both sides are fact-sized and a
    // forced broadcast would cap out at the 8 GB limit.
    "j1_examseries_join" -> ((s, dir) => {
      val o = load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("l_linenumber"), col("o_custkey"),
          col("o_orderdate"), col("l_partkey"), col("l_quantity"))
    }),

    // J2 — orphan anti-join (Cenir_DB.py:596-601): rows with no match in
    // the child table (here: customers with no URGENT order).
    "j2_orphan_anti_join" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val o = load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // J3 — near-duplicate band self-join (do_dicom.py:61): same day, same
    // type, |Δt| < 300 s, distinct ids. True banded range join: each row
    // is bucketed by floor(sec/300) and the probe side fans out to its
    // bucket and both neighbors, so the equi-join key is
    // (day, type, bucket) and each row only meets its ±300 s
    // neighborhood — per-key join cardinality stays O(bucket), not
    // O(day), at any scale. The range predicate is the cheap residual.
    "j3_band_self_join" -> ((s, dir) => {
      val ev = load(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          to_date(col("ts")).as("day"), epochSec(col("ts")).as("sec"))
      val build = ev.select(col("event_id").as("id_b"), col("day"),
        col("event_type"), col("sec").as("sec_b"),
        (col("sec") / 300).cast("long").as("bucket"))
      val probe = ev.select(col("event_id").as("id_a"), col("day"),
        col("event_type"), col("sec").as("sec_a"),
        explode(array((col("sec") / 300).cast("long") - 1,
          (col("sec") / 300).cast("long"),
          (col("sec") / 300).cast("long") + 1)).as("bucket"))
      probe.join(build, Seq("day", "event_type", "bucket"))
        .filter(col("id_a") < col("id_b") &&
          abs(col("sec_a") - col("sec_b")) < 300)
        .select(col("id_a"), col("id_b"), col("event_type"),
          (col("sec_b") - col("sec_a")).as("dsec"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // J4 — upsert existence probe as a semi-join (Cenir_DB.py:742-788):
    // incoming rows that already exist in the identity set.
    "j4_semi_probe" -> ((s, dir) => {
      val o = load(s, dir, "orders")
      val c = load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // J5 — double-exam self-join on (AcquisitionTime, MachineName)
    // (Exam_info.py:1515-1542): equi self-join, pairs ordered by key.
    "j5_double_exam_pairs" -> ((s, dir) => {
      val o = load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val o1 = o.select(col("o_orderkey").as("ok_a"), col("o_custkey"),
        col("o_orderdate"))
      val o2 = o.select(col("o_orderkey").as("ok_b"), col("o_custkey"),
        col("o_orderdate"))
      o1.join(o2, Seq("o_custkey", "o_orderdate"))
        .filter(col("ok_a") < col("ok_b"))
        .select(col("o_custkey"), col("o_orderdate"), col("ok_a"), col("ok_b"))
        .orderBy(col("o_custkey"), col("ok_a"), col("ok_b"))
    }),

    // J6/X4 — recup-vs-primary full-outer diff
    // (do_dicom_compare_recup_to.py:149-260): two manifests, both-sides
    // branches via when(isnull(...)).
    "j6_full_outer_diff" -> ((s, dir) => {
      val m1 = load(s, dir, "customer").filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("k1"))
      val m2 = load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("k2")).distinct()
      m1.join(m2, col("k1") === col("k2"), "full_outer")
        .select(
          coalesce(col("k1"), col("k2")).as("custkey"),
          when(col("k1").isNull, lit("right_only"))
            .when(col("k2").isNull, lit("left_only"))
            .otherwise(lit("both")).as("status"))
        .orderBy(col("custkey"))
    }),

    // J7 — QC resume anti-join (qcview.py:209-231): drop rows whose id is
    // already in the done-set.
    "j7_resume_anti_join" -> ((s, dir) => {
      val ev = load(s, dir, "events")
      val done = ev.filter(col("event_type") === "error" && col("value") > 95)
        .select(col("user_id")).distinct()
      ev.join(broadcast(done), Seq("user_id"), "left_anti")
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
    }),

    // J8 — review semi-join (do_dicom.py:652-676): keep rows matched by
    // the review sheet.
    "j8_review_semi_join" -> ((s, dir) => {
      val p = load(s, dir, "part")
      val hi = load(s, dir, "lineitem").filter(col("l_quantity") > 49)
      p.join(hi, col("p_partkey") === col("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_name"), col("p_brand"))
        .orderBy(col("p_partkey"))
    }),

    // J9 — duplicate-group members in one pass (replaces the reference's
    // N+1 re-query per group, Cenir_DB.py:224): window count over the
    // dup key, keep members of groups with count > 1.
    "j9_dup_group_members" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val keyed = load(s, dir, "events")
        .withColumn("ttime", hourBucket(col("ts")))
      val w = Window.partitionBy(col("ttime"), col("event_type"))
      keyed.withColumn("grp_n", count(lit(1)).over(w))
        .filter(col("grp_n") > 1)
        .select(col("event_id"), col("ttime"), col("event_type"), col("grp_n"))
        .orderBy(col("event_id"))
    }),

    // J10 — positional zip join (common.py:496-505): row_number both
    // sides, inner join on index.
    "j10_positional_zip" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val r = load(s, dir, "region")
        .withColumn("idx", row_number().over(Window.orderBy(col("r_name"))))
        .select(col("idx"), col("r_name"))
      val n = load(s, dir, "nation")
        .withColumn("idx", row_number().over(Window.orderBy(col("n_name"))))
        .select(col("idx"), col("n_name"))
      r.join(n, Seq("idx"))
        .select(col("idx"), col("r_name"), col("n_name"))
        .orderBy(col("idx"))
    }),

    // J11 — as-of join: each purchase event picks up the latest click
    // of the same user at or before its timestamp. Implemented as the
    // scale-right union-merge: tag both sides, ONE shuffle on user_id,
    // a single ordered window pass carrying the last click forward
    // (`last(_, ignoreNulls)` over rows-unbounded-preceding). A range
    // join would fan out per (user, purchase×click); this is linear in
    // input and never materializes candidate pairs. Clicks sort before
    // purchases at equal ts (is_click desc) so ties honor ts_click <=
    // ts_purchase; among equal-ts clicks the max event_id wins (the
    // unique tie-break both engines replay).
    "j11_asof_join" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = load(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"), lit(1).as("is_click"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id"))
      val tagged = clicks
        .withColumn("purchase_id", lit(null).cast("long"))
        .select(col("user_id"), col("ts"), col("click_id"),
          col("is_click"), col("purchase_id"))
        .union(purchases.select(col("user_id"), col("ts"),
          lit(null).cast("long").as("click_id"), lit(0).as("is_click"),
          col("purchase_id")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("is_click").desc, col("click_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("asof_click",
          last(col("click_id"), ignoreNulls = true).over(w))
        .filter(col("is_click") === 0)
        .select(col("purchase_id"), col("user_id"),
          coalesce(col("asof_click"), lit(-1L)).as("click_id"))
        .orderBy(col("purchase_id"))
    }),

    // J12 — bloom-pruned join: build a bloom filter over the dim keys
    // on the driver (df.stat.bloomFilter = treeAggregate — only the
    // bitset moves, never rows), probe it as a native codegen'd
    // predicate (bloom_contains) on the fact side BEFORE the shuffle,
    // then exact-join to drop the false positives. Composed result is
    // exactly the plain join (the oracle), but at 100 TB the fact rows
    // that survive to the shuffle are |dim-matched| + fp·N instead of
    // N — the manual form of Spark's runtime row-level filtering,
    // usable where InjectRuntimeFilter won't fire (non-equi residuals,
    // pre-aggregation pruning, reuse across several queries).
    "j12_bloom_prune" -> ((s, dir) => {
      graft.GraftFunctions.register(s)
      val dim = load(s, dir, "supplier")
        .filter(col("s_suppkey") % 7 === 0)
        .select(col("s_suppkey"), col("s_name"))
      // stat.bloomFilter NPEs on an empty build side (its aggregate
      // returns a null buffer) — an empty dim means an empty join, so
      // probe with constant-false instead of building a filter
      val nDim = dim.count()
      val probe =
        if (nDim == 0) lit(false)
        else {
          val bf = dim.stat.bloomFilter("s_suppkey", nDim, 0.01)
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          call_function("bloom_contains",
            lit(bos.toByteArray), col("l_suppkey"))
        }
      load(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_extendedprice"))
        .filter(probe)
        .join(broadcast(dim), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(decSumD(col("l_extendedprice")).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("s_name"))
    }),

    // Salted skew join under the oracle gate: half the fact rows land
    // on ONE key (every even event_id → key 0 — the protocol-sized
    // hot-key skew of SURVEY §7.4), and the join runs through
    // Skew.saltedJoin: the hot side splits across 8 deterministic
    // sub-keys (xxhash64 of the unique event_id — no rand(), reruns
    // identical) while the 100-row dim replicates 8×. The oracle is
    // the PLAIN join — equality proves salting changes the partition
    // layout and nothing else. At 100 TB the unsalted shape puts 50%
    // of the shuffle in one task; the salted one caps any task at
    // ~1/8 of the hot key.
    "j13_salted_skew_join" -> ((s, dir) => {
      val ev = load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          when(col("event_id") % 2 === 0, lit(0L))
            .otherwise(col("user_id") % 100).as("k"))
      val dim = s.range(0, 100).select(col("id").as("k"),
        concat(lit("seg_"), (col("id") % 7).cast("string")).as("seg"))
      Skew.saltedJoin(ev, dim, "k", "event_id", 8)
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("seg"))
    })
  )

  val oracle: Map[String, String] = Map(
    // the plain (unsalted) join — equality pins saltedJoin's semantics
    "j13_salted_skew_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id,
        |         CASE WHEN event_id % 2 = 0 THEN 0
        |              ELSE user_id % 100 END AS k
        |  FROM events),
        |dim AS (SELECT range AS k,
        |               'seg_' || CAST(range % 7 AS VARCHAR) AS seg
        |        FROM range(0, 100))
        |SELECT seg, COUNT(*) AS n_events,
        |       COUNT(DISTINCT user_id) AS n_users
        |FROM ev JOIN dim USING (k)
        |GROUP BY seg ORDER BY seg""".stripMargin,

    // CASTs to TIMESTAMP (µs) everywhere: the parquet carries ns, which
    // Spark truncates on load — comparing or tie-breaking at ns would
    // diverge from the µs the Spark side sees.
    "j12_bloom_prune" ->
      """SELECT s_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_suppkey % 7 = 0
        |GROUP BY s_name ORDER BY s_name""".stripMargin,

    "j11_asof_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  COALESCE((SELECT c.event_id FROM events c
        |            WHERE c.event_type = 'click'
        |              AND c.user_id = p.user_id
        |              AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        |            ORDER BY CAST(c.ts AS TIMESTAMP) DESC,
        |                     c.event_id DESC
        |            LIMIT 1), -1) AS click_id
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin,

    "j1_examseries_join" ->
      """SELECT o_orderkey, l_linenumber, o_custkey, o_orderdate,
        |       l_partkey, l_quantity
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,

    "j2_orphan_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "j3_band_self_join" ->
      """WITH e AS (SELECT event_id, event_type, CAST(ts AS DATE) AS day,
        |             CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
        |SELECT a.event_id AS id_a, b.event_id AS id_b, a.event_type,
        |       b.sec - a.sec AS dsec
        |FROM e a JOIN e b
        |  ON a.day = b.day AND a.event_type = b.event_type
        | AND a.event_id < b.event_id AND abs(a.sec - b.sec) < 300
        |ORDER BY id_a, id_b""".stripMargin,

    "j4_semi_probe" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM customer c
        |  WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,

    "j5_double_exam_pairs" ->
      """SELECT a.o_custkey, a.o_orderdate,
        |       a.o_orderkey AS ok_a, b.o_orderkey AS ok_b
        |FROM orders a JOIN orders b
        |  ON a.o_custkey = b.o_custkey AND a.o_orderdate = b.o_orderdate
        | AND a.o_orderkey < b.o_orderkey
        |ORDER BY a.o_custkey, ok_a, ok_b""".stripMargin,

    "j6_full_outer_diff" ->
      """WITH m1 AS (SELECT c_custkey AS k1 FROM customer WHERE c_acctbal < 0),
        |     m2 AS (SELECT DISTINCT o_custkey AS k2 FROM orders
        |            WHERE o_orderpriority = '1-URGENT')
        |SELECT COALESCE(k1, k2) AS custkey,
        |       CASE WHEN k1 IS NULL THEN 'right_only'
        |            WHEN k2 IS NULL THEN 'left_only'
        |            ELSE 'both' END AS status
        |FROM m1 FULL OUTER JOIN m2 ON k1 = k2
        |ORDER BY custkey""".stripMargin,

    "j7_resume_anti_join" ->
      """SELECT event_id, user_id, event_type FROM events e
        |WHERE NOT EXISTS (SELECT 1 FROM events d
        |  WHERE d.event_type = 'error' AND d.value > 95
        |    AND d.user_id = e.user_id)
        |ORDER BY event_id""".stripMargin,

    "j8_review_semi_join" ->
      """SELECT p_partkey, p_name, p_brand FROM part p
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 49)
        |ORDER BY p_partkey""".stripMargin,

    "j9_dup_group_members" ->
      """SELECT event_id, ttime, event_type, grp_n FROM (
        |  SELECT event_id, substr(CAST(ts AS VARCHAR),1,13) AS ttime,
        |         event_type,
        |         COUNT(*) OVER (PARTITION BY substr(CAST(ts AS VARCHAR),1,13),
        |                        event_type) AS grp_n
        |  FROM events) t
        |WHERE grp_n > 1 ORDER BY event_id""".stripMargin,

    "j10_positional_zip" ->
      """WITH r AS (SELECT row_number() OVER (ORDER BY r_name) AS idx, r_name
        |           FROM region),
        |     n AS (SELECT row_number() OVER (ORDER BY n_name) AS idx, n_name
        |           FROM nation)
        |SELECT r.idx AS idx, r_name, n_name FROM r JOIN n ON r.idx = n.idx
        |ORDER BY idx""".stripMargin
  )
}
