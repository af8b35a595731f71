package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Registry of driver-checked queries.
  *
  * Each entry maps a SURVEY.md §2 operator (or an LLM-pipeline component)
  * onto the driver's synthetic tables. The Spark form and the DuckDB
  * oracle form must agree on column names and value bits — see
  * [[graft.functions.Fns]] for the determinism discipline.
  *
  * Families live in graft.operators: AggOps (A1–A13), JoinOps (J1–J10),
  * WindowOps (W1–W7), SetOps (X1–X5 + P-family), MergeOps (K3/K5),
  * DedupOps (exact/MinHash/SimHash/Jaccard), SimilarityOps (ANN),
  * TextOps (lang-id/quality/tokens/fingerprint), MultimodalOps (binary).
  */
object Queries {

  import graft.functions.Fns.decSumD

  import Tables.load

  val all: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
      // TPC-H Q1 shape: scan+filter+groupBy+agg (SURVEY A8/A12 analog).
      "q1_pricing_summary" -> ((s, dir) => {
        val li = load(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            decSumD(col("l_quantity")).as("sum_qty"),
            decSumD(col("l_extendedprice")).as("sum_base_price"),
            decSumD(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      }),

      // TPC-H Q3 shape: three-way join with selective dim filter, top-10
      // by aggregated revenue. The customer dim is broadcast; the
      // orders side is left to Catalyst/AQE (it stays fact-sized after
      // the date filter, and a forced broadcast would cap out at scale).
      "q3_shipping_priority" -> ((s, dir) => {
        val c = load(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val o = load(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
            col("o_orderpriority"))
        val li = load(s, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(decSumD(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      }),

      // TPC-H Q5 shape: six-table snowflake join, revenue per nation.
      // True dimensions (supplier/customer/nation/region) broadcast;
      // orders is fact-sized and joins however Catalyst/AQE decides.
      "q5_local_supplier" -> ((s, dir) => {
        val r = load(s, dir, "region").filter(col("r_name") === "ASIA")
        val n = load(s, dir, "nation")
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val c = load(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        val su = load(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        val o = load(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        val li = load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .filter(col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(decSumD(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      })
      ,

      // TPC-H Q4 shape: EXISTS-driven aggregate — orders with at least
      // one late-shipped line (semi join carries the correlated
      // condition), counted per priority. The semi join shuffles on the
      // order key once; no distinct/dedup pass is ever needed because
      // left_semi emits each order at most once.
      "q4_priority_exists" -> ((s, dir) => {
        val o = load(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority"))
        val li = load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
        o.join(li, col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      }),

      // TPC-H Q16 shape: distinct-count over a deduped pair relation,
      // minus an anti-joined exclusion set (suppliers "with complaints"
      // = negative balance). The tiny exclusion list broadcasts; the
      // distinct pair relation and the count-distinct agg shuffle on
      // their own keys only.
      "q16_supplier_cnt" -> ((s, dir) => {
        // No pre-distinct on the (partkey, suppkey) pairs: the final
        // countDistinct already dedups per group (its partial-distinct
        // phase absorbs repeats map-side), so the explicit distinct
        // only added a full shuffle of every fact pair BEFORE the
        // selective part filter could prune ~85% of them (r17
        // optimization: 2 Exchanges → 1, and the one that remains
        // carries the post-filter sliver). Result set is provably
        // unchanged — DISTINCT-then-COUNT(DISTINCT) ≡ COUNT(DISTINCT).
        val ps = load(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"))
        val p = load(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#1" &&
            col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
          .select(col("p_partkey"), col("p_brand"), col("p_type"),
            col("p_size"))
        val bad = load(s, dir, "supplier")
          .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
        ps.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
            "left_anti")
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"),
            col("p_type"), col("p_size"))
      }),

      // TPC-H Q21 shape: multi semi/anti self-join — suppliers whose
      // late line (ship > order date + 90d) was the ONLY late one in a
      // multi-supplier finished order. The order-scoped line relation
      // is built once and reused on every side; both existence probes
      // are semi/anti joins on the order key, never row-multiplying.
      "q21_waiting_supplier" -> ((s, dir) => {
        val o = load(s, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate"))
        val lo = load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey"),
            (col("l_shipdate") > col("o_orderdate") +
              expr("INTERVAL 90 DAYS")).as("is_late"))
        val late = lo.filter(col("is_late"))
          .select(col("l_orderkey"), col("l_suppkey"))
        val others = lo.select(col("l_orderkey").as("k2"),
          col("l_suppkey").as("s2"))
        val otherLate = late.select(col("l_orderkey").as("k3"),
          col("l_suppkey").as("s3"))
        val l1 = late
          .join(others, col("k2") === col("l_orderkey") &&
            col("s2") =!= col("l_suppkey"), "left_semi")
          .join(otherLate, col("k3") === col("l_orderkey") &&
            col("s3") =!= col("l_suppkey"), "left_anti")
        val su = load(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))
        l1.join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
      }),

      // TPC-H Q7 shape: bilateral volume between two nations — the
      // fact table picks up BOTH nation attributions (supplier-side
      // and customer-side) through broadcast dims, then filters to the
      // wanted pairs; grouped by the pair and the shipment year.
      "q7_nation_volume" -> ((s, dir) => {
        val n = load(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        val su = load(s, dir, "supplier")
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val cu = load(s, dir, "customer")
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        val o = load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val li = load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
            col("l_extendedprice"), col("l_discount"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(cu), col("o_custkey") === col("c_custkey"))
          .filter((col("supp_nation") === "NATION_3" &&
              col("cust_nation") === "NATION_7") ||
            (col("supp_nation") === "NATION_7" &&
              col("cust_nation") === "NATION_3"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(decSumD(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      }),

      // TPC-H Q17 shape: per-group-average correlated subquery — the
      // per-part avg quantity is a tiny aggregate joined back (Catalyst
      // broadcasts it), so "qty < 0.2 * avg over its part" never
      // rescans the fact side per row.
      "q17_small_quantity" -> ((s, dir) => {
        val li = load(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        val p = load(s, dir, "part")
          .filter(col("p_brand") === "Brand#11")
          .select(col("p_partkey"))
        val avgQ = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey").as("ak"))
          .agg(avg(col("l_quantity")).as("avg_qty"))
        val out = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(broadcast(avgQ), col("l_partkey") === col("ak"))
          .filter(col("l_quantity") < col("avg_qty") * 0.2)
          .agg(decSumD(col("l_extendedprice")).as("total_price"),
            count(lit(1)).as("n_lines"))
        out
      }),

      // TPC-H Q18 shape: large-volume orders — the pre-aggregated
      // filter (sum(qty) > 300 per order) runs FIRST and shrinks the
      // fact side to a sliver before any join; customer dim broadcasts.
      "q18_large_orders" -> ((s, dir) => {
        val big = load(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(decSumD(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 300.0)
        val o = load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        val c = load(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"))
        big.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_totalprice"), col("sum_qty"))
          .orderBy(col("sum_qty").desc, col("o_orderkey"))
      }),

      // TPC-H Q10 shape: returned-item revenue per customer, top-20 —
      // fact filtered, customer dim broadcast, orders left to the
      // optimizer.
      "q10_returned_items" -> ((s, dir) => {
        val li = load(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        val o = load(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        val c = load(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .agg(decSumD(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      })
    ) ++ TpchOps.queries ++ AggOps.queries ++ JoinOps.queries ++ WindowOps.queries ++
      SetOps.queries ++ DedupOps.queries ++ SimilarityOps.queries ++
      TextOps.queries ++ MultimodalOps.queries ++ MergeOps.queries ++
      DeriveOps.queries ++ GraphOps.queries ++
      graft.streaming.EventStream.queries ++
      graft.catalog.JdbcCatalog.queries ++ graft.ingest.IngestPipeline.queries

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |        AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY 1,2,3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |        AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE c_nationkey = s_nationkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,

    "q4_priority_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q16_supplier_cnt" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |       COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM ps JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q21_waiting_supplier" ->
      """WITH lo AS (
        |  SELECT l_orderkey, l_suppkey,
        |         l_shipdate > o_orderdate + INTERVAL 90 DAY AS is_late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |late AS (SELECT l_orderkey, l_suppkey FROM lo WHERE is_late)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE EXISTS (SELECT 1 FROM lo l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,

    "q7_nation_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  EXTRACT(year FROM l_shipdate) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |        AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7') OR
        |       (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q17_small_quantity" ->
      """WITH flt AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#11'),
        |a AS (SELECT l_partkey AS ak, AVG(l_quantity) AS avg_qty
        |      FROM flt GROUP BY 1)
        |SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
        |    AS total_price,
        |  COUNT(*) AS n_lines
        |FROM flt JOIN a ON l_partkey = ak
        |WHERE l_quantity < avg_qty * 0.2""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
        |           AS sum_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
        |         > 300.0)
        |SELECT c_name, c_custkey, o_orderkey, o_totalprice, sum_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |         JOIN customer ON o_custkey = c_custkey
        |ORDER BY sum_qty DESC, o_orderkey""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_mktsegment,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |        AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |GROUP BY 1,2,3
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
  ) ++ TpchOps.oracle ++ AggOps.oracle ++ JoinOps.oracle ++ WindowOps.oracle ++
    SetOps.oracle ++ DedupOps.oracle ++ SimilarityOps.oracle ++
    TextOps.oracle ++ MultimodalOps.oracle ++ MergeOps.oracle ++
    DeriveOps.oracle ++ GraphOps.oracle ++
    graft.streaming.EventStream.oracle ++
    graft.catalog.JdbcCatalog.oracle ++ graft.ingest.IngestPipeline.oracle
}
