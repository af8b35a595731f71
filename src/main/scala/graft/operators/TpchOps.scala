package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.load
import graft.functions.Fns.{decSum, decSumD}

/** The remaining TPC-H query shapes (Q2/Q6/Q8/Q9/Q11/Q12/Q13/Q14/Q15/
  * Q19/Q20/Q22), adapted to the driver's synthetic star schema.
  *
  * The testdata has no `partsupp` table and no comment/phone/shipmode
  * columns, so the shapes that need them are re-expressed over what
  * exists while keeping the *plan shape* TPC-H exercises:
  *  - partsupp            → `SELECT DISTINCT l_partkey, l_suppkey`
  *  - ps_supplycost       → `s_acctbal` (Q2 ranking) / `l_extendedprice`
  *                          (Q11 value)
  *  - c_phone country code→ `c_nationkey % 10`
  *  - l_shipmode          → `l_linestatus`
  *  - comment LIKE filter → an orderpriority / p_name filter
  *
  * Scale notes (100 TB): every dimension that is genuinely small
  * (part-filtered slivers, supplier, nation, region, scalar aggregates)
  * is broadcast explicitly; fact-fact joins shuffle on their join key
  * once; scalar subqueries (Q11 total, Q14 denominator, Q15 max, Q22
  * avg) become one-row broadcasts, never per-row rescans; Q13's
  * histogram double-aggregates with map-side partials on both passes.
  */
object TpchOps {

  /** Per-priority counts expressed as COUNT(CASE …) so both engines emit
    * BIGINT (a DuckDB SUM would widen to HUGEINT and break the compare).
    */
  private def countIf(c: org.apache.spark.sql.Column) = count(when(c, 1))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q6: single-table predicate sliver + sum. The whole query is one
    // scan with every predicate pushed to parquet; no shuffle at all
    // beyond the final single-row agg.
    "q6_forecast_revenue" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24.0)
        .agg(decSumD(col("l_extendedprice") * col("l_discount"))
          .as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // Q2 shape: min-cost supplier per part — here "best" = highest
    // account balance among EUROPE suppliers that ever shipped the part.
    // The part sliver and the supplier dim broadcast; the only shuffle
    // is the window's partition-by-part exchange over the POST-FILTER
    // sliver. No pre-distinct on the pair relation (r17 optimization,
    // 2 Exchanges → 1): the old DISTINCT shuffled every fact pair
    // before the selective part filter, and the row_number window then
    // re-shuffled on p_partkey anyway. Duplicate (part, supplier) rows
    // entering the window are full ties in every output column, so
    // rk=1 picks an identical row — the result is provably unchanged.
    "q2_best_supplier" -> ((s, dir) => {
      val ps = load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
      val p = load(s, dir, "part")
        .filter(col("p_size").between(10, 20) && col("p_type") === "LARGE")
        .select(col("p_partkey"), col("p_brand"))
      val eu = load(s, dir, "region").filter(col("r_name") === "EUROPE")
      val n = load(s, dir, "nation")
        .join(broadcast(eu), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val su = load(s, dir, "supplier")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name"))
      val w = Window.partitionBy(col("p_partkey"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey"))
      ps.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"))
        .orderBy(col("s_acctbal").desc, col("p_partkey"))
        .limit(100)
    }),

    // Q8 shape: market share of one nation inside one region's demand
    // for one part type, per order year. Numerator and denominator ride
    // the same aggregate pass (conditional sum), so the ratio costs one
    // shuffle; both are exact DECIMAL sums divided once in double.
    "q8_market_share" -> ((s, dir) => {
      val p = load(s, dir, "part")
        .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
      val am = load(s, dir, "region").filter(col("r_name") === "AMERICA")
      val n = load(s, dir, "nation")
        .join(broadcast(am), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cu = load(s, dir, "customer")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val sn = load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val su = load(s, dir, "supplier")
        .join(broadcast(sn), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val o = load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("volume"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cu), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((decSumD(when(col("supp_nation") === "NATION_3", col("volume"))
            .otherwise(0.0)) / decSumD(col("volume")))
          .as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // Q9 shape: profit per supplier nation per year over a part-name
    // sliver. Supply cost is proxied by 10% of retail price x quantity.
    // part sliver + supplier dim broadcast; one fact shuffle for the
    // order join, one for the group-by.
    "q9_product_profit" -> ((s, dir) => {
      val p = load(s, dir, "part")
        .filter(col("p_name").like("red%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val sn = load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val su = load(s, dir, "supplier")
        .join(broadcast(sn), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val li = load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"), col("l_shipdate"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("nation"), year(col("l_shipdate")).as("o_year"))
        .agg(decSumD(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            - col("p_retailprice") * col("l_quantity") * 0.1)
          .as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // Q11 shape: per-part value concentration for one nation's
    // suppliers, kept when above a fraction of the total. The total is
    // a one-row aggregate cross-joined back (broadcast) — the classic
    // scalar-subquery-as-broadcast pattern, never a rescan.
    "q11_important_parts" -> ((s, dir) => {
      val sn = load(s, dir, "nation")
        .filter(col("n_name") === "NATION_19").select(col("n_nationkey"))
      val su = load(s, dir, "supplier")
        .join(broadcast(sn), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val li = load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      val byPart = li.groupBy(col("l_partkey"))
        .agg(decSumD(col("l_extendedprice")).as("value"))
      val total = li.agg(
        (decSumD(col("l_extendedprice")) * lit(0.001))
          .as("threshold"))
      byPart.join(broadcast(total))
        .filter(col("value") > col("threshold"))
        .select(col("l_partkey"), col("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }),

    // Q12 shape: late-shipment priority split. The join shuffles once
    // on the order key; the two priority counts are conditional counts
    // in a single aggregate pass (COUNT(CASE) keeps both engines in
    // BIGINT).
    "q12_late_priority" -> ((s, dir) => {
      val o = load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val li = load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_shipdate"), col("l_linestatus"))
      li.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(
          countIf(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
            .as("high_line_count"),
          countIf(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
            .as("low_line_count"))
        .orderBy(col("l_linestatus"))
    }),

    // Q13 shape: customer order-count distribution — a left outer join
    // (order filter playing the comment-exclusion role), then a
    // two-level aggregate. Both group-bys get map-side partials; the
    // second input is one row per customer, so the histogram pass is
    // trivially small.
    "q13_count_distribution" -> ((s, dir) => {
      val c = load(s, dir, "customer").select(col("c_custkey"))
      val o = load(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "5-LOW")
        .select(col("o_orderkey"), col("o_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q14 shape: promo revenue share in one month. Numerator and
    // denominator are conditional/total DECIMAL sums in one aggregate
    // pass; the single double division afterwards is bit-deterministic.
    "q14_promo_share" -> ((s, dir) => {
      val p = load(s, dir, "part")
        .select(col("p_partkey"), col("p_type"))
      val li = load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("l_partkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("rev"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg((decSumD(when(col("p_type") === "PROMO", col("rev"))
            .otherwise(0.0)) * lit(100.0) / decSumD(col("rev")))
          .as("promo_revenue"))
    }),

    // Q15 shape: top supplier(s) by quarterly revenue. The max is a
    // window over the tiny per-supplier aggregate (100 rows) — at any
    // scale that relation is |suppliers|, so the un-partitioned window
    // is safe; supplier names broadcast in.
    "q15_top_supplier" -> ((s, dir) => {
      val rev = load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(decSumD(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_revenue"))
      val su = load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      rev.join(broadcast(mx))
        .filter(col("total_revenue") === col("mx"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // Q19 shape: disjunction of bracketed brand/size/quantity
    // predicates. The whole OR evaluates inside the joined scan —
    // one broadcast join, one row-level filter, one sum; no
    // union-of-three-scans (that would read the fact table thrice).
    "q19_bracket_revenue" -> ((s, dir) => {
      val p = load(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val li = load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" &&
            col("p_size").between(1, 5) &&
            col("l_quantity").between(1.0, 11.0)) ||
          (col("p_brand") === "Brand#23" &&
            col("p_size").between(1, 10) &&
            col("l_quantity").between(10.0, 20.0)) ||
          (col("p_brand") === "Brand#3" &&
            col("p_size").between(1, 15) &&
            col("l_quantity").between(20.0, 30.0)))
        .agg(decSumD(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // Q20 shape: suppliers holding a dominant share of a part's 1996
    // volume. Share per (part, supplier) vs the part total rides one
    // grouping sets-free double aggregate (pair agg, then part agg
    // joined back on the part key — both shuffles are on l_partkey so
    // AQE coalesces them); the winning pairs semi-join the supplier dim.
    "q20_excess_share" -> ((s, dir) => {
      val p = load(s, dir, "part")
        .filter(col("p_name").like("hot%")).select(col("p_partkey"))
      val li96 = load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      val pairQty = li96.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(decSumD(col("l_quantity")).as("pair_qty"))
      val partQty = li96.groupBy(col("l_partkey").as("pk"))
        .agg((decSumD(col("l_quantity")) * lit(0.15))
          .as("part_threshold"))
      val winners = pairQty
        .join(partQty, col("l_partkey") === col("pk"))
        .filter(col("pair_qty") > col("part_threshold"))
        .select(col("l_suppkey")).distinct()
      val sn = load(s, dir, "nation")
        .filter(col("n_name") === "NATION_18").select(col("n_nationkey"))
      load(s, dir, "supplier")
        .join(broadcast(sn), col("s_nationkey") === col("n_nationkey"))
        .join(winners, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    }),

    // Q22 shape: rich *lapsed* customers per country code (nationkey %
    // 10 plays the phone prefix; every synthetic customer has SOME
    // order, so "never ordered" becomes "no order since 1999"). The
    // positive-balance average is a one-row broadcast; the lapse test
    // is an anti join on the customer key — no NOT IN materialization.
    "q22_global_sales" -> ((s, dir) => {
      val codes = Seq(0, 1, 2, 3, 4)
      val c = load(s, dir, "customer")
        .withColumn("cntrycode", col("c_nationkey") % 10)
        .filter(col("cntrycode").isin(codes: _*))
        .select(col("c_custkey"), col("cntrycode"), col("c_acctbal"))
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg((decSumD(col("c_acctbal")) / count(lit(1)))
          .as("avg_bal"))
      val o = load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      c.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          decSumD(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("cntrycode"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6)))
        |       AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24.0""".stripMargin,

    "q2_best_supplier" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |ranked AS (
        |  SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
        |         ROW_NUMBER() OVER (PARTITION BY p_partkey
        |                            ORDER BY s_acctbal DESC, s_suppkey)
        |           AS rk
        |  FROM ps
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
        |    AND r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
        |FROM ranked WHERE rk = 1
        |ORDER BY s_acctbal DESC, p_partkey
        |LIMIT 100""".stripMargin,

    "q8_market_share" ->
      """SELECT EXTRACT(year FROM o_orderdate) AS o_year,
        |  CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_3'
        |        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
        |        AS DECIMAL(30,6))) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |        AS DECIMAL(30,6))) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,

    "q9_product_profit" ->
      """SELECT n_name AS nation,
        |  EXTRACT(year FROM l_shipdate) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |        - p_retailprice * l_quantity * 0.1
        |        AS DECIMAL(30,6))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE 'red%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q11_important_parts" ->
      """WITH v AS (
        |  SELECT l_partkey, l_extendedprice
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_19')
        |SELECT l_partkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
        |    AS value
        |FROM v
        |GROUP BY 1
        |HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
        |  > (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6)))
        |            AS DOUBLE) * 0.001 FROM v)
        |ORDER BY value DESC, l_partkey""".stripMargin,

    "q12_late_priority" ->
      """SELECT l_linestatus,
        |  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |        THEN 1 END) AS high_line_count,
        |  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |        THEN 1 END) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY l_linestatus""".stripMargin,

    "q13_count_distribution" ->
      """WITH pc AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '5-LOW'
        |  GROUP BY 1)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM pc
        |GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q14_promo_share" ->
      """SELECT
        |  CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
        |      AS DECIMAL(30,6))) AS DOUBLE) * 100.0 /
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(30,6))) AS DOUBLE) AS promo_revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |          AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q19_bracket_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |        AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE
        |  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |     AND l_quantity BETWEEN 1.0 AND 11.0)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |     AND l_quantity BETWEEN 10.0 AND 20.0)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |     AND l_quantity BETWEEN 20.0 AND 30.0)""".stripMargin,

    "q20_excess_share" ->
      """WITH li96 AS (
        |  SELECT l_partkey, l_suppkey, l_quantity
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'hot%'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'),
        |pair AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
        |      AS pair_qty
        |  FROM li96 GROUP BY 1, 2),
        |pt AS (
        |  SELECT l_partkey AS pk,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) * 0.15
        |      AS part_threshold
        |  FROM li96 GROUP BY 1),
        |winners AS (
        |  SELECT DISTINCT l_suppkey
        |  FROM pair JOIN pt ON l_partkey = pk
        |  WHERE pair_qty > part_threshold)
        |SELECT s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_18'
        |  AND s_suppkey IN (SELECT l_suppkey FROM winners)
        |ORDER BY s_name""".stripMargin,

    "q22_global_sales" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey % 10 AS cntrycode, c_acctbal
        |  FROM customer
        |  WHERE c_nationkey % 10 IN (0, 1, 2, 3, 4)),
        |a AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
        |         / COUNT(*) AS avg_bal
        |  FROM c WHERE c_acctbal > 0.0)
        |SELECT cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
        |    AS totacctbal
        |FROM c, a
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1 ORDER BY cntrycode""".stripMargin
  )
}
