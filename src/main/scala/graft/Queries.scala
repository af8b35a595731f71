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
    ) ++ AggOps.queries ++ JoinOps.queries ++ WindowOps.queries ++
      SetOps.queries ++ DedupOps.queries ++ SimilarityOps.queries ++
      TextOps.queries ++ MultimodalOps.queries ++ MergeOps.queries ++
      DeriveOps.queries ++ graft.streaming.EventStream.queries ++
      graft.catalog.JdbcCatalog.queries

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
  ) ++ AggOps.oracle ++ JoinOps.oracle ++ WindowOps.oracle ++
    SetOps.oracle ++ DedupOps.oracle ++ SimilarityOps.oracle ++
    TextOps.oracle ++ MultimodalOps.oracle ++ MergeOps.oracle ++
    DeriveOps.oracle ++ graft.streaming.EventStream.oracle ++
    graft.catalog.JdbcCatalog.oracle
}
