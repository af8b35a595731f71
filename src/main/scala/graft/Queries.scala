package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registry of driver-checked queries.
  *
  * Each entry maps a SURVEY.md §2 operator onto the driver's synthetic
  * tables. The Spark form and the DuckDB oracle form must agree on column
  * names, row order (explicit ORDER BY both sides) and float bits
  * (DECIMAL-exact aggregation, see [[Dec]]).
  */
object Queries {

  /** Exact-decimal aggregate helper: sum of doubles is order-dependent in
    * IEEE754; casting to DECIMAL first makes the sum exact and therefore
    * identical between Spark and DuckDB regardless of partitioning.
    * Scale 6: far above double representation noise (~1e-13 relative, so
    * both engines round identically), far below the data's 2-4 decimal
    * digits of true precision.
    */
  private def decSum(c: Column): Column =
    sum(c.cast("decimal(30,6)"))

  import Tables.load

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A-family: aggregations -------------------------------------
    // TPC-H Q1 shape: scan+filter+groupBy+agg (SURVEY A8/A12 analog).
    "q1_pricing_summary" -> ((s, dir) => {
      val li = load(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          decSum(col("l_quantity")).cast("double").as("sum_qty"),
          decSum(col("l_extendedprice")).cast("double").as("sum_base_price"),
          decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    })
  )

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
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
