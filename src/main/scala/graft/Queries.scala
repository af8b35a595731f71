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
      })
    ) ++ AggOps.queries ++ JoinOps.queries ++ WindowOps.queries ++
      SetOps.queries ++ DedupOps.queries ++ SimilarityOps.queries ++
      TextOps.queries ++ MultimodalOps.queries ++ MergeOps.queries ++
      DeriveOps.queries ++ graft.streaming.EventStream.queries

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
  ) ++ AggOps.oracle ++ JoinOps.oracle ++ WindowOps.oracle ++
    SetOps.oracle ++ DedupOps.oracle ++ SimilarityOps.oracle ++
    TextOps.oracle ++ MultimodalOps.oracle ++ MergeOps.oracle ++
    DeriveOps.oracle ++ graft.streaming.EventStream.oracle
}
