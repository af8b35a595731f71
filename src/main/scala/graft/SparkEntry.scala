package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 that is "done" has an entry in
  * [[queries]] (Spark implementation over the sf-dir parquet tables) and,
  * when SQL-expressible, a matching entry in [[oracleSql]] (DuckDB runs it
  * on the same parquet; the driver hash-compares values after sorting
  * columns by name).
  *
  * Float discipline: any aggregate over a double column is computed via
  * an exact DECIMAL cast then cast back to DOUBLE, in BOTH the Spark and
  * the SQL form, so sum order cannot change the result bits.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's most load-bearing shape (Cenir_DB.py:453): duplicate
    * groups by truncated timestamp over the events table — 121 groups at
    * sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    queries("a1_dup_exam_groups")(spark, dir)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  def oracleSql: Map[String, String] = Queries.oracle
}
