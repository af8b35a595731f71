package graft.catalog

import org.apache.spark.sql.SparkSession
import graft.Tables

/** SQL surface — the reference's view layer (cenir_view.sql).
  *
  * Registers every base table plus the two reference views so users can
  * run plain `spark.sql(...)`:
  *  - `order_lines` = the ExamSeries inner equi-join (cenir_view.sql:8):
  *    every parent column + every child column, 1—N;
  *  - `first_per_group` = the `seqname` first-row-per-group view
  *    (cenir_view.sql:20), MySQL's implicit-first made explicit.
  */
object Views {

  def register(spark: SparkSession, sfDir: String): Unit = {
    Tables.names.foreach { n =>
      Tables.load(spark, sfDir, n).createOrReplaceTempView(n)
    }
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW order_lines AS
        |SELECT * FROM orders o JOIN lineitem l
        |  ON o.o_orderkey = l.l_orderkey""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW first_per_group AS
        |SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT *, row_number() OVER (PARTITION BY lang
        |    ORDER BY doc_id) AS rn FROM documents) t
        |WHERE rn = 1""".stripMargin)
  }
}
