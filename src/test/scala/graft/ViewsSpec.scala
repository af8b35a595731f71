package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.Views

/** SQL view surface: registered views must agree with the DataFrame
  * forms of the same operators. */
class ViewsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("order_lines view matches the j1 join row count") {
    Views.register(spark, sfDir)
    val viaSql = spark.sql("SELECT count(*) FROM order_lines")
      .head.getLong(0)
    val viaDf = SparkEntry.queries("j1_examseries_join")(spark, sfDir)
      .count()
    assert(viaSql == viaDf)
  }

  test("first_per_group view matches the a13 window form") {
    Views.register(spark, sfDir)
    val viaSql = spark.sql(
      "SELECT doc_id, lang FROM first_per_group ORDER BY lang")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val viaDf = SparkEntry.queries("a13_first_row_per_group")(spark, sfDir)
      .select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaSql == viaDf)
  }

  test("ad-hoc SQL over registered tables works") {
    Views.register(spark, sfDir)
    val n = spark.sql(
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY 1 HAVING count(*) > 0""".stripMargin).count()
    assert(n == 5)
  }
}
