package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SketchOps

/** Error-bound checks for the sketch aggregates against exact answers
  * on the events table, plus the plan property that makes them scale:
  * partial aggregation (the shuffle carries sketches, not raw rows). */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("HLL distinct estimate within rsd of the exact count") {
    val ev = Tables.load(spark, dir, "events")
    val approx = SketchOps.distinctEstimate(ev, Seq("event_type"), "user_id")
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"))
    val joined = approx.join(exact, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (a, e) = (r.getAs[Long]("approx_distinct"), r.getAs[Long]("exact"))
      assert(math.abs(a - e) <= math.max(3, 0.15 * e),
        s"${r.get(0)}: approx $a vs exact $e")
    }
  }

  test("approx median lands within tight rank error of exact") {
    val ev = Tables.load(spark, dir, "events")
    val got = SketchOps.quantileEstimate(ev, Seq("event_type"), "value",
      Seq(0.5, 0.9)).collect()
    val exact = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.5, 0.9))").as("ex")).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    got.foreach { r =>
      val qs = r.getSeq[Double](1)
      val ex = exact(r.getString(0))
      // value domain is ~[0,1000]; 1/accuracy rank error at n≈1k rows
      // per group keeps the value gap tiny
      assert(math.abs(qs(0) - ex(0)) < 5.0 && math.abs(qs(1) - ex(1)) < 5.0,
        s"${r.get(0)}: $qs vs $ex")
    }
  }

  test("count-min estimates are one-sided bounded: true <= est <= true+eps*N") {
    val ev = Tables.load(spark, dir, "events")
    val exact = ev.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val est = SketchOps.freqEstimate(ev, "event_type", exact.keys.toSeq)
    exact.foreach { case (k, e) =>
      val a = est(k)
      assert(a >= e, s"$k: count-min undercounted $a < $e")
      assert(a <= e + math.ceil(0.001 * n).toLong + 1,
        s"$k: estimate $a exceeds the eps*N bound over $e")
    }
  }

  test("sketches partial-aggregate: shuffle carries merged state") {
    val ev = Tables.load(spark, dir, "events")
    val p = SketchOps.distinctEstimate(ev, Seq("event_type"), "user_id")
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate|HashAggregate".r.findAllIn(p).length >= 2,
      s"no partial agg in:\n${p.take(1500)}")
  }
}
