package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.Lake

/** Dynamic partition pruning over the date-partitioned lake: a join
  * whose dimension side carries a selective filter must prune the fact
  * table's partition directories at RUNTIME (the filter value is only
  * known after the dim side runs). At 100 TB this is the difference
  * between scanning two days and scanning three years — and it only
  * works if the fact side is genuinely partitioned and the join key is
  * the partition column, which is exactly the layout
  * [[Lake.writePartitionedByDay]] produces. */
class DppSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("date-dim filter dynamically prunes the fact table's partitions") {
    val root = java.nio.file.Files.createTempDirectory("dpp").toString
    val fact = Tables.load(spark, "/root/testdata/sf0.001", "events")
    Lake.writePartitionedByDay(fact, "ts", s"$root/events_by_day")

    val partitioned = spark.read.parquet(s"$root/events_by_day")
    val allDays = partitioned.select("part_date").distinct()
      .as[java.sql.Date].collect().sorted
    assert(allDays.length > 2, "fixture must span several days")

    // dimension: a calendar table on disk where two days carry the
    // "requested" tag. DPP only fires when the filtering side has a
    // SELECTIVE predicate (PartitionPruning.hasSelectivePredicate) —
    // a bare in-memory LocalRelation doesn't qualify, a filtered scan
    // does, and a real calendar dim is a filtered scan.
    val requested = allDays.take(2).toSet
    allDays.toSeq.toDF("d")
      .withColumn("window_tag",
        when(col("d").isin(requested.toSeq: _*), lit("requested"))
          .otherwise(lit("other")))
      .write.parquet(s"$root/calendar")
    val dim = spark.read.parquet(s"$root/calendar")
      .filter(col("window_tag") === "requested")

    val joined = partitioned.join(broadcast(dim),
      partitioned("part_date") === dim("d"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(plan.contains("dynamicpruning"),
      s"no dynamic pruning in the fact scan:\n${plan.take(3000)}")
    // correctness: only the two requested days' rows survive
    val got = joined.select("part_date").distinct()
      .as[java.sql.Date].collect().sorted
    assert(got.toSeq == allDays.take(2).toSeq)
  }
}
