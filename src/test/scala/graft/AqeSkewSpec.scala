package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join: the RUNTIME half of the skew story (Skew.saltedJoin
  * is the plan-level half). A sort-merge join whose shuffle produces
  * one oversized partition must be re-planned at runtime — the skewed
  * partition split into advisory-sized slices, the other side's
  * matching partition replicated — with no change to the result. At
  * 100 TB this is what absorbs the protocol-sized skew SURVEY §7.4
  * flags when the hot key is not known ahead of time (salting needs
  * the key list; AQE reads it off the shuffle map statistics). */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("runtime skew-join split fires on a hot key and preserves results") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap

    // 90% of the fact rows share key 0; the payload makes the hot
    // shuffle partition comfortably exceed the lowered skew threshold.
    val fact = spark.range(0, 100000)
      .select(when(col("id") % 10 === 0, col("id") % 50)
          .otherwise(lit(0L)).as("k"),
        concat(lit("p"), lpad(col("id").cast("string"), 64, "x"))
          .as("payload"))
    val dim = spark.range(0, 50).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("tag"))

    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // coalescing would re-merge the split slices of the probe side
      // in this tiny fixture; production keeps it on with a real
      // advisory size, the spec pins the split itself
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      val joined = fact.join(dim, "k")
      val n = joined.count()
      assert(n == 100000L, "inner join on a complete dim keeps every row")

      // the FINAL adaptive plan must carry the skew markers; consuming
      // the payload keeps it from being pruned off the shuffle (a
      // k-only shuffle is too small to trip even the lowered threshold)
      val agg = joined.groupBy(col("tag"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("payload"))).as("bytes"))
      agg.collect()
      val finalPlan = agg.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"no runtime skew split in the final plan:\n${finalPlan.take(3000)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
