package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.Lake

/** Bucketed co-located join: same bucket count on the join key on both
  * sides → the sort-merge join runs without any Exchange (no shuffle of
  * either fact table), and results match the plain join. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans no shuffle and matches plain join") {
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    Lake.writeBucketed(o, "orders_b", "o_orderkey", 8)
    Lake.writeBucketed(li, "lineitem_b", "l_orderkey", 8)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(2000)}")

      val viaBuckets = joined.count()
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(viaBuckets == plain && plain > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("extension injection point registers all graft functions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // all five native expressions resolve through the injected builders
    GraftFunctions.register(spark)
    val resolved = Seq("cosine_sim", "minhash_sig", "simhash60",
      "shingle_hash64", "md5_shingle60").map { f =>
      spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(f))
    }
    assert(resolved.forall(identity))
  }
}
