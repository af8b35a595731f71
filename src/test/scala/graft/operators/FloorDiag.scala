package graft.operators

import org.apache.spark.sql.SparkSession

/** Query-floor attribution (r17 optimization round): splits a warm
  * timed run of representative cheap queries into DataFrame
  * construction, planning (executedPlan force), and execution
  * (toRdd.count), so the ~0.65 s floor of trivial queries can be
  * attributed. Numbers go to OPTIMIZATION_r17.md by hand.
  */
object FloorDiag {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "t10_repetition", "w9_rolling_window",
        "a4_group_stats", "q5_local_supplier")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, dir).queryExecution.toRdd.count() // warmup
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.queryExecution.toRdd.count()
        val t3 = System.nanoTime()
        println(f"FLOOR $n%-24s run$i construct=${(t1 - t0) / 1e9}%6.3f " +
          f"plan=${(t2 - t1) / 1e9}%6.3f exec=${(t3 - t2) / 1e9}%6.3f")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
