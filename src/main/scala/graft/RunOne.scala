package graft

import org.apache.spark.sql.SparkSession

/** Profiling helper: run one named query (warmup + N timed runs) and
  * print per-run seconds — the single-query loupe for bench outliers.
  *
  * sbt "runMain graft.RunOne <name> [sfDir] [runs]"
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    println(f"[runone] $name warmup ${(System.nanoTime() - t0) / 1e9}%.2f s")
    (1 to runs).foreach { i =>
      val t = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"[runone] $name run$i ${(System.nanoTime() - t) / 1e9}%.2f s ($n rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
