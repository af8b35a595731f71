package graft

import org.apache.spark.sql.SparkSession

/** One pinned-workload cpu calibration reading ([[Bench.calCpuSeconds]])
  * printed as a single JSON line — the box-speed stamp for artifacts
  * OUTSIDE the bench main: the SlowTest tier runner brackets its run
  * with two of these so a slow tier/suite wall time is attributable
  * in-band the way bench lines are (r15 verdict ask #6), and anchor
  * passes can take a standalone reading between queries. Deliberately
  * COLD, no warmup pass: Bench's own `cal_cpu` is the first Spark job
  * of its JVM too, so readings share a ruler with the bench quiet band
  * (3.7–5.0 s quiet, 5.5 ceiling — BENCH_NOTES). */
object CalProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sec = Bench.calCpuSeconds(spark)
    println(s"""{"cal_cpu":${Bench.num3(sec)}}""")
    spark.stop()
  }
}
