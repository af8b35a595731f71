package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage fixed-overhead probe (r17 optimization round): times
  * micro-jobs of known stage counts under the exact Bench session
  * config, so query floors (~0.65 s for trivial TPC-H shapes) can be
  * attributed to scheduling/stage latency vs real work. Numbers go to
  * OPTIMIZATION_r17.md by hand.
  */
object StageLatDiag {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"STAGELAT $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    // warmup
    (1 to 3).foreach(_ => spark.range(1000000).select(sum("id")).collect())
    (1 to 2).foreach { pass =>
      timed(s"pass$pass 1-stage collect (range 1M sum)") {
        spark.range(1000000).select(sum("id")).collect(): Unit
      }
      timed(s"pass$pass 2-stage groupBy (10k rows, 32 part)") {
        spark.range(10000).select((col("id") % 97).as("k"))
          .groupBy("k").count().queryExecution.toRdd.count(): Unit
      }
      timed(s"pass$pass join+agg (10k x 10k)") {
        val a = spark.range(10000).select(col("id"), (col("id") % 97).as("k"))
        val b = spark.range(10000).select(col("id").as("id2"))
        a.join(b, col("id") === col("id2"))
          .groupBy("k").count().queryExecution.toRdd.count(): Unit
      }
      timed(s"pass$pass join+agg+orderBy (10k x 10k)") {
        val a = spark.range(10000).select(col("id"), (col("id") % 97).as("k"))
        val b = spark.range(10000).select(col("id").as("id2"))
        a.join(b, col("id") === col("id2"))
          .groupBy("k").count().orderBy(col("k"))
          .queryExecution.toRdd.count(): Unit
      }
      timed(s"pass$pass 5-round loop of 2-stage aggs") {
        (1 to 5).foreach { _ =>
          spark.range(10000).select((col("id") % 97).as("k"))
            .groupBy("k").count().queryExecution.toRdd.count(): Unit
        }
      }
    }
    spark.stop()
  }
}
