package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession shared by every suite (Test / fork := true gives the
  * whole test run a single JVM). */
object SharedSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
