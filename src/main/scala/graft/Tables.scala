package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Each table is one parquet file under the sf directory. At 100 TB each
  * of these would be a partitioned parquet lake directory; the loader API
  * is the same either way (`spark.read.parquet(dir)` handles both), so
  * query code never cares.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The events table stores TIMESTAMP(NANOS) parquet, which Spark only
    * reads via the nanosAsLong legacy conf (as a raw long). We truncate
    * nanos → micros exactly like DuckDB's TIMESTAMP_NS → TIMESTAMP cast,
    * so both engines see identical microsecond timestamps.
    */
  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None    => df
    }
  }
}
