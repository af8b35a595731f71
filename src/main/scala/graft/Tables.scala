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

  /** Schema cache per parquet path (r17 optimization, guide §6): a
    * bare `spark.read.parquet(path)` re-reads parquet footers to infer
    * the schema on EVERY call — ~30-80 ms per table per plan build,
    * paid inside every timed run (multi-table queries paid ~0.5 s of
    * construction before any execution). The driver tables are
    * immutable per sf dir, so the first inference (under the same
    * nanosAsLong conf) is cached and later loads pass it explicitly —
    * exactly what a metastore/table-format catalog does at 100 TB
    * scale instead of per-query footer inference. Values, pruning and
    * pushdown are unchanged: the passed schema IS the inferred one. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  /** The events table stores TIMESTAMP(NANOS) parquet, which Spark only
    * reads via the nanosAsLong legacy conf (as a raw long). We truncate
    * nanos → micros exactly like DuckDB's TIMESTAMP_NS → TIMESTAMP cast,
    * so both engines see identical microsecond timestamps.
    */
  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sfDir/$table.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    val df = spark.read.schema(schema).parquet(path)
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None    => df
    }
  }
}
