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
    * construction before any execution). The first inference (under
    * the same nanosAsLong conf) is cached and later loads pass it
    * explicitly — exactly what a metastore/table-format catalog does
    * at 100 TB scale instead of per-query footer inference. Values,
    * pruning and pushdown are unchanged: the passed schema IS the
    * inferred one. The key carries the file's (mtime, length) next to
    * the path (r17 advice): an in-process rewrite of the same path
    * with a different schema — e.g. test tooling like ScaleUp
    * overwriting $dst/$t.parquet — re-infers instead of silently
    * serving the stale schema. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  /** (path, mtime, length) stamp — path alone is not an identity for
    * a rewriteable file. Directories (a partitioned lake table) stamp
    * with the dir's own mtime, which bumps on any child add/remove. */
  private def pathStamp(path: String): String = {
    val f = new java.io.File(path)
    s"$path@${f.lastModified}:${f.length}"
  }

  /** The events table stores TIMESTAMP(NANOS) parquet, which Spark only
    * reads via the nanosAsLong legacy conf (as a raw long). We truncate
    * nanos → micros exactly like DuckDB's TIMESTAMP_NS → TIMESTAMP cast,
    * so both engines see identical microsecond timestamps.
    */
  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sfDir/$table.parquet"
    val schema = schemaCache.computeIfAbsent(pathStamp(path),
      _ => spark.read.parquet(path).schema)
    val df = spark.read.schema(schema).parquet(path)
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None    => df
    }
  }

  /** Scan-task count of a table's parquet scan, cached per path stamp
    * (no job runs — partition planning only). Used by [[narrowScan]]
    * to decide whether a §2.5 spread is needed at all. */
  private val scanPartsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** True when `table`'s scan CANNOT fill the executors on its own —
    * fewer scan tasks than the session's core count. The §2.5 spreads
    * (d7/d13/m3: hash-repartition before a heavy per-row compute loop)
    * exist for exactly this case — locally every testdata table is one
    * small single-row-group file, so every scan is 1 task and per-row
    * hash loops would otherwise run single-threaded on a 32-core box.
    * On a multi-file 100 TB lake the scan splits into thousands of
    * tasks and the same repartition would be a pure extra full-corpus
    * shuffle with no downstream consumer of the layout (r17 verdict) —
    * so the spread is gated here, not applied unconditionally. The
    * task count is Spark's own byte-range split count, which
    * over-estimates row parallelism only for a multi-hundred-MB file
    * holding one giant row group — a layout production writers bound. */
  def narrowScan(spark: SparkSession, sfDir: String, table: String): Boolean = {
    val path = s"$sfDir/$table.parquet"
    val parts = scanPartsCache.computeIfAbsent(pathStamp(path),
      _ => Integer.valueOf(load(spark, sfDir, table).rdd.getNumPartitions))
    parts.intValue < spark.sparkContext.defaultParallelism
  }
}
