package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.MergeOps

/** Parquet-lake catalog sink — the reference's main sink (K3: exam and
  * serie tables in MySQL, Cenir_DB.py:62-135) persisted as a parquet
  * table with MERGE maintenance instead of row-at-a-time SQL.
  *
  * Write protocol: read current table → MergeOps.merge with the
  * incoming batch → write the merged snapshot to `<table>.tmp` → atomic
  * swap (rename current → `.bak`, tmp → current, drop `.bak`). A
  * reader sees either the old or the new snapshot, never a partial
  * write; a crashed writer leaves the current snapshot intact. On a
  * real deployment the same semantics come from a table format's
  * transactional commit — the merge plan is identical.
  *
  * Idempotent by construction (MergeSpec property): re-merging the same
  * batch is a no-op, which is what the reference's `--twice` rerun
  * approximated.
  */
object Lake {

  /** Date-partitioned lake layout: the reference's mtime-based `--days`
    * pruning (common.py:267-306) becomes partition pruning — a reader
    * filtering on `part_date` touches only the matching directories
    * (PartitionFilters in the scan, asserted in LakeSpec). */
  def writePartitionedByDay(df: DataFrame, tsCol: String,
      path: String): Unit =
    df.withColumn("part_date",
      org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col(tsCol)))
      .write.mode("overwrite").partitionBy("part_date").parquet(path)

  /** Bucketed layout for co-located joins: both fact tables bucketed by
    * the join key into the same bucket count join WITHOUT a shuffle
    * (no Exchange in the plan — asserted in BucketedJoinSpec). At 100 TB
    * this is the difference between re-shuffling the fact table per
    * query and a one-time layout cost at ingest. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new java.net.URI(
      if (path.contains("://")) path else s"file://$path"),
      spark.sparkContext.hadoopConfiguration)

  /** Reads the current snapshot; if a previous writer died mid-swap
    * (no table, `.bak` present), the backup is restored first — the
    * batch must never be mistaken for the whole table. */
  def readTable(spark: SparkSession, path: String): Option[DataFrame] = {
    val fs = fsFor(spark, path)
    val cur = new Path(path); val bak = new Path(path + ".bak")
    if (!fs.exists(cur) && fs.exists(bak)) {
      require(fs.rename(bak, cur), s"crash recovery failed: $bak -> $cur")
    }
    if (fs.exists(cur)) Some(spark.read.parquet(path)) else None
  }

  /** MERGE `batch` into the table at `path` (created if absent).
    * Returns per-status counts (inserted/updated/kept).
    *
    * The merge plan executes ONCE (persisted before the counts collect
    * and the snapshot write — it would otherwise re-read the table and
    * re-run the join for each). Crash recovery: if the process dies
    * between the two renames, the previous snapshot is intact at
    * `.bak` — rename it back. */
  def mergeWrite(spark: SparkSession, path: String, batch: DataFrame,
      key: String, exclude: Seq[String] = Nil): Map[String, Long] = {
    val merged = (readTable(spark, path) match {
      case Some(db) => MergeOps.merge(db, batch, key, exclude)
      case None => batch.withColumn("merge_status",
        org.apache.spark.sql.functions.lit("inserted"))
    }).persist()
    try {
      val counts = merged.groupBy("merge_status").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val fs = fsFor(spark, path)
      val cur = new Path(path); val tmp = new Path(path + ".tmp")
      val bak = new Path(path + ".bak")
      merged.drop("merge_status").write.mode("overwrite")
        .parquet(tmp.toString)
      // a leftover .bak alongside a live table is stale (previous swap
      // completed); with NO live table it is the only copy and
      // readTable above already restored it
      if (fs.exists(bak) && fs.exists(cur)) fs.delete(bak, true)
      if (fs.exists(cur)) require(fs.rename(cur, bak), s"swap failed: $cur")
      require(fs.rename(tmp, cur), s"swap failed: $tmp -> $cur")
      fs.delete(bak, true)
      counts
    } finally merged.unpersist()
  }
}
