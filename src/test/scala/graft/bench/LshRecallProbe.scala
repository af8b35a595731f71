package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftFunctions
import graft.operators.DedupOps

/** Planted-canary LSH recall at the scales where the band-bucket cap
  * ACTUALLY BINDS (VERDICT r9 ask #1). d15's graded oracle runs where
  * `MaxBandBucketDefault` never fires, so the recall cost of dropping
  * a hot band bucket rested on the "15 other bands" argument; this
  * probe replays the exact d15 pipeline (every 4th doc gains a copy
  * with its first 3 words dropped; detected = the full banded + capped
  * + exact-Jaccard-verified d2 chain; truth = the planted pairs with
  * exact Jaccard) at sf0.1 / sf1 / sf10 and reports recall@J≥0.8 next
  * to how often the cap bound and the largest band bucket seen.
  *
  * The planted-copy id offset is scale-safe (beyond any corpus id) —
  * and since r12 the graded query's offset is the same 4e8 class, so
  * the two measure the same construction. Results go to BENCH_NOTES
  * by hand.
  *
  * Run: `sbt "Test/runMain graft.bench.LshRecallProbe \
  *   /root/testdata/sf0.1 /tmp/sf1 /tmp/sf10"`.
  */
object LshRecallProbe {

  private val Off = 100000000L // far beyond any scaled corpus id

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    println("dir\tdocs\ttruth\ttrue_dups\tcaught\trecall\t" +
      "overflowed_buckets\tmax_band_bucket")
    dirs.foreach { dir =>
      val base = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val cop = base.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + Off).as("doc_id"),
          concat_ws(" ", expr(
            "slice(split(text, ' '), 4, size(split(text, ' ')))"))
            .as("text"))
      val all = base.union(cop).filter(length(col("text")) >= 8)
        .repartition(col("doc_id"))
        .withColumn("shingles", expr("md5_shingle60(text)"))
        .cache()
      val n = all.count()
      val sh = all.select(col("doc_id"), col("shingles"))
      val banded = DedupOps.minhashBanded(sh).cache()
      // r12: the graded chain's shape (shingles-on-banded self-join)
      val detected = DedupOps.lshVerifiedPairs(banded,
        Seq("band", "band_key"), sh, 0.8,
        DedupOps.MaxBandBucketDefault, ordered = false)
      val planted = all.select(col("doc_id").as("doc_a"))
        .filter(col("doc_a") % 4 === 0 && col("doc_a") < Off)
        .join(all.select(col("doc_id").as("doc_b")),
          col("doc_b") === col("doc_a") + Off)
      val truth = DedupOps.verifyJaccard(planted, sh, 0.0,
        ordered = false)
      val scored = truth.join(
          detected.select(col("doc_a"), col("doc_b"),
            lit(true).as("caught")),
          Seq("doc_a", "doc_b"), "left")
        .agg(count(lit(1)).as("truth"),
          sum(when(col("jacc") >= 0.8, 1L).otherwise(0L)).as("dups"),
          sum(when(col("jacc") >= 0.8 && col("caught"), 1L)
            .otherwise(0L)).as("caught"))
        .head()
      val ov = DedupOps.bucketOverflow(banded, Seq("band", "band_key"),
        DedupOps.MaxBandBucketDefault)
        .agg(coalesce(count(lit(1)), lit(0L)),
          coalesce(max(col("bucket_n")), lit(0L))).head()
      val maxBucket = banded.groupBy(col("band"), col("band_key"))
        .agg(count(lit(1)).as("bn")).agg(max(col("bn"))).head().getLong(0)
      val (t, d, c) = (scored.getLong(0), scored.getLong(1),
        scored.getLong(2))
      println(f"$dir\t$n\t$t\t$d\t$c\t${c.toDouble / d}%.4f\t" +
        f"${ov.getLong(0)}\t$maxBucket")
      banded.unpersist(); all.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
