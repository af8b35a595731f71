package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftFunctions

/** One-shot diagnostic: where does d2's sf10 time go — band-bucket
  * candidate generation or the exact-Jaccard verify's per-pair
  * shingle-array joins? Decides whether the d9/d5 self-join lesson
  * (carry payloads on bucket rows) would pay for the minhash family,
  * where the payload is ~300 hashed shingles/doc and the banded table
  * fans out 16 rows/doc: payload-on-banded costs 16 × 2.4 KB per doc
  * shuffled, per-pair re-join costs 2 × 2.4 KB per CANDIDATE — the
  * self-join only wins when candidates/doc > 8. */
object D2Diag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    // single-shot per stage (cached outputs make in-process re-runs
    // read the cache, not the work) — run the WHOLE main 3× and take
    // per-stage mins: single numbers on this box swing 5× with
    // writeback load (r12 re-measure: verifyJaccard read 6.8 s and
    // 37.7 s on identical code+data minutes apart)
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 8)
      .repartition(col("doc_id"))
      .withColumn("shingles", expr("md5_shingle60(text)"))
      .select(col("doc_id"), col("shingles"))
      .cache()
    val nDocs = timed("shingle + cache")(sh.count())
    val banded = DedupOps.minhashBanded(sh).cache()
    timed("banding")(banded.count())
    val pairs = DedupOps.bucketPairs(banded,
      Seq("band", "band_key"), DedupOps.MaxBandBucketDefault).cache()
    val nPairs = timed("bucketPairs")(pairs.count())
    println(s"docs=$nDocs candidate_pairs=$nPairs " +
      f"pairs_per_doc=${nPairs.toDouble / nDocs}%.2f " +
      "(self-join-with-payload wins only above ~8)")
    timed("verifyJaccard (per-pair shingle joins)") {
      DedupOps.verifyJaccard(pairs, sh, 0.8).count()
    }
    // r12: the landed rewrite, end-to-end (banding is inside the
    // cached `banded`, so this times size-pass + live filter +
    // payload attach + self-join verify against the pair path's
    // bucketPairs + verifyJaccard above)
    val nV = timed("lshVerifiedPairs (shingles-on-banded self-join)") {
      val v = DedupOps.lshVerifiedPairs(banded,
        Seq("band", "band_key"), sh, 0.8,
        DedupOps.MaxBandBucketDefault, ordered = false)
      v.count()
    }
    println(s"verified_pairs=$nV")
    spark.stop()
  }
}
