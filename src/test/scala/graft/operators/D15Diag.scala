package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftFunctions

/** Stage attribution for the d15 sf10 regression probe (round 13):
  * times the recall query's three stages separately — the eager
  * adaptive verify (detected), the planted-truth verifyJaccard, and
  * the final join — against SPARK_GRAFT_SF_DIR. Full-process run;
  * numbers go to BENCH_NOTES by hand.
  *
  * Run: /tmp/benchrun.sh graft.operators.D15Diag
  */
object D15Diag {
  private def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"D15DIAG $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val cop = base.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 400000000L).as("doc_id"),
        concat_ws(" ",
          expr("slice(split(text, ' '), 4, size(split(text, ' ')))"))
          .as("text"))
    val all = base.union(cop).filter(length(col("text")) >= 8)
      .repartition(col("doc_id"))
      .withColumn("shingles", expr("md5_shingle60(text)"))
      .cache()
    val sh = all.select(col("doc_id"), col("shingles"))
    timed("all.cache population (count)")(all.count())

    var detected: DataFrame = null
    timed("lshVerifiedPairs EAGER (detected)") {
      detected = DedupOps.lshVerifiedPairs(DedupOps.minhashBanded(sh),
        Seq("band", "band_key"), sh, 0.8, DedupOps.MaxBandBucketDefault,
        ordered = false)
    }
    timed("detected.count (checkpoint read)")(detected.count())

    var truth: DataFrame = null
    timed("truth verifyJaccard (build+count)") {
      val planted = all.select(col("doc_id").as("doc_a"))
        .filter(col("doc_a") % 4 === 0 && col("doc_a") < 400000000L)
        .join(all.select(col("doc_id").as("doc_b")),
          col("doc_b") === col("doc_a") + 400000000L)
      truth = DedupOps.verifyJaccard(planted, sh, 0.0, ordered = false)
        .cache()
      truth.count(): Unit
    }

    // stage decomposition of the adaptive verify on THIS corpus
    {
      val keys = Seq("band", "band_key")
      val maxBucket = DedupOps.MaxBandBucketDefault
      val smallMax = DedupOps.PairFormBucketMax
      val b = DedupOps.minhashBanded(sh).cache()
      timed("  stage: banding (b.count)")(b.count())
      val sizes = b.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("bsz")).cache()
      timed("  stage: sizes (count)")(sizes.count())
      val smallKeys = sizes
        .filter(col("bsz") >= 2 && col("bsz") <= smallMax)
        .select(keys.map(col): _*)
      val largeKeys = sizes
        .filter(col("bsz") > smallMax && col("bsz") <= maxBucket)
        .select(keys.map(col): _*)
      val liveS = b.join(smallKeys, keys)
      val pairsS = DedupOps.bucketPairs(liveS, keys, smallMax).cache()
      timed("  stage: small bucketPairs (count)")(pairsS.count())
      timed("  stage: small verifyJaccard (count)") {
        DedupOps.verifyJaccard(pairsS, sh, 0.8, ordered = false)
          .count(): Unit
      }
      val liveL = b.join(largeKeys, keys)
      timed("  stage: large stratum rows (count)")(liveL.count())
      spark.catalog.clearCache()
      timed("re-cache all after clear")(all.cache().count())
    }

    timed("final join + orderBy (toRdd)") {
      val out = truth.join(
          detected.select(col("doc_a"), col("doc_b"),
            lit(true).as("caught")),
          Seq("doc_a", "doc_b"), "left")
        .select(col("doc_a"), col("doc_b"), col("jacc"),
          (col("jacc") >= 0.8).as("is_dup"),
          coalesce(col("caught"), lit(false)).as("caught"))
        .orderBy(col("doc_a"))
      out.queryExecution.toRdd.count(): Unit
    }
    spark.stop()
  }
}
