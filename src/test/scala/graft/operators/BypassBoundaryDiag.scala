package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Boundary pin for the small-corpus verify bypass (r13 verdict ask
  * #1): [[DedupOps.lshVerifiedPairs]] routes a corpus whose banded
  * table is ≤ [[DedupOps.StrataBypassMaxBandedRows]] (1 M rows)
  * through the distinct-pairs form and everything larger through the
  * bucket-size-adaptive strata. This diag runs REAL corpora sitting
  * just below and just above that constant (ScaleUp 12× ≈ 960 k and
  * 13× ≈ 1.04 M banded rows from sf0.1's 5 k docs × 16 bands) and, on
  * EACH, verifies the two forms produce the IDENTICAL pair set —
  * forcing the other path via the injectable `bypassMaxBandedRows`
  * (0 = always strata, Long.MaxValue = always pairs). The printed
  * banded counts pin which side of the constant each corpus lands on
  * (the routing is a pure function of that count), and the timings
  * record the crossover the constant encodes. Results go to
  * BENCH_NOTES by hand.
  *
  * Run (no sbt lock, after Test/compile):
  *   /tmp/benchrun.sh graft.operators.BypassBoundaryDiag /tmp/sfb12 /tmp/sfb13
  */
object BypassBoundaryDiag {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val below = args.headOption.getOrElse("/tmp/sfb12")
    val above = if (args.length > 1) args(1) else "/tmp/sfb13"

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.register(spark)

    def sh(dir: String): DataFrame = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 8)
      .repartition(col("doc_id"))
      .withColumn("shingles", expr("md5_shingle60(text)"))
      .select(col("doc_id"), col("shingles"))

    Seq("below_1M" -> below, "above_1M" -> above).foreach {
      case (tag, dir) =>
        val s = sh(dir)
        val banded = DedupOps.minhashBanded(s)
        val nBanded = banded.count()
        val side =
          if (nBanded <= DedupOps.StrataBypassMaxBandedRows) "PAIRS(bypass)"
          else "STRATA"
        println(f"BOUNDARY $tag%-9s banded=$nBanded%9d vs " +
          f"${DedupOps.StrataBypassMaxBandedRows}%9d -> default path: $side")
        def run(bypass: Long): (DataFrame, Double) = {
          spark.catalog.clearCache()
          val (df, sec) = time {
            val r = DedupOps.lshVerifiedPairs(DedupOps.minhashBanded(s),
              Seq("band", "band_key"), s, 0.8,
              ordered = false, bypassMaxBandedRows = bypass)
            r.queryExecution.toRdd.count()
            r
          }
          (df, sec)
        }
        val (viaPairs, tPairs) = run(Long.MaxValue) // force pairs form
        val (viaStrata, tStrata) = run(0L)          // force strata
        val onlyP = viaPairs.exceptAll(viaStrata).count()
        val onlyS = viaStrata.exceptAll(viaPairs).count()
        val n = viaPairs.count()
        println(f"BOUNDARY $tag%-9s pairs_form=$tPairs%6.2fs " +
          f"strata=$tStrata%6.2fs  n_pairs=$n%7d  " +
          f"pairs_only=$onlyP strata_only=$onlyS " +
          (if (onlyP == 0 && onlyS == 0) "IDENTICAL" else "MISMATCH"))
        require(onlyP == 0 && onlyS == 0,
          s"$tag: the two verify forms disagree")
    }
    spark.stop()
  }
}
