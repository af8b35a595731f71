package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftFunctions

/** Scale attribution for the round-13 probe/compact shuffle-diet
  * changes: the probe's postings used to cross TWO payload exchanges
  * (an early distinct + the window's shuffle of scored candidates) and
  * the compact rewrite crossed the store twice (distinct + cid
  * repartition). Times probeVectorStore (min of 3) and
  * compactVectorStore (ONCE per invocation — a second in-process
  * compact would measure the degenerate already-compacted, replay-free
  * store; A/B compact across alternated invocations instead) on a
  * store big enough for the wire cost to show (1.5 M × 64-dim rows,
  * several hundred MB of payload). The store is REBUILT every run:
  * the compact mutates it, so reusing a workdir would silently
  * measure a one-file-per-cell store with no replay tail. The same
  * main runs unmodified on the pre-change tree for the A/B.
  * Methodology caveat recorded with the numbers: the first probe run
  * is JIT-cold and writes its shuffle files fresh, but the store
  * pages are BUILD-WARM in the page cache (sync flushes dirty pages,
  * it does not evict) — "cold" here means cold JIT + fresh shuffle,
  * not cold disk. Numbers go to BENCH_NOTES by hand.
  *
  * Run (no sbt lock, after Test/compile):
  *   /tmp/benchrun.sh graft.operators.ProbeDiag [workdir]
  */
object ProbeDiag {
  private def timed(label: String)(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"PROBEDIAG $label%-46s $s%8.2f s")
    s
  }

  private val Dim = 64
  private val NList = 64
  private val Rows = 1500000L

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/probediag")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    import spark.implicits._

    val store = s"$work/store"
    val centPath = s"$work/centroids"
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // rebuild unconditionally: the compact below mutates the store
    fs.delete(new org.apache.hadoop.fs.Path(work), true)
    if (!fs.exists(new org.apache.hadoop.fs.Path(centPath))) {
      (0 until NList).map(c =>
          (c, Seq.tabulate(Dim)(i => if (i == c) 1.0 else 0.0)))
        .toDF("cid", "cv").coalesce(1).write.parquet(centPath)
      val vecsDf = spark.range(Rows).map { id =>
        val c = (id % NList).toInt
        val v = Array.tabulate(Dim)(i =>
          0.02 + 0.001 * ((id + i) % 13) + (if (i == c) 1.0 else 0.0))
        (id, v.toSeq)
      }.toDF("vec_id", "v")
      // two appends → replayed tail so the dedup paths do real work
      SimilarityOps.extendVectorStore(store,
        spark.read.parquet(centPath), vecsDf)
      SimilarityOps.extendVectorStore(store,
        spark.read.parquet(centPath),
        vecsDf.filter(col("vec_id") % 10 === 0))
      println(s"PROBEDIAG built $store: " +
        spark.read.parquet(store).count() + " posting rows")
    }
    new ProcessBuilder("sync").inheritIO().start().waitFor()
    Thread.sleep(2000)

    val cents = spark.read.parquet(centPath)
    // 20 queries spread over 20 cells, nprobe=4 → ~80 probed cells'
    // worth of candidates (≈ 1/16 of the store per query tilt)
    val queries = (0 until 20).map { qi =>
      val c = qi * 3 % NList
      val v = Array.tabulate(Dim)(i =>
        0.02 + (if (i == c) 1.0 else 0.0) +
          (if (i == (c + 1) % Dim) 0.4 else 0.0))
      (10000000L + qi, v.toSeq)
    }.toDF("vec_id", "v")

    val probeTimes = (1 to 3).map(i => timed(s"probe k=10 nprobe=4 run$i") {
      SimilarityOps.probeVectorStore(store, cents, queries,
        k = 10, nprobe = 4).queryExecution.toRdd.count(): Unit
    })
    println(f"PROBEDIAG probe min ${probeTimes.min}%.2f s")

    timed("compactVectorStore (once — replay tail + small files)") {
      SimilarityOps.compactVectorStore(spark, store): Unit
    }
    spark.stop()
  }
}
