package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the STREAMING vector-ingest capstone (r13 verdict
  * ask #3): [[SimilarityOps.vectorsToStore]] claims per-batch cost ∝
  * batch size, not store size — the append is an exchange-free
  * per-row assignment, the writer lease is two metadata ops, and the
  * maintenance TRIGGER check is the parquet-METADATA-bound cell-counts
  * pass (O(files), zero data columns decoded). So a 10× store must
  * not make a batch meaningfully slower. Method mirrors
  * StreamDedupProbe: two stores whose untouched bulk differs 10×, the
  * SAME micro-batches pushed through each, every batch timed
  * end-to-end (lease + heal + assign + append + trigger check).
  * Numbers go to BENCH_NOTES by hand.
  *
  * Run (no sbt lock, after Test/compile):
  *   /tmp/benchrun.sh graft.operators.StreamVecIngestDiag
  */
object StreamVecIngestDiag {
  private val Dim = 64
  private val NList = 64

  private def clusteredVecs(spark: SparkSession, n: Long,
      idOffset: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map { i =>
      val id = i + idOffset
      val c = (id % NList).toInt
      val v = Array.tabulate(Dim)(d =>
        0.02 + 0.001 * ((id + d) % 7) +
          (if (d == c) 1.0 + 0.01 * (id % 11) else 0.0))
      (id, v.toSeq)
    }.toDF("vec_id", "v")
  }

  private def centroidTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until NList).map { c =>
      (c, Seq.tabulate(Dim)(d => if (d == c) 1.0 else 0.0))
    }.toDF("cid", "cv")
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/svingest")
    val bulk1x = 150000L
    val batchRows = 5000L
    val nBatches = 5

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.register(spark)

    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(work), true)

    val scales = Seq("store_1x" -> bulk1x, "store_10x" -> bulk1x * 10)
    val results = scales.map { case (tag, bulk) =>
      val store = s"$work/$tag/store"
      val centPath = s"$work/$tag/centroids"
      centroidTable(spark).coalesce(1).write.parquet(centPath)
      val cents = spark.read.parquet(centPath)
      // bulk in FOUR appends → several files per cell, the shape a
      // long-running ingest leaves (the trigger check is O(files))
      (0 until 4).foreach { s =>
        SimilarityOps.extendVectorStore(store, cents,
          clusteredVecs(spark, bulk / 4, bulk / 4 * s))
      }
      // hot threshold far above any cell: NO cycle fires — this diag
      // measures the steady-state per-batch cost (append + lease +
      // trigger check); cycle cost is MaintDiag's subject
      val hot = bulk * 100
      // warmup batch (JIT, codegen, listing) — not recorded
      SimilarityOps.vectorsToStore(store, centPath,
        clusteredVecs(spark, batchRows, 900000000L),
        hotCellThreshold = hot): Unit
      val perBatch = (0 until nBatches).map { b =>
        val batch = clusteredVecs(spark, batchRows,
          100000000L * (b + 1)).cache()
        batch.count()
        val sec = time {
          SimilarityOps.vectorsToStore(store, centPath, batch,
            hotCellThreshold = hot): Unit
        }
        batch.unpersist()
        (b, sec)
      }
      (tag, bulk, perBatch)
    }

    println("== streaming vector-ingest capstone probe ==")
    results.foreach { case (tag, bulk, perBatch) =>
      val secs = perBatch.map(_._2)
      println(f"$tag%-10s bulk=$bulk%9d  batches=" +
        perBatch.map { case (b, s) => f"b$b:$s%.2fs" }.mkString(" ") +
        f"  median=${secs.sorted.apply(secs.size / 2)}%.2fs")
    }
    val m1 = results.head._3.map(_._2).sorted.apply(nBatches / 2)
    val m10 = results.last._3.map(_._2).sorted.apply(nBatches / 2)
    println(f"store 10x / store 1x median per-batch ratio: ${m10 / m1}%.2f")
    spark.stop()
  }
}
