package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftFunctions

/** Scale attribution for the vector-store maintenance pair (round 13):
  * is the entry cost of `splitHotCells`/`mergeColdCells` really
  * O(touched rows) + O(files metadata), never O(store)? Builds two
  * stores with IDENTICAL maintenance work (same hot cell / same cold
  * cells) whose UNTOUCHED bulk differs 10×, and times the same
  * maintenance call on each. If the claim holds, the walls track the
  * touched-row count, not the store size; the residual growth is the
  * metadata term (10× more files+footers in the counts pass and the
  * debris listing). Numbers go to BENCH_NOTES by hand.
  *
  * Run (no sbt lock, after Test/compile):
  *   /tmp/benchrun.sh graft.operators.MaintDiag
  */
object MaintDiag {
  private def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"MAINTDIAG $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  // one UNIQUE axis per cell (Dim == NList): with Dim < NList the
  // c % Dim lead makes centroid c and centroid c+Dim the same
  // direction, cosine ties send everything to the lower cid, and the
  // upper half of the table becomes phantom cells — the first run of
  // this diag did exactly that and measured a 29-hot-cell split
  // instead of the intended single-hot-cell comparison
  private val Dim = 64
  private val NList = 64

  /** Unit-ish vectors clustered around axis (id % NList): base noise
    * plus a dominant lead on the cluster axis, all deterministic. */
  private def clusteredVecs(spark: SparkSession, n: Long,
      idOffset: Long, cell: Long => Int): DataFrame = {
    import spark.implicits._
    spark.range(n).map { i =>
      val id = i + idOffset
      val c = cell(id)
      val v = Array.tabulate(Dim)(d =>
        0.02 + 0.001 * ((id + d) % 7) +
          (if (d == c % Dim) 1.0 + 0.01 * (id % 11) else 0.0) +
          // a second lead splits the hot cell into two sub-clusters
          (if (c == 0 && d == 1) { if (id % 2 == 0) 0.3 else -0.3 }
           else 0.0))
      (id, v.toSeq)
    }.toDF("vec_id", "v")
  }

  private def centroidTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until NList).map { c =>
      (c, Seq.tabulate(Dim)(d => if (d == c % Dim) 1.0 else 0.0))
    }.toDF("cid", "cv")
  }

  /** A store whose cell 0 holds `hotRows` (the maintenance target),
    * cells 1..3 hold `coldRows` each (the merge targets), and the
    * remaining cells share `bulkRows` of untouched vectors. */
  private def buildStore(spark: SparkSession, dir: String,
      hotRows: Long, coldRows: Long, bulkRows: Long): (String, String) = {
    val store = s"$dir/store"
    val centPath = s"$dir/centroids"
    centroidTable(spark).coalesce(1).write.mode("overwrite")
      .parquet(centPath)
    val cents = spark.read.parquet(centPath)
    // several appends → several files per cell, like a streaming ingest
    val hot = clusteredVecs(spark, hotRows, 0L, _ => 0)
    val cold = clusteredVecs(spark, coldRows * 3, 10000000L,
      id => 1 + (id % 3).toInt)
    val bulk = clusteredVecs(spark, bulkRows, 20000000L,
      id => 4 + (id % (NList - 4)).toInt)
    SimilarityOps.extendVectorStore(store, cents, hot)
    SimilarityOps.extendVectorStore(store, cents, cold)
    Seq(0, 1, 2, 3).foreach { s =>
      SimilarityOps.extendVectorStore(store, cents,
        bulk.filter(col("vec_id") % 4 === s))
    }
    (store, centPath)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    val base = java.nio.file.Files.createTempDirectory("maintdiag")
      .toString
    // thresholds chosen so ONLY the planted cells are ever touched at
    // BOTH bulk sizes: bulk/cell is 6.7k (small) and 67k (large) —
    // above the 5k cold line, below the 80k hot line
    val hotRows = 100000L
    val coldRows = 3000L

    // same touched rows; untouched bulk 10× apart
    Seq(("small", 400000L), ("large", 4000000L)).foreach {
      case (tag, bulkRows) =>
        val (store, centPath) = timed(s"$tag: build store " +
            s"(hot $hotRows + cold 3x$coldRows + bulk $bulkRows)") {
          buildStore(spark, s"$base/$tag", hotRows, coldRows, bulkRows)
        }
        // flush the build's dirty pages before timing maintenance —
        // otherwise the larger build's kernel writeback bleeds into
        // the split wall and the comparison measures the page cache,
        // not the operator (the BENCH_NOTES multi-query lesson)
        new ProcessBuilder("sync").inheritIO().start().waitFor()
        Thread.sleep(2000)
        timed(s"$tag: counts pass alone (cellCountsFrame collect)") {
          SimilarityOps.cellCountsFrame(spark, store).collect(): Unit
        }
        val mapping = timed(s"$tag: splitHotCells (threshold 80k)") {
          SimilarityOps.splitHotCells(spark, store, centPath,
            hotCellThreshold = 80000L, maxSplitK = 4)
        }
        println(s"MAINTDIAG $tag: split mapping $mapping")
        val merged = timed(s"$tag: mergeColdCells (threshold 5k)") {
          SimilarityOps.mergeColdCells(spark, store, centPath,
            coldCellThreshold = 5000L)
        }
        println(s"MAINTDIAG $tag: merged ${merged.keySet.toSeq.sorted}")
        timed(s"$tag: no-op maintenance entry (nothing hot/cold)") {
          SimilarityOps.splitHotCells(spark, store, centPath,
            hotCellThreshold = 10000000L): Unit
        }
    }
    spark.stop()
  }
}
