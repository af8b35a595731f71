package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round/phase attribution for connectedComponents on d6's planted
  * graph (r17 optimization round): prints executed round count and
  * wall per call so the per-round fixed-cost share is visible next to
  * the shuffle-byte share. Full-process run; numbers go to
  * OPTIMIZATION_r17.md by hand.
  */
object CCDiag {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
    val third = d.filter(col("doc_id") % 3 === 0)
    val edges = d.select(col("doc_id").as("src"),
        (col("doc_id") + 100000000L).as("dst"))
      .union(third.select((col("doc_id") + 100000000L).as("src"),
        (col("doc_id") + 200000000L).as("dst")))
      .union(third.select((col("doc_id") + 200000000L).as("src"),
        (col("doc_id") + 300000000L).as("dst")))
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val (labels, rounds) = DedupOps.connectedComponentsWithRounds(edges)
      val n = labels.count()
      println(f"CCDIAG pass$i rounds=$rounds nodes=$n " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
