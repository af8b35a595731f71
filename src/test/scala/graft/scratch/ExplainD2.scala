package graft.operators
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftFunctions
object ExplainD2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 8)
      .repartition(col("doc_id"))
      .withColumn("shingles", expr("md5_shingle60(text)"))
      .select(col("doc_id"), col("shingles")).cache()
    val v = DedupOps.lshVerifiedPairs(DedupOps.minhashBanded(sh),
      Seq("band", "band_key"), sh, 0.8, DedupOps.MaxBandBucketDefault,
      ordered = false)
    v.collect()
    println(v.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
