package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftFunctions


/** One-shot diagnostic for the d9 two-level regression at sf10:
  * times the flat vs two-level centroid assignment separately from
  * the verify, and reports cluster-size skew (sum of size² ∝ verify
  * pair count) for each. */
object D9Diag {
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

    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val scaled = base.select((col("vec_id") + 100000000L).as("vec_id"),
      expr("transform(embedding, x -> x * cast(1.01 as float))")
        .as("embedding"))
    val all = base.union(scaled)
      .repartition(col("vec_id"))
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .select(col("vec_id"), col("v"))
      .cache()
    val n = all.count()
    val k = math.max(16L, n / 250L)
    println(s"n=$n k=$k")
    val centRows = all.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int"), col("v")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)

    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // FLAT assignment (the r10 shape)
    val cidLit = typedLit(centRows.map(_._1).toSeq)
    val centLit = typedLit(centRows.map(_._2).toSeq)
    val rs = transform(centLit,
      c => round(call_function("cosine_sim", col("v"), c), 6))
    val flat = all.withColumn("rs", rs)
      .withColumn("cid", element_at(cidLit,
        array_position(col("rs"), array_max(col("rs"))).cast("int")))
      .select(col("vec_id"), col("cid")).cache()
    timed("flat assign")(flat.count())
    val flatSkew = flat.groupBy("cid").count()
      .agg(sum(col("count") * col("count")), max(col("count")),
        count(lit(1))).head()
    println(s"flat sum(sz^2)=${flatSkew.getLong(0)} max=${flatSkew.getLong(1)} nclusters=${flatSkew.getLong(2)}")

    // TWO-LEVEL assignment (current d9 path)
    val two = SimilarityOps.withCosArgmaxCid(all,
        centRows.map(_._1), centRows.map(_._2))
      .select(col("vec_id"), col("cid")).cache()
    timed("two-level assign")(two.count())
    val twoSkew = two.groupBy("cid").count()
      .agg(sum(col("count") * col("count")), max(col("count")),
        count(lit(1))).head()
    println(s"two  sum(sz^2)=${twoSkew.getLong(0)} max=${twoSkew.getLong(1)} nclusters=${twoSkew.getLong(2)}")
    val agree = flat.withColumnRenamed("cid", "fc")
      .join(two.withColumnRenamed("cid", "tc"), "vec_id")
      .agg(sum(when(col("fc") === col("tc"), 1L).otherwise(0L)),
        count(lit(1))).head()
    println(s"agreement(nprobe=1): ${agree.getLong(0)}/${agree.getLong(1)}")

    // TWO-LEVEL, level-1 nprobe=2 (r12 knob): the two nearest supers'
    // children both probed — measures how much flat agreement the
    // runner-up group recovers and what it costs
    val two2 = SimilarityOps.withCosArgmaxCid(all,
        centRows.map(_._1), centRows.map(_._2), nprobe1 = 2)
      .select(col("vec_id"), col("cid")).cache()
    timed("two-level nprobe=2 assign")(two2.count())
    val two2Skew = two2.groupBy("cid").count()
      .agg(sum(col("count") * col("count")), max(col("count")),
        count(lit(1))).head()
    println(s"two(np2) sum(sz^2)=${two2Skew.getLong(0)} " +
      s"max=${two2Skew.getLong(1)} nclusters=${two2Skew.getLong(2)}")
    val agree2 = flat.withColumnRenamed("cid", "fc")
      .join(two2.withColumnRenamed("cid", "tc"), "vec_id")
      .agg(sum(when(col("fc") === col("tc"), 1L).otherwise(0L)),
        count(lit(1))).head()
    println(s"agreement(nprobe=2): ${agree2.getLong(0)}/${agree2.getLong(1)}")

    // verify cost for each assignment
    def verifySec(a: org.apache.spark.sql.DataFrame): Double = {
      val withV = a.join(all, "vec_id")
      val assign = withV.select(col("vec_id"), col("cid"), col("v")).cache()
      assign.count()
      val t0 = System.nanoTime()
      val pairs = DedupOps.bucketPairs(
        assign.select(col("cid"), col("vec_id").as("doc_id")), Seq("cid"))
      val nd = pairs
        .join(assign.select(col("vec_id").as("doc_a"), col("v").as("va")),
          "doc_a")
        .join(assign.select(col("vec_id").as("doc_b"), col("v").as("vb")),
          "doc_b")
        .filter(expr("round(cosine_sim(va, vb), 6)") >= 0.999)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      assign.unpersist()
      println(f"verify: $nd dropped-pairs in $sec%.1f s")
      sec
    }
    println("flat verify:"); verifySec(flat)
    println("two-level verify:"); verifySec(two)
    spark.stop()
  }
}
