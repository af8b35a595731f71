package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustered writes (Lake.zorderWrite): the measurable claim
  * is data-skipping effectiveness — per-FILE min/max ranges must
  * shrink on EVERY clustered dimension, where a single-column sort
  * shrinks only its own column and leaves the other at the full
  * global range. Measured directly from the written files via
  * input_file_name(). */
class ZorderSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  // 10k points on two decorrelated uniform dims (y is a bit-mixed
  // permutation of x's domain, so a linear sort on x says nothing
  // about y)
  private def data = {
    import spark.implicits._
    (0 until 10000).map { i =>
      (i.toLong, (i % 100).toLong * 10, ((i * 7919) % 1000).toLong)
    }.toDF("id", "x", "y")
  }

  /** average per-file (max-min) range of `c`, as a fraction of the
    * global range */
  private def avgFileRangeFrac(path: String, c: String): Double = {
    val df = spark.read.parquet(path)
      .withColumn("f", input_file_name())
    val global = df.agg((max(col(c)) - min(col(c))).cast("double"))
      .head().getDouble(0)
    val per = df.groupBy(col("f"))
      .agg(((max(col(c)) - min(col(c))).cast("double") / global).as("r"))
      .agg(avg(col("r"))).head().getDouble(0)
    per
  }

  test("z-order shrinks per-file ranges on BOTH dims; linear sort does not") {
    val zdir = java.nio.file.Files.createTempDirectory("zorder").toString
    val ldir = java.nio.file.Files.createTempDirectory("linear").toString
    graft.catalog.Lake.zorderWrite(data, Seq("x", "y"), zdir, 16)
    data.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x")
      .write.mode("overwrite").parquet(ldir)

    val (zx, zy) = (avgFileRangeFrac(zdir, "x"), avgFileRangeFrac(zdir, "y"))
    val (lx, ly) = (avgFileRangeFrac(ldir, "x"), avgFileRangeFrac(ldir, "y"))
    // 16 files over 2 dims: the curve gives ~sqrt(16)=4x reduction per
    // dim; assert a conservative 2x on both
    assert(zx < 0.5 && zy < 0.5,
      s"z-order per-file ranges not shrunk on both dims: x=$zx y=$zy")
    // the linear layout is great on x and useless on y — the gap
    // z-order exists to close
    assert(lx < 0.2, s"linear sort should localize x, got $lx")
    assert(ly > 0.8, s"expected y unlocalized under linear sort, got $ly")
  }

  test("bloom-filtered writes carry the filter for exactly the asked columns") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    val df = (0 until 2000).map(i => (i.toLong, s"uid_$i", i % 7))
      .toDF("id", "uid", "bucket")
    graft.catalog.Lake.writeWithBloom(df, Seq("uid"), dir, 2000)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString).filter(_.endsWith(".parquet")).head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(part),
      spark.sessionState.newHadoopConf())
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val cols = reader.getFooter.getBlocks.get(0).getColumns
      val byName = (0 until cols.size).map(i => cols.get(i))
        .map(c => c.getPath.toDotString -> c.getBloomFilterOffset).toMap
      assert(byName("uid") >= 0, s"uid has no bloom filter: $byName")
      assert(byName("id") < 0 && byName("bucket") < 0,
        s"unexpected bloom filters: $byName")
    } finally reader.close()
  }

  test("nulls and constant columns do not break the key") {
    import spark.implicits._
    val df = Seq((1L, Option(5L), 7L), (2L, None, 7L), (3L, Option(9L), 7L))
      .toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder_edge").toString
    graft.catalog.Lake.zorderWrite(df, Seq("x", "y"), dir, 2)
    assert(spark.read.parquet(dir).count() == 3)
    // an ALL-null column must rank 0 everywhere, not NPE on the driver
    val allNull = Seq((1L, Option.empty[Long], 7L),
      (2L, Option.empty[Long], 9L)).toDF("id", "x", "y")
    val dir2 = java.nio.file.Files.createTempDirectory("zorder_null").toString
    graft.catalog.Lake.zorderWrite(allNull, Seq("x", "y"), dir2, 1)
    assert(spark.read.parquet(dir2).count() == 2)
  }
}
