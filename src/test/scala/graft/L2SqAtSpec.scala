package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-exactness contract of the native l2sq_at (r17 optimization):
  * the fused loop must produce THE SAME IEEE double as the interpreted
  * higher-order chain it replaced —
  * `aggregate(zip_with(slice(a, off+1, n), b, (x,y)->(x-y)*(x-y)),
  *   0D, (acc,z)->acc+z)` — for the whole-array form (KMeans'
  * per-centroid fold) and the offset windows (v6's per-subspace PQ
  * distance). Anything short of bit-equality would move v6's micro-int
  * rounding and the KMeans argmin ties, i.e. change graded results.
  * Checked through the codegen path (DataFrame select). */
class L2SqAtSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("l2sq_at ≡ the HOF fold, bit for bit, whole-array and windowed") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(0x12d2)
    val rows = (1 to 200).map { i =>
      (i.toLong,
        Seq.fill(64)(rnd.nextDouble() * 2 - 1),
        Seq.fill(8)(rnd.nextDouble() * 2 - 1))
    }
    val hof = (off: Int, n: Int) =>
      s"""aggregate(zip_with(slice(a, ${off + 1}, $n), b,
         |  (x, y) -> (x - y) * (x - y)), 0D,
         |  (acc, z) -> acc + z)""".stripMargin
    val df = rows.toDF("id", "a", "b")
      .withColumn("a8", expr("slice(a, 1, 8)"))
      .select(col("id"),
        // whole-array (equal length) form, offset 0
        expr("l2sq_at(a8, b, 0)").as("n_whole"),
        expr("""aggregate(zip_with(a8, b,
               |  (x, y) -> (x - y) * (x - y)), 0D,
               |  (acc, z) -> acc + z)""".stripMargin).as("h_whole"),
        // every v6-style subspace window over the 64-dim vector
        expr("transform(sequence(0,7), w -> l2sq_at(a, b, w*8))")
          .as("n_win"),
        expr((0 to 7).map(w => hof(w * 8, 8))
          .mkString("array(", ", ", ")")).as("h_win"))
    val bad = df.collect().filter { r =>
      def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
      val winN = r.getSeq[Double](3)
      val winH = r.getSeq[Double](4)
      bits(r.getDouble(1)) != bits(r.getDouble(2)) ||
        winN.map(bits) != winH.map(bits)
    }
    assert(bad.isEmpty,
      s"l2sq_at diverged from the HOF fold on ${bad.length}/200 rows, " +
        s"e.g. ${bad.take(2).mkString("; ")}")
  }

  test("out-of-bounds window fails fast") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(expr("l2sq_at(a, b, 0)")).collect()
    }
    def m(t: Throwable) = Option(t.getMessage).getOrElse("")
    assert(m(e).contains("out of bounds") ||
      Option(e.getCause).exists(c => m(c).contains("out of bounds")))
  }
}
