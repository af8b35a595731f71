package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Float-input contract of the native cosine_sim (the d5 sf10 fix):
  * reading float32 arrays and widening per element inside the fused
  * loop must be BIT-identical to pre-casting the arrays to
  * array<double> — float→double widening is exact, so shipping raw
  * float vectors through the verify joins halves shuffle bytes with
  * zero numeric drift. Checked through the codegen path (DataFrame
  * select) on float/float, float/double, and the double/double
  * baseline. */
class CosineSimSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("cosine_sim on float arrays ≡ cosine_sim on the double-cast " +
      "arrays, bit for bit (and mixed sides resolve)") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(0x5eed)
    val rows = (1 to 200).map { i =>
      (i.toLong,
        Seq.fill(64)(rnd.nextFloat() * 2 - 1),
        Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "fa", "fb")
      .withColumn("da", expr("transform(fa, x -> cast(x as double))"))
      .withColumn("db", expr("transform(fb, x -> cast(x as double))"))
      .select(col("id"),
        expr("cosine_sim(fa, fb)").as("r_ff"),
        expr("cosine_sim(fa, db)").as("r_fd"),
        expr("cosine_sim(da, fb)").as("r_df"),
        expr("cosine_sim(da, db)").as("r_dd"))
    val bad = df.collect().filter { r =>
      val dd = r.getDouble(4)
      // bit comparison, not tolerance: the claim is exactness
      Seq(1, 2, 3).exists(i =>
        java.lang.Double.doubleToLongBits(r.getDouble(i)) !=
          java.lang.Double.doubleToLongBits(dd))
    }
    assert(bad.isEmpty,
      s"float-input cosine diverged from the double baseline on " +
        s"${bad.length}/200 rows, e.g. ${bad.take(3).mkString("; ")}")
  }

  test("length mismatch still fails fast on float inputs") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
    val e = intercept[Exception] {
      df.select(expr("cosine_sim(a, b)")).collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("length mismatch")))
  }
}
