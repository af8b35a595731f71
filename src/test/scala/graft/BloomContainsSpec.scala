package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the native bloom_contains probe (j12's build block). */
class BloomContainsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def bloomBytesOf(keys: Seq[Long]): Array[Byte] = {
    import spark.implicits._
    val bf = keys.toDF("k").stat.bloomFilter("k", keys.size.max(1), 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("no false negatives: every inserted key probes true") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val keys = (1L to 500L).map(_ * 7919L)
    val bytes = bloomBytesOf(keys)
    val missed = keys.toDF("k")
      .filter(!call_function("bloom_contains", lit(bytes), col("k")))
      .count()
    assert(missed == 0, s"$missed inserted keys probed false")
  }

  test("prune+exact-join equals the plain join (FPs removed)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val dim = (1L to 50L).map(k => (k * 13L, s"d$k")).toDF("k", "name")
    val fact = (1L to 5000L).map(v => (v % 997L, v)).toDF("k", "v")
    val bytes = bloomBytesOf(dim.select("k").as[Long].collect().toSeq)
    val pruned = fact
      .filter(call_function("bloom_contains", lit(bytes), col("k")))
      .join(dim, "k").select("k", "v").collect().toSet
    val plain = fact.join(dim, "k").select("k", "v").collect().toSet
    assert(pruned == plain)
  }

  test("interpreted eval matches codegen") {
    GraftFunctions.register(spark)
    val bytes = bloomBytesOf(Seq(1L, 2L, 3L))
    val lits = Seq(1L, 2L, 3L, 4L, 1000L)
    // interpreted: eval via expression on literals (ConstantFolding runs
    // the interpreted path); codegen: filter over a DataFrame column
    import spark.implicits._
    val viaDf = lits.toDF("k")
      .select(call_function("bloom_contains", lit(bytes), col("k")).as("c"))
      .collect().map(_.getBoolean(0)).toSeq
    val viaFold = lits.map { k =>
      spark.sql(s"SELECT bloom_contains(${bytesAsSqlLit(bytes)}, ${k}L)")
        .collect().head.getBoolean(0)
    }
    assert(viaDf == viaFold)
    assert(viaDf.take(3).forall(identity), "inserted keys must probe true")
  }

  private def bytesAsSqlLit(b: Array[Byte]): String =
    "X'" + b.map("%02X".format(_)).mkString + "'"
}
