package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SharedSpark

/** Lloyd's fit on planted well-separated clusters must recover them:
  * every member lands with its cluster-mates, and each fitted centroid
  * sits at its cluster's mean. */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  // 3 clusters of 40 points in 4-d, centers far apart (±10), points
  // jittered deterministically within ±0.5 — separation ≫ spread.
  private def planted = {
    import spark.implicits._
    val centers = Seq(Seq(10.0, 0.0, 0.0, 0.0), Seq(0.0, 10.0, 0.0, 0.0),
      Seq(0.0, 0.0, -10.0, 0.0))
    (0 until 120).map { i =>
      val c = centers(i % 3)
      val jit = c.indices.map(j => ((i * 7 + j * 13) % 11 - 5) / 10.0)
      (i.toLong, c.zip(jit).map { case (a, b) => a + b })
    }.toDF("id", "vec")
  }

  test("fit recovers planted clusters and their means") {
    val df = planted.cache()
    val cents = KMeans.fit(df, "id", "vec", k = 3, iters = 5)
    val assigned = KMeans.assign(df, "vec", cents)
      .select(col("id"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))

    // all members of a planted cluster share one fitted cid, and the
    // three planted clusters map to three distinct cids
    val byPlanted = assigned.groupBy(_._1 % 3).view
      .mapValues(_.map(_._2).toSet).toMap
    byPlanted.values.foreach(s => assert(s.size == 1,
      s"a planted cluster split across fitted clusters: $byPlanted"))
    assert(byPlanted.values.flatten.toSet.size == 3)

    // each fitted centroid ≈ its planted center (within the jitter):
    // planted cluster i peaks on dim i with magnitude 10
    byPlanted.foreach { case (planted, cids) =>
      val c = cents(cids.head)
      val dim = planted.toInt
      assert(math.abs(math.abs(c(dim)) - 10.0) < 1.0,
        s"centroid ${c.mkString(",")} off its planted center on dim $dim")
    }
  }

  test("typed-literal centroid delivery survives production k·d") {
    import spark.implicits._
    // k=512, d=128 → 65,536 doubles: a rendered SQL array literal at
    // this size blows codegen/constant-pool limits; the typed literal
    // must plan and execute (one ArrayData reference in codegen)
    val cents = Array.tabulate(512, 128)((i, j) => (i * 131 + j * 17).toDouble)
    val rows = Seq((0L, cents(5).toSeq), (1L, cents(100).toSeq),
      (2L, cents(511).toSeq)).toDF("id", "vec")
    val got = KMeans.assign(rows, "vec", cents)
      .select(col("id"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(0L -> 5, 1L -> 100, 2L -> 511))
  }

  test("assignment is deterministic and ties break to the lowest cid") {
    import spark.implicits._
    val two = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0))).toDF("id", "vec")
    // two identical centroids: every row must pick cid 0
    val cents = Array(Array(1.0, 0.0), Array(1.0, 0.0))
    val cids = KMeans.assign(two, "vec", cents)
      .select(col("cid")).collect().map(_.getInt(0)).toSeq
    assert(cids == Seq(0, 0))
  }
}
