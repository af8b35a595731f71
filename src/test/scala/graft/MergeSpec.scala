package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.MergeOps.merge

/** MERGE semantics (Cenir_DB.py:62-135 shape): unit cases for
  * insert/update/keep branches, exclude-list behavior, the reference's
  * round(x*1e5) float tolerance, and the idempotence property the
  * reference needed `--twice` to approximate. */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def db = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("id", "name", "price")

  test("insert, update, keep branches") {
    val batch = Seq(
      (2L, "b", 99.0),   // changed → updated
      (3L, "c", 30.0),   // identical → kept
      (4L, "d", 40.0)    // new → inserted
    ).toDF("id", "name", "price")
    val out = merge(db, batch, "id").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 10.0, "kept"), (2L, 99.0, "updated"),
      (3L, 30.0, "kept"), (4L, 40.0, "inserted")))
  }

  test("exclude-list fields do not trigger updates") {
    val batch = Seq((1L, "CHANGED", 10.0)).toDF("id", "name", "price")
    val out = merge(db, batch, "id", exclude = Seq("name"))
      .filter(col("id") === 1).head
    assert(out.getString(3) == "kept")
    assert(out.getString(1) == "a") // kept row retains db values
  }

  test("float equality tolerance: round(x*1e5)") {
    val batch = Seq((1L, "a", 10.000000004)).toDF("id", "name", "price")
    val out = merge(db, batch, "id").filter(col("id") === 1).head
    assert(out.getString(3) == "kept") // sub-1e-5 drift is "unchanged"
  }

  test("empty comparison set (all columns excluded) keeps rows") {
    val batch = Seq((1L, "CHANGED", 99.0), (4L, "d", 40.0))
      .toDF("id", "name", "price")
    val out = merge(db, batch, "id", exclude = Seq("name", "price"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(3))).toSeq
    // existing row untouched (nothing to compare → "unchanged"),
    // new key still inserts
    assert(out == Seq((1L, "kept"), (2L, "kept"), (3L, "kept"),
      (4L, "inserted")))
  }

  test("idempotence: merge(merge(db,b),b) == merge(db,b)") {
    // deterministic property sweep: random batches, fixed seed
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val rows = List.fill(6)((
        1L + rnd.nextInt(8),
        Seq("a", "b", "c")(rnd.nextInt(3)),
        rnd.nextInt(50).toDouble
      )).distinctBy(_._1) // one row per key within a batch
      val b = rows.toDF("id", "name", "price")
      val once = merge(db, b, "id").drop("merge_status")
      val twice = merge(once, b, "id").drop("merge_status")
      val a1 = once.orderBy("id").collect().toSeq
      val a2 = twice.orderBy("id").collect().toSeq
      assert(a1 == a2, s"not idempotent for batch $rows")
    }
  }

  test("scd2: change closes + reopens, insert opens, re-apply is a no-op") {
    import graft.operators.MergeOps.scd2
    val dim = Seq((1L, "x"), (2L, "y"))
      .toDF("id", "seg").withColumn("valid_from", lit("2020-01-01"))
    val batch = Seq((1L, "x"), (2L, "MOVED"), (3L, "z"))
      .toDF("id", "seg")
    val h1 = scd2(dim, batch, "id", "2024-06-01")
    val got = h1.orderBy("id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), r.getBoolean(4))).toSeq
    assert(got == Seq(
      (1L, "x", "2020-01-01", None, true),            // untouched, open
      (2L, "y", "2020-01-01", Some("2024-06-01"), false), // closed
      (2L, "MOVED", "2024-06-01", None, true),        // new version
      (3L, "z", "2024-06-01", None, true)))           // insert
    // idempotence: the open slice already equals the batch, so a
    // re-apply at a later ts must close nothing and insert nothing
    val open = h1.filter(col("is_current"))
      .select(col("id"), col("seg"), col("valid_from"))
    val h2 = scd2(open, batch, "id", "2024-07-01")
    assert(h2.filter(!col("is_current")).count() == 0)
    assert(h2.filter(col("valid_from") === "2024-07-01").count() == 0)
  }
}
