package graft.operators

import java.net.URI
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.hadoop.fs.{FSDataInputStream, Path, RawLocalFileSystem}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** A local filesystem that records every file OPEN — the probe for
  * partition pruning: hive partition discovery LISTS every cell dir,
  * but only selected (unpruned) partitions' files are ever opened. */
class OpenCountingFs extends RawLocalFileSystem {
  override def getScheme: String = "openfs"
  override def getUri: URI = URI.create("openfs:///")
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    OpenCountingFs.opened.add(f.toUri.getPath)
    super.open(f, bufferSize)
  }
}
object OpenCountingFs {
  val opened = new ConcurrentLinkedQueue[String]()
  def reset(): Unit = opened.clear()
}

/** The streaming IVF vector store: cell-partitioned postings, probe
  * reads ONLY probed cells (pruning proven by file opens), results
  * match an independent brute-force over the probed cells, replayed
  * appends are rank-neutral. */
class VectorStoreSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // 4 orthogonal centroids in R^4
  private def centroids: DataFrame = Seq(
    (0, Seq(1.0, 0.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0, 0.0)),
    (2, Seq(0.0, 0.0, 1.0, 0.0)), (3, Seq(0.0, 0.0, 0.0, 1.0)))
    .toDF("cid", "cv")

  /** id's vector leans toward axis (id % 4) with a small unique tilt,
    * so nearest-centroid assignment is unambiguous and cosines are
    * distinct. */
  private def vecs(ids: Seq[Long]): DataFrame =
    ids.map { id =>
      val axis = (id % 4).toInt
      val base = Array.fill(4)(0.05 + 0.001 * (id % 7))
      base(axis) = 1.0 + 0.01 * (id % 11)
      (id, base.toSeq)
    }.toDF("vec_id", "v")

  test("extend→probe lifecycle: probed-cell brute-force parity, " +
      "partition-pruned opens, replay-neutral ranking") {
    graft.GraftFunctions.register(spark)
    spark.sparkContext.hadoopConfiguration
      .set("fs.openfs.impl", classOf[OpenCountingFs].getName)
    val dir = java.nio.file.Files.createTempDirectory("vecstore")
    val store = s"openfs://$dir/store"

    // two ingest batches, all four cells populated
    SimilarityOps.extendVectorStore(store, centroids, vecs(0L to 15L))
    SimilarityOps.extendVectorStore(store, centroids, vecs(16L to 31L))

    // two queries, both leaning to axis 0 → with nprobe=1 only cell 0
    // is probed
    val queries = vecs(Seq(100L, 104L)) // 100 % 4 == 0, 104 % 4 == 0
    OpenCountingFs.reset()
    val got = SimilarityOps.probeVectorStore(store, centroids, queries,
      k = 3, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

    // pruning: every opened STORE file lives under cid=0
    val storeOpens = OpenCountingFs.opened.toArray(Array.empty[String])
      .filter(p => p.contains("/store/") && p.contains("cid="))
    assert(storeOpens.nonEmpty, "probe opened no store files")
    assert(storeOpens.forall(_.contains("cid=0")),
      s"probe opened files outside the probed cell: " +
        storeOpens.filterNot(_.contains("cid=0")).mkString(", "))

    // parity: brute-force top-3 over cell-0 members, same rounding
    val cell0 = (0L to 31L).filter(_ % 4 == 0)
    val expected = queries.as[(Long, Seq[Double])].collect().flatMap {
      case (qId, qv) =>
        def cos(a: Seq[Double], b: Seq[Double]): Double = {
          val dot = a.zip(b).map { case (x, y) => x * y }.sum
          val na = math.sqrt(a.map(x => x * x).sum)
          val nb = math.sqrt(b.map(x => x * x).sum)
          BigDecimal(dot / (na * nb))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        val members = vecs(cell0).as[(Long, Seq[Double])].collect()
        members.filter(_._1 != qId)
          .map { case (nId, nv) => (nId, cos(qv, nv)) }
          .sortBy { case (nId, r) => (-r, nId) }
          .take(3).zipWithIndex
          .map { case ((nId, _), i) => (qId, i + 1, nId) }
    }.toSet
    assert(got.toSet == expected,
      s"probe diverged from brute force over the probed cell:\n" +
        s"got      ${got.sortBy(r => (r._1, r._2)).mkString(", ")}\n" +
        s"expected ${expected.toSeq.sortBy(r => (r._1, r._2)).mkString(", ")}")

    // replay: re-append batch 2 verbatim; ranking must not change
    SimilarityOps.extendVectorStore(store, centroids, vecs(16L to 31L))
    val replay = SimilarityOps.probeVectorStore(store, centroids,
      queries, k = 3, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(replay.toSet == got.toSet,
      "a replayed append changed probe rankings")

    // nprobe widening reaches more cells (the recall/latency knob)
    OpenCountingFs.reset()
    SimilarityOps.probeVectorStore(store, centroids, queries,
      k = 3, nprobe = 2).collect()
    val cells2 = OpenCountingFs.opened.toArray(Array.empty[String])
      .filter(p => p.contains("/store/") && p.contains("cid="))
      .flatMap(p => "cid=(\\d+)".r.findFirstMatchIn(p).map(_.group(1)))
      .toSet
    assert(cells2.size == 2, s"nprobe=2 should open exactly the two " +
      s"probed cells, opened: $cells2")
  }

  test("cell assignment and probe-cell ranking plans are EXCHANGE-FREE " +
      "(typed-literal argmax — the round-10 crossJoin+window shape " +
      "shuffled n×nlist rows per batch)") {
    graft.GraftFunctions.register(spark)
    val assignPlan = SimilarityOps.assignToCells(centroids, vecs(0L to 63L))
      .queryExecution.executedPlan.toString
    assert(!assignPlan.contains("Exchange"),
      s"assignToCells plans a shuffle/broadcast exchange:\n$assignPlan")
    val probePlan = SimilarityOps
      .probeCells(centroids, vecs(Seq(100L, 101L)), nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(!probePlan.contains("Exchange"),
      s"probeCells plans a shuffle/broadcast exchange:\n$probePlan")
  }

  test("compactVectorStore collapses per-cell small files, preserves " +
      "probe results byte-for-byte, and flags a planted hot cell") {
    graft.GraftFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("vecstorec")
    val store = s"$dir/store"
    // plant: cell 0 gets 16 vectors across 4 separate appends (4+
    // files); cells 1–3 get 1 vector each — threshold 12 makes ONLY
    // cell 0 hot
    val hotIds = (0L to 60L by 4) // all ≡ 0 (mod 4) → cell 0
    hotIds.grouped(4).foreach { chunk =>
      SimilarityOps.extendVectorStore(store, centroids, vecs(chunk.toSeq))
    }
    SimilarityOps.extendVectorStore(store, centroids, vecs(Seq(1L, 2L, 3L)))
    def cellFiles(c: Int): Int =
      new java.io.File(s"$store/cid=$c").listFiles()
        .count(_.getName.endsWith(".parquet"))
    assert(cellFiles(0) >= 4,
      s"setup should leave ≥4 small files in cell 0, saw ${cellFiles(0)}")
    val queries = vecs(Seq(100L, 102L)) // cells 0 and 2
    val before = SimilarityOps.probeVectorStore(store, centroids,
      queries, k = 5, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val hot = SimilarityOps.compactVectorStore(spark, store,
      hotCellThreshold = 12L)
    assert(hot == Map(0 -> hotIds.size.toLong),
      s"hot-cell audit should flag exactly cell 0 at ${hotIds.size} " +
        s"rows, got $hot")
    assert(cellFiles(0) == 1,
      s"compaction left ${cellFiles(0)} files in cell 0 — not collapsed")
    val after = SimilarityOps.probeVectorStore(store, centroids,
      queries, k = 5, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(after == before,
      "compaction changed probe results")
    // swap debris never lingers
    assert(!new java.io.File(s"$store.next").exists())
    assert(!new java.io.File(s"$store.old").exists())
  }

  test("splitHotCells: a planted hot cell splits into children, probe " +
      "results are unchanged while the probed row count drops, the " +
      "centroid table swaps crash-safely, debris never lingers") {
    graft.GraftFunctions.register(spark)
    spark.sparkContext.hadoopConfiguration
      .set("fs.openfs.impl", classOf[OpenCountingFs].getName)
    val dir = java.nio.file.Files.createTempDirectory("vecsplit")
    val store = s"openfs://$dir/store"
    val centPath = s"openfs://$dir/centroids"
    centroids.coalesce(1).write.parquet(centPath)
    def cents: DataFrame = spark.read.parquet(centPath)

    // hot cell 0 = TWO separable sub-clusters inside the axis-0
    // halfspace: even ids lean (1, +0.3, …), odd ids (1, -0.3, …) —
    // all assign to centroid 0 among the four axes, and a k'=2 refit
    // (init = ids 0 and 1, one per sub-cluster) recovers the split
    val hotVecs = (0L until 40L).map { id =>
      val tilt = if (id % 2 == 0) 0.3 + 0.001 * (id % 7)
        else -0.3 - 0.001 * (id % 7)
      (id, Seq(1.0 + 0.01 * (id % 11), tilt, 0.02, 0.02))
    }.toDF("vec_id", "v")
    SimilarityOps.extendVectorStore(store, cents, hotVecs)
    SimilarityOps.extendVectorStore(store, cents,
      vecs(Seq(101L, 102L, 103L))) // cells 1–3, one vector each
    // external query in the even (+0.3) sub-cluster: its true top-5
    // all live there, so a post-split nprobe=1 probe of the matching
    // child returns the SAME answer from half the rows
    val q = Seq((500L, Seq(1.0, 0.31, 0.02, 0.02))).toDF("vec_id", "v")
    val before = SimilarityOps.probeVectorStore(store, cents, q,
      k = 5, nprobe = 1, excludeSelf = false)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet

    val mapping = SimilarityOps.splitHotCells(spark, store, centPath,
      hotCellThreshold = 30L, maxSplitK = 2)
    assert(mapping == Map(0 -> Seq(4, 5)),
      s"expected cell 0 → children (4, 5), got $mapping")
    assert(!new java.io.File(s"$dir/store/cid=0").exists(),
      "the split parent's dead directory must be deleted")
    val newCids = cents.select("cid").collect().map(_.getInt(0)).toSet
    assert(newCids == Set(1, 2, 3, 4, 5),
      s"centroid table after split should be children + untouched, " +
        s"got $newCids")

    OpenCountingFs.reset()
    val after = SimilarityOps.probeVectorStore(store, cents, q,
      k = 5, nprobe = 1, excludeSelf = false)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(after == before,
      s"splitting the hot cell changed probe results:\n" +
        s"before $before\nafter  $after")
    // scan drop: the probe now opens exactly ONE child cell holding
    // half the parent's rows
    val openedCells = OpenCountingFs.opened.toArray(Array.empty[String])
      .filter(p => p.contains("/store/") && p.contains("cid="))
      .flatMap(p => "cid=(\\d+)".r.findFirstMatchIn(p).map(_.group(1)))
      .toSet
    // schema inference may open one stray footer in another cell; the
    // pruning claims are: exactly one CHILD is read (the sibling is
    // pruned — the scan halved) and the dead parent is never touched
    val probedChild = openedCells.intersect(Set("4", "5"))
    assert(probedChild.size == 1,
      s"post-split probe should read exactly one child cell, " +
        s"opened: $openedCells")
    assert(!openedCells.contains("0"),
      s"post-split probe touched the dead parent cell: $openedCells")
    val childRows = spark.read.parquet(store)
      .filter(col("cid").isin(probedChild.map(_.toInt).toSeq: _*))
      .count()
    assert(childRows == 20L,
      s"the probed child should hold half the parent's 40 rows, " +
        s"has $childRows")
    // untouched cells still probeable; total rows conserved
    assert(spark.read.parquet(store).count() == 43L)
    // no swap debris on either artifact
    assert(!new java.io.File(s"$dir/centroids.next").exists())
    assert(!new java.io.File(s"$dir/centroids.old").exists())
    // a second pass over the now-cool store is a no-op
    assert(SimilarityOps.splitHotCells(spark, store, centPath,
      hotCellThreshold = 30L, maxSplitK = 2).isEmpty)
    // interrupted-split debris (children appended, table never
    // swapped) is swept on the next maintenance entry: plant a fake
    // unreferenced cell and re-run
    vecs(Seq(777L)).withColumn("cid", lit(99))
      .select(col("cid"), col("vec_id"), col("v"))
      .write.mode("append").partitionBy("cid").parquet(store)
    assert(SimilarityOps.splitHotCells(spark, store, centPath,
      hotCellThreshold = 30L, maxSplitK = 2).isEmpty)
    assert(!new java.io.File(s"$dir/store/cid=99").exists(),
      "entry sweep must remove a cid= dir the centroid table does " +
        "not reference (interrupted-split debris)")
  }
}
