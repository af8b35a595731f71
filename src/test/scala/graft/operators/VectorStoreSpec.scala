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
}
