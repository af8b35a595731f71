package graft.operators

import java.net.URI

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.catalog.FaultInjectingFs

/** Randomized kill-point fuzz for the vector-store MAINTENANCE pair
  * ([[SimilarityOps.splitHotCells]] / [[SimilarityOps.mergeColdCells]])
  * — the store-side twin of LakeCrashFuzzSpec, reusing its
  * fault-injecting filesystem (every mutating FS call counts toward an
  * armed kill point; from the kill on, all further mutations fail, so
  * on-disk state is exactly what a process death leaves).
  *
  * The claim under test is the one both operators' scaladocs stake out:
  * at EVERY point in a maintenance run, a restarted reader that heals
  * interrupted swaps ([[DedupOps.recoverStoreSwap]] — what every store
  * entry point already does) and probes with the then-current centroid
  * table gets EXACTLY the global brute-force answer over the original
  * corpus. The windows that make this non-obvious:
  *
  *  - split, children appended but table not swapped: the children's
  *    cids are invisible (not in the table), the parent still serves
  *    every row;
  *  - split, table swapped but parents not deleted: the parents are
  *    unreferenced (never probed), the children serve every row;
  *  - merge, cold rows copied but table not swapped: a vector is served
  *    from BOTH its cold cell and its target cell — the probe's
  *    per-(query, neighbor) collapse must fill one top-k slot, not two;
  *  - a kill inside the rename-aside table swap itself: the table path
  *    is transiently absent, recoverStoreSwap rolls it forward or back.
  *
  * After the crashed run, the fuzz also proves LIVENESS: a re-run of
  * the same maintenance call completes over the debris (the guarded
  * entry sweep must classify one run's leftovers as debris, not refuse
  * them as a wrong table), reaches the maintenance goal (no hot cell /
  * no cold cell), preserves the corpus row set, and fresh ingest +
  * probe still work. */
class StoreMaintCrashFuzzSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("maintfuzz").toFile
    d.delete(); d.getAbsolutePath
  }

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    URI.create("failfs:///"), spark.sparkContext.hadoopConfiguration)

  // ---- corpus (the VectorStoreSpec split shape: deterministic refit) —
  // hot cell 0 = two separable sub-clusters inside the axis-0 halfspace
  // (even ids tilt +0.3, odd ids -0.3), cells 1-3 one vector each
  private def hotVec(id: Long): (Long, Seq[Double]) = {
    val tilt = if (id % 2 == 0) 0.3 + 0.001 * (id % 7)
      else -0.3 - 0.001 * (id % 7)
    (id, Seq(1.0 + 0.01 * (id % 11), tilt, 0.02, 0.02))
  }
  private def axisVec(id: Long): (Long, Seq[Double]) = {
    val axis = (id % 4).toInt
    val base = Array.fill(4)(0.05 + 0.001 * (id % 7))
    base(axis) = 1.0 + 0.01 * (id % 11)
    (id, base.toSeq)
  }
  private def splitCorpus: Seq[(Long, Seq[Double])] =
    (0L until 40L).map(hotVec) ++ Seq(101L, 102L, 103L).map(axisVec)
  // merge shape: cell 0 heavy (stays), cells 1-3 carry 1-2 vectors
  // each → cold under threshold 3, folding into the survivor
  private def mergeCorpus: Seq[(Long, Seq[Double])] =
    (0L until 12L).map(hotVec) ++ Seq(101L, 102L, 103L, 105L).map(axisVec)

  private def centroids: DataFrame = Seq(
    (0, Seq(1.0, 0.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0, 0.0)),
    (2, Seq(0.0, 0.0, 1.0, 0.0)), (3, Seq(0.0, 0.0, 0.0, 1.0)))
    .toDF("cid", "cv")

  /** Fresh (store, centroidPath) pair on failfs with `corpus` ingested. */
  private def freshStore(corpus: Seq[(Long, Seq[Double])])
      : (String, String) = {
    FaultInjectingFs.disarm()
    val dir = tmp()
    val store = s"failfs://$dir/store"
    val centPath = s"failfs://$dir/centroids"
    centroids.coalesce(1).write.parquet(centPath)
    SimilarityOps.extendVectorStore(store,
      spark.read.parquet(centPath), corpus.toDF("vec_id", "v"))
    (store, centPath)
  }

  /** Global brute-force top-k for `qv` over `corpus`, the store's
    * determinism contract (cosine rounded half-up to 6, id tiebreak). */
  private def brute(corpus: Seq[(Long, Seq[Double])], qv: Seq[Double],
      k: Int): Seq[(Int, Long)] = {
    def cos6(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    corpus.map { case (id, v) => (id, cos6(qv, v)) }
      .sortBy { case (id, r) => (-r, id) }
      .take(k).zipWithIndex.map { case ((id, _), i) => (i + 1, id) }
  }

  /** What a RESTARTED reader does: heal interrupted swaps on both
    * artifacts, read the current table, probe every live cell. */
  private def restartProbe(store: String, centPath: String,
      q: (Long, Seq[Double]), k: Int): Seq[(Int, Long)] = {
    DedupOps.recoverStoreSwap(fs, store)
    DedupOps.recoverStoreSwap(fs, centPath)
    val cents = spark.read.parquet(centPath)
    val nCells = cents.count().toInt
    SimilarityOps.probeVectorStore(store, cents,
        Seq(q).toDF("vec_id", "v"), k = k, nprobe = nCells,
        excludeSelf = false)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
  }

  private def liveCids(centPath: String): Set[Int] =
    spark.read.parquet(centPath)
      .select("cid").collect().map(_.getInt(0)).toSet

  private def storedIds(store: String): Set[Long] =
    spark.read.parquet(store)
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet

  /** Kill points: a fixed-seed sample of a clean run's mutation count,
    * always including the first mutation and the protocol-dense tail
    * (table-swap renames + parent/cold-dir deletes). */
  private def killPoints(total: Long, seed: Long): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    (Seq.fill(8)(1L + rnd.nextLong(total)) ++
      Seq(1L, total, total - 1, total - 2, total - 4))
      .distinct.filter(p => p >= 1 && p <= total).sorted
  }

  private def withFailFs[A](body: => A): A = {
    graft.GraftFunctions.register(spark)
    spark.sparkContext.hadoopConfiguration
      .set("fs.failfs.impl", classOf[FaultInjectingFs].getName)
    try body finally FaultInjectingFs.disarm()
  }

  test("sampled crash points through splitHotCells: a restarted probe " +
      "always equals global brute force, the re-run completes over the " +
      "debris, ingest keeps working", graft.SlowTest) {
    withFailFs {
      def split(store: String, centPath: String) =
        SimilarityOps.splitHotCells(spark, store, centPath,
          hotCellThreshold = 30L, maxSplitK = 2)
      // query in the even (+0.3) sub-cluster; its top-5 spans the split
      val q = (500L, Seq(1.0, 0.31, 0.02, 0.02))
      val expect = brute(splitCorpus, q._2, 5)

      // clean probe run: mutation count of a full split on this shape
      val (pStore, pCent) = freshStore(splitCorpus)
      FaultInjectingFs.arm(Long.MaxValue)
      assert(split(pStore, pCent) == Map(0 -> Seq(4, 5)))
      val total = FaultInjectingFs.ops.get()
      FaultInjectingFs.disarm()
      assert(total > 10, s"split probe saw only $total mutations")
      val points = killPoints(total, 0x5117AB1L)
      info(s"clean split = $total mutations; kill points: " +
        points.mkString(", "))

      points.foreach { k =>
        val (store, centPath) = freshStore(splitCorpus)
        FaultInjectingFs.arm(k)
        val crashed =
          try { split(store, centPath); false }
          catch { case scala.util.control.NonFatal(_) => true }
        FaultInjectingFs.disarm()
        val clue = s"split kill@$k (crashed=$crashed)"

        // invariant 1: the restarted reader sees the exact brute-force
        // answer whatever the crash left (parent-only, both, table
        // swapped, mid-swap)
        assert(restartProbe(store, centPath, q, 5) == expect,
          s"$clue: restarted probe diverged from brute force")

        // invariant 2 (liveness): the re-run rides over the debris —
        // the guarded sweep must classify it as one run's leftovers —
        // and reaches the goal state
        split(store, centPath): Unit
        val cids = liveCids(centPath)
        assert(!cids.contains(0) && cids.size == 5,
          s"$clue: re-run did not reach the split state, table $cids")
        assert(restartProbe(store, centPath, q, 5) == expect,
          s"$clue: post-recovery probe diverged")
        assert(storedIds(store) == splitCorpus.map(_._1).toSet,
          s"$clue: corpus rows lost or invented")
        // no swap debris survives recovery
        assert(!fs.exists(new Path(centPath + ".next")) &&
          !fs.exists(new Path(centPath + ".old")),
          s"$clue: centroid swap debris lingers")

        // invariant 3: fresh ingest lands correctly post-recovery
        val extra = Seq(axisVec(201L), axisVec(202L))
        SimilarityOps.extendVectorStore(store,
          spark.read.parquet(centPath), extra.toDF("vec_id", "v"))
        assert(storedIds(store) ==
          splitCorpus.map(_._1).toSet ++ extra.map(_._1),
          s"$clue: post-recovery ingest rows missing")
        assert(
          restartProbe(store, centPath, q, 5) ==
            brute(splitCorpus ++ extra, q._2, 5),
          s"$clue: probe after post-recovery ingest diverged")
      }
    }
  }

  test("sampled crash points through a CHUNKED (two-pass) merge: " +
      "every kill point — including between the two table swaps — " +
      "restarts to brute-force parity and the re-run retires every " +
      "cold cell", graft.SlowTest) {
    withFailFs {
      // one unique axis per cell; survivor cell 0 carries 12 rows,
      // cells 1..nCold one row each — nCold > MaxColdPerMergePass
      // forces two passes (two swaps), so the mutation-count probe
      // spans BOTH commit points and the sampled kills land on either
      // side of the inter-pass boundary
      val nCold = SimilarityOps.MaxColdPerMergePass + 4
      val d = nCold + 1
      def axis(c: Int, id: Long): (Long, Seq[Double]) = {
        val a = Array.fill(d)(0.01)
        a(c) = 1.0 + 0.001 * (id % 7)
        (id, a.toSeq)
      }
      // survivor cell 0 carries SIX rows (just over the cold line) so
      // a k=10 probe MUST fill four slots with moved cold rows — a
      // kill that loses or duplicates one of those rows changes the
      // probe answer, not just the later row-count audit (a 12-row
      // survivor cell would fill all of top-5 by itself and make the
      // parity assertion vacuous for moved rows)
      val corpus = (0L until 6L).map(i => axis(0, i)) ++
        (1 to nCold).map(c => axis(c, 1000L + c))
      def freshChunkStore(): (String, String) = {
        FaultInjectingFs.disarm()
        val dir = tmp()
        val store = s"failfs://$dir/store"
        val centPath = s"failfs://$dir/centroids"
        import spark.implicits._
        (0 to nCold).map(c =>
            (c, Seq.tabulate(d)(i => if (i == c) 1.0 else 0.0)))
          .toDF("cid", "cv").coalesce(1).write.parquet(centPath)
        SimilarityOps.extendVectorStore(store,
          spark.read.parquet(centPath), corpus.toDF("vec_id", "v"))
        (store, centPath)
      }
      def merge(store: String, centPath: String) =
        SimilarityOps.mergeColdCells(spark, store, centPath,
          coldCellThreshold = 5L)
      // query leaning the survivor axis with a tilt toward axis 7 (a
      // cold cell retired in pass 1): top-10 = the 6 survivor rows +
      // the axis-7 moved row + 3 more moved rows — moved rows are
      // load-bearing in the parity check at every kill point
      val q = (900L, {
        val a = Array.fill(d)(0.01); a(0) = 1.0; a(7) = 0.6; a.toSeq
      })
      val topK = 10
      val expect = brute(corpus, q._2, topK)
      // the corpus must actually put moved rows inside top-k, or the
      // parity assertions silently stop covering the merge
      assert(expect.count { case (_, id) => id >= 1000L } >= 4,
        s"fuzz corpus no longer places moved rows in top-$topK: $expect")

      val (pStore, pCent) = freshChunkStore()
      FaultInjectingFs.arm(Long.MaxValue)
      val cleanMoved = merge(pStore, pCent)
      val total = FaultInjectingFs.ops.get()
      FaultInjectingFs.disarm()
      assert(cleanMoved.keySet == (1 to nCold).toSet,
        s"clean chunked merge must retire all $nCold cold cells, " +
          s"got ${cleanMoved.keySet.size}")
      assert(total > 20, s"chunked-merge probe saw only $total mutations")
      val points = killPoints(total, 0xc4a5b2L)
      info(s"clean chunked merge = $total mutations (2 passes); " +
        s"kill points: ${points.mkString(", ")}")

      points.foreach { k =>
        val (store, centPath) = freshChunkStore()
        FaultInjectingFs.arm(k)
        val crashed =
          try { merge(store, centPath); false }
          catch { case scala.util.control.NonFatal(_) => true }
        FaultInjectingFs.disarm()
        val clue = s"chunked merge kill@$k (crashed=$crashed)"

        assert(restartProbe(store, centPath, q, topK) == expect,
          s"$clue: restarted probe diverged from brute force")

        merge(store, centPath) // liveness across the pass boundary
        assert(liveCids(centPath) == Set(0),
          s"$clue: re-run left cold cids in the table: " +
            liveCids(centPath))
        assert(restartProbe(store, centPath, q, topK) == expect,
          s"$clue: post-recovery probe diverged")
        assert(storedIds(store) == corpus.map(_._1).toSet,
          s"$clue: corpus rows lost or invented")
      }
    }
  }

  test("sampled crash points through mergeColdCells: duplicates stay " +
      "top-k-neutral at every point, the re-run folds the cold cells, " +
      "rows are conserved", graft.SlowTest) {
    withFailFs {
      def merge(store: String, centPath: String) =
        SimilarityOps.mergeColdCells(spark, store, centPath,
          coldCellThreshold = 3L)
      // query leaning axis 1 — its neighborhood crosses the cold cells
      // (101 in cell 1, the axis-1-ish tilts of the hot vectors), so a
      // dup-filled slot or a lost cold row changes the answer
      val q = (600L, Seq(0.1, 1.0, 0.1, 0.1))
      val expect = brute(mergeCorpus, q._2, 5)

      val (pStore, pCent) = freshStore(mergeCorpus)
      FaultInjectingFs.arm(Long.MaxValue)
      val cleanMoved = merge(pStore, pCent)
      val total = FaultInjectingFs.ops.get()
      FaultInjectingFs.disarm()
      assert(cleanMoved.nonEmpty, "merge shape produced no cold cells")
      assert(total > 5, s"merge probe saw only $total mutations")
      val points = killPoints(total, 0xc01dce11L)
      info(s"clean merge = $total mutations (moved $cleanMoved); " +
        s"kill points: ${points.mkString(", ")}")

      points.foreach { k =>
        val (store, centPath) = freshStore(mergeCorpus)
        FaultInjectingFs.arm(k)
        val crashed =
          try { merge(store, centPath); false }
          catch { case scala.util.control.NonFatal(_) => true }
        FaultInjectingFs.disarm()
        val clue = s"merge kill@$k (crashed=$crashed)"

        assert(restartProbe(store, centPath, q, 5) == expect,
          s"$clue: restarted probe diverged from brute force")

        merge(store, centPath) // liveness: completes over the debris
        val cids = liveCids(centPath)
        val counts = spark.read.parquet(store)
          .groupBy("cid").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        assert(cids.forall(c => counts.getOrElse(c, 0L) >= 3L),
          s"$clue: a live cell is still cold after the re-run: " +
            s"table $cids, counts $counts")
        assert(counts.keySet.subsetOf(cids),
          s"$clue: unreferenced cell dirs survive the re-run")
        assert(restartProbe(store, centPath, q, 5) == expect,
          s"$clue: post-recovery probe diverged")
        assert(storedIds(store) == mergeCorpus.map(_._1).toSet,
          s"$clue: corpus rows lost or invented")
      }
    }
  }
}
