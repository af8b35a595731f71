package graft.catalog

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.{DedupOps, SimilarityOps}

/** The single-writer lease on the mutable stores (r13 verdict ask #2):
  * exactly one of two racing writers proceeds, the loser fails loudly,
  * a crashed holder's stale lease is reclaimed, a live holder's
  * heartbeat defeats the stale horizon, and the store survives a
  * refused writer bit-for-bit. */
class WriterLeaseSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def localFs = new Path("/tmp")
    .getFileSystem(spark.sessionState.newHadoopConf())

  test("two racing writer threads: exactly one body runs, the loser " +
      "throws ConcurrentWriterException, the lease is gone afterward") {
    val store = java.nio.file.Files
      .createTempDirectory("leaserace").resolve("store").toString
    val fs = localFs
    val inBody = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    val refused = new java.util.concurrent.atomic.AtomicInteger(0)
    def writer(): Runnable = () =>
      try WriterLease.withLease(fs, store, "race-test") {
        ran.incrementAndGet()
        inBody.countDown()
        release.await(20, TimeUnit.SECONDS): Unit
      } catch {
        case _: WriterLease.ConcurrentWriterException =>
          refused.incrementAndGet(): Unit
      }
    val t1 = new Thread(writer()); t1.start()
    assert(inBody.await(20, TimeUnit.SECONDS), "holder never entered")
    // t2 races while t1 provably holds the lease
    val t2 = new Thread(writer()); t2.start()
    t2.join(20000)
    assert(refused.get() == 1, "second writer was not refused")
    assert(ran.get() == 1, "both writers ran concurrently")
    release.countDown()
    t1.join(20000)
    assert(!fs.exists(WriterLease.leasePath(store)),
      "lease not released on exit")
    // after release, a new claim proceeds
    WriterLease.withLease(fs, store, "race-test-2") { ran.incrementAndGet() }
    assert(ran.get() == 2)
  }

  test("a crashed holder's stale lease is reclaimed; a LIVE holder's " +
      "heartbeat keeps it fresh past the stale horizon") {
    val store = java.nio.file.Files
      .createTempDirectory("leasestale").resolve("store").toString
    val fs = localFs
    val lease = WriterLease.leasePath(store)
    // fabricate a crashed holder: a lease whose mtime is far past the
    // horizon and whose owner will never heartbeat again
    fs.create(lease, false).close()
    fs.setTimes(lease, System.currentTimeMillis() - 3600L * 1000, -1)
    var reclaimed = false
    WriterLease.withLease(fs, store, "takeover-test",
        staleMs = 60000L) { reclaimed = true }
    assert(reclaimed, "stale lease was not taken over")
    assert(!fs.exists(lease), "takeover left the lease behind")

    // live holder: shrink the heartbeat so the lease mtime refreshes
    // inside a sub-second stale horizon — the contender must STILL be
    // refused even though the holder entered longer than staleMs ago
    val prevBeat = SnapshotLake.heartbeatIntervalMs
    SnapshotLake.heartbeatIntervalMs = 100L
    try {
      val entered = new CountDownLatch(1)
      val release = new CountDownLatch(1)
      val t = new Thread(() =>
        WriterLease.withLease(fs, store, "live-holder") {
          entered.countDown()
          release.await(20, TimeUnit.SECONDS): Unit
        })
      t.start()
      assert(entered.await(20, TimeUnit.SECONDS))
      Thread.sleep(1200) // > staleMs below; ≥ several heartbeats
      intercept[WriterLease.ConcurrentWriterException] {
        WriterLease.withLease(fs, store, "contender",
          staleMs = 800L) { fail("contender body must not run") }
      }
      release.countDown()
      t.join(20000)
    } finally SnapshotLake.heartbeatIntervalMs = prevBeat
  }

  test("a tombstone delete fault neither aborts a stale takeover nor " +
      "leaks the debris past the next takeover's sweep") {
    val flaky = new FlakyDeleteFs(localFs)
    val store = java.nio.file.Files
      .createTempDirectory("leasetomb").resolve("store").toString
    val lease = WriterLease.leasePath(store)
    def plantStale(): Unit = {
      flaky.create(lease, false).close()
      flaky.setTimes(lease, System.currentTimeMillis() - 3600L * 1000, -1)
    }
    // takeover with EVERY delete faulted: the rename freed the path,
    // so the claim must still succeed — and the tombstone stays behind
    plantStale()
    flaky.failDeletes = true
    var ran = false
    try WriterLease.withLease(flaky, store, "tomb-faulted",
      staleMs = 60000L) { ran = true }
    finally flaky.failDeletes = false
    assert(ran, "takeover aborted on a best-effort tombstone delete")
    val glob = new Path(lease.getParent, lease.getName + ".stale.*")
    // the faulted release also left the lease file; clear it so the
    // next takeover exercises the SWEEP, not the orphan fast path
    flaky.delete(lease, false): Unit
    assert(Option(flaky.globStatus(glob)).toSeq.flatten.nonEmpty,
      "expected the faulted delete to leave tombstone debris")
    // next stale takeover (deletes healthy) sweeps the stragglers
    plantStale()
    ran = false
    WriterLease.withLease(flaky, store, "tomb-sweeper",
      staleMs = 60000L) { ran = true }
    assert(ran)
    assert(Option(flaky.globStatus(glob)).toSeq.flatten.isEmpty,
      "takeover did not sweep earlier claims' tombstone debris")
  }

  /** Local FS whose delete — and, separately, whose OVERWRITING create
    * — can be made to throw: the one-fault-takes-both shape (body dies
    * AND the release delete dies) that leaves a same-process orphan
    * lease behind, and the kill-at-stamp shape (the claim's
    * atomicCreate on file:// goes through java.io.File directly, so
    * `failOverwrites` faults ONLY the best-effort stamp write,
    * `fs.create(lease, overwrite = true)`). */
  private class FlakyDeleteFs(underlying: org.apache.hadoop.fs.FileSystem)
      extends org.apache.hadoop.fs.FilterFileSystem(underlying) {
    // FilterFileSystem does not delegate getScheme (the base throws
    // UnsupportedOperationException), and WriterLease's claim consults
    // it to pick the O_EXCL primitive
    override def getScheme: String = "file"
    @volatile var failDeletes = false
    @volatile var failOverwrites = false
    @volatile var failReads = false
    override def delete(p: Path, recursive: Boolean): Boolean =
      if (failDeletes) throw new java.io.IOException("injected delete fault")
      else super.delete(p, recursive)
    override def open(f: Path, bufferSize: Int)
        : org.apache.hadoop.fs.FSDataInputStream =
      if (failReads) throw new java.io.IOException("injected read fault")
      else super.open(f, bufferSize)
    override def create(f: Path,
        permission: org.apache.hadoop.fs.permission.FsPermission,
        overwrite: Boolean, bufferSize: Int, replication: Short,
        blockSize: Long,
        progress: org.apache.hadoop.util.Progressable)
        : org.apache.hadoop.fs.FSDataOutputStream =
      if (failOverwrites && overwrite)
        throw new java.io.IOException("injected stamp-write fault")
      else super.create(f, permission, overwrite, bufferSize,
        replication, blockSize, progress)
  }

  private def orphanedStore(flaky: FlakyDeleteFs, prefix: String,
      failStamp: Boolean = false): String = {
    val store = java.nio.file.Files
      .createTempDirectory(prefix).resolve("store").toString
    flaky.failDeletes = true
    flaky.failOverwrites = failStamp
    try {
      val e = intercept[RuntimeException] {
        WriterLease.withLease(flaky, store, "crasher") {
          throw new RuntimeException("body died")
        }
      }
      assert(e.getMessage == "body died", s"unexpected failure: $e")
    } finally {
      flaky.failDeletes = false
      flaky.failOverwrites = false
    }
    assert(flaky.exists(WriterLease.leasePath(store)),
      "crashed call left no orphan lease")
    store
  }

  test("same-process orphan: a crashed call whose release delete also " +
      "failed is reclaimed immediately (token match / unstamped), but a " +
      "foreign writer's fresh stamped lease is refused even with the " +
      "orphan marker set") {
    val flaky = new FlakyDeleteFs(localFs)

    // token match: the on-disk stamp is OURS → immediate reclaim,
    // no 10-minute horizon wait (default staleMs)
    val s1 = orphanedStore(flaky, "leaseorphan1")
    var ran = false
    WriterLease.withLease(flaky, s1, "restart") { ran = true }
    assert(ran, "same-process restart did not reclaim its own orphan")
    assert(!flaky.exists(WriterLease.leasePath(s1)))

    // unstamped orphan (the kill-at-stamp-write fuzz shape): our own
    // stamp write FAILED, so no readable token cannot CONTRADICT
    // ownership → still reclaims. (When our stamp write SUCCEEDED an
    // unstamped file is refused as foreign — the r15 release-window
    // test below pins that side.)
    val s2 = orphanedStore(flaky, "leaseorphan2", failStamp = true)
    ran = false
    WriterLease.withLease(flaky, s2, "restart") { ran = true }
    assert(ran, "unstamped same-process orphan was not reclaimed")

    // foreign takeover beat the retry: the fresh lease carries ANOTHER
    // writer's token — the marker must not steal it
    val s3 = orphanedStore(flaky, "leaseorphan3")
    val lease3 = WriterLease.leasePath(s3)
    flaky.delete(lease3, false) // the foreign stale-reclaim
    val out = flaky.create(lease3, false)
    out.write(("foreign-maint pid=99999 host=elsewhere token=" +
      java.util.UUID.randomUUID()).getBytes("UTF-8"))
    out.close()
    intercept[WriterLease.ConcurrentWriterException] {
      WriterLease.withLease(flaky, s3, "retry") {
        fail("stole a live foreign writer's lease")
      }
    }
    flaky.delete(lease3, false): Unit
  }

  test("a thawed FROZEN writer's release leaves the takeover holder's " +
      "fresh lease intact (token-checked release, r14 ask #2)") {
    val fs = localFs
    val store = java.nio.file.Files
      .createTempDirectory("leasefrozen").resolve("store").toString
    val lease = WriterLease.leasePath(store)
    val entered = new CountDownLatch(1)
    val thaw = new CountDownLatch(1)
    val t = new Thread(() =>
      WriterLease.withLease(fs, store, "frozen-writer") {
        entered.countDown()
        // the "freeze": the body outlives a foreign takeover staged by
        // the test thread below, then thaws and runs its release
        thaw.await(20, TimeUnit.SECONDS): Unit
      })
    t.start()
    assert(entered.await(20, TimeUnit.SECONDS), "holder never entered")
    // simulate the cross-process stale takeover the frozen writer
    // cannot see: the contender renames our stale lease aside and
    // claims fresh with ITS stamp (direct FS ops — a real second
    // process would not be visible to the in-process registries
    // either, which is the point of the hazard)
    val foreignToken = java.util.UUID.randomUUID().toString
    assert(fs.delete(lease, false))
    val out = fs.create(lease, false)
    out.write(("foreign-maint pid=1 host=elsewhere " +
      s"token=$foreignToken").getBytes("UTF-8"))
    out.close()
    // thaw: the release must read the FOREIGN token and leave the file
    thaw.countDown()
    t.join(20000)
    assert(fs.exists(lease),
      "the thawed frozen writer deleted the takeover holder's lease — " +
        "the third-writer door the token-checked release closes")
    val in = fs.open(lease)
    val buf = new Array[Byte](512)
    val n = in.read(buf); in.close()
    assert(new String(buf, 0, n, "UTF-8").contains(foreignToken),
      "the surviving lease is not the takeover holder's")
    // and the fresh foreign lease still refuses the next claim — no
    // silent third writer
    intercept[WriterLease.ConcurrentWriterException] {
      WriterLease.withLease(fs, store, "third-writer") {
        fail("third writer ran against a live foreign lease")
      }
    }
    fs.delete(lease, false): Unit
  }

  test("unstamped-takeover release window (r15 ask #2): a writer whose " +
      "own stamp is known on disk refuses to delete an UNSTAMPED " +
      "replacement lease; a writer whose stamp write FAILED still " +
      "deletes its own unstamped file") {
    val fs = localFs
    // (a) our stamp succeeded → an unreadable token cannot be ours:
    // a takeover whose stamp write faulted left a fresh EMPTY lease,
    // and the thawed frozen writer's release must leave it intact
    val s1 = java.nio.file.Files
      .createTempDirectory("leaseunstamped").resolve("store").toString
    val lease1 = WriterLease.leasePath(s1)
    val entered = new CountDownLatch(1)
    val thaw = new CountDownLatch(1)
    val t = new Thread(() =>
      WriterLease.withLease(fs, s1, "frozen-writer") {
        entered.countDown()
        thaw.await(20, TimeUnit.SECONDS): Unit
      })
    t.start()
    assert(entered.await(20, TimeUnit.SECONDS), "holder never entered")
    // the takeover: rename our lease aside, claim fresh — and its own
    // stamp write faults, leaving the new lease EMPTY
    assert(fs.delete(lease1, false))
    fs.create(lease1, false).close() // fresh, unstamped
    thaw.countDown()
    t.join(20000)
    assert(fs.exists(lease1),
      "the thawed writer deleted the takeover's UNSTAMPED fresh lease " +
        "— the residual third-writer door r15 ask #2 closes")
    fs.delete(lease1, false): Unit

    // (b) our OWN stamp write failed → an unstamped file can still be
    // ours, and the release must delete it (no leaked lease)
    val failStamp = new FlakyDeleteFs(localFs)
    val s2 = java.nio.file.Files
      .createTempDirectory("leasenostamp").resolve("store").toString
    val lease2 = WriterLease.leasePath(s2)
    failStamp.failOverwrites = true
    var ran = false
    try WriterLease.withLease(failStamp, s2, "stampless-writer") {
      ran = true
      assert(failStamp.exists(lease2), "claim did not create the lease")
      // the claim is the file's existence; the stamp write faulted
      val in = failStamp.open(lease2)
      assert(in.read() == -1, "stamp write was supposed to fault")
      in.close()
    } finally failStamp.failOverwrites = false
    assert(ran)
    assert(!failStamp.exists(lease2),
      "a stamp-write-failed claim leaked its own unstamped lease")
  }

  test("transient stamp-read fault at release keeps the orphan marker " +
      "(r16 advice): the declined delete leaves OUR lease on disk, and " +
      "the next same-process claim re-reads our token and reclaims " +
      "immediately instead of waiting the horizon") {
    val flaky = new FlakyDeleteFs(localFs)
    val store = java.nio.file.Files
      .createTempDirectory("leasereadfault").resolve("store").toString
    val lease = WriterLease.leasePath(store)
    // the release-time stamp READ faults: with our stamp known on disk
    // (stamped=true) the release must decline the delete — it cannot
    // tell its own still-on-disk lease from a takeover's unstamped one
    flaky.failReads = true
    var ran = false
    try WriterLease.withLease(flaky, store, "read-faulted-release") {
      ran = true
    } finally flaky.failReads = false
    assert(ran)
    assert(flaky.exists(lease),
      "release deleted under an unreadable stamp with stamped=true — " +
        "the r15-closed window reopened")
    // the fault was transient and the file is OURS: the marker must
    // have survived the declined delete, so this claim re-reads the
    // stamp, sees our token, and reclaims NOW (pre-fix: the marker was
    // dropped and this claim would refuse until the 10-min horizon)
    val t0 = System.nanoTime()
    var reclaimed = false
    WriterLease.withLease(flaky, store, "restart-after-fault") {
      reclaimed = true
    }
    assert(reclaimed,
      "same-process restart did not reclaim its own lease after a " +
        "transient release-time stamp-read fault")
    assert((System.nanoTime() - t0) < 30L * 1000 * 1000 * 1000,
      "reclaim took implausibly long — did the dropped marker force a " +
        "horizon wait?")
    assert(!flaky.exists(lease))
  }

  test("bounded-wait claim (r15 ask #5): a second claimant with waitMs " +
      "wins after the holder releases inside the window, and still " +
      "throws past it — on both the in-process and the on-disk path") {
    val fs = localFs
    val store = java.nio.file.Files
      .createTempDirectory("leasewait").resolve("store").toString
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val t = new Thread(() =>
      WriterLease.withLease(fs, store, "holder") {
        entered.countDown()
        release.await(20, TimeUnit.SECONDS): Unit
      })
    t.start()
    assert(entered.await(20, TimeUnit.SECONDS), "holder never entered")
    // past the window: the holder outlives waitMs → same loud refusal
    intercept[WriterLease.ConcurrentWriterException] {
      WriterLease.withLease(fs, store, "impatient", waitMs = 250L) {
        fail("impatient claimant body must not run")
      }
    }
    // inside the window: the queued claimant wins once the holder exits
    val won = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t2 = new Thread(() =>
      WriterLease.withLease(fs, store, "patient", waitMs = 20000L) {
        won.set(true)
      })
    t2.start()
    Thread.sleep(200) // let the claimant queue against the live holder
    release.countDown()
    t.join(20000); t2.join(20000)
    assert(won.get(),
      "queued claimant did not win after the release inside its window")
    assert(!fs.exists(WriterLease.leasePath(store)))

    // on-disk path (no in-process holder): a fresh FOREIGN lease file
    val lease = WriterLease.leasePath(store)
    val out = fs.create(lease, false)
    out.write(("foreign-maint pid=99999 host=elsewhere token=" +
      java.util.UUID.randomUUID()).getBytes("UTF-8"))
    out.close()
    intercept[WriterLease.ConcurrentWriterException] {
      WriterLease.withLease(fs, store, "impatient2", waitMs = 250L) {
        fail("claimant body must not run against a live foreign lease")
      }
    }
    val freer = new Thread(() => {
      Thread.sleep(300)
      fs.delete(lease, false): Unit
    })
    freer.start()
    var ran = false
    WriterLease.withLease(fs, store, "patient2", waitMs = 20000L) {
      ran = true
    }
    freer.join(20000)
    assert(ran, "claimant did not win after the foreign lease vanished " +
      "inside its window")
  }

  // SlowTest tier (~15 s: real maintenance ops on both stores) — the
  // lease MECHANISM is covered in-default by the two tests above;
  // this integration sweep runs in the bench window
  test("a refused maintenance writer leaves the store bit-identical, " +
      "and the reentrant cycle claim admits its own primitives",
      graft.SlowTest) {
    graft.GraftFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("leaseparity")
    val store = s"$dir/store"
    val centPath = s"$dir/centroids"
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
      .toDF("cid", "cv")
    cents.coalesce(1).write.parquet(centPath)
    SimilarityOps.extendVectorStore(store, cents,
      Seq((1L, Seq(1.0, 0.1)), (2L, Seq(0.1, 1.0)), (3L, Seq(0.9, 0.2)))
        .toDF("vec_id", "v"))
    val fs = localFs
    def snapshot(): Map[String, Long] = {
      val it = fs.listFiles(new Path(store), true)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) { val f = it.next(); b += f.getPath.toString -> f.getLen }
      b.result()
    }
    val before = snapshot()
    // every writer entry refuses while another writer holds the lease
    WriterLease.withLease(fs, store, "blocking-writer") {
      // calls from a DIFFERENT thread: the thread-local reentrancy
      // must not leak across threads
      val refusals = new java.util.concurrent.atomic.AtomicInteger(0)
      val t = new Thread(() => {
        def expectRefusal(body: => Any): Unit =
          try { body; () } catch {
            case _: WriterLease.ConcurrentWriterException =>
              refusals.incrementAndGet(): Unit
          }
        expectRefusal(SimilarityOps.compactVectorStore(spark, store))
        expectRefusal(SimilarityOps.splitHotCells(spark, store, centPath,
          hotCellThreshold = 1L))
        expectRefusal(SimilarityOps.mergeColdCells(spark, store, centPath,
          coldCellThreshold = 10L))
        expectRefusal(SimilarityOps.maintainVectorStore(spark, store,
          centPath, hotCellThreshold = 2L))
        expectRefusal(SimilarityOps.extendVectorStore(store, cents,
          Seq((9L, Seq(0.5, 0.5))).toDF("vec_id", "v")))
      })
      t.start(); t.join(60000)
      assert(refusals.get() == 5,
        s"expected all 5 writer entries refused, got ${refusals.get()}")
    }
    assert(snapshot() == before,
      "a refused writer modified the store")
    // with the lease free, the full cycle runs — one outer claim, the
    // three primitives re-entering it on the owning thread
    val report = SimilarityOps.maintainVectorStore(spark, store,
      centPath, hotCellThreshold = 100L, coldCellThreshold = 0L)
    assert(report.hot.isEmpty)
    assert(!fs.exists(WriterLease.leasePath(store)),
      "cycle did not release its lease")

    // the dedup signature store's writer entry carries the lease too
    val dstore = s"$dir/bands"
    DedupOps.probeAndExtend(dstore,
      Seq((1L, "some shingled text long enough to band properly"))
        .toDF("doc_id", "text")).collect()
    WriterLease.withLease(fs, dstore, "blocking-writer") {
      val refused = new java.util.concurrent.atomic.AtomicInteger(0)
      val t = new Thread(() => {
        try DedupOps.compactStore(spark, dstore) catch {
          case _: WriterLease.ConcurrentWriterException =>
            refused.incrementAndGet(): Unit
        }
        // the APPEND path is a writer entry too: an append landing
        // inside a concurrent compact's read→swap window would be
        // silently dropped with the swapped-aside store
        try {
          DedupOps.probeAndExtend(dstore,
            Seq((2L, "another shingled text long enough to band"))
              .toDF("doc_id", "text")).collect(): Unit
        } catch {
          case _: WriterLease.ConcurrentWriterException =>
            refused.incrementAndGet(): Unit
        }
      })
      t.start(); t.join(60000)
      assert(refused.get() == 2,
        "compactStore/probeAndExtend were not both refused")
    }
    DedupOps.compactStore(spark, dstore) // free lease → proceeds
    assert(!fs.exists(WriterLease.leasePath(dstore)))

    // r15 ask #5 plumbed through the operational entry points: a
    // cron-style compact queued with leaseWaitMs waits out a live
    // ingest writer's lease instead of crashing, then runs
    val entered2 = new CountDownLatch(1)
    val release2 = new CountDownLatch(1)
    val holderT = new Thread(() =>
      WriterLease.withLease(fs, dstore, "ingest-batch") {
        entered2.countDown()
        release2.await(60, java.util.concurrent.TimeUnit.SECONDS): Unit
      })
    holderT.start()
    assert(entered2.await(60, java.util.concurrent.TimeUnit.SECONDS))
    val compactErr =
      new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val cronT = new Thread(() =>
      try DedupOps.compactStore(spark, dstore, leaseWaitMs = 60000L)
      catch { case t: Throwable => compactErr.set(t) })
    cronT.start()
    Thread.sleep(300) // let the cron compact queue against the holder
    release2.countDown()
    holderT.join(60000); cronT.join(120000)
    assert(compactErr.get() == null,
      s"queued compact failed instead of waiting: ${compactErr.get()}")
    assert(!fs.exists(WriterLease.leasePath(dstore)))
  }
}
