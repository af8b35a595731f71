package graft.catalog

import org.apache.hadoop.fs.Path

/** Child-JVM entry for CrossProcessLeaseSpec: claim `args(0)`'s writer
  * lease on the local filesystem, print a line the parent can wait on,
  * and hold for `args(1)` ms. A SIGKILLed instance leaves exactly what
  * a crashed foreign writer leaves — a fresh-mtime lease no shutdown
  * hook cleans up — which is the on-disk state the cross-process
  * horizon rules are specified against. */
object LeaseHolderMain {
  def main(args: Array[String]): Unit = {
    val store = args(0)
    val holdMs = args(1).toLong
    val fs = new Path(store)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    WriterLease.withLease(fs, store, "cross-process-holder") {
      // the parent reads this line to know the claim landed before it
      // starts racing; flush because the JVM may die by SIGKILL
      System.out.println("HELD")
      System.out.flush()
      Thread.sleep(holdMs)
    }
    System.out.println("RELEASED")
    System.out.flush()
  }
}
