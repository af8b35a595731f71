package graft.operators

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Makes LSH bucket-cap truncation visible in every query that uses
  * [[DedupOps.bucketPairs]]: each `cappedBuckets` plan carries an
  * `observe()` metric (zero-cost — computed on rows the plan already
  * materializes), and this listener logs a warning whenever a finished
  * query dropped at least one over-cap bucket. The oracle-gated runs
  * thus carry a standing assertion that the cap never binds at test
  * scale (any hit would show up in the log and in [[totalOverflowed]]),
  * while production runs at corpus scale get an audit trail instead of
  * silent result divergence.
  */
object BucketAudit {

  private val seq = new AtomicInteger()
  private val installed = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Running total of overflowed (dropped) buckets across all
    * bucketPairs queries in this JVM — a test/ops hook; the per-query
    * detail goes to the log. */
  val totalOverflowed = new AtomicLong()

  /** observe() names must be unique per query; several bucketPairs can
    * appear in one plan. */
  private[operators] def nextMetricName(): String =
    s"bucket_overflow_${seq.incrementAndGet()}"

  /** Overflow counts from operators that materialize INTERNALLY
    * (lshVerifiedPairs' eager checkpoint): their observe() metrics
    * live on the internal QueryExecution, invisible to callers
    * polling the returned frame's plan, so the operator records them
    * here SYNCHRONOUSLY right after its action. The bench diffs this
    * around each query to keep its bucket_overflows artifact honest;
    * the async listener still logs the warning (same QE), into its
    * own [[totalOverflowed]] counter — the two never double-count
    * within a counter. */
  private val eagerTotal = new AtomicLong()
  private[graft] def eagerOverflowed: Long = eagerTotal.get()
  private[graft] def recordEagerOverflow(qe: QueryExecution): Long = {
    val n = qe.observedMetrics.iterator.collect {
      case (name, row) if name.startsWith("bucket_overflow_") &&
        !row.isNullAt(0) => row.getLong(0)
    }.sum
    if (n > 0) eagerTotal.addAndGet(n): Unit
    n
  }

  /** Idempotent per-session listener registration. */
  def install(spark: SparkSession): Unit =
    if (installed.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        private def report(qe: QueryExecution): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("bucket_overflow_") && !row.isNullAt(0)) {
              val n = row.getLong(0)
              if (n > 0) {
                totalOverflowed.addAndGet(n)
                org.slf4j.LoggerFactory.getLogger(getClass).warn(
                  s"bucketPairs dropped $n over-cap bucket(s) ($name): " +
                    "pair recall is reduced; run DedupOps.bucketOverflow " +
                    "on the banded input for the dropped keys")
              }
            }
          }
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = report(qe)
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = report(qe)
      })
    }
}
