package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import graft.streaming.{EventStream, Sessionize}

/** Sessionization: the flatMapGroupsWithState streaming form must agree
  * with the batch window form on closed sessions. */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)
  private val gapSec = 1800L

  private val events = Seq(
    // user 1: two sessions (gap 09:00→12:00 > 30 min)
    Sessionize.Event(1, ts("2024-03-01 09:00:00")),
    Sessionize.Event(1, ts("2024-03-01 09:10:00")),
    Sessionize.Event(1, ts("2024-03-01 12:00:00")),
    // user 2: one session, events out of order within the batch
    Sessionize.Event(2, ts("2024-03-01 09:20:00")),
    Sessionize.Event(2, ts("2024-03-01 09:05:00")),
    // watermark pusher: far-future event closes everything above
    Sessionize.Event(9, ts("2024-03-02 00:00:00")))

  test("late in-watermark event extends session START backwards") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessions(mem.toDS(), gapSec)
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    mem.addData(Sessionize.Event(1, ts("2024-03-01 10:00:00")))
    q.processAllAvailable()
    // batch 2: a late event 15 min EARLIER, still inside the watermark
    mem.addData(Sessionize.Event(1, ts("2024-03-01 09:45:00")),
      Sessionize.Event(9, ts("2024-03-02 00:00:00")))
    q.processAllAvailable()
    mem.addData(Sessionize.Event(9, ts("2024-03-03 00:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_late").filter("user_id = 1")
      .collect().map(r => (r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3))).toSeq
    assert(got == Seq(("2024-03-01 09:45:00.0", "2024-03-01 10:00:00.0", 2L)))
  }

  test("far-late event becomes its own session, not an absurd merge") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessions(mem.toDS(), gapSec)
      .writeStream.format("memory").queryName("sess_farlate")
      .outputMode("append").start()
    mem.addData(Sessionize.Event(1, ts("2024-03-01 10:00:00")))
    q.processAllAvailable()
    // 90 min BEFORE the open session's start (> gap): with the old
    // vacuous `t - last <= gap` test this merged and stretched the
    // session start back to 08:30
    mem.addData(Sessionize.Event(1, ts("2024-03-01 08:30:00")))
    q.processAllAvailable()
    mem.addData(Sessionize.Event(9, ts("2024-03-03 00:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_farlate").filter("user_id = 1")
      .collect().map(r => (r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3))).toSet
    assert(got == Set(
      ("2024-03-01 08:30:00.0", "2024-03-01 08:30:00.0", 1L),
      ("2024-03-01 10:00:00.0", "2024-03-01 10:00:00.0", 1L)))
  }

  test("streaming sessions equal batch sessions for closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessions(mem.toDS(), gapSec)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    // second micro-batch: watermark from batch 1 now closes idle sessions
    mem.addData(Sessionize.Event(9, ts("2024-03-03 00:00:00")))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sess")
      .orderBy("user_id", "session_start")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3))).toSeq

    val batch = EventStream.sessionizeBatch(
        events.toDF().withColumnRenamed("ts", "ts")
          .withColumn("event_id", org.apache.spark.sql.functions
            .monotonically_increasing_id()), gapSec)
      .filter("user_id < 9") // the pusher's session may still be open
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).toString,
        r.getTimestamp(3).toString, r.getLong(4))).toSeq

    val closedStreamed = streamed.filter(_._1 < 9)
    assert(closedStreamed == batch)
    assert(closedStreamed == Seq(
      (1L, "2024-03-01 09:00:00.0", "2024-03-01 09:10:00.0", 2L),
      (1L, "2024-03-01 12:00:00.0", "2024-03-01 12:00:00.0", 1L),
      (2L, "2024-03-01 09:05:00.0", "2024-03-01 09:20:00.0", 2L)))
  }
}
