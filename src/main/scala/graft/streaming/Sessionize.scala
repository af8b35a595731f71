package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom state — the
  * `flatMapGroupsWithState` path (SURVEY §2.9: Spark's replacement for
  * the reference's offline gap analysis).
  *
  * State per user: the open session (start, last-seen, count). An event
  * extends the session if it arrives within `gapSec` of the last one,
  * else the previous session is emitted and a new one opens. An
  * event-time timeout flushes idle sessions once the watermark passes
  * last-seen + gap, which bounds state size.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp)
  case class Session(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long)
  case class OpenSession(start: Long, last: Long, n: Long)

  def sessions(events: Dataset[Event], gapSec: Long,
      watermark: String = "2 hours"): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val le = Encoders.scalaLong
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(le)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(gapSec))(Encoders.product[OpenSession], se)
  }

  private def process(gapSec: Long)(userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    val gapMs = gapSec * 1000
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(Session(userId, new Timestamp(s.start),
        new Timestamp(s.last), s.n))
    }
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = e.ts.getTime
      open match {
        case Some(s) if t < s.start - gapMs =>
          // a late event more than gap BEFORE the open session is its
          // own earlier session in event-time order — emit it; merging
          // it (the old `t - s.last <= gap` test was vacuously true for
          // any late event) would stretch the session start arbitrarily
          // far back. Exact batch parity for such stragglers needs
          // watermark <= gap; beyond that they surface as singletons.
          closed += Session(userId, new Timestamp(t), new Timestamp(t), 1)
        case Some(s) if t - s.last <= gapMs =>
          // a late in-watermark event can also extend the session START
          // backwards — batch parity requires min/max on both bounds
          open = Some(OpenSession(math.min(s.start, t),
            math.max(s.last, t), s.n + 1))
        case Some(s) =>
          closed += Session(userId, new Timestamp(s.start),
            new Timestamp(s.last), s.n)
          open = Some(OpenSession(t, t, 1))
        case None =>
          open = Some(OpenSession(t, t, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.last + gapMs)
    }
    closed.result().iterator
  }
}
