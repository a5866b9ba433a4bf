package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event of the streaming sessionizer (the `events` table's key columns). */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long)

/** Open-session state: first/last event micros + event count. */
case class SessionState(startUs: Long, lastUs: Long, n: Long)

/** A closed session, emitted once the gap (or the watermark) closes it. */
case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp, n_events: Long)

/**
 * STATEFUL streaming sessionization — the Structured Streaming twin of
 * [[graft.operators.EventOps.sessionize]] (x11), built on
 * `flatMapGroupsWithState` + event-time timeout: the one streaming
 * primitive the watermarked-aggregation operators ([[LedgerStream]]) can't
 * express, because a session's window closes on a DATA-dependent condition
 * (the gap), not a fixed grid.
 *
 * Semantics: state is keyed by user; each micro-batch's events fold into
 * the open session in (ts, event_id) order; an event whose gap from the
 * session's last exceeds `gapMinutes` closes it (emitted downstream) and
 * opens a new one. A session with no successor event closes when the
 * WATERMARK passes `last + gap` (event-time timeout), so idle users emit
 * without waiting for their next click and state stays bounded by the
 * number of concurrently-open sessions — never event history.
 *
 * Correctness contract: exactly the batch operator's session set, PROVIDED
 * events are not late across micro-batches beyond the watermark (the
 * standard streaming caveat; within a micro-batch any order is fine — the
 * fold sorts). The spec pins stream == batch on a multi-batch fixture.
 *
 * At 100 TB-scale ingest: state is (user → 24 bytes); the shuffle is the
 * same user-keyed exchange the batch window uses; timeouts GC state, so
 * the store holds only users active within one gap of the watermark.
 */
object EventStream {

  def sessionize(
      events: Dataset[SessionEvent],
      gapMinutes: Int = 30,
      watermark: String = "1 hour"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60_000_000L

    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1_000_000) / 1000

    def tsOf(micros: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(micros / 1000)
      t.setNanos(((micros % 1_000_000) * 1000).toInt)
      t
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, evs: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            // watermark passed last + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, tsOf(s.startUs), s.n))
          } else {
            val sorted = evs.toSeq.sortBy(e => (us(e.ts), e.event_id))
            val closed = Seq.newBuilder[ClosedSession]
            var cur = state.getOption
            for (e <- sorted) {
              val t = us(e.ts)
              cur match {
                case Some(s) if t - s.lastUs > gapUs =>
                  closed += ClosedSession(uid, tsOf(s.startUs), s.n)
                  cur = Some(SessionState(t, t, 1L))
                case Some(s) =>
                  cur = Some(SessionState(s.startUs, math.max(s.lastUs, t), s.n + 1))
                case None =>
                  cur = Some(SessionState(t, t, 1L))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                // ms precision is what the state store's timeout clock has;
                // rounding up keeps "timeout strictly after last + gap"
                state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000 + 1)
              case None => // no events and no prior state: nothing to do
            }
            closed.result().iterator
          }
        })
  }
}
