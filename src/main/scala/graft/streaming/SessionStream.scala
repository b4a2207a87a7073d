package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Events

/** Streaming GAP SESSIONIZATION — the batch session key
  * (`q_events_sessions`, operators/Events.scala) as keyed incremental
  * state, and the analytics twin of the reference's chat-session
  * semantics (telegram-agent.py:419-433: a conversation "session" ends
  * when the user goes quiet past a threshold) that [[Sessions]] already
  * mirrors for the chat-state shape. State per user is one (start,
  * last, n) triple — the OPEN session; an event whose gap from `last`
  * EXCEEDS the threshold (strictly — a gap of exactly the threshold
  * stays in-session, the batch key's spec-pinned boundary) CLOSES the
  * open session, emits its (n_events, dur_ns) row, and opens a new one
  * at the event.
  *
  * Closure semantics: a session row emits when the NEXT session's first
  * event arrives (the gap is only then known to exceed the threshold).
  * Each user's final open session therefore stays in state — correct
  * (its extent is not yet knowable: the next event may still continue
  * it) and surfaced by construction: stream output == batch sessions
  * MINUS each user's last session, exactly (StreamingSpec pins that
  * equality across a MID-SESSION micro-batch split, and that a
  * watermark-like closing event drains the remainder to full
  * equality). A production feed closes idle sessions with an event-time
  * timeout sweep; the driver corpora replay closed windows, so the
  * arrival-driven form is the honest one to pin.
  *
  * Ordering contract and scale shape are [[ActiveStream]]'s: per-user
  * event-time order ACROSS micro-batches (an event at or before the
  * open session's `last` is a late/duplicate arrival — counted into
  * the open session if inside the gap, ignored if it predates the
  * session start; the guard case pins it), intra-batch disorder sorted
  * before folding; one user_id shuffle per micro-batch, 24 bytes of
  * state per user. */
object SessionStream {

  case class Ev(userId: Long, tsNs: Long, eventId: Long)
  case class SState(start: Long, last: Long, n: Long)
  case class Sess(userId: Long, nEvents: Long, durNs: Long)

  def advance(userId: Long, evs: Iterator[Ev],
              state: GroupState[SState]): Iterator[Sess] = {
    var st = state.getOption
    val out = Vector.newBuilder[Sess]
    for (e <- evs.toVector.sortBy(x => (x.tsNs, x.eventId))) {
      st match {
        case None =>
          st = Some(SState(e.tsNs, e.tsNs, 1L))
        case Some(s) if e.tsNs < s.start =>
          // Late event predating the open session: its true session
          // was already closed and emitted — ignored, surfaced by
          // omission (the ActiveStream late rule).
          ()
        case Some(s) if e.tsNs - s.last > Events.SessionGapNs =>
          out += Sess(userId, s.n, s.last - s.start)
          st = Some(SState(e.tsNs, e.tsNs, 1L))
        case Some(s) =>
          // In-gap arrival; a same-ts duplicate still counts an event,
          // exactly like the batch window (rows, not distinct ts).
          st = Some(SState(s.start, math.max(s.last, e.tsNs), s.n + 1L))
      }
    }
    st.foreach(s => state.update(s))
    out.result().iterator
  }

  /** events (streaming Dataset) → append rows of CLOSED sessions. */
  def sessionStream(events: Dataset[Ev]): Dataset[Sess] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        advance)
  }

  /** The batch key's report shape over the emitted session rows — a
    * STATELESS downstream rollup (bucket = least(n, cap)), so the
    * session feed is a sufficient statistic for `q_events_sessions`
    * exactly as the active feed is for DAU/stickiness. */
  def report(sessions: DataFrame,
             cap: Int = Events.SessionBucketCap): DataFrame =
    Events.sessionReport(
      sessions.select(col("nEvents").as("n_events"),
        col("durNs").as("dur_ns")), cap)
}
