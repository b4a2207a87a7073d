package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

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
  * equality). A production feed closes idle sessions with the v2
  * per-state TTL instead: an open session whose user goes quiet past
  * the TTL reads as ABSENT (silently dropped, never emitted as
  * closed), so the next event opens a fresh session — exercised end to
  * end in StreamingSpec's TTL scenario on RocksDB.
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

  /** The per-batch fold, PURE: (open-session state, this batch's
    * events) → (new state, closed-session emissions). ONE definition —
    * both state APIs run through [[StateApi.foldStream]], so they
    * cannot drift (the Events.funnelStep discipline). */
  def fold(userId: Long, st0: Option[SState],
           evs: Seq[Ev]): (Option[SState], Vector[Sess]) = {
    var st = st0
    val out = Vector.newBuilder[Sess]
    for (e <- evs.sortBy(x => (x.tsNs, x.eventId))) {
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
    (st, out.result())
  }

  /** events (streaming Dataset) → append rows of CLOSED sessions.
    * `v2 = true` routes through transformWithState (pass `ttl` to
    * expire idle open sessions per-state — v1 has no TTL arm here, its
    * bounded tests never needed one). Same observable stream —
    * StreamingSpec pins the full scenario on BOTH paths. */
  def sessionStream(events: Dataset[Ev], v2: Boolean = false,
                    ttl: Option[java.time.Duration] = None): Dataset[Sess] = {
    import events.sparkSession.implicits._
    StateApi.foldStream(events, (_: Ev).userId, "open_session", v2, ttl, fold)
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
