package graft.streaming

import org.apache.spark.sql.Dataset

import graft.operators.Events

/** Streaming FIRST-TOUCH ATTRIBUTION — the batch key
  * (`q_events_attribution`, operators/Events.scala) as keyed
  * incremental state: per user, the (ts, event_id)-minimal first event
  * type plus a sticky converted flag, emitting a change row whenever
  * either moves. Unlike the funnel machine this twin is EXACT under
  * ANY arrival order — first touch is a running minimum and conversion
  * a running OR, both order-insensitive folds — so out-of-order and
  * cross-micro-batch late events need no ordering contract at all: a
  * late-but-earlier event simply RE-ATTRIBUTES the user and the change
  * stream records the correction (the last row per user is always the
  * batch answer). StreamingSpec pins the full scenario on BOTH state
  * APIs.
  *
  * Scale shape: one shuffle on user_id per micro-batch; state is one
  * (ts, id, type, flag) record per user — the same ~tens of bytes the
  * funnel machine holds, 10⁹ users ≈ a few GB across the fleet. The
  * channel rollup (`conv_bp` per first type) is a downstream aggregate
  * over the ≤ |users|-row change stream's latest rows, never over raw
  * events.
  */
object AttributionStream {

  case class Ev(userId: Long, tsNs: Long, eventId: Long, eventType: String)
  /** The running minimum's full key (ts, id) + its type + sticky conv. */
  case class AState(tsNs: Long, eventId: Long, firstType: String,
                    converted: Boolean)
  /** Emitted on every state change — the attribution correction log. */
  case class Touch(userId: Long, firstType: String, converted: Boolean)

  /** The per-batch fold, PURE: emits ONLY when the state moved — the
    * correction-log contract — so the returned state is None exactly
    * when nothing needs writing back (the StateApi skip-write lane).
    * ONE definition both state APIs run through
    * [[StateApi.foldStream]]. */
  def fold(userId: Long, st0: Option[AState],
           evs: Seq[Ev]): (Option[AState], Vector[Touch]) = {
    val before = st0.orNull
    var st = before
    for (e <- evs) {
      if (st == null ||
          e.tsNs < st.tsNs || (e.tsNs == st.tsNs && e.eventId < st.eventId)) {
        st =
          if (st == null) AState(e.tsNs, e.eventId, e.eventType, false)
          else AState(e.tsNs, e.eventId, e.eventType, st.converted)
      }
      if (e.eventType == Events.ConvType) st = st.copy(converted = true)
    }
    if (st != before)
      (Some(st), Vector(Touch(userId, st.firstType, st.converted)))
    else (None, Vector.empty)
  }

  /** events (streaming Dataset) → per-user attribution change rows;
    * the latest row per user is the batch `q_events_attribution`
    * per-user frame. `v2 = true` routes through transformWithState;
    * same observable feed — StreamingSpec pins the full scenario on
    * BOTH paths.
    *
    * TTL CAVEAT (v2 + `ttl`, the TypeStream tradeoff documented here
    * too — round-19 review): the fold emits None (skip the state
    * write) whenever the attribution did NOT move, and on the v2 lane
    * a skipped write also skips refreshing the TTL clock. A
    * continuously ACTIVE user whose first touch never changes
    * therefore expires after `ttl` of unchanged attribution — not of
    * inactivity — and their next event re-attributes as a fresh first
    * touch. Deliberate: rewriting unchanged state per micro-batch to
    * keep the clock warm would re-impose exactly the steady-state
    * write load the skip removes, and the production reading of the
    * TTL is "retire attributions older than the retention window"
    * (first touch is a creation-time fact — its age IS the right
    * expiry axis). Pass `ttl = None` (the default) where
    * never-expiring attribution is wanted. */
  def firstTouchStream(events: Dataset[Ev], v2: Boolean = false,
                       ttl: Option[java.time.Duration] = None): Dataset[Touch] = {
    import events.sparkSession.implicits._
    StateApi.foldStream(events, (_: Ev).userId, "first_touch", v2, ttl, fold)
  }
}
