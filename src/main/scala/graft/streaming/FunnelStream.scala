package graft.streaming

import org.apache.spark.sql.Dataset

import graft.operators.Events

/** Streaming CONVERSION FUNNEL — the batch funnel pair
  * (`q_events_funnel` / `q_events_funnel_windowed`, operators/Events.scala)
  * as keyed incremental state: per user, the greedy first-match depth
  * advances as events arrive, emitting one row per stage reached. The
  * greedy machine is EXACT against the batch definition because the
  * batch match is prefix-incremental: stage k's match is the first
  * step-k event after stage k−1's, so a state machine consuming the
  * stream in (ts, event_id) order makes identical decisions — and
  * under a conversion window, ts monotonicity means a first candidate
  * failing the window implies every later one does too (the same
  * argument the batch key documents).
  *
  * Ordering contract: events are sorted by (ts_ns, event_id) WITHIN a
  * micro-batch (the [[Sessions.route]] determinism rule); ACROSS
  * micro-batches the per-user stream must be ingested in event-time
  * order (the per-key ordered delivery a user-keyed log partition
  * gives). StreamingSpec pins stream == batch on both window settings,
  * on BOTH state APIs.
  *
  * Scale shape: one shuffle on user_id per micro-batch; state is a
  * fixed 12 bytes per user (depth + last matched ts) — 10⁹ users is
  * ~12 GB across the fleet's state stores, and completed funnels
  * (depth 4) could be dropped entirely if retention allows (on v2 a
  * per-state TTL restarts an expired user's funnel from depth 0 —
  * the retention close for unbounded user churn).
  */
object FunnelStream {

  case class Ev(userId: Long, tsNs: Long, eventId: Long, eventType: String)
  /** depth reached so far + ts of the last MATCHED stage (window anchor). */
  case class FState(depth: Int, lastTsNs: Long)
  /** Emitted once per stage advance — the funnel's change stream. */
  case class DepthAdvance(userId: Long, depth: Int, tsNs: Long)

  /** The per-batch fold, PURE — ONE definition both state APIs run
    * through [[StateApi.foldStream]]. */
  def fold(windowNs: Long)(userId: Long, st0: Option[FState],
           evs: Seq[Ev]): (Option[FState], Vector[DepthAdvance]) = {
    var st = st0.getOrElse(FState(0, 0L))
    val out = Vector.newBuilder[DepthAdvance]
    for (e <- evs.sortBy(e => (e.tsNs, e.eventId))) {
      // Events.funnelStep is THE shared machine (the batch keys fold
      // the same function under a secondary sort — one definition, so
      // stream and batch cannot drift). Its ts >= lastTs guard is a
      // no-op under the documented per-user event-time ordering
      // contract, but without it a late event arriving ACROSS
      // micro-batches with ts before the last matched stage would
      // yield a negative gap that passes the window check and silently
      // diverges. Late events are ignored, not absorbed.
      if (Events.funnelStep(st.depth, st.lastTsNs, e.eventType, e.tsNs,
          windowNs)) {
        st = FState(st.depth + 1, e.tsNs)
        out += DepthAdvance(userId, st.depth, e.tsNs)
      }
    }
    (Some(st), out.result())
  }

  /** events (streaming Dataset) → per-stage depth advances.
    * `windowNs = Long.MaxValue` is the unwindowed funnel;
    * [[Events.FunnelWindowNs]] matches `q_events_funnel_windowed`.
    * `v2 = true` routes through transformWithState; same observable
    * stream — StreamingSpec pins the full scenario on BOTH paths. */
  def funnelDepthStream(events: Dataset[Ev],
                        windowNs: Long = Long.MaxValue, v2: Boolean = false,
                        ttl: Option[java.time.Duration] = None): Dataset[DepthAdvance] = {
    import events.sparkSession.implicits._
    StateApi.foldStream(events, (_: Ev).userId, "funnel_depth", v2, ttl,
      fold(windowNs))
  }
}
