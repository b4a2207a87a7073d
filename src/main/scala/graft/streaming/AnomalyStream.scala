package graft.streaming

import org.apache.spark.sql.Dataset

import graft.operators.Events

/** Streaming VOLUME-ANOMALY monitor — the batch k·σ detector
  * (`q_events_anomaly`, operators/Events.scala) as keyed incremental
  * state: per event_type, the trailing window of the last
  * [[Events.AnomalyWindow]] CLOSED (day, count) rows advances as days
  * complete, and each closing day is flagged with the identical
  * cleared-denominator integer compare. A day CLOSES when the first
  * event of a later day arrives for that type — exactly the point at
  * which the batch ROWS frame for the closed day is complete, so a
  * closed day's row is bit-identical to the batch key's (the still-open
  * newest day is the only batch row the stream has not yet emitted;
  * StreamingSpec pins stream == batch-minus-open-day on BOTH state
  * APIs).
  *
  * Ordering contract: per event_type the stream is ingested in
  * event-time order across micro-batches (the [[FunnelStream]] rule);
  * a late event for an already-closed day is IGNORED, never absorbed
  * into the wrong window (surfacing the violation by omission rather
  * than silent divergence).
  *
  * Scale shape: one shuffle on event_type per micro-batch; state is
  * ≤ (window+1) longs per type — thousands of types cost kilobytes.
  * Day counts partial-aggregate inside each micro-batch before they
  * reach the keyed state only via the group iterator (counts are
  * folded in [[fold]], so per-event state writes never happen). */
object AnomalyStream {

  case class Ev(eventType: String, tsNs: Long)
  /** Trailing CLOSED day counts (ascending, ≤ AnomalyWindow) + the
    * currently open day (curDay == -1 ⟺ nothing open yet). */
  case class AState(trail: Seq[Long], curDay: Long, curN: Long)
  /** One row per CLOSED day — same columns as the batch key. */
  case class AnomalyFlag(eventType: String, day: Long, n: Long,
                         dev2: Long, bound: Long, isAnomaly: Int)

  /** The per-batch fold, PURE — ONE definition both state APIs run
    * through [[StateApi.foldStream]]. */
  def fold(eventType: String, st0: Option[AState],
           evs: Seq[Ev]): (Option[AState], Vector[AnomalyFlag]) = {
    val w = Events.AnomalyWindow
    val k2 = Events.AnomalyK * Events.AnomalyK
    var st = st0.getOrElse(AState(Vector.empty, -1L, 0L))
    val out = Vector.newBuilder[AnomalyFlag]
    def close(): Unit = {
      if (st.trail.length == w) {
        val s = st.trail.sum
        val q = st.trail.map(c => c * c).sum
        val dev2 = (w * st.curN - s) * (w * st.curN - s)
        val bound = k2 * (w * q - s * s)
        out += AnomalyFlag(eventType, st.curDay, st.curN, dev2, bound,
          if (dev2 > bound) 1 else 0)
      }
      st = AState((st.trail :+ st.curN).takeRight(w), -1L, 0L)
    }
    for (e <- evs.sortBy(_.tsNs)) {
      val d = e.tsNs / Events.DayNs // tsNs ≥ 0, so / == the batch div
      if (st.curDay < 0) st = st.copy(curDay = d, curN = 1L)
      else if (d == st.curDay) st = st.copy(curN = st.curN + 1)
      else if (d > st.curDay) { close(); st = st.copy(curDay = d, curN = 1L) }
      // d < curDay: late event for a closed day — ignored (contract).
    }
    (Some(st), out.result())
  }

  /** events (streaming Dataset) → per-closed-day anomaly flags.
    * `v2 = true` routes through transformWithState; same observable
    * feed — StreamingSpec pins the full scenario on BOTH paths. */
  def anomalyFlagStream(events: Dataset[Ev], v2: Boolean = false,
                        ttl: Option[java.time.Duration] = None): Dataset[AnomalyFlag] = {
    import events.sparkSession.implicits._
    StateApi.foldStream(events, (_: Ev).eventType, "trailing_days", v2, ttl,
      fold)
  }
}
