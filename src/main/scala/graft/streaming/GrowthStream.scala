package graft.streaming

import org.apache.spark.sql.Dataset

import graft.operators.Events

/** Streaming GROWTH-ACCOUNTING feed — the batch DAU decomposition
  * (`q_events_growth`, operators/Events.scala) as keyed incremental
  * state: per user, ONE long (the last active day; "never seen" is the
  * absent state, so NEW needs no extra field). Each first activity on
  * a new day emits its classification row, and a gap emits the churn
  * row the batch key derives from `lead()`:
  *
  *  - no prior state           → (d, new)
  *  - d == last + 1            → (d, retained)
  *  - d >  last + 1            → (last + 1, churned) + (d, resurrected)
  *  - d <= last                → nothing (same-day repeat / late event)
  *
  * The emitted append stream aggregates to the batch growth frame by a
  * STATELESS count per (day, kind) — including the all-quiet-day churn
  * rows the batch full-outer frame reports (the stream emits churn by
  * day value, active or not). One deliberate asymmetry, surfaced by
  * omission rather than silently wrong: a user who churns and NEVER
  * returns has no later event to carry its churn row, so the stream's
  * churn count covers RETURN-GAP churn only; the batch key additionally
  * counts still-dormant users (knowable there because the whole corpus
  * is in hand). A production feed closes that with a daily sweep over
  * the state store (every user with lastDay < today−1 and no churn row
  * yet — pure state iteration, no event replay); the spec pins
  * stream == batch on a window where every gap closes, which makes the
  * two frames equal row-for-row (on BOTH state APIs).
  *
  * TTL/semantics interaction on v2: an expired user reads as
  * never-seen, so their next event classifies as "new" rather than
  * "resurrected" — the documented cost of bounding state by retention;
  * leave TTL unset where growth-kind fidelity matters beyond the
  * retention horizon.
  *
  * Ordering contract and scale shape are [[ActiveStream]]'s: per-user
  * event-time order across micro-batches, intra-batch disorder sorted
  * before folding; one user_id shuffle per micro-batch, 8 bytes of
  * state per user. */
object GrowthStream {

  case class Ev(userId: Long, tsNs: Long)
  case class GState(lastDay: Long)
  case class GrowthEv(day: Long, kind: String)

  /** The per-batch fold, PURE — ONE definition both state APIs run
    * through [[StateApi.foldStream]]. */
  def fold(userId: Long, st0: Option[GState],
           evs: Seq[Ev]): (Option[GState], Vector[GrowthEv]) = {
    var last = st0.map(_.lastDay).getOrElse(Long.MinValue)
    var seen = st0.isDefined
    val out = Vector.newBuilder[GrowthEv]
    for (d <- evs.map(_.tsNs / Events.DayNs).sorted) {
      if (!seen) { out += GrowthEv(d, "new"); last = d; seen = true }
      else if (d == last + 1) { out += GrowthEv(d, "retained"); last = d }
      else if (d > last + 1) {
        out += GrowthEv(last + 1, "churned")
        out += GrowthEv(d, "resurrected")
        last = d
      }
      // d <= last: same-day repeat or late event — nothing to emit.
    }
    (Some(GState(last)), out.result())
  }

  /** events (streaming Dataset) → append growth-classification rows.
    * `v2 = true` routes through transformWithState; same observable
    * feed — StreamingSpec pins the full scenario on BOTH paths. */
  def growthStream(events: Dataset[Ev], v2: Boolean = false,
                   ttl: Option[java.time.Duration] = None): Dataset[GrowthEv] = {
    import events.sparkSession.implicits._
    StateApi.foldStream(events, (_: Ev).userId, "last_day", v2, ttl, fold)
  }
}
