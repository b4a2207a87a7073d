package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
  * two frames equal row-for-row.
  *
  * Ordering contract and scale shape are [[ActiveStream]]'s: per-user
  * event-time order across micro-batches, intra-batch disorder sorted
  * before folding; one user_id shuffle per micro-batch, 8 bytes of
  * state per user. */
object GrowthStream {

  case class Ev(userId: Long, tsNs: Long)
  case class GState(lastDay: Long)
  case class GrowthEv(day: Long, kind: String)

  def advance(userId: Long, evs: Iterator[Ev],
              state: GroupState[GState]): Iterator[GrowthEv] = {
    var last = state.getOption.map(_.lastDay).getOrElse(Long.MinValue)
    var seen = state.exists
    val out = Vector.newBuilder[GrowthEv]
    for (d <- evs.map(_.tsNs / Events.DayNs).toVector.sorted) {
      if (!seen) { out += GrowthEv(d, "new"); last = d; seen = true }
      else if (d == last + 1) { out += GrowthEv(d, "retained"); last = d }
      else if (d > last + 1) {
        out += GrowthEv(last + 1, "churned")
        out += GrowthEv(d, "resurrected")
        last = d
      }
      // d <= last: same-day repeat or late event — nothing to emit.
    }
    state.update(GState(last))
    out.result().iterator
  }

  /** events (streaming Dataset) → append growth-classification rows. */
  def growthStream(events: Dataset[Ev]): Dataset[GrowthEv] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        advance)
  }
}
