package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Events

/** Streaming ACTIVE-USERS feed — the batch DAU/WAU frame
  * (`q_events_active`, operators/Events.scala) as keyed incremental
  * state: per user, ONE long (the max day seen); an event whose day
  * exceeds it emits a (user, day) FIRST-ACTIVITY row. The emitted
  * append stream is therefore exactly the batch `ud` frame (the
  * distinct (user, day) pairs) delivered incrementally — DAU is a
  * per-day count over it and rolling-7d actives the same ×7
  * cover-explode, both downstream stateless aggregations, so the gate
  * pins the (user, day) set itself (StreamingSpec: stream == batch
  * distinct frame across a mid-day micro-batch split, same-day
  * repeats within AND across batches emit nothing).
  *
  * Ordering contract: per-user event-time order across micro-batches
  * (the [[FunnelStream]] rule); a late event for an already-passed day
  * is IGNORED, never re-emitted (surfaced by omission). Within a
  * micro-batch the group iterator is sorted before folding, so
  * intra-batch disorder is absorbed exactly like the batch `distinct`.
  *
  * Scale shape: one shuffle on user_id per micro-batch; state is ONE
  * long per user — a billion users is 8 GB across the cluster, and a
  * watermark timeout can evict dormant users if even that matters. */
object ActiveStream {

  case class Ev(userId: Long, tsNs: Long)
  case class UState(maxDay: Long)
  case class UserDay(userId: Long, day: Long)

  def advance(userId: Long, evs: Iterator[Ev],
              state: GroupState[UState]): Iterator[UserDay] = {
    var maxDay = state.getOption.map(_.maxDay).getOrElse(Long.MinValue)
    val out = Vector.newBuilder[UserDay]
    for (d <- evs.map(_.tsNs / Events.DayNs).toVector.sorted) {
      if (d > maxDay) { out += UserDay(userId, d); maxDay = d }
      // d <= maxDay: same-day repeat or late event — nothing to emit.
    }
    state.update(UState(maxDay))
    out.result().iterator
  }

  /** events (streaming Dataset) → first-activity (user, day) rows. */
  def userDayStream(events: Dataset[Ev]): Dataset[UserDay] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        advance)
  }
}
