package graft.streaming

import org.apache.spark.sql.Dataset

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
  * repeats within AND across batches emit nothing — on BOTH state
  * APIs).
  *
  * Ordering contract: per-user event-time order across micro-batches
  * (the [[FunnelStream]] rule); a late event for an already-passed day
  * is IGNORED, never re-emitted (surfaced by omission). Within a
  * micro-batch the group iterator is sorted before folding, so
  * intra-batch disorder is absorbed exactly like the batch `distinct`.
  *
  * Scale shape: one shuffle on user_id per micro-batch; state is ONE
  * long per user — a billion users is 8 GB across the cluster, and on
  * the v2 path a per-state TTL evicts dormant users if even that
  * matters (an evicted user's next event re-emits its day — a
  * first-activity row that is correct again after eviction, since the
  * state was the only dedup witness). */
object ActiveStream {

  case class Ev(userId: Long, tsNs: Long)
  case class UState(maxDay: Long)
  case class UserDay(userId: Long, day: Long)

  /** The per-batch fold, PURE — ONE definition both state APIs run
    * through [[StateApi.foldStream]]. */
  def fold(userId: Long, st0: Option[UState],
           evs: Seq[Ev]): (Option[UState], Vector[UserDay]) = {
    var maxDay = st0.map(_.maxDay).getOrElse(Long.MinValue)
    val out = Vector.newBuilder[UserDay]
    for (d <- evs.map(_.tsNs / Events.DayNs).sorted) {
      if (d > maxDay) { out += UserDay(userId, d); maxDay = d }
      // d <= maxDay: same-day repeat or late event — nothing to emit.
    }
    (Some(UState(maxDay)), out.result())
  }

  /** events (streaming Dataset) → first-activity (user, day) rows.
    * `v2 = true` routes through transformWithState; same observable
    * feed — StreamingSpec pins the full scenario on BOTH paths. */
  def userDayStream(events: Dataset[Ev], v2: Boolean = false,
                    ttl: Option[java.time.Duration] = None): Dataset[UserDay] = {
    import events.sparkSession.implicits._
    StateApi.foldStream(events, (_: Ev).userId, "max_day", v2, ttl, fold)
  }
}
