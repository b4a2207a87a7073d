package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming (user, type) FIRST-OCCURRENCE feed — [[ActiveStream]]'s
  * shape with the day replaced by the event-type alphabet: per user,
  * the set of types already seen (bounded by |types| — a few dozen
  * strings, not a corpus-sized structure); an event whose type is new
  * for its user emits one (user, type) row. The emitted append stream
  * IS the batch `distinct (user_id, event_type)` frame delivered
  * incrementally, which is the ONLY input `q_events_affinity` needs —
  * so the affinity table (support/lift over type pairs) reproduces by
  * handing the feed to the batch rollup itself ([[affinityOf]];
  * stream == batch pinned in StreamingSpec including cross-batch
  * repeat suppression).
  *
  * Unlike the day/pair feeds there is no late-event asymmetry: set
  * membership is order-independent, so ANY arrival order yields the
  * same feed — repeats are suppressed, never re-emitted. One user_id
  * shuffle per micro-batch. */
object TypeStream {

  case class Ev(userId: Long, eventType: String)
  case class Seen(types: Seq[String])
  case class UserType(userId: Long, eventType: String)

  def advance(userId: Long, evs: Iterator[Ev],
              state: GroupState[Seen]): Iterator[UserType] = {
    var seen = state.getOption.map(_.types.toSet).getOrElse(Set.empty[String])
    val out = Vector.newBuilder[UserType]
    // Deterministic intra-batch order (sorted) so the emitted feed is
    // reproducible run-to-run; the SET semantics make the final feed
    // order-independent regardless.
    for (t <- evs.map(_.eventType).toVector.sorted) {
      if (!seen.contains(t)) { out += UserType(userId, t); seen += t }
    }
    val emitted = out.result()
    // Write state only when the set GREW: in steady state (the type
    // alphabet saturates fast) every micro-batch would otherwise pay a
    // state-store put of the re-encoded string sequence per active
    // user for zero information change.
    if (emitted.nonEmpty) state.update(Seen(seen.toSeq.sorted))
    emitted.iterator
  }

  /** events (streaming Dataset) → first-occurrence (user, type) rows. */
  def userTypeStream(events: Dataset[Ev]): Dataset[UserType] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        advance)
  }

  /** `q_events_affinity` over the feed — the batch rollup applied
    * verbatim (it consumes exactly the distinct (user, type) frame the
    * stream delivers; its leading distinct() is a no-op on the feed). */
  def affinityOf(feed: DataFrame): DataFrame =
    graft.operators.Events.eventsAffinity(
      feed.select(col("userId").as("user_id"),
        col("eventType").as("event_type")))
}
