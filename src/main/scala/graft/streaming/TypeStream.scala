package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

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
  * repeat suppression, on BOTH state APIs).
  *
  * Unlike the day/pair feeds there is no late-event asymmetry: set
  * membership is order-independent, so ANY arrival order yields the
  * same feed — repeats are suppressed, never re-emitted. One user_id
  * shuffle per micro-batch. On v2, note the skip-unchanged state write
  * also skips refreshing the TTL clock — an idle-but-saturated user's
  * set can expire and re-emit; acceptable for the affinity rollup
  * (distinct() downstream). */
object TypeStream {

  case class Ev(userId: Long, eventType: String)
  case class Seen(types: Seq[String])
  case class UserType(userId: Long, eventType: String)

  /** The per-batch fold, PURE: returns the new state ONLY when the set
    * GREW (None = skip the state write: in steady state the type
    * alphabet saturates fast, and a put of the re-encoded string
    * sequence per active user per micro-batch would buy zero
    * information change — the StateApi skip-write lane). ONE
    * definition both state APIs run through [[StateApi.foldStream]]. */
  def fold(userId: Long, st0: Option[Seen],
           evs: Seq[Ev]): (Option[Seen], Vector[UserType]) = {
    var seen = st0.map(_.types.toSet).getOrElse(Set.empty[String])
    val out = Vector.newBuilder[UserType]
    // Deterministic intra-batch order (sorted) so the emitted feed is
    // reproducible run-to-run; the SET semantics make the final feed
    // order-independent regardless.
    for (t <- evs.map(_.eventType).sorted) {
      if (!seen.contains(t)) { out += UserType(userId, t); seen += t }
    }
    val emitted = out.result()
    (if (emitted.nonEmpty) Some(Seen(seen.toSeq.sorted)) else None, emitted)
  }

  /** events (streaming Dataset) → first-occurrence (user, type) rows.
    * `v2 = true` routes through transformWithState; same observable
    * feed — StreamingSpec pins the full scenario on BOTH paths. */
  def userTypeStream(events: Dataset[Ev], v2: Boolean = false,
                     ttl: Option[java.time.Duration] = None): Dataset[UserType] = {
    import events.sparkSession.implicits._
    StateApi.foldStream(events, (_: Ev).userId, "seen_types", v2, ttl, fold)
  }

  /** `q_events_affinity` over the feed — the batch rollup applied
    * verbatim (it consumes exactly the distinct (user, type) frame the
    * stream delivers; its leading distinct() is a no-op on the feed). */
  def affinityOf(feed: DataFrame): DataFrame =
    graft.operators.Events.eventsAffinity(
      feed.select(col("userId").as("user_id"),
        col("eventType").as("event_type")))
}
