package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Events

/** Streaming CONSECUTIVE-PAIR feed — the incremental backbone of the
  * whole path-analysis family: per user, keep the last TWO event
  * (type, ts) pairs; each arriving event emits one transition row
  * (prev2, prev_type, event_type, gap_ns). That feed is a sufficient
  * statistic for every batch key that starts from a user-keyed lag
  * window:
  *
  *   - `q_events_paths`    — count per (prev, curr) + per-source share
  *   - `q_events_markov`   — modal next type over the same pair frame
  *   - `q_events_markov2`  — modal over (prev2, prev1) states (the
  *                           two-event context is IN the feed)
  *   - `q_events_markov_gain` — the order-1 vs order-2 join
  *   - `q_events_dwell`    — gap percentiles per (prev, curr) edge
  *   - `q_events_pagerank` — the fixed point over the feed's
  *                           null-inclusive pair aggregate (each
  *                           user's FIRST event emits a null-prev row,
  *                           so the node set matches the batch lag's)
  *
  * each reproduced by a STATELESS rollup over the emitted rows
  * ([[pathsOf]]/[[markovOf]]/[[markov2Of]]/[[markovGainOf]]/
  * [[dwellOf]]/[[pagerankOf]] — the CohortStream sufficiency pattern;
  * StreamingSpec pins all six against their batch keys over the same
  * events, across a mid-stream micro-batch split).
  *
  * Ordering contract and scale shape are [[ActiveStream]]'s: per-user
  * event-time order ACROSS micro-batches (a late event at or before
  * the stored last timestamp is ignored — surfaced by omission, the
  * guard case pins it; the batch window would have spliced it in,
  * which is exactly what an append stream cannot retroactively do);
  * intra-batch disorder is sorted before folding. One user_id shuffle
  * per micro-batch; state is (prev2 type, prev type, prev ts) — two
  * strings and one long per user. */
object TransitionStream {

  case class Ev(userId: Long, tsNs: Long, eventId: Long, eventType: String)
  case class TState(prev2: String, prevType: String, prevTs: Long)
  case class Trans(userId: Long, prev2: String, prevType: String,
                   eventType: String, gapNs: Long)

  /** The per-batch fold, PURE — ONE definition both state APIs run
    * through [[StateApi.foldStream]]. */
  def fold(userId: Long, st0: Option[TState],
           evs: Seq[Ev]): (Option[TState], Vector[Trans]) = {
    var st = st0.getOrElse(TState(null, null, Long.MinValue))
    val out = Vector.newBuilder[Trans]
    for (e <- evs.sortBy(x => (x.tsNs, x.eventId))) {
      if (st.prevType == null) {
        // FIRST-EVENT row (null prev, gap 0): the null-inclusive pair
        // the batch lag produces. Pair-frame consumers filter it out
        // exactly like the batch keys filter `prev IS NULL`; pagerank
        // NEEDS it — its node set counts first-event-only types.
        out += Trans(userId, null, null, e.eventType, 0L)
        st = TState(null, e.eventType, e.tsNs)
      } else if (e.tsNs >= st.prevTs) {
        // Equal-ts arrivals follow stored order — the batch window's
        // (ts, event_id) order is already enforced within a batch by
        // the sort above, and the cross-batch contract delivers them
        // in order.
        out += Trans(userId, st.prev2, st.prevType, e.eventType,
          e.tsNs - st.prevTs)
        st = TState(st.prevType, e.eventType, e.tsNs)
      }
      // e.tsNs < prevTs: late event — ignored (ordering contract).
    }
    (if (st.prevType != null) Some(st) else None, out.result())
  }

  /** events (streaming Dataset) → append transition rows. `v2 = true`
    * routes through transformWithState with optional per-state TTL (a
    * user idle past the TTL reads as absent, so their next event
    * re-anchors as a first event — the production close for unbounded
    * user churn). Same observable feed — StreamingSpec pins the full
    * scenario on BOTH paths. */
  def transitionStream(events: Dataset[Ev], v2: Boolean = false,
                       ttl: Option[java.time.Duration] = None): Dataset[Trans] = {
    import events.sparkSession.implicits._
    StateApi.foldStream(events, (_: Ev).userId, "last_two", v2, ttl, fold)
  }

  /** `q_events_paths` over the feed — the BATCH TAIL itself
    * ([[Events.pathsFromPairCounts]], one definition) over the feed's
    * counted pair frame. */
  def pathsOf(feed: DataFrame): DataFrame =
    Events.pathsFromPairCounts(feed.filter(col("prevType").isNotNull)
      .groupBy(col("prevType").as("prev_type"),
        col("eventType").as("event_type"))
      .agg(count(lit(1)).as("n")))

  /** `q_events_markov` over the feed — the batch modal tail
    * ([[Events.markovFromPairCounts]]) over the same pair counts. */
  def markovOf(feed: DataFrame): DataFrame =
    Events.markovFromPairCounts(feed.filter(col("prevType").isNotNull)
      .groupBy(col("prevType").as("prev_type"),
        col("eventType").as("event_type"))
      .agg(count(lit(1)).as("n")))

  /** `q_events_markov2` over the feed — the two-event context rows are
    * exactly the feed rows whose prev2 is set (the batch key's
    * prev2-isNotNull filter); tail shared
    * ([[Events.markov2FromPairCounts]]). */
  def markov2Of(feed: DataFrame): DataFrame =
    Events.markov2FromPairCounts(feed.filter(col("prev2").isNotNull)
      .groupBy(col("prev2"), col("prevType").as("prev1"),
        col("eventType").as("event_type"))
      .agg(count(lit(1)).as("n")))

  /** `q_events_markov_gain` over the feed — the batch join
    * ([[Events.markovGainFrom]]) over the two feed rollups. */
  def markovGainOf(feed: DataFrame): DataFrame =
    Events.markovGainFrom(markovOf(feed), markov2Of(feed))

  /** `q_events_pagerank` over the feed — the NULL-INCLUSIVE pair
    * aggregate the batch key's lag pass produces is exactly the feed
    * (first-event rows carry the null prev), so the fixed-point
    * iterations run over the feed-derived edge frame with the SAME
    * node set, first-event-only types included
    * ([[Events.pageRankFromPairs]]). */
  def pagerankOf(feed: DataFrame): DataFrame =
    Events.pageRankFromPairs(
      feed.groupBy(col("prevType").as("src"),
          col("eventType").as("dst"))
        .agg(count(lit(1)).as("wt"))
        .localCheckpoint(true))

  /** `q_events_dwell` over the feed — the batch percentile tail over
    * (prev, curr, gap_ms) triples derived from the carried gap. */
  def dwellOf(feed: DataFrame): DataFrame =
    Events.dwellFromDist(feed.filter(col("prevType").isNotNull)
      .select(col("prevType").as("prev_type"),
        col("eventType").as("dst"),
        expr(s"gapNs div ${Events.DwellMsNs}L").as("gap_ms"))
      .groupBy("prev_type", "dst", "gap_ms")
      .agg(count(lit(1)).as("c")))
}
