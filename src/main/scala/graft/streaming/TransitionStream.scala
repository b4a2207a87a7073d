package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
  * per micro-batch; state is two (string, long) pairs per user. */
object TransitionStream {

  case class Ev(userId: Long, tsNs: Long, eventId: Long, eventType: String)
  case class TState(prev2: String, prevType: String, prevTs: Long)
  case class Trans(userId: Long, prev2: String, prevType: String,
                   eventType: String, gapNs: Long)

  def advance(userId: Long, evs: Iterator[Ev],
              state: GroupState[TState]): Iterator[Trans] = {
    var st = state.getOption.getOrElse(TState(null, null, Long.MinValue))
    val out = Vector.newBuilder[Trans]
    for (e <- evs.toVector.sortBy(x => (x.tsNs, x.eventId))) {
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
    if (st.prevType != null) state.update(st)
    out.result().iterator
  }

  /** events (streaming Dataset) → append transition rows. */
  def transitionStream(events: Dataset[Ev]): Dataset[Trans] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        advance)
  }

  /** `q_events_paths` over the feed — the batch tail verbatim
    * (pair counts + broadcast per-source totals, shares in bp). */
  def pathsOf(feed: DataFrame): DataFrame = {
    val pairs = feed.filter(col("prevType").isNotNull)
      .groupBy(col("prevType").as("prev_type"),
        col("eventType").as("event_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("prev_type").agg(sum(col("n")).as("tot"))
    pairs.join(broadcast(totals), Seq("prev_type"))
      .select(col("prev_type"), col("event_type"), col("n"),
        expr("n * 10000 div tot").as("share_bp"))
      .orderBy("prev_type", "event_type")
  }

  /** `q_events_markov` over the feed — modal next type, same
    * (count desc, type asc) total order, accuracy = modal share. */
  def markovOf(feed: DataFrame): DataFrame =
    feed.filter(col("prevType").isNotNull)
      .groupBy(col("prevType").as("prev_type"),
        col("eventType").as("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy("prev_type")
      .agg(sum(col("n")).as("n_transitions"),
        min_by(col("event_type"), struct((-col("n")).as("nn"),
          col("event_type"))).as("predicted_next"),
        max(col("n")).as("n_correct"))
      .withColumn("acc_bp", expr("n_correct * 10000 div n_transitions"))
      .orderBy("prev_type")

  /** `q_events_markov2` over the feed — the two-event context rows are
    * exactly the feed rows whose prev2 is set (the batch key's
    * prev2-isNotNull filter). */
  def markov2Of(feed: DataFrame): DataFrame =
    feed.filter(col("prev2").isNotNull)
      .groupBy(col("prev2"), col("prevType").as("prev1"),
        col("eventType").as("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy("prev2", "prev1")
      .agg(sum(col("n")).as("n_transitions"),
        min_by(col("event_type"), struct((-col("n")).as("nn"),
          col("event_type"))).as("predicted_next"),
        max(col("n")).as("n_correct"))
      .withColumn("acc_bp", expr("n_correct * 10000 div n_transitions"))
      .orderBy("prev2", "prev1")

  /** `q_events_markov_gain` over the feed — the order-1 vs order-2
    * comparison joined exactly like the batch key (both sides are
    * feed rollups, so the whole memory-gain table is feed-derived). */
  def markovGainOf(feed: DataFrame): DataFrame = {
    val o1 = markovOf(feed)
      .select(col("prev_type").as("prev1"), col("acc_bp").as("acc1_bp"))
    markov2Of(feed)
      .select(col("prev2"), col("prev1"),
        col("n_transitions"), col("acc_bp").as("acc2_bp"))
      .join(broadcast(o1), Seq("prev1"))
      .select(col("prev2"), col("prev1"), col("n_transitions"),
        col("acc1_bp"), col("acc2_bp"),
        (col("acc2_bp") - col("acc1_bp")).as("gain_bp"))
      .orderBy("prev2", "prev1")
  }

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
  def dwellOf(feed: DataFrame): DataFrame = {
    val dist = feed.filter(col("prevType").isNotNull)
      .select(col("prevType").as("prev_type"),
        col("eventType").as("dst"),
        expr(s"gapNs div ${Events.DwellMsNs}L").as("gap_ms"))
      .groupBy("prev_type", "dst", "gap_ms")
      .agg(count(lit(1)).as("c"))
    val totals = dist.groupBy("prev_type", "dst").agg(sum(col("c")).as("tot"))
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy("prev_type", "dst").orderBy("gap_ms")
    dist
      .withColumn("cum", sum(col("c")).over(cw))
      .join(broadcast(totals), Seq("prev_type", "dst"))
      .groupBy(col("prev_type"), col("dst").as("event_type"))
      .agg(max(col("tot")).as("n"),
        min(when(expr("cum >= (tot - 1) div 2 + 1"), col("gap_ms")))
          .as("p50_gap_ms"),
        min(when(expr("cum >= (tot - 1) * 9 div 10 + 1"), col("gap_ms")))
          .as("p90_gap_ms"))
      .orderBy("prev_type", "event_type")
  }
}
