package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Events

/** Streaming DAY-OF-WEEK seasonality counters — the batch profile
  * (`q_events_dow`, operators/Events.scala `eventsDowProfile`) as a
  * STATELESS-per-row streaming aggregation: the dow projection is pure
  * epoch arithmetic ((day + 4) mod 7 — no calendar, no watermark
  * dependence), so the streaming form is literally the same groupBy
  * applied to a readStream frame. State is the running count per
  * (event_type, dow) — ≤ 7·types rows TOTAL, the smallest state
  * footprint of any twin (no per-user keys at all). Late events are
  * CORRECT here, not ignored: a count bumps whichever (type, dow) cell
  * the event belongs to regardless of arrival order, so the final
  * table equals the batch aggregate unconditionally — the spec pins
  * that across a multi-batch split with disorder.
  *
  * The share_bp column derives STATELESSLY downstream (n·10⁴ div
  * per-type total) exactly as the batch key computes it from its own
  * count frame; the feed ships the counts, the consumer derives the
  * shares at read time (shares are non-monotonic under updates, counts
  * are — the streaming-friendly half is the state).
  *
  * Scale shape: map-side partial aggregation collapses each
  * micro-batch to ≤ 7·types rows BEFORE the one tiny shuffle; the
  * state store holds ≤ 7·types longs regardless of corpus size. */
object DowStream {

  /** The shared projection + count — batch/stream agnostic: apply to a
    * streaming events frame and write in Update/Complete mode, or to a
    * batch frame for the equality proof. */
  def dowCounts(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        expr(s"(ts_ns div ${Events.DayNs}L + 4) % 7").as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("n"))
}
