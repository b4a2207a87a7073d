package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The SHARED two-API scaffold for every keyed fold in the engine
  * (round-18): each streaming twin is a PURE fold
  * `(key, state, batch rows) → (new state, emissions)` — this object
  * owns the only two places that fold ever meets a state store, so a
  * fix to the pattern (state read, TTL wiring, update-skip semantics)
  * lands once instead of once per operator:
  *
  *  - v1: `flatMapGroupsWithState` over a [[GroupState]];
  *  - v2: `transformWithState` via [[FoldProcessor]] (arbitrary-state
  *    API, [[ValueState]] + optional per-state TTL; TTL implies
  *    [[TimeMode.ProcessingTime]] — note processAllAvailable never
  *    terminates under that mode, see StreamingSpec's TTL test).
  *
  * A fold returning `None` for the state SKIPS the state write (the
  * TypeStream steady-state optimization: no put of an unchanged value
  * per micro-batch) — on the v2 lane that also skips refreshing the
  * TTL clock, which each caller documents where it matters. */
object StateApi {

  /** The one [[StatefulProcessor]] every v2 twin instantiates. */
  class FoldProcessor[K, I, S, O](
      stateName: String, enc: Encoder[S],
      ttl: Option[java.time.Duration],
      fold: (K, Option[S], Seq[I]) => (Option[S], Vector[O]))
      extends StatefulProcessor[K, I, O] {
    @transient private var state: ValueState[S] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[S](stateName, enc,
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
    }

    override def handleInputRows(key: K, rows: Iterator[I],
                                 timerValues: TimerValues): Iterator[O] = {
      val st0 = if (state.exists()) Some(state.get()) else None
      val (st, out) = fold(key, st0, rows.toVector)
      st.foreach(state.update)
      out.iterator
    }
  }

  /** Run `fold` as a keyed stream on either state API. */
  def foldStream[K: Encoder, I, S: Encoder, O: Encoder](
      ds: Dataset[I], keyOf: I => K, stateName: String,
      v2: Boolean, ttl: Option[java.time.Duration],
      fold: (K, Option[S], Seq[I]) => (Option[S], Vector[O])): Dataset[O] = {
    if (v2) {
      val timeMode =
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
      ds.groupByKey(keyOf).transformWithState(
        new FoldProcessor[K, I, S, O](
          stateName, implicitly[Encoder[S]], ttl, fold),
        timeMode, OutputMode.Append())
    } else
      ds.groupByKey(keyOf).flatMapGroupsWithState[S, O](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[I], state: GroupState[S]) =>
          val (st, out) = fold(key, state.getOption, rows.toVector)
          st.foreach(state.update)
          out.iterator
      }
  }
}
