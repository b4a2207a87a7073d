package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Keyed per-chat session state — the reference's Telegram session map
  * (`telegram-agent.py:131-143,419-433,489-495`) re-expressed as
  * Structured Streaming keyed state:
  *
  *   - first message from a chat creates a session id;
  *   - every turn routes to the chat's current session and bumps the
  *     turn counter;
  *   - "/reset" clears the chat's session (`telegram-agent.py:489-495`),
  *     so the next message starts a fresh one;
  *   - idle chats expire via processing-time timeout — the engine-side
  *     analog of the reference's context compaction TTL
  *     (`agent-loop.sh:19,787-800`).
  *
  * The reference's offset checkpoint + atomic rename
  * (`telegram-agent.py:120-124`) is NOT reimplemented — Structured
  * Streaming checkpoints subsume it (SURVEY §1.3).
  *
  * Scale shape: state lives in the state store keyed by chat — one shuffle
  * on chat_id per micro-batch, state size O(active chats), TTL bounds it.
  */
object Sessions {

  case class Msg(chatId: Long, ts: Long, text: String)
  case class SessionState(sessionId: String, turns: Int)
  case class Turn(chatId: Long, sessionId: String, turn: Int, text: String)

  /** Deterministic session id: chat + timestamp of the opening message. */
  private def newSessionId(chatId: Long, ts: Long) = s"s-$chatId-$ts"

  def route(ttl: Boolean)(chatId: Long, msgs: Iterator[Msg],
            state: GroupState[SessionState]): Iterator[Turn] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val out = Vector.newBuilder[Turn]
    // Micro-batch iterators are not ordered by event time; sort so turn
    // numbers are deterministic.
    for (m <- msgs.toSeq.sortBy(m => (m.ts, m.text))) {
      if (m.text == "/reset") state.remove()
      else {
        val s = state.getOption.getOrElse(SessionState(newSessionId(chatId, m.ts), 0))
        val bumped = s.copy(turns = s.turns + 1)
        state.update(bumped)
        out += Turn(chatId, bumped.sessionId, bumped.turns, m.text)
      }
    }
    if (ttl && state.exists) state.setTimeoutDuration("30 minutes")
    out.result().iterator
  }

  /** msgs (streaming Dataset) → per-turn routing with live session ids.
    * `ttl = true` (production) expires idle chats via processing-time
    * timeout — which keeps the engine triggering housekeeping batches, so
    * bounded tests run with `ttl = false` + NoTimeout.
    *
    * `v2 = true` routes through [[SessionProcessor]] — Spark 4's
    * arbitrary-state v2 (`transformWithState`): per-STATE TTL replaces
    * the v1 timeout dance (no timed-out-key wakeup calls to filter, no
    * setTimeoutDuration re-arm per batch; expired state simply reads as
    * absent), and the state store handles schema evolution. Requires the
    * RocksDB state store provider. Same observable Turn stream — the
    * equivalence is tested on both paths in StreamingSpec. */
  def sessionize(msgs: Dataset[Msg], ttl: Boolean = true,
                 v2: Boolean = false): Dataset[Turn] = {
    import msgs.sparkSession.implicits._
    if (v2) {
      val timeMode = if (ttl) TimeMode.ProcessingTime() else TimeMode.None()
      msgs.groupByKey(_.chatId)
        .transformWithState(new SessionProcessor(ttl), timeMode, OutputMode.Append())
    } else {
      val timeoutConf =
        if (ttl) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
      msgs.groupByKey(_.chatId)
        .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(route(ttl))
    }
  }

  /** The v2 (arbitrary-state) spelling of [[route]]: same session
    * semantics, with idle expiry declared ONCE as a TTL on the state
    * itself instead of re-armed timeout timers. */
  class SessionProcessor(ttl: Boolean) extends StatefulProcessor[Long, Msg, Turn] {
    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val cfg = if (ttl) TTLConfig(java.time.Duration.ofMinutes(30)) else TTLConfig.NONE
      state = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], cfg)
    }

    override def handleInputRows(chatId: Long, msgs: Iterator[Msg],
                                 timerValues: TimerValues): Iterator[Turn] = {
      val out = Vector.newBuilder[Turn]
      // Same deterministic in-batch ordering as route().
      for (m <- msgs.toSeq.sortBy(m => (m.ts, m.text))) {
        if (m.text == "/reset") state.clear()
        else {
          val s = if (state.exists()) state.get()
                  else SessionState(newSessionId(chatId, m.ts), 0)
          val bumped = s.copy(turns = s.turns + 1)
          state.update(bumped)
          out += Turn(chatId, bumped.sessionId, bumped.turns, m.text)
        }
      }
      out.result().iterator
    }
  }
}
