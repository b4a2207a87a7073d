package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
    * bounded tests run with `ttl = false` + NoTimeout. */
  def sessionize(msgs: Dataset[Msg], ttl: Boolean = true): Dataset[Turn] = {
    import msgs.sparkSession.implicits._
    val timeoutConf =
      if (ttl) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    msgs.groupByKey(_.chatId)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(route(ttl))
  }
}
