package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

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

  /** One routed turn with the chat's transcript-state accounting:
    * `kept` = transcript entries held in state AFTER this turn,
    * `accTokens` = their estimated token total, `compacted` = this turn
    * crossed the threshold and snapshot-truncated the transcript. */
  case class CompactTurn(chatId: Long, sessionId: String, turn: Int,
                         kept: Int, accTokens: Long, compacted: Boolean)

  /** Bookkeeping alongside the transcript so the hot path never rescans
    * the list: entry count + token total, updated incrementally. */
  case class TranscriptMeta(entries: Int, accTokens: Long)

  /** Token estimate, same chars/4 integer rule as the batch operators. */
  private def estTokens(s: String): Long = (s.length + 3L) / 4L

  /** CONTEXT COMPACTION inside keyed state — the behavioral mirror of
    * the reference loop's summarize-and-reset (`agent-loop.sh:428-455,
    * 787-800`): each chat's transcript accumulates in a ListState; when
    * its estimated token total crosses `CompactAt`% of the budget
    * (80% of 200k by default — Guards' constants), the transcript is
    * SNAPSHOTTED into one bounded summary entry and truncated. State
    * SHRINKS at the threshold; the turn counter SURVIVES because it
    * lives in the session ValueState, not the transcript (asserted in
    * StreamingSpec). The transcript list is only materialized at
    * compaction time (to build the summary) — per-message work reads
    * the O(1) meta state, so a chat's cost does not grow with its
    * history between compactions. */
  class CompactingSessionProcessor(budgetTokens: Long = Guards.ContextWindow)
      extends StatefulProcessor[Long, Msg, CompactTurn] {
    @transient private var session: ValueState[SessionState] = _
    @transient private var transcript: ListState[String] = _
    @transient private var meta: ValueState[TranscriptMeta] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      session = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)
      transcript = getHandle.getListState[String](
        "transcript", Encoders.STRING, TTLConfig.NONE)
      meta = getHandle.getValueState[TranscriptMeta](
        "meta", Encoders.product[TranscriptMeta], TTLConfig.NONE)
    }

    override def handleInputRows(chatId: Long, msgs: Iterator[Msg],
                                 timerValues: TimerValues): Iterator[CompactTurn] = {
      val out = Vector.newBuilder[CompactTurn]
      for (m <- msgs.toSeq.sortBy(m => (m.ts, m.text))) {
        if (m.text == "/reset") {
          session.clear(); transcript.clear(); meta.clear()
        } else {
          val s = if (session.exists()) session.get()
                  else SessionState(newSessionId(chatId, m.ts), 0)
          val bumped = s.copy(turns = s.turns + 1)
          session.update(bumped)
          transcript.appendValue(m.text)
          val m0 = if (meta.exists()) meta.get() else TranscriptMeta(0, 0L)
          var kept = m0.entries + 1
          var acc = m0.accTokens + estTokens(m.text)
          // Integer cross-multiply — no double rounding at the boundary.
          val compact = acc * 100L >= budgetTokens * Guards.CompactAt
          if (compact) {
            // Snapshot + truncate: the reference summarizes the whole
            // conversation into a ≤500-word digest and starts over from
            // it; here the (stubbed) digest is a deterministic one-line
            // snapshot — swapping in a real summarizer changes this
            // string, not the state machinery. The list is read ONLY on
            // this path.
            val full = transcript.get()
            var n = 0
            while (full.hasNext) { n += 1; full.next() }
            val summary = s"[compacted: $n entries, ${bumped.turns} turns, ~$acc tokens]"
            transcript.clear()
            transcript.appendValue(summary)
            kept = 1
            acc = estTokens(summary)
          }
          meta.update(TranscriptMeta(kept, acc))
          out += CompactTurn(chatId, bumped.sessionId, bumped.turns, kept, acc, compact)
        }
      }
      out.result().iterator
    }
  }

  /** msgs → turns with transcript-state compaction at `CompactAt`% of
    * `budgetTokens` (see [[CompactingSessionProcessor]]). Requires the
    * RocksDB state store provider, like every transformWithState path. */
  def sessionizeCompacting(msgs: Dataset[Msg],
                           budgetTokens: Long = Guards.ContextWindow): Dataset[CompactTurn] = {
    import msgs.sparkSession.implicits._
    msgs.groupByKey(_.chatId)
      .transformWithState(new CompactingSessionProcessor(budgetTokens),
        TimeMode.None(), OutputMode.Append())
  }
}
