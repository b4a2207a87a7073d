package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Two more keyed-state shapes from the reference:
  *
  *  - In-flight guard (`telegram-agent.py:378-384,464-471`): a chat with
  *    work in flight rejects new work until a completion arrives. State =
  *    one busy bit per chat.
  *  - Context compaction (`agent-loop.sh:19,428-455,787-800`): per-chat
  *    token accumulation; crossing 80% of the context window triggers a
  *    compaction event that resets the accumulator to the summary's
  *    (modeled) size. State = one long per chat.
  *
  * Both are `flatMapGroupsWithState` with O(1) state per key — at scale
  * the state store holds one record per ACTIVE chat, nothing grows with
  * throughput.
  */
object Guards {

  case class Work(chatId: Long, seq: Long, kind: String) // kind: msg | done
  case class Decision(chatId: Long, seq: Long, accepted: Boolean)

  def guard(chatId: Long, work: Iterator[Work],
            state: GroupState[Boolean]): Iterator[Decision] = {
    val out = Vector.newBuilder[Decision]
    for (w <- work.toSeq.sortBy(_.seq)) w.kind match {
      case "done" => state.update(false)
      case _ =>
        val busy = state.getOption.getOrElse(false)
        if (busy) out += Decision(chatId, w.seq, accepted = false)
        else { state.update(true); out += Decision(chatId, w.seq, accepted = true) }
    }
    out.result().iterator
  }

  def inFlight(work: Dataset[Work]): Dataset[Decision] = {
    import work.sparkSession.implicits._
    work.groupByKey(_.chatId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(guard)
  }

  case class Usage(chatId: Long, seq: Long, tokens: Long)
  case class Context(chatId: Long, seq: Long, accTokens: Long, compacted: Boolean)

  val ContextWindow = 200000L  // agent-loop.sh:18
  val CompactAt     = 80L      // percent, agent-loop.sh:19
  /** Modeled size of the post-compaction summary. */
  val SummaryTokens = 2000L

  def accumulate(chatId: Long, usage: Iterator[Usage],
                 state: GroupState[Long]): Iterator[Context] = {
    val out = Vector.newBuilder[Context]
    var acc = state.getOption.getOrElse(0L)
    for (u <- usage.toSeq.sortBy(_.seq)) {
      acc += u.tokens
      val compact = acc * 100 >= ContextWindow * CompactAt
      if (compact) acc = SummaryTokens
      out += Context(chatId, u.seq, acc, compact)
    }
    state.update(acc)
    out.result().iterator
  }

  def compaction(usage: Dataset[Usage]): Dataset[Context] = {
    import usage.sparkSession.implicits._
    usage.groupByKey(_.chatId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(accumulate)
  }

  // --- Model failover with carried state -----------------------------
  //
  // The reference threads `_LAST_SUCCESSFUL_MODEL` across its task loop
  // (`agent-loop.sh:674,716,751-759`): every task STARTS on the model
  // that last completed anything (don't waste an attempt on a primary
  // under a sustained rate limit), rate_limit/timeout failures TOGGLE
  // primary↔fallback for the next attempt, success RECORDS the serving
  // model, auth aborts without touching the carried preference. Here
  // that is per-key streaming state: O(2 strings) per chat.

  val PrimaryModel  = "primary"
  val FallbackModel = "fallback"

  /** One attempt outcome arriving on the stream.
    * `outcome`: ok | rate_limit | timeout | auth | unknown. */
  case class Attempt(chatId: Long, seq: Long, outcome: String)
  /** `model` = the model that SERVED this attempt; `nextModel` = where
    * the router sends the chat's next attempt. */
  case class Route(chatId: Long, seq: Long, model: String, nextModel: String)
  case class RouteState(current: String, lastOk: String)

  def failover(chatId: Long, attempts: Iterator[Attempt],
               state: GroupState[RouteState]): Iterator[Route] = {
    val out = Vector.newBuilder[Route]
    var s = state.getOption.getOrElse(RouteState(PrimaryModel, PrimaryModel))
    for (a <- attempts.toSeq.sortBy(_.seq)) {
      val served = s.current
      s = a.outcome match {
        case "ok" =>
          // Success pins the carried preference (_LAST_SUCCESSFUL_MODEL=).
          RouteState(served, lastOk = served)
        case "rate_limit" | "timeout" =>
          // Failover toggle, exactly the reference's two-way switch.
          val next = if (served == PrimaryModel) FallbackModel else PrimaryModel
          s.copy(current = next)
        case "auth" =>
          // Not retryable: the task aborts; the NEXT task starts from
          // the carried last-successful model, not the toggled one.
          s.copy(current = s.lastOk)
        case _ => s // unknown: retry on the same model
      }
      out += Route(chatId, a.seq, served, s.current)
    }
    state.update(s)
    out.result().iterator
  }

  def modelRouter(attempts: Dataset[Attempt]): Dataset[Route] = {
    import attempts.sparkSession.implicits._
    attempts.groupByKey(_.chatId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(failover)
  }
}
