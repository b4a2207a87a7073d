package graft.streaming

import org.apache.spark.sql.Dataset

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
  * All three shapes (plus the model-failover router below) are O(1)
  * state per key — at scale the state store holds one record per
  * ACTIVE chat, nothing grows with throughput — and each runs on BOTH
  * state APIs through [[StateApi.foldStream]] (one pure fold per
  * shape, so the two cannot drift; GuardsSpec pins every scenario on
  * both).
  */
object Guards {

  case class Work(chatId: Long, seq: Long, kind: String) // kind: msg | done
  case class Decision(chatId: Long, seq: Long, accepted: Boolean)

  /** Busy-bit fold, PURE — both state APIs run through
    * [[StateApi.foldStream]]. */
  def guardFold(chatId: Long, st0: Option[Boolean],
                work: Seq[Work]): (Option[Boolean], Vector[Decision]) = {
    val out = Vector.newBuilder[Decision]
    var busy = st0.getOrElse(false)
    for (w <- work.sortBy(_.seq)) w.kind match {
      case "done" => busy = false
      case _ =>
        if (busy) out += Decision(chatId, w.seq, accepted = false)
        else { busy = true; out += Decision(chatId, w.seq, accepted = true) }
    }
    (Some(busy), out.result())
  }

  /** `v2 = true` keeps the busy bit in a ValueState with optional TTL
    * — an expired bit reads as idle, which is the crash-recovery
    * semantics a production guard wants: a chat whose in-flight work
    * died with its worker must not stay locked forever. */
  def inFlight(work: Dataset[Work], v2: Boolean = false,
               ttl: Option[java.time.Duration] = None): Dataset[Decision] = {
    import work.sparkSession.implicits._
    StateApi.foldStream(work, (_: Work).chatId, "busy", v2, ttl, guardFold)
  }

  case class Usage(chatId: Long, seq: Long, tokens: Long)
  case class Context(chatId: Long, seq: Long, accTokens: Long, compacted: Boolean)

  val ContextWindow = 200000L  // agent-loop.sh:18
  val CompactAt     = 80L      // percent, agent-loop.sh:19
  /** Modeled size of the post-compaction summary. */
  val SummaryTokens = 2000L

  /** Token-accumulator fold, PURE — both state APIs run through
    * [[StateApi.foldStream]]. */
  def accumulateFold(chatId: Long, st0: Option[Long],
                     usage: Seq[Usage]): (Option[Long], Vector[Context]) = {
    val out = Vector.newBuilder[Context]
    var acc = st0.getOrElse(0L)
    for (u <- usage.sortBy(_.seq)) {
      acc += u.tokens
      val compact = acc * 100 >= ContextWindow * CompactAt
      if (compact) acc = SummaryTokens
      out += Context(chatId, u.seq, acc, compact)
    }
    (Some(acc), out.result())
  }

  def compaction(usage: Dataset[Usage], v2: Boolean = false,
                 ttl: Option[java.time.Duration] = None): Dataset[Context] = {
    import usage.sparkSession.implicits._
    StateApi.foldStream(usage, (_: Usage).chatId, "acc_tokens", v2, ttl,
      accumulateFold)
  }

  // --- Model failover with carried state -----------------------------
  //
  // The reference threads `_LAST_SUCCESSFUL_MODEL` across its task loop
  // (`agent-loop.sh:674,716,751-759`): every task STARTS on the model
  // that last completed anything (don't waste an attempt on a primary
  // under a sustained rate limit), rate_limit/timeout failures TOGGLE
  // primary↔fallback for the next attempt, success RECORDS the serving
  // model, auth aborts without touching the carried preference. Here
  // that is per-key streaming state: O(2 strings) per chat. On v2, an
  // expired route preference simply restarts the chat on the primary
  // (the cold-start default).

  val PrimaryModel  = "primary"
  val FallbackModel = "fallback"

  /** One attempt outcome arriving on the stream.
    * `outcome`: ok | rate_limit | timeout | auth | unknown. */
  case class Attempt(chatId: Long, seq: Long, outcome: String)
  /** `model` = the model that SERVED this attempt; `nextModel` = where
    * the router sends the chat's next attempt. */
  case class Route(chatId: Long, seq: Long, model: String, nextModel: String)
  case class RouteState(current: String, lastOk: String)

  /** Failover fold, PURE — both state APIs run through
    * [[StateApi.foldStream]]. */
  def failoverFold(chatId: Long, st0: Option[RouteState],
                   attempts: Seq[Attempt]): (Option[RouteState], Vector[Route]) = {
    val out = Vector.newBuilder[Route]
    var s = st0.getOrElse(RouteState(PrimaryModel, PrimaryModel))
    for (a <- attempts.sortBy(_.seq)) {
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
    (Some(s), out.result())
  }

  def modelRouter(attempts: Dataset[Attempt], v2: Boolean = false,
                  ttl: Option[java.time.Duration] = None): Dataset[Route] = {
    import attempts.sparkSession.implicits._
    StateApi.foldStream(attempts, (_: Attempt).chatId, "route", v2, ttl,
      failoverFold)
  }
}
