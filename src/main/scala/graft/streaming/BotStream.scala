package graft.streaming

import org.apache.spark.sql.Dataset

import graft.operators.Events

/** Streaming BOT SCREEN — the batch abuse classifier (`q_events_bots`,
  * operators/Events.scala) as keyed incremental state: per user, the
  * running (current day, its count, max day count, min inter-event
  * gap, last event ts, total events, active days) septuple — seven
  * longs (56 bytes), everything the batch verdict reads plus the
  * timestamp the gap rule needs. A VERDICT-CHANGE LOG is emitted (the
  * AttributionStream correction pattern): one row when a user first
  * appears (verdict human unless its first day instantly trips the
  * cap — it can't: one event) and one row whenever the verdict FLIPS
  * to bot (volume cap crossed or a sub-threshold gap observed). Bot
  * verdicts are monotone — no rule un-flags a user — so the log is at
  * most two rows per user and the LAST row per user equals the batch
  * key's `is_bot` (StreamingSpec pins both rule boundaries and the
  * cross-batch gap case, on BOTH state APIs).
  *
  * Production shape: the state septuple IS the bot-screen serving
  * table (point lookups at the door); the append log feeds the audit
  * trail. Ordering contract and scale shape are [[ActiveStream]]'s:
  * per-user event-time order across micro-batches, intra-batch
  * disorder sorted before folding; one user_id shuffle per
  * micro-batch, 56 bytes of state per user. */
object BotStream {

  case class Ev(userId: Long, tsNs: Long, eventId: Long)
  case class BState(curDay: Long, curDayN: Long, maxDayN: Long,
                    minGapNs: Long, lastTs: Long, nEvents: Long,
                    nDays: Long)
  case class Verdict(userId: Long, isBot: Int)

  /** The per-batch fold, PURE — ONE definition both state APIs run
    * through [[StateApi.foldStream]]. */
  def fold(userId: Long, st0: Option[BState],
           evs: Seq[Ev]): (Option[BState], Vector[Verdict]) = {
    var st = st0.orNull
    val out = Vector.newBuilder[Verdict]
    def bot(s: BState): Boolean =
      s.maxDayN > Events.BotDayCap || s.minGapNs < Events.BotMinGapNs
    for (e <- evs.sortBy(x => (x.tsNs, x.eventId))) {
      if (st == null) {
        st = BState(e.tsNs / Events.DayNs, 1L, 1L, Long.MaxValue,
          e.tsNs, 1L, 1L)
        out += Verdict(userId, if (bot(st)) 1 else 0)
      } else if (e.tsNs >= st.lastTs) {
        val wasBot = bot(st)
        val d = e.tsNs / Events.DayNs
        val gap = e.tsNs - st.lastTs
        val sameDay = d == st.curDay
        val dayN = if (sameDay) st.curDayN + 1L else 1L
        st = BState(d, dayN, math.max(st.maxDayN, dayN),
          math.min(st.minGapNs, gap), e.tsNs, st.nEvents + 1L,
          st.nDays + (if (sameDay) 0L else 1L))
        if (!wasBot && bot(st)) out += Verdict(userId, 1)
      }
      // e.tsNs < lastTs: late event — ignored (ordering contract).
    }
    (Option(st), out.result())
  }

  /** events (streaming Dataset) → append verdict-change rows.
    * `v2 = true` routes through transformWithState; same observable
    * feed — StreamingSpec pins the full scenario on BOTH paths. */
  def botStream(events: Dataset[Ev], v2: Boolean = false,
                ttl: Option[java.time.Duration] = None): Dataset[Verdict] = {
    import events.sparkSession.implicits._
    StateApi.foldStream(events, (_: Ev).userId, "bot_stats", v2, ttl, fold)
  }
}
