package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort analytics over the streaming ACTIVE-USERS feed — the
  * retention and stickiness twins (round-15 verdict item 6): both
  * batch keys depend on the events stream ONLY through the distinct
  * (user, day) frame, which is exactly what [[ActiveStream]] delivers
  * incrementally. These rollups are therefore STATELESS downstream of
  * the feed — no second keyed state, no event replay: the feed is a
  * sufficient statistic, and these functions are the proof made engine
  * code (StreamingSpec pins each against its batch key row-for-row
  * over the same events).
  *
  * Input contract: `feed` is the ActiveStream output — (userId, day)
  * first-activity rows, each pair at most once. Scale shape: the feed
  * is already the corpus collapsed to active (user, day) pairs; every
  * aggregate below is over that bounded frame (the batch keys' own
  * scale argument, inherited). */
object CohortStream {

  /** `q_events_retention` over the feed: weekly cohorts from epoch
    * days (week = day div 7 — exact, WeekNs = 7·DayNs, so ts div
    * WeekNs == (ts div DayNs) div 7). The week frame needs a distinct
    * (several active days of one user land in one week); it is a
    * rollup of the bounded feed, not of raw events. */
  def retentionOf(feed: DataFrame): DataFrame =
    graft.operators.Events.retentionFromWeeks(feed
      .select(col("userId").as("user_id"), expr("day div 7").as("week"))
      .distinct())

  /** `q_events_stickiness` over the feed: DAU per day directly (feed
    * rows are distinct), MAU30 by the same ×30 cover-explode as the
    * batch key, ratio in bp; the inner join drops phantom tail days. */
  def stickinessOf(feed: DataFrame): DataFrame =
    graft.operators.Events.stickinessFromUserDays(
      feed.select(col("userId").as("user_id"), col("day")))
}
