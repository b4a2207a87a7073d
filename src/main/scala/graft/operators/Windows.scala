package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.5 — window functions.
  *
  * Reference shapes: ordinal assignment (`agent-loop.sh:274,282`), ranking
  * (`agent-loop.sh:683-697`), previous-row carry
  * (`agent-loop.sh:674,716`), running token sum (`agent-loop.sh:706`),
  * bounded diagnostic frame (`agent-loop.sh:397,553`), heading fill-down
  * (`agent-loop.sh:187,200-203`), `[i/N]` labels
  * (`telegram-agent.py:242-244`).
  *
  * Scale rule: EVERY window below is `partitionBy`-ed on a real key
  * (customer, user, status) — no global unpartitioned window anywhere, so
  * each partition's rows sort independently and no single task ever
  * receives the whole table. Order keys always end in a unique column
  * (orderkey / event_id) so ties are impossible and results deterministic
  * under any parallelism.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  private def byUser = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")

  /** Integer cume_dist (`q_win_cume_dist`): peers-inclusive RANGE-frame
    * count over the partition total, in bp — cume_dist's double output
    * can't hash-compare across engines, but its definition is a ratio
    * of two window COUNTS and the default ANSI frame (RANGE UNBOUNDED
    * PRECEDING → CURRENT ROW) counts order PEERS inclusively in both.
    * Ordered by o_orderdate so ties are REAL and the peer semantics is
    * exercised — a unique key would collapse this to row_number/n. */
  def cumeDistBp(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    val all = Window.partitionBy("o_custkey")
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        count(lit(1)).over(w).as("peers"),
        count(lit(1)).over(all).as("tot"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        expr("peers * 10000 div tot").as("cd_bp"))
      .orderBy("o_orderkey")
  }

  /** The hot-window-key mitigation SCALE.md prescribes, made concrete: a
    * running sum per key whose partitions are (key, time-block) instead
    * of key alone, so one user with billions of events never lands on a
    * single sort task. Two phases, both frame-safe:
    *
    *   1. intra-block running sum — window over (key, block), block =
    *      `ts DIV blockSpan` (deterministic, order-preserving);
    *   2. block prefix offsets — per-(key, block) totals (ONE row per
    *      block) get an exclusive running sum over blocks per key; the
    *      final value is intra + offset.
    *
    * The offset window partitions by key but sees only blocks-per-key
    * rows — bounded by time range / blockSpan, not by data volume. All
    * partials stay in exact DECIMAL, so the result is BIT-IDENTICAL to
    * the single-window spelling (asserted against q_win_running_sum in
    * PipelineSpec along with the hot-key spread property). */
  def saltedRunningSum(events: DataFrame,
                       blockSpan: Long = 3600000000000L): DataFrame = {
    val blocked = events.withColumn("blk", expr(s"ts_ns DIV ${blockSpan}L"))
    val intraW = Window.partitionBy("user_id", "blk").orderBy("ts_ns", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIntra = blocked.withColumn("intra",
      sum(col("value").cast("decimal(18,4)")).over(intraW))
    val prefW = Window.partitionBy("user_id").orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blocked.groupBy("user_id", "blk")
      .agg(sum(col("value").cast("decimal(18,4)")).as("blk_total"))
      .withColumn("offset",
        coalesce(sum(col("blk_total")).over(prefW),
          lit(0).cast("decimal(18,4)")))
      .select(col("user_id"), col("blk"), col("offset"))
    withIntra.join(offsets, Seq("user_id", "blk"))
      .select(col("event_id"), col("user_id"),
        (col("intra") + col("offset")).cast("double").as("run_sum"))
  }

  val queries: Map[String, Q] = Map(
    // Ordinal per customer in date order (the %03d task index).
    "q_win_row_number" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          row_number().over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
            .as("rn"))
        .orderBy("o_orderkey")),

    // Rank within status by price (ties share a rank — deterministic).
    "q_win_rank" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"),
          rank().over(
            Window.partitionBy("o_orderstatus")
              .orderBy(col("o_totalprice").desc, col("o_orderkey")))
            .as("rk"),
          dense_rank().over(
            Window.partitionBy("o_orderstatus")
              .orderBy(col("o_totalprice").desc, col("o_orderkey")))
            .as("drk"))
        .orderBy("o_orderkey")),

    // Previous-row carry: each event sees the user's previous event type.
    "q_win_lag" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          lag(col("event_type"), 1).over(byUser).as("prev_type"),
          lead(col("event_type"), 1).over(byUser).as("next_type"))
        .orderBy("event_id")),

    // Running accumulation (SESSION_TOKENS fold). Decimal partials keep
    // the running double sum exact at any prefix length.
    "q_win_running_sum" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          sum(col("value").cast("decimal(18,4)"))
            .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("run_sum"))
        .orderBy("event_id")),

    // Bounded frame: 3-row trailing view (the tail -c diagnostic window).
    // Sum+count computed on exact decimals, divided once as double.
    "q_win_frame_avg" -> ((s, dir) => {
      val frame = byUser.rowsBetween(-2, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          round(
            sum(col("value").cast("decimal(18,4)")).over(frame).cast("double") /
            count(lit(1)).over(frame), 4).as("ma3"))
        .orderBy("event_id")
    }),

    // Fill-down: carry the user's last error-event id forward (the
    // parser's current_group semantics re-expressed over events).
    "q_win_fill_down" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          coalesce(
            last(when(col("event_type") === "error", col("event_id")),
                 ignoreNulls = true)
              .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            lit(-1L)).as("last_error_id"))
        .orderBy("event_id")),

    // Value-based RANGE frame — events within the trailing 10 minutes
    // (ns-exact), the rate-limiter's sliding-count view. Unlike ROWS
    // frames, the bound is on the ORDER value, so ties and gaps behave
    // identically in both engines with no tie-break column needed.
    "q_win_range_frame" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(
            Window.partitionBy("user_id").orderBy("ts_ns")
              .rangeBetween(-600000000000L, 0))
            .as("n_last_10m"))
        .orderBy("event_id")),

    // Batch sessionization — the session_window analog without streaming
    // (`agent-loop.sh:635-640` session boundaries): a >30 min gap starts
    // a new session; session ordinal = running sum of boundary flags.
    // Gap arithmetic in exact ns-longs.
    "q_win_session_batch" -> ((s, dir) => {
      val prev = lag(col("ts_ns"), 1).over(byUser)
      val newSession =
        when(prev.isNull || col("ts_ns") - prev > 1800000000000L, 1L).otherwise(0L)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          sum(newSession)
            .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("session_no"))
        .orderBy("event_id")
    }),

    // [i/N] labels: ordinal + partition total in one pass.
    "q_win_ntile_total" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          concat(lit("["),
                 row_number().over(byUser).cast("string"), lit("/"),
                 count(lit(1)).over(w).cast("string"), lit("]")).as("label"),
          ntile(4).over(byUser).as("quartile"))
        .orderBy("event_id")
    }),

    // INTEGER cume_dist: the peers-inclusive RANGE-frame count over
    // the partition total, in bp — cume_dist's double output can't
    // hash-compare across engines, but its definition (rows ≤ current
    // ÷ rows) is a ratio of two window COUNTS, and the default ANSI
    // frame (RANGE UNBOUNDED PRECEDING → CURRENT ROW) counts order
    // PEERS inclusively in both engines. Order key is o_orderdate, so
    // ties are REAL (several orders per customer-date) and the peer
    // semantics is actually exercised — a unique key would collapse
    // this to row_number/n.
    "q_win_cume_dist" -> ((s, dir) => cumeDistBp(Tables.orders(s, dir))),
  )

  val oracle: Map[String, String] = Map(
    "q_win_row_number" -> """
      SELECT o_orderkey, o_custkey,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rn
      FROM orders ORDER BY o_orderkey""",

    "q_win_rank" -> """
      SELECT o_orderkey, o_orderstatus,
             CAST(rank()       OVER w AS INTEGER) AS rk,
             CAST(dense_rank() OVER w AS INTEGER) AS drk
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus
                   ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_orderkey""",

    "q_win_lag" -> """
      SELECT event_id, user_id,
             lag(event_type)  OVER w AS prev_type,
             lead(event_type) OVER w AS next_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
      ORDER BY event_id""",

    "q_win_running_sum" -> """
      SELECT event_id, user_id,
             CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
               PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
      FROM events ORDER BY event_id""",

    "q_win_frame_avg" -> """
      SELECT event_id, user_id,
             round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) /
                   count(*) OVER w, 4) AS ma3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""",

    "q_win_fill_down" -> """
      SELECT event_id, user_id,
             coalesce(last_value(CASE WHEN event_type = 'error' THEN event_id END
                                 IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS last_error_id
      FROM events ORDER BY event_id""",

    "q_win_range_frame" -> """
      SELECT event_id, user_id,
             count(*) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)
               RANGE BETWEEN 600000000000 PRECEDING AND CURRENT ROW) AS n_last_10m
      FROM events ORDER BY event_id""",

    "q_win_session_batch" -> """
      SELECT event_id, user_id,
             CAST(sum(CASE WHEN prev IS NULL OR epoch_ns(ts) - prev > 1800000000000
                      THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
      FROM (
        SELECT event_id, user_id, ts,
               lag(epoch_ns(ts)) OVER (PARTITION BY user_id
                                       ORDER BY epoch_ns(ts), event_id) AS prev
        FROM events)
      ORDER BY event_id""",

    "q_win_ntile_total" -> """
      SELECT event_id, user_id,
             '[' || CAST(row_number() OVER w AS VARCHAR) || '/' ||
                    CAST(count(*) OVER (PARTITION BY user_id) AS VARCHAR) || ']' AS label,
             CAST(ntile(4) OVER w AS INTEGER) AS quartile
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
      ORDER BY event_id""",

    // Same two window counts, same default RANGE frame, single
    // trailing //.
    "q_win_cume_dist" -> """
      SELECT o_orderkey, o_custkey, o_orderdate,
             CAST(count(*) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate) * 10000
                  // count(*) OVER (PARTITION BY o_custkey) AS BIGINT)
               AS cd_bp
      FROM orders ORDER BY o_orderkey""",
  )
}
