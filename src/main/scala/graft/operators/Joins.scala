package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.3 — joins.
  *
  * The reference is single-document and performs no explicit relational
  * joins, but four join shapes are implied by its lookups: session lookup
  * (`telegram-agent.py:419-420`), broadcast config join
  * (`agent-loop.sh:71-79`), optional enrichment (`agent-loop.sh:287-288`),
  * authorization semi/anti (`telegram-agent.py:552-555`), the
  * task→group→session chain (`agent-loop.sh:635-640`), and temporal
  * session-continuity (`agent-loop.sh:489-493`).
  *
  * Scale notes:
  *  - Small dims (region, nation) are explicitly `broadcast()` — at
  *    100 TB the fact side never shuffles for those.
  *  - Big-big joins (orders⋈customer, lineitem⋈orders) shuffle on their
  *    keys; with AQE on, skew is split at runtime. On a real lake these
  *    sides are bucketed on the join key to skip the shuffle entirely —
  *    `Sinks.writeBucketed` is that layout, and BucketingSpec
  *    plan-asserts the Exchange-free sort-merge join on both
  *    orders⋈customer and lineitem⋈orders (SCALE.md §Joins for the
  *    bucketing-vs-AQE decision).
  *  - The range join keeps an equi key (`user_id`) so Spark plans a hash
  *    or sort-merge join with the interval as a post-join predicate —
  *    NEVER a broadcast-nested-loop over a cross product.
  *  - Nanosecond arithmetic stays in exact BIGINT (`ts_ns`) — no
  *    double rounding at any scale.
  */
object Joins {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Session lookup: each order row enriched with its customer segment.
    "q_join_inner" -> ((s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir),
              col("o_custkey") === col("c_custkey"), "inner")
        .select(col("o_orderkey"), col("c_mktsegment"))
        .orderBy("o_orderkey")),

    // Config lookup joined to every row — broadcast() hint: the build side
    // ships to every executor once; the probe side never moves.
    "q_join_broadcast" -> ((s, dir) =>
      Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)),
              col("n_regionkey") === col("r_regionkey"))
        .select(col("n_name"), col("r_name"))
        .orderBy("n_name")),

    // Optional enrichment: every customer, order key nullable when absent.
    "q_join_left" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir),
              col("c_custkey") === col("o_custkey"), "left_outer")
        .select(col("c_custkey"), col("o_orderkey"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)),

    // Authorization keep-list: customers that DO have an urgent order.
    // Semi join never duplicates the probe side — output ≤ left rows.
    "q_join_semi" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
              col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy("c_custkey")),

    // Drop-list: customers with NO order at all.
    "q_join_anti" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy("c_custkey")),

    // task → group → session chain: 3-way lineitem⋈orders⋈customer,
    // aggregated to revenue per market segment. Partial aggregation runs
    // before the final shuffle; only (segment, partial) rows move.
    "q_join_multiway" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          Tables.decSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("c_mktsegment")),

    // Point update / upsert: the reference rewrites its whole state doc
    // per task-status change (`agent-loop.sh:315-319`); relationally that
    // is base LEFT JOIN delta with COALESCE — the merge-into shape. The
    // delta side is tiny → broadcast, base never shuffles.
    "q_upsert_state" -> ((s, dir) => {
      val base = Tables.orders(s, dir)
      val delta = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey").as("d_key"), lit("X").as("new_status"))
      base.join(broadcast(delta), col("o_orderkey") === col("d_key"), "left_outer")
        .select(col("o_orderkey"),
          coalesce(col("new_status"), col("o_orderstatus")).as("status"))
        .orderBy("o_orderkey")
    }),

    // AS-OF join — the temporal point lookup every feature/training
    // pipeline needs (state of X as of event time): for each
    // non-purchase event, the user's most recent purchase at or before
    // it. Spark has no native as-of, and the naive spelling
    // (range join + per-row max) re-scans the right side per left row.
    // The scale-right shape is NO JOIN AT ALL: tag both sides, UNION,
    // and run one last_value(ignoreNulls) window per key ordered by
    // (t, side, ref) — a single shuffle on the key, linear in
    // left+right, skew-bounded by the window partition. Right rows are
    // pre-reduced to one per (key, t) (max ref) so ties are
    // deterministic; a same-instant right row sorts before the left row
    // (side 0 < 1) giving inclusive t_right <= t_left semantics — the
    // same contract as DuckDB's native ASOF LEFT JOIN, which the oracle
    // uses (two independent algorithms, one answer: a genuine
    // differential check). Unmatched lefts surface as -1.
    "q_join_asof" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val right = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts_ns").as("t"))
        .agg(max(col("event_id")).as("ref"))
        .select(col("user_id"), col("t"), lit(0).as("side"),
          col("ref"), lit(null).cast("bigint").as("left_id"))
      val left = e.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("ts_ns").as("t"), lit(1).as("side"),
          lit(null).cast("bigint").as("ref"), col("event_id").as("left_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("t"), col("side"), col("ref"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      right.unionByName(left)
        .withColumn("asof_ref", last(col("ref"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("left_id").as("event_id"), col("user_id"),
          coalesce(col("asof_ref"), lit(-1L)).as("last_purchase_id"))
        .orderBy("event_id")
    }),

    // Session continuity: for each error event, count the same user's
    // events in the following hour — see rangeFollowCounts for the
    // skew-hardened time-bucket join shape.
    "q_join_range" -> ((s, dir) =>
      rangeFollowCounts(Tables.events(s, dir)).orderBy("a_id")),
  )

  /** One-hour-follow counts per error event, as a SKEW-HARDENED range
    * join: the join key is (user_id, hour_bucket), not user_id alone.
    * Each follow row carries its hour bucket; each anchor explodes to
    * its own bucket and the next (f_ts ∈ (a_ts, a_ts+1h] ⟹ bucket(f) ∈
    * {bucket(a), bucket(a)+1} — exact, nanosecond-integer bucketing, no
    * false negatives), so the interval predicate stays a post-join
    * filter on an EQUI join. On a power-law key a plain user_id join
    * sends a dominant user's entire history to one task; the composite
    * key splits that user across (active hours) keys, bounding any task
    * by events-per-user-per-2-hours — the quantity the OUTPUT is itself
    * quadratic in, so no algorithm beats it. Cost: anchors duplicate
    * ×2; follows never duplicate. 3.6e12 ns = 1 h. Skew bound + model
    * agreement tested in PipelineSpec on a one-dominant-user frame. */
  def rangeFollowCounts(events: DataFrame): DataFrame = {
    val H = 3600000000000L
    val anchors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("a_id"), col("user_id").as("a_user"),
              col("ts_ns").as("a_ts"))
      .withColumn("bucket",
        explode(array(expr(s"a_ts DIV ${H}L"), expr(s"a_ts DIV ${H}L + 1L"))))
    val follows = events.select(col("user_id").as("f_user"),
                                col("ts_ns").as("f_ts"))
      .withColumn("bucket", expr(s"f_ts DIV ${H}L"))
    anchors
      .join(follows,
            col("a_user") === col("f_user") &&
            anchors("bucket") === follows("bucket") &&
            col("f_ts") > col("a_ts") &&
            col("f_ts") <= col("a_ts") + lit(H))
      .groupBy(col("a_id"))
      .agg(count(lit(1)).as("n_follow"))
  }

  val oracle: Map[String, String] = Map(
    "q_join_inner" -> """
      SELECT o_orderkey, c_mktsegment
      FROM orders JOIN customer ON o_custkey = c_custkey
      ORDER BY o_orderkey""",

    "q_join_broadcast" -> """
      SELECT n_name, r_name
      FROM nation JOIN region ON n_regionkey = r_regionkey
      ORDER BY n_name""",

    "q_join_left" -> """
      SELECT c_custkey, o_orderkey
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      ORDER BY c_custkey, o_orderkey NULLS FIRST""",

    "q_join_semi" -> """
      SELECT c_custkey, c_mktsegment FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""",

    "q_join_anti" -> """
      SELECT c_custkey, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",

    "q_join_multiway" -> """
      SELECT c_mktsegment,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q_upsert_state" -> """
      SELECT o_orderkey,
             coalesce(CASE WHEN o_orderkey % 100 = 0 THEN 'X' END,
                      o_orderstatus) AS status
      FROM orders ORDER BY o_orderkey""",

    // DuckDB's NATIVE ASOF JOIN — a different algorithm than the Spark
    // union+window spelling, so agreement is a differential check.
    "q_join_asof" -> """
      WITH p AS (
        SELECT user_id, epoch_ns(ts) AS t, max(event_id) AS ref
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, epoch_ns(ts)),
      l AS (
        SELECT event_id, user_id, epoch_ns(ts) AS t
        FROM events WHERE event_type <> 'purchase')
      SELECT l.event_id, l.user_id, coalesce(p.ref, -1) AS last_purchase_id
      FROM l ASOF LEFT JOIN p ON l.user_id = p.user_id AND l.t >= p.t
      ORDER BY event_id""",

    "q_join_range" -> """
      SELECT a.event_id AS a_id, count(*) AS n_follow
      FROM events a JOIN events f
        ON a.user_id = f.user_id
       AND epoch_ns(f.ts) >  epoch_ns(a.ts)
       AND epoch_ns(f.ts) <= epoch_ns(a.ts) + 3600000000000
      WHERE a.event_type = 'error'
      GROUP BY a.event_id ORDER BY a_id""",
  )
}
