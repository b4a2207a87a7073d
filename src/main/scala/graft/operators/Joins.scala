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
  *    sides would be bucketed on the join key to skip the shuffle.
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

    // Session continuity: for each error event, count the same user's
    // events in the following hour. Equi key user_id + ns-exact interval
    // predicate → hash join + filter, not a nested loop. 3.6e12 ns = 1 h.
    "q_join_range" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val anchors = e.filter(col("event_type") === "error")
        .select(col("event_id").as("a_id"), col("user_id").as("a_user"),
                col("ts_ns").as("a_ts"))
      val follows = e.select(col("user_id").as("f_user"),
                             col("ts_ns").as("f_ts"))
      anchors
        .join(follows,
              col("a_user") === col("f_user") &&
              col("f_ts") > col("a_ts") &&
              col("f_ts") <= col("a_ts") + lit(3600000000000L))
        .groupBy(col("a_id"))
        .agg(count(lit(1)).as("n_follow"))
        .orderBy("a_id")
    }),
  )

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
