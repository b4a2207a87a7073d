package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.6 sorts/limits/top-k + §2.7 set operations.
  *
  * Reference shapes: last-N suffix scans (`agent-loop.sh:397,553,598`),
  * latest-session-wins (`telegram-agent.py:431-433`), ordered display
  * (`agent-loop.sh:229-241`), daily-log concatenation
  * (`agent-loop.sh:537-545`), pending = all − done (`agent-loop.sh:629-631`),
  * active∩allowed guard (`telegram-agent.py:378-384,552-555`).
  *
  * Scale notes: `orderBy(...).limit(N)` compiles to Spark's
  * `TakeOrderedAndProject` — each partition keeps only its local top-N and
  * the driver merges N·partitions rows, never a global sort. Top-k per
  * group is the window `row_number ≤ k` idiom: one shuffle on the group
  * key, per-group heaps, no global ordering. Set ops hash on the full row;
  * EXCEPT/INTERSECT are distinct-semantics in both Spark and DuckDB.
  */
object SortsSets {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Suffix scan: the 100 most recent events (tail -N), re-sorted
    // ascending for a deterministic dump.
    "q_sort_limit" -> ((s, dir) =>
      Tables.events(s, dir)
        .orderBy(col("ts_ns").desc, col("event_id").desc)
        .limit(100)
        .select(col("event_id"), col("event_type"))
        .orderBy("event_id")),

    // Latest-k per key: each user's 3 most recent events.
    "q_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_ns").desc, col("event_id").desc)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
                row_number().over(w).as("rk"))
        .filter(col("rk") <= 3)
        .orderBy("event_id")
    }),

    // Ordered display: group order, then file order within group.
    "q_sort_multi" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderpriority"), col("o_orderdate"), col("o_orderkey"))
        .orderBy(col("o_orderpriority"), col("o_orderdate"), col("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderpriority"))),

    // Concatenate two filtered slices (daily-log append): UNION ALL keeps
    // duplicates; each side is tagged with its origin.
    "q_union" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      o.filter(col("o_orderstatus") === "O" && col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), lit("open_urgent").as("src"))
        .union(
          o.filter(col("o_orderstatus") === "F" && col("o_orderpriority") === "5-LOW")
            .select(col("o_orderkey"), lit("done_low").as("src")))
        .orderBy("o_orderkey", "src")
    }),

    // pending = all − started: customers minus those with an open order.
    "q_except" -> ((s, dir) =>
      Tables.customer(s, dir).select(col("c_custkey"))
        .except(
          Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
            .select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey")),

    // active ∩ allowed: customers having BOTH an open and a finished order.
    "q_intersect" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        .intersect(
          o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
        .orderBy("o_custkey")
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_sort_limit" -> """
      SELECT event_id, event_type FROM (
        SELECT event_id, event_type FROM events
        ORDER BY epoch_ns(ts) DESC, event_id DESC LIMIT 100)
      ORDER BY event_id""",

    "q_topk_per_group" -> """
      SELECT event_id, user_id, rk FROM (
        SELECT event_id, user_id,
               CAST(row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_ns(ts) DESC, event_id DESC) AS INTEGER) AS rk
        FROM events)
      WHERE rk <= 3 ORDER BY event_id""",

    "q_sort_multi" -> """
      SELECT o_orderkey, o_orderpriority FROM orders
      ORDER BY o_orderpriority, o_orderdate, o_orderkey""",

    "q_union" -> """
      SELECT o_orderkey, 'open_urgent' AS src FROM orders
      WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT o_orderkey, 'done_low' AS src FROM orders
      WHERE o_orderstatus = 'F' AND o_orderpriority = '5-LOW'
      ORDER BY o_orderkey, src""",

    "q_except" -> """
      SELECT c_custkey FROM customer
      EXCEPT
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
      ORDER BY c_custkey""",

    "q_intersect" -> """
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY o_custkey""",
  )
}
