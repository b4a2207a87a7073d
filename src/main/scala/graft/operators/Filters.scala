package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.2 — projections / filters / predicates.
  *
  * Reference shapes: equality filter (`agent-loop.sh:146`), conjunctive
  * skip predicate (`agent-loop.sh:630`), regex error grep
  * (`agent-loop.sh:399-408`), null/missing-field guard
  * (`agent-loop.sh:368,448`), CASE projection (`agent-loop.sh:165`),
  * set membership (`telegram-agent.py:553,498`).
  *
  * All predicates are plain Column expressions → Catalyst pushes them into
  * the parquet scan (check `PushedFilters` in the formatted plan); at
  * 100 TB this is the difference between reading a partition and reading
  * the lake.
  */
object Filters {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_filter_eq" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy("l_orderkey", "l_linenumber")),

    // TPC-H Q6 shape: tight conjunctive scan, single-row aggregate. The
    // whole predicate reaches the parquet reader as PushedFilters.
    "q_filter_multi" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(Tables.decSum(col("l_extendedprice") * col("l_discount")).as("revenue"))),

    // Ordered-alternation regex predicate (the error-grep shape).
    "q_filter_regex" -> ((s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_type").rlike("^(ECONOMY|PROMO)"))
        .select(col("p_partkey"), col("p_type"))
        .orderBy("p_partkey")),

    // Missing-field guard: `// empty` / `!= null` — drop rows whose
    // extracted field is missing or the zero sentinel. Extraction-based
    // (not byte-comparison on the raw JSON) so it survives generator
    // whitespace changes.
    "q_filter_null" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(coalesce(get_json_object(col("props"), "$.k").cast("int"), lit(0)) =!= 0)
        .select(col("event_id"), col("event_type"))
        .orderBy("event_id")),

    // Computed projection: status → display label (CASE chain).
    "q_project_compute" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          when(col("o_orderstatus") === "O", "open")
            .when(col("o_orderstatus") === "F", "done")
            .otherwise("partial").as("disp"))
        .orderBy("o_orderkey")),

    "q_filter_in_set" -> ((s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_orderkey"), col("o_orderpriority"))
        .orderBy("o_orderkey")),
  )

  val oracle: Map[String, String] = Map(
    "q_filter_eq" -> """
      SELECT l_orderkey, l_linenumber FROM lineitem
      WHERE l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber""",

    "q_filter_multi" -> """
      SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
        AND l_quantity < 24""",

    "q_filter_regex" -> """
      SELECT p_partkey, p_type FROM part
      WHERE regexp_matches(p_type, '^(ECONOMY|PROMO)') ORDER BY p_partkey""",

    "q_filter_null" -> """
      SELECT event_id, event_type FROM events
      WHERE coalesce(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER), 0) != 0
      ORDER BY event_id""",

    "q_project_compute" -> """
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'O' THEN 'open'
                  WHEN o_orderstatus = 'F' THEN 'done'
                  ELSE 'partial' END AS disp
      FROM orders ORDER BY o_orderkey""",

    "q_filter_in_set" -> """
      SELECT o_orderkey, o_orderpriority FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') ORDER BY o_orderkey""",
  )
}
